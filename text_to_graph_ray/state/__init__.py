"""Durable state: checkpoint manifests + resume logic (no shared mutable DB —
the reference's SQLite cache becomes append-only per-partition manifests)."""
