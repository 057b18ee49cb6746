"""Entity normalization, type vocabulary, containment and alias rules —
the single source of truth shared by the engine stages, the synthetic-corpus
ground truth, and the conformance oracle.

Reference semantics carried over:
* ``sanitize``: ``'|' -> '_'`` + strip (/root/reference/graph_extractor/src/
  graph_utils.py:9-10 — '|' was reserved for string-packed multi-values there;
  we keep list columns but preserve the sanitizer for conformance).
* ``entity_key``: ``sanitize(label).lower()`` (graph_utils.py:30-31) — the
  canonicalization shuffle key.
"""

from __future__ import annotations


def sanitize(text: str) -> str:
    return text.replace("|", "_").strip()


def entity_key(label: str) -> str:
    return sanitize(label).lower()


# node type vocabulary
T_REPO, T_DIR, T_FILE = "Repository", "Directory", "File"
T_MOD, T_FN, T_CLS, T_CONCEPT = "Module", "Function", "Class", "Concept"


def containment_triples(repo: str, path: str) -> list[tuple]:
    """(repo, contains, dir), (dir, contains, subdir)..., (dir, contains, file)
    per path segment (FIXTURES.md F1/F4). 5-tuples
    (src_label, src_type, pred, dst_label, dst_type)."""
    out = []
    parts = path.split("/")
    parent, parent_t = repo, T_REPO
    for i in range(len(parts) - 1):
        d = f"{repo}/{'/'.join(parts[: i + 1])}"
        out.append((parent, parent_t, "contains", d, T_DIR))
        parent, parent_t = d, T_DIR
    out.append((parent, parent_t, "contains", f"{repo}/{path}", T_FILE))
    return out


def module_path(path: str) -> str:
    """python-style module path of a source file: strip extension, '/' -> '.'."""
    return path.rsplit(".", 1)[0].replace("/", ".")


def resolve_alias(key: str, defs_idx: dict) -> str | None:
    """Alias rule for entity linking: dotted key ``a.b.name`` merges into the
    entity ``name`` iff exactly one known definition of ``name`` lives in a
    module whose path ends with ``a.b`` at a dot boundary. ``defs_idx`` maps
    defined-name key -> set of module paths."""
    if "." not in key:
        return None
    prefix, name = key.rsplit(".", 1)
    mods = defs_idx.get(name)
    if not mods:
        return None
    matches = {m for m in mods if m == prefix or m.endswith("." + prefix)}
    if len(matches) == 1:
        return name
    return None


def close_reexports(reexports: dict, max_rounds: int = 32) -> dict:
    """Transitive closure of a (small, user-declared) re-export alias map —
    chained aliases ``a -> b, b -> c`` close to ``a -> c, b -> c`` so linking
    applies ONE lookup per key instead of iterating per mention. Cycles are
    resolved min-label (every member of / path into a cycle maps to the
    lexicographically smallest cycle member — the bounded-round min-label
    propagation rule, run here on the driver because the map is
    vocabulary-small by contract). Identity entries are dropped.

    The def-rule hop (keys.resolve_alias) composes AFTER the closure: a
    closed target that is still dotted may merge into its unique definition
    key downstream."""
    out: dict[str, str] = {}
    for start in reexports:
        path = [start]
        seen = {start}
        cur = start
        for _ in range(max_rounds):
            nxt = reexports.get(cur)
            if nxt is None:
                break
            if nxt in seen:
                # cycle: min-label over the cycle members wins for the whole path
                cyc = path[path.index(nxt):]
                cur = min(cyc)
                break
            path.append(nxt)
            seen.add(nxt)
            cur = nxt
        if cur != start:
            out[start] = cur
    return out
