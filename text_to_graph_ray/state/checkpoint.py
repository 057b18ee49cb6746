"""Per-partition checkpoint manifests — the resume contract.

Replaces the reference's fine-grained SQLite response cache keyed
``(document_id, chunk_index, config_id)`` (/root/reference/graph_extractor/src/
sqlite_support.py:275-423, skip checks graph_generator.py:183,227,260) with a
coarse per-partition layout suited to distributed object-store execution:

    <root>/<config_hash>/<stage>/part=<k>/...parquet      (stage data)
    <root>/<config_hash>/_manifest/<stage>/part-<k>.json  (completion marker)

A partition is "done" iff its manifest row exists; manifest rows are written
only after the stage's data write returns, so a killed run leaves at worst
orphan data files that the resumed run overwrites-by-recompute (the idempotent
upsert analogue of sqlite_support.py:333-423). Resume = anti-join of partition
ids against the manifest (J3 in SURVEY §2.4). Each row carries lineage +
counters (config_hash, input fingerprint, row counts, wall ms) — the
per-partition lineage/metrics requirement of the north rule.
"""

from __future__ import annotations

import json
import os
import zlib


def part_of(repo: str, path: str, num_partitions: int) -> int:
    """Stable partition id of a file row (crc32 — process-independent)."""
    return zlib.crc32(f"{repo}\x00{path}".encode("utf-8")) % num_partitions


def input_fingerprint(input_path: str) -> str:
    """Content-change fingerprint of an input path: digest over the sorted
    (relative name, size, mtime_ns) of every parquet file under it. Cheap
    (metadata only — no data read) yet catches replaced/appended/removed
    inputs, so a resume against changed data recomputes instead of silently
    reusing stale partitions (the reference keyed its cache on content sha —
    my_hash.py; size+mtime is the metadata-cost analogue)."""
    import hashlib
    import os

    entries = []
    if os.path.isdir(input_path):
        for root, _, names in os.walk(input_path):
            for n in sorted(names):
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    st = os.stat(p)
                    entries.append(f"{os.path.relpath(p, input_path)}\x00{st.st_size}\x00{st.st_mtime_ns}")
    elif os.path.exists(input_path):
        st = os.stat(input_path)
        entries.append(f"{os.path.basename(input_path)}\x00{st.st_size}\x00{st.st_mtime_ns}")
    entries.sort()
    return hashlib.sha256("\n".join(entries).encode("utf-8")).hexdigest()[:16]


class CheckpointStore:
    def __init__(self, root: str, config_hash: str):
        self.base = os.path.join(root, config_hash)
        self.config_hash = config_hash
        os.makedirs(self.base, exist_ok=True)

    def stage_dir(self, stage: str) -> str:
        d = os.path.join(self.base, stage)
        os.makedirs(d, exist_ok=True)
        return d

    def _manifest_dir(self, stage: str) -> str:
        d = os.path.join(self.base, "_manifest", stage)
        os.makedirs(d, exist_ok=True)
        return d

    def done_parts(self, stage: str) -> set[int]:
        d = self._manifest_dir(stage)
        out = set()
        for f in os.listdir(d):
            if f.startswith("part-") and f.endswith(".json"):
                out.add(int(f[5:-5]))
        return out

    def manifest(self, stage: str, part: int) -> dict | None:
        p = os.path.join(self._manifest_dir(stage), f"part-{part}.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def mark_done(self, stage: str, part: int, **meta) -> None:
        p = os.path.join(self._manifest_dir(stage), f"part-{part}.json")
        tmp = p + ".tmp"
        row = {"partition_id": part, "stage": stage, "config_hash": self.config_hash, **meta}
        with open(tmp, "w") as f:
            json.dump(row, f)
        os.replace(tmp, p)  # atomic: a manifest row either exists fully or not at all

    def counters(self, stage: str) -> dict[int, dict]:
        return {p: self.manifest(stage, p) for p in self.done_parts(stage)}

    def clear_stage(self, stage: str) -> None:
        """Drop a stage's data + manifests entirely (stale-input invalidation:
        leftover data files from partitions that no longer exist in the new
        input must not leak into reads of the stage dir)."""
        import shutil

        shutil.rmtree(os.path.join(self.base, stage), ignore_errors=True)
        shutil.rmtree(os.path.join(self.base, "_manifest", stage), ignore_errors=True)
