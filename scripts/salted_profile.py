"""Skew profile for the salted two-phase canonicalization (NOTES.md evidence).

Builds a pathologically skewed corpus — EVERY file mentions one hot entity,
each with a distinct repo, so the hot key's distinct provenance set equals the
corpus size and its merge serializes in one bucket task under the default
plan — then times graph_tables under both plans and checks value equality on
the hot node.

Usage: python scripts/salted_profile.py [n_files]   (default 100000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/graft_skew_corpus"


def build_corpus(n_files: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"{ROOT}/{n_files}"
    if os.path.isdir(out) and any(os.scandir(out)):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    shard = 10_000
    body = "\n".join(f"    value_{j} = compute_{j}()" for j in range(10))
    for s0 in range(0, n_files, shard):
        n = min(shard, n_files - s0)
        idx = range(s0, s0 + n)
        tbl = pa.table(
            {
                "repo": [f"repo{i:07d}" for i in idx],
                "path": [f"m{i}.py" for i in idx],
                "commit": ["c"] * n,
                "lang": ["python"] * n,
                "content": [
                    f"import hotmod\n\ndef handler_{i}():\n{body}\n    hotmod.hot()\n" for i in idx
                ],
            }
        )
        pq.write_table(tbl, f"{out}/part-{s0 // shard:04d}.parquet")
    return out


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    corpus = build_corpus(n_files)

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from text_to_graph_ray.config import PipelineConfig
    from text_to_graph_ray.pipelines import kg

    results = {}
    hot_rows = {}
    for name, cfg in (
        ("single_phase", PipelineConfig()),
        ("salted", PipelineConfig(salted_canonicalize=True, salt_buckets=16)),
    ):
        t0 = time.monotonic()
        nodes, _ = kg.graph_tables(corpus, cfg, which="nodes")
        df = nodes.to_pandas()
        results[name] = round(time.monotonic() - t0, 1)
        hot = df[df["entity_key"] == "hotmod"].iloc[0]
        hot_rows[name] = (hot["label"], hot["types_packed"], len(hot["repos_packed"].split("|")))

    assert hot_rows["single_phase"] == hot_rows["salted"], hot_rows
    assert hot_rows["salted"][2] == n_files
    print(
        json.dumps(
            {
                "metric": "salted_canonicalize_profile",
                "n_files": n_files,
                "wall_single_phase_sec": results["single_phase"],
                "wall_salted_sec": results["salted"],
                "hot_key_distinct_repos": n_files,
                "plans_value_equal_on_hot_key": True,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
