"""Scale evidence for fuzzy_self_join_ed1: 1M synthetic 10-char strings with
2% injected ED-1 mutations, generated DISTRIBUTED and deterministically from
the row id (no disk, no driver-side corpus). Prints wall, pair counts, and
the truncation counter.

Usage: RAY_GRAFT_CPUS=32 python -u scripts/fuzzy_scale_check.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def string_for(i: int) -> str:
    # deterministic 10-char string from a splitmix-style mix of the id
    x = (i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    out = []
    for _ in range(10):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        out.append(ALPHABET[x % 26])
    return "".join(out)


def row_string(i: int) -> str:
    if i % 50 == 1:  # 2%: ED-1 mutation of the previous row's string
        base = string_for(i - 1)
        pos = i % 10
        repl = ALPHABET[(ALPHABET.index(base[pos]) + 1) % 26]
        return base[:pos] + repl + base[pos + 1 :]
    return string_for(i)


def main():
    import pyarrow as pa
    import ray
    import ray.data as rd
    from ray.data import DataContext

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from text_to_graph_ray.functions.fuzzy import fuzzy_self_join_ed1

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        return pa.table(
            {"id": pa.array(ids, type=pa.int64()), "s": pa.array([row_string(i) for i in ids])}
        )

    ds = rd.range(n, override_num_blocks=max(8, cpus * 4)).map_batches(gen, batch_format="pyarrow")

    t0 = time.monotonic()
    stats: dict = {}
    out = fuzzy_self_join_ed1(ds, "s", "id", num_buckets=nb, stats=stats).materialize()
    wall = time.monotonic() - t0
    pairs = out.count()
    injected = sum(1 for i in range(n) if i % 50 == 1)
    print(
        f"RESULT n={n} nb={nb} cpus={cpus} wall={wall:.1f}s pairs={pairs} "
        f"injected={injected} dropped={stats.get('fuzzy_pairs_dropped')} "
        f"rows_per_sec={n / wall:.0f}"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
