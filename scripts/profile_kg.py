"""Per-stage profile of the KG pipeline via Dataset.stats().

Usage: python scripts/profile_kg.py [sf_dir] [--cpus N]

Prints Ray Data's operator-level wall/cpu/rows breakdown for the full
graph_tables run — the feedback loop for "is wall-time dominated by useful
compute". Owns its Ray session (do not call from the driver)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    ns = ap.parse_args()
    sf_dir, cpus = ns.sf_dir, ns.cpus

    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from text_to_graph_ray.pipelines import kg
    from text_to_graph_ray.synth import ensure_synth

    d = ensure_synth(sf_dir)
    nodes, edges = kg.graph_tables(f"{d}/repo_files.parquet")
    n_nodes, n_edges = nodes.count(), edges.count()
    print(f"nodes={n_nodes} edges={n_edges} (cpus={cpus}, {sf_dir})\n")
    for name, ds in (("EDGES", edges), ("NODES", nodes)):
        print(f"===== {name} pipeline stats =====")
        stats = ds.stats()
        # keep the operator summary lines; drop the per-block histograms
        for line in stats.splitlines():
            if re.match(r"^(Operator|\* (Remote wall time|Total time|Output rows per task|Peak heap)|Dataset )", line.strip()):
                print(line)
        print()

    ray.shutdown()


if __name__ == "__main__":
    main()
