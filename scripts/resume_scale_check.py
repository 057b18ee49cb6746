"""Resume-at-scale evidence (VERDICT r3 item 9): REALLY kill the driver
between the merged-graph checkpoint and the final sink on the scaling corpus,
then resume and prove the second checkpoint level carries the run:

  phase 1  child process runs kg.run with CheckpointStore.mark_done patched
           to os._exit(17) right after the "merged" manifest lands — a hard
           process death mid-job, after extraction + canonicalization +
           linking but before any output file exists;
  phase 2  a fresh process resumes: extraction partitions must all skip
           (parts_computed == 0), the merged checkpoint files must be reused
           byte-for-byte (same names + mtimes), and the final nodes/edges
           counts must match a clean reference run.

Usage: python scripts/resume_scale_check.py [n_files]   (default 50000)
Prints one JSON line with the timings + verdict; exit 0 = all assertions hold.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_ROOT = "/tmp/graft_resume_check"


def _init_ray():
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def child(corpus: str, out: str) -> None:
    _init_ray()
    from text_to_graph_ray.config import PipelineConfig
    from text_to_graph_ray.pipelines import kg
    from text_to_graph_ray.state.checkpoint import CheckpointStore

    orig = CheckpointStore.mark_done

    def die_after_merged(self, stage, part, **kw):
        orig(self, stage, part, **kw)
        if stage == "merged":
            print("KILL: merged checkpoint written, dying before the sink", flush=True)
            os._exit(17)

    CheckpointStore.mark_done = die_after_merged
    kg.run(corpus, out, PipelineConfig())
    os._exit(3)  # must not be reached


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    from text_to_graph_ray.synth import ensure_scaling_corpus

    corpus = ensure_scaling_corpus(n_files)
    out = f"{OUT_ROOT}/{n_files}"
    clean_out = f"{OUT_ROOT}/{n_files}_clean"
    for d in (out, clean_out):
        shutil.rmtree(d, ignore_errors=True)

    t0 = time.monotonic()
    rc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", corpus, out],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    ).returncode
    t_killed = time.monotonic() - t0
    assert rc == 17, f"child exited {rc}, expected the injected kill (17)"
    assert not os.path.isdir(f"{out}/nodes"), "sink ran before the kill?"

    _init_ray()
    from text_to_graph_ray.config import PipelineConfig
    from text_to_graph_ray.pipelines import kg
    from text_to_graph_ray.state.checkpoint import CheckpointStore

    cfg = PipelineConfig()
    store = CheckpointStore(f"{out}/checkpoints", cfg.config_hash())
    merged_before = sorted((f, os.path.getmtime(os.path.join(store.stage_dir("merged"), f)))
                           for f in os.listdir(store.stage_dir("merged")))
    assert merged_before, "merged checkpoint missing after the kill"

    t1 = time.monotonic()
    r = kg.run(corpus, out, cfg)
    t_resume = time.monotonic() - t1
    merged_after = sorted((f, os.path.getmtime(os.path.join(store.stage_dir("merged"), f)))
                          for f in os.listdir(store.stage_dir("merged")))
    assert r["parts_computed"] == 0, f"resume recomputed {r['parts_computed']} extraction partitions"
    assert merged_after == merged_before, "merged checkpoint was rewritten on resume"

    t2 = time.monotonic()
    r_clean = kg.run(corpus, clean_out, cfg)
    t_clean = time.monotonic() - t2
    assert (r["nodes"], r["edges"]) == (r_clean["nodes"], r_clean["edges"]), (r, r_clean)

    print(json.dumps({
        "metric": "resume_mid_link_scale",
        "n_files": n_files,
        "killed_run_sec": round(t_killed, 1),
        "resume_sec": round(t_resume, 1),
        "clean_run_sec": round(t_clean, 1),
        "nodes": r["nodes"],
        "edges": r["edges"],
        "parts_recomputed_on_resume": r["parts_computed"],
        "merged_checkpoint_reused": True,
        "ok": True,
    }))
    shutil.rmtree(clean_out, ignore_errors=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
    else:
        sys.exit(main())
