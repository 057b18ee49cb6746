"""Checkpoint/resume semantics (FIXTURES.md F6): interrupted runs resume
without recomputing completed partitions; outputs are byte-identical."""

import os
import shutil

import pandas as pd
import pytest


def _read_sorted(d):
    import glob

    import pyarrow.parquet as pq

    parts = [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{d}/**/*.parquet", recursive=True))]
    df = pd.concat(parts, ignore_index=True)
    cols = [c for c in ("entity_key", "src_key", "pred", "dst_key") if c in df.columns]
    return df.sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def cfg():
    from text_to_graph_ray.config import PipelineConfig

    return PipelineConfig(num_partitions=8)


def test_full_run_then_resume_noop(ray_session, small_corpus, cfg, tmp_path_factory):
    from text_to_graph_ray.pipelines import kg

    out = str(tmp_path_factory.mktemp("ckpt"))
    r1 = kg.run(small_corpus["path"], out, cfg)
    assert r1["parts_computed"] > 0
    assert r1["edges"] > 0

    r2 = kg.run(small_corpus["path"], out, cfg)
    assert r2["parts_computed"] == 0
    assert r2["parts_skipped"] == r1["parts_total"]
    assert (r2["nodes"], r2["edges"]) == (r1["nodes"], r1["edges"])


def test_partial_resume_recomputes_only_missing(ray_session, small_corpus, cfg, tmp_path_factory):
    from text_to_graph_ray.pipelines import kg
    from text_to_graph_ray.state.checkpoint import CheckpointStore

    out = str(tmp_path_factory.mktemp("ckpt2"))
    r1 = kg.run(small_corpus["path"], out, cfg)
    edges_before = _read_sorted(f"{out}/edges")
    nodes_before = _read_sorted(f"{out}/nodes")

    store = CheckpointStore(f"{out}/checkpoints", cfg.config_hash())
    done = sorted(store.done_parts("records"))
    killed = done[: len(done) // 2]
    # simulate losing half the partitions (a completed run compacts its
    # manifest, so forgetting goes through the store API, not file removal)
    store.invalidate_parts("records", killed)
    for p in killed:
        shutil.rmtree(os.path.join(store.stage_dir("records"), f"part_id={p}"), ignore_errors=True)
    survivor_meta = {p: store.manifest("records", p) for p in done if p not in killed}

    r2 = kg.run(small_corpus["path"], out, cfg)
    assert r2["parts_computed"] == len(killed)
    assert r2["parts_skipped"] == len(done) - len(killed)
    # completed partitions were not recomputed: their manifest rows (which
    # carry the writing run's wall_ms) are byte-identical after the resume
    for p, meta in survivor_meta.items():
        assert store.manifest("records", p) == meta

    assert _read_sorted(f"{out}/edges").equals(edges_before)
    assert _read_sorted(f"{out}/nodes").equals(nodes_before)


def test_config_change_invalidates_cache(ray_session, small_corpus, tmp_path_factory):
    from text_to_graph_ray.config import PipelineConfig
    from text_to_graph_ray.pipelines import kg

    out = str(tmp_path_factory.mktemp("ckpt3"))
    c1 = PipelineConfig(num_partitions=4)
    c2 = PipelineConfig(num_partitions=4, chunk_size=300)  # the "high" preset
    kg.run(small_corpus["path"], out, c1)
    r = kg.run(small_corpus["path"], out, c2)
    assert r["parts_computed"] > 0  # different config_hash -> no reuse
    assert c1.config_hash() != c2.config_hash()


def test_part_of_stable():
    from text_to_graph_ray.state.checkpoint import part_of

    assert part_of("r", "p", 64) == part_of("r", "p", 64)
    assert 0 <= part_of("acme/web", "src/a.py", 64) < 64
