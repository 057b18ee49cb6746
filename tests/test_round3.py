"""Round-3 additions: graph invariance of the hand-computed fixture under the
high-resolution preset, the NgramScorer near-miss fallback wired end-to-end,
and the schema-metadata hygiene helpers."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _sorted(df: pd.DataFrame, cols) -> pd.DataFrame:
    return df[cols].sort_values(cols).reset_index(drop=True)


NODE_COLS = ["entity_key", "label", "types_packed", "repos_packed"]
EDGE_COLS = ["src_key", "pred", "dst_key", "repos_packed"]


def test_kg_fixture_hand_computed_hires(ray_session):
    """The HAND-COMPUTED fixture must reproduce under high_resolution()
    (300-token chunks, padding, two-pass) — graph invariance proven on the
    independent oracle, not just the synth one."""
    import pyarrow.parquet as pq

    from text_to_graph_ray.config import PipelineConfig
    from text_to_graph_ray.fixtures import ensure_fixture
    from text_to_graph_ray.pipelines import kg

    d = ensure_fixture()
    nodes, edges = kg.graph_tables(f"{d}/repo_files.parquet", PipelineConfig.high_resolution())
    exp_n = pq.read_table(f"{d}/expected_nodes.parquet").to_pandas()
    exp_e = pq.read_table(f"{d}/expected_triples.parquet").to_pandas()
    assert _sorted(nodes.to_pandas(), NODE_COLS).equals(_sorted(exp_n, NODE_COLS))
    assert _sorted(edges.to_pandas(), EDGE_COLS).equals(_sorted(exp_e, EDGE_COLS))


def test_scored_link_stage_unit():
    """ScoredLinkStage: exact vocab hit scores ~1, junk scores below the
    threshold and is dropped; output schema is fixed."""
    from text_to_graph_ray.stages.linker import ScoredLinkStage

    stage = ScoredLinkStage(vocab=["handle_request", "parse_config", "write_output"], threshold=0.35)
    batch = pa.table({"mention": pa.array(["pkg.handle_request", "zzqqxx", "parse_config"], type=pa.string())})
    out = stage(batch)
    assert out.schema.names == ["mention", "matched", "score"]
    got = {m: (t, s) for m, t, s in zip(*[out.column(c).to_pylist() for c in out.schema.names])}
    assert got["parse_config"][0] == "parse_config" and got["parse_config"][1] == 1.0
    assert got["pkg.handle_request"][0] == "handle_request"
    assert "zzqqxx" not in got  # below threshold -> dropped


def test_scored_fallback_links_distributed_vs_naive(ray_session):
    """Distributed scored_fallback_links == the naive single-threaded trigram
    oracle on a small synthetic graph (batch splits must not change scores)."""
    import numpy as np
    import ray.data as rd

    from text_to_graph_ray.expected import _naive_trigram_vec
    from text_to_graph_ray.pipelines.kg import scored_fallback_links

    vocab = [f"func_{i}" for i in range(40)] + ["alpha_beta", "gamma_delta"]
    mentions = ["pkg0.func_3", "pkg1.alpha_beta", "mod.gamma_delta", "x.unrelated_zz"]
    edges = pa.table(
        {
            "src_key": pa.array(mentions, type=pa.string()),
            "dst_key": pa.array(["func_0"] * len(mentions), type=pa.string()),
        }
    )
    nodes = pa.table({"entity_key": pa.array(vocab, type=pa.string())})
    got = (
        scored_fallback_links(rd.from_arrow(edges).repartition(3), rd.from_arrow(nodes).repartition(2))
        .to_pandas()
        .sort_values("mention")
        .reset_index(drop=True)
    )

    sv = sorted(vocab)
    mat = np.stack([_naive_trigram_vec(w, 1024) for w in sv])
    exp_rows = []
    for m in sorted({k for k in mentions if "." in k and "/" not in k}):
        q = _naive_trigram_vec(m, 1024)
        sims = q @ mat.T
        i = int(sims.argmax())
        if sims[i] >= 0.35:
            exp_rows.append((m, sv[i], round(float(sims[i]), 6)))
    want = pd.DataFrame(exp_rows, columns=["mention", "matched", "score"])
    pd.testing.assert_frame_equal(got, want)


def test_read_parquet_clean_strips_metadata(ray_session, tmp_path):
    """Blocks read through read_parquet_clean carry NO schema metadata (the
    b'pandas' dict makes schemas unhashable in Ray's reduce)."""
    import pyarrow.parquet as pq

    from text_to_graph_ray.util import read_parquet_clean

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = str(tmp_path / "t.parquet")
    df.to_parquet(p)  # pandas writer embeds b'pandas' metadata
    assert pq.read_schema(p).metadata  # precondition

    ds = read_parquet_clean(p)
    for batch in ds.iter_batches(batch_format="pyarrow"):
        assert not batch.schema.metadata
    sub = read_parquet_clean(p, columns=["a"])
    assert sub.schema().names == ["a"]
    assert sub.to_pandas()["a"].tolist() == [1, 2, 3]


def test_pa_from_pandas_no_metadata():
    from text_to_graph_ray.util import pa_from_pandas

    t = pa_from_pandas(pd.DataFrame({"x": [1.5], "y": ["s"]}))
    assert t.schema.metadata is None
    assert hash(t.schema)  # hashable again


def test_decode_image_real_branch_import_guarded():
    """fake=False exercises whichever branch the environment provides: a real
    PIL decode when PIL is importable, a clear NotImplementedError otherwise."""
    import pytest

    from text_to_graph_ray.functions.multimodal import DecodeImage, _PILImage

    d = DecodeImage(fake=False)
    if _PILImage is None:
        with pytest.raises(NotImplementedError):
            d._decode(b"\x00\x01", 4, 4)
    else:
        import io

        buf = io.BytesIO()
        _PILImage.new("RGB", (4, 4), (10, 20, 30)).save(buf, format="PNG")
        img = d._decode(buf.getvalue(), 4, 4)
        assert img.shape == (4, 4, 3)
        assert img[0, 0, 0] == 10.0
