"""Training-data ops: dedup (exact/minhash/simhash/embedding), text analysis,
ANN, multimodal plumbing — correctness on planted fixtures."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},                                  # exact dup of 0
        {"doc_id": 2, "text": base.replace("lazy", "sleepy")},        # near dup of 0
        {"doc_id": 3, "text": "completely different content about databases and distributed systems engines"},
        {"doc_id": 4, "text": "another unrelated text mentioning graphs pipelines and shuffles everywhere"},
        {"doc_id": 5, "text": ""},
    ]
    return rd.from_items(rows)


def test_exact_dedup_keep_min(docs_ds):
    from text_to_graph_ray.functions.dedup import exact_dedup_keep_min

    out = exact_dedup_keep_min(docs_ds).to_pandas()
    assert list(out["doc_id"]) == [0, 2, 3, 4, 5]  # doc 1 collapsed into 0


def test_minhash_finds_planted_near_dup(docs_ds):
    from text_to_graph_ray.functions.dedup import minhash_near_dup_pairs

    # 32 bands x 2 rows: high candidate recall for short planted docs
    pairs = minhash_near_dup_pairs(docs_ds, threshold=0.5, bands=32).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in got  # exact dup: est jaccard 1.0
    assert (0, 2) in got or (1, 2) in got  # near dup found
    assert not any({a, b} & {3, 4} and {a, b} & {0, 1, 2} for a, b in got)


def test_minhash_estimate_close_to_exact(docs_ds):
    from text_to_graph_ray.functions.dedup import exact_jaccard, minhash_near_dup_pairs

    pairs = minhash_near_dup_pairs(docs_ds, threshold=0.3, bands=32).to_pandas()
    row = pairs[(pairs["a"] == 0) & (pairs["b"] == 2)]
    if len(row):
        base = "the quick brown fox jumps over the lazy dog and runs far away today"
        exact = exact_jaccard(base, base.replace("lazy", "sleepy"))
        assert abs(row["est_jaccard"].iloc[0] - exact) < 0.35


def test_simhash_near_dup(docs_ds):
    from text_to_graph_ray.functions.dedup import simhash_near_dup_pairs

    pairs = simhash_near_dup_pairs(docs_ds, max_hamming=10).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in got  # identical -> hamming 0
    h01 = pairs[(pairs["a"] == 0) & (pairs["b"] == 1)]["hamming"].iloc[0]
    assert h01 == 0


def test_simhash64_deterministic():
    from text_to_graph_ray.functions.dedup import simhash64

    assert simhash64("hello world foo") == simhash64("hello world foo")
    assert simhash64("") == 0


def test_embedding_near_dup(ray_session):
    import ray.data as rd

    from text_to_graph_ray.functions.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(0)
    base = rng.normal(size=16)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + rng.normal(scale=0.01, size=16)).tolist()},  # near dup
        {"vec_id": 2, "embedding": rng.normal(size=16).tolist()},
    ]
    pairs = embedding_near_dup_pairs(rd.from_items(rows), threshold=0.95).to_pandas()
    assert list(zip(pairs["a"], pairs["b"])) == [(0, 1)]


def test_ann_brute_force_topk(ray_session):
    import ray.data as rd

    from text_to_graph_ray.functions.ann import brute_force_topk

    rng = np.random.RandomState(1)
    vecs = rng.normal(size=(50, 8))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    ds = rd.from_items(rows)
    out = brute_force_topk(ds, [0], vecs[:1], k=5).to_pandas()
    assert len(out) == 5
    assert out.iloc[0]["vec_id"] == 0 and out.iloc[0]["sim"] == 1.0  # self first
    # verify against numpy
    sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ (vecs[0] / np.linalg.norm(vecs[0]))
    want = np.argsort(-np.round(sims, 6), kind="stable")[:5]
    assert list(out["vec_id"]) == list(want)


def test_ann_lsh_recall(ray_session):
    import ray.data as rd

    from text_to_graph_ray.functions.ann import brute_force_topk, lsh_topk

    rng = np.random.RandomState(2)
    vecs = rng.normal(size=(200, 16))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    ds = rd.from_items(rows)
    exact = brute_force_topk(ds, [0, 1], vecs[:2], k=5).to_pandas()
    approx = lsh_topk(ds, [0, 1], vecs[:2], k=5, n_planes=4).to_pandas()
    # self-match must survive bucketing; partial recall acceptable
    assert 0 in set(approx[approx["query_id"] == 0]["vec_id"])
    inter = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    assert inter >= 3


def test_text_stats_and_tokens():
    from text_to_graph_ray.functions.text import text_stats

    b = pa.table({"doc_id": [0, 1], "text": ["Hello, world! Two.", ""]})
    out = text_stats(b).to_pylist()
    assert out[0]["n_tokens"] == 3 and out[0]["n_punct"] == 3
    assert out[1] == {"doc_id": 1, "n_chars": 0, "n_tokens": 0, "n_punct": 0}


def test_lang_id_heuristic():
    from text_to_graph_ray.functions.text import detect_lang

    assert detect_lang("the cat and the dog went to the park") == "en"
    assert detect_lang("der Hund und die Katze sind nicht da") == "de"
    assert detect_lang("le chat est dans la maison pour que") == "fr"
    assert detect_lang("el perro y la casa es una en por") == "es"
    assert detect_lang("这是一个中文句子") == "zh"
    assert detect_lang("") == "und"
    assert detect_lang("zzz qqq xxx") == "und"


def test_fingerprint_deterministic_and_sensitive():
    from text_to_graph_ray.functions.text import fingerprint

    a = fingerprint("some document body with enough text to window over")
    assert a == fingerprint("some document body with enough text to window over")
    assert a != fingerprint("some document body with enough text to window under")
    assert 0 <= a <= 0xFFFFFFFF


def test_quality_score_monotonic_in_substance():
    from text_to_graph_ray.functions.text import quality_score

    b = pa.table({"doc_id": [0, 1], "text": ["the and of to in is that it with for " * 8, "x"]})
    out = quality_score(b).to_pylist()
    assert out[0]["quality"] > out[1]["quality"]


def test_multimodal_decode_stub(ray_session):
    import ray.data as rd

    from text_to_graph_ray.functions.multimodal import DecodeImage, DecodeMedia, decode_stats, media_table_from_documents

    docs = rd.from_items([{"doc_id": i, "text": f"payload {i}"} for i in range(6)])
    media = docs.map_batches(media_table_from_documents, batch_format="pyarrow")
    out = decode_stats(media).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(out) == 6
    assert list(out["kind"]) == ["image", "audio", "video"] * 2  # all three branches decoded
    assert (out.loc[out["kind"] != "audio", "feat_mean"] > 0).all()  # pixel means positive
    assert (out["feat_std"] > 0).all()
    # deterministic across instances
    d1, d2 = DecodeMedia(), DecodeMedia()
    assert (d1._decode_one("image", b"x", 4, 4, 0, 1) == d2._decode_one("image", b"x", 4, 4, 0, 1)).all()
    with pytest.raises(NotImplementedError):
        DecodeMedia(fake=False)._decode_one("image", b"x", 4, 4, 0, 1)
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)._decode(b"x", 4, 4)


def test_frame_sampler():
    from text_to_graph_ray.functions.multimodal import FrameSampler

    b = pa.table({"media_id": [0], "n_frames": [25]})
    out = FrameSampler(stride=10)(b)
    assert out.column("sampled_frames").to_pylist() == [[0, 10, 20]]


def test_relabel_edges(ray_session):
    import ray.data as rd

    from text_to_graph_ray.functions.relabel import relabel_edges

    ds = rd.from_items([{"src_key": "a", "pred": "calls", "dst_key": "b"}, {"src_key": "a", "pred": "defines", "dst_key": "c"}])
    out = relabel_edges(ds, {"calls": "invokes"}).to_pandas()
    assert set(out["pred"]) == {"invokes", "defines"}
    assert relabel_edges(ds, {}) is ds


def test_embedding_near_dup_lsh_finds_close_pair(ray_session):
    import ray.data as rd

    from text_to_graph_ray.functions.dedup import embedding_near_dup_lsh

    rng = np.random.RandomState(3)
    base = rng.normal(size=16)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + rng.normal(scale=0.005, size=16)).tolist()},
        {"vec_id": 2, "embedding": rng.normal(size=16).tolist()},
    ]
    out = embedding_near_dup_lsh(rd.from_items(rows), threshold=0.95, n_planes=2).to_pandas()
    assert (0, 1) in set(zip(out["a"], out["b"]))  # nearly-identical vectors share every bucket
