"""Synthetic corpus determinism + fixture edge cases (FIXTURES.md F1)."""

import hashlib

from text_to_graph_ray.synth import build_corpus, expected_tables


def test_deterministic_same_seed():
    f1, t1 = build_corpus(48, seed=7)
    f2, t2 = build_corpus(48, seed=7)
    assert f1 == f2
    assert t1 == t2


def test_different_seed_differs():
    f1, _ = build_corpus(48, seed=7)
    f2, _ = build_corpus(48, seed=8)
    assert f1 != f2


def test_duplicate_content_pair_same_sha():
    files, _ = build_corpus(48, seed=7)
    by_path = {f["path"]: f for f in files if "dup_" in f["path"]}
    a, b = by_path["src/dup_a.py"], by_path["src/dup_b.py"]
    assert a["content"] == b["content"]
    sha = lambda c: hashlib.sha256(c.encode()).hexdigest()
    assert sha(a["content"]) == sha(b["content"])


def test_edge_case_files_present():
    files, _ = build_corpus(48, seed=7)
    paths = {f["path"] for f in files}
    assert "src/empty.py" in paths
    assert "src/unicode_mod.py" in paths
    empty = next(f for f in files if f["path"] == "src/empty.py")
    assert empty["content"] == ""


def test_giant_repo_skew():
    files, _ = build_corpus(100, seed=7)
    from collections import Counter

    counts = Counter(f["repo"] for f in files)
    giant = counts["org0/giant"]
    others = [v for k, v in counts.items() if k != "org0/giant"]
    assert giant > max(others)  # skew fixture


def test_expected_tables_sorted_and_stable():
    _, tbf = build_corpus(48, seed=7)
    tr1, nd1 = expected_tables(tbf, link=True)
    tr2, nd2 = expected_tables(tbf, link=True)
    assert tr1 == tr2 and nd1 == nd2
    keys = [(r["src_key"], r["pred"], r["dst_key"]) for r in tr1]
    assert keys == sorted(keys)
    ids = [r["entity_id"] for r in nd1]
    assert ids == list(range(len(ids)))


def test_linking_strictly_merges():
    _, tbf = build_corpus(48, seed=7)
    raw_t, raw_n = expected_tables(tbf, link=False)
    lnk_t, lnk_n = expected_tables(tbf, link=True)
    assert len(lnk_n) <= len(raw_n)  # aliases merged
    assert len(lnk_t) <= len(raw_t)
    raw_keys = {r["entity_key"] for r in raw_n}
    lnk_keys = {r["entity_key"] for r in lnk_n}
    # some dotted alias disappeared into its definition
    assert raw_keys - lnk_keys, "expected at least one alias merge in the corpus"
