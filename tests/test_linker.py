"""AliasResolver + NgramScorer unit behavior (no Ray needed — defs_idx passed
directly; the actor path is covered by the pipeline tests)."""

import pyarrow as pa

from text_to_graph_ray.stages.linker import AliasResolver, NgramScorer, build_defs_index


def test_build_defs_index():
    idx = build_defs_index([("f", "src.a.m"), ("f", "src.b.m2"), ("g", "src.a.m")])
    assert idx == {"f": {"src.a.m", "src.b.m2"}, "g": {"src.a.m"}}


def _batch(kind, a, c=""):
    return pa.table(
        {
            "repo": ["r"],
            "path": ["p"],
            "content_sha256": ["h"],
            "chunk_index": [0],
            "ord": [0],
            "kind": [kind],
            "a": [a],
            "b": ["calls"],
            "c": [c],
        }
    )


def test_resolver_rewrites_dotted_alias():
    r = AliasResolver(defs_idx={"helper": {"src.pkg.mod"}})
    out = r(_batch("edge", "g", "pkg.mod.helper"))
    assert out.column("c_key").to_pylist() == ["helper"]
    assert out.column("a_key").to_pylist() == ["g"]


def test_resolver_leaves_unresolvable():
    r = AliasResolver(defs_idx={"helper": {"src.a.m", "src.b.m"}})
    out = r(_batch("edge", "os.path", "m.helper"))
    assert out.column("a_key").to_pylist() == ["os.path"]
    assert out.column("c_key").to_pylist() == ["m.helper"]  # ambiguous: untouched


def test_resolver_memo_cache():
    r = AliasResolver(defs_idx={"f": {"m.x"}})
    r(_batch("edge", "x.f", "x.f"))
    assert r.memo["x.f"] == "f"


def test_ngram_scorer_self_match_and_determinism():
    vocab = ["canonical_name", "other_entity", "third_thing"]
    s1 = NgramScorer(vocab)
    s2 = NgramScorer(vocab)
    b1 = s1.best(["canonical_name", "canonicl_name", "zzzz"])
    b2 = s2.best(["canonical_name", "canonicl_name", "zzzz"])
    assert b1 == b2  # crc32-hashed features: stable across instances/processes
    assert b1[0] == ("canonical_name", 1.0) or abs(b1[0][1] - 1.0) < 1e-5
    assert b1[1][0] == "canonical_name"  # near-miss typo still matches
    assert b1[2][0] is None  # garbage below threshold


def test_ngram_scorer_empty_vocab():
    s = NgramScorer([])
    assert s.best(["x"]) == [(None, 0.0)]
