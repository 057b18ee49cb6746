"""Property tests: engine kernels == naive reference implementations
(expected.py) on arbitrary inputs — not just the fixed test corpora. These
are the pure-python halves of the oracle pairs, so hypothesis can hammer them
cheaply (no Ray involved)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any unicode except surrogates
    max_size=400,
)
word_texts = st.lists(
    st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=1000), min_size=1, max_size=12),
    max_size=60,
).map(" ".join)


@settings(max_examples=150, deadline=None)
@given(word_texts)
def test_minhash_signature_matches_naive(t):
    from text_to_graph_ray.expected import _minhash_params, naive_minhash_sig
    from text_to_graph_ray.functions.dedup import MinHasher

    eng = MinHasher().signature(t)
    a, b = _minhash_params(64, 42)
    ref = naive_minhash_sig(t, a, b)
    assert (np.asarray(eng, dtype=np.uint64) == ref).all()


@settings(max_examples=150, deadline=None)
@given(word_texts)
def test_simhash_matches_naive(t):
    from text_to_graph_ray.expected import naive_simhash64
    from text_to_graph_ray.functions.dedup import simhash64

    assert simhash64(t) == naive_simhash64(t)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_fingerprint_matches_naive(t):
    from text_to_graph_ray.expected import naive_fingerprint
    from text_to_graph_ray.functions.text import fingerprint

    assert fingerprint(t) == naive_fingerprint(t)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_langid_and_quality_match_naive(t):
    from text_to_graph_ray.expected import naive_lang, naive_quality
    from text_to_graph_ray.functions.text import detect_lang, quality_score
    import pyarrow as pa

    assert detect_lang(t) == naive_lang(t)
    b = pa.table({"doc_id": pa.array([0], type=pa.int64()), "text": pa.array([t], type=pa.string())})
    q = quality_score(b)
    got = (
        q.column("mean_tok_len")[0].as_py(),
        q.column("stop_ratio")[0].as_py(),
        q.column("alpha_ratio")[0].as_py(),
        q.column("quality")[0].as_py(),
    )
    assert got == naive_quality(t)


@settings(max_examples=80, deadline=None)
@given(st.lists(word_texts, min_size=2, max_size=12))
def test_pairwise_jaccard_matches_naive(docs):
    from text_to_graph_ray.expected import naive_word_jaccard
    from text_to_graph_ray.functions.dedup import exact_jaccard

    for i in range(len(docs) - 1):
        assert exact_jaccard(docs[i], docs[i + 1]) == naive_word_jaccard(docs[i], docs[i + 1])
