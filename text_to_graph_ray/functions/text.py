"""Text analysis over a documents table: stats/quality, language-ID,
token counting, document fingerprinting. All stateless vectorized-ish
``map_batches`` transforms (regexes/profiles compiled at module import, once
per worker process)."""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.!?,;:]")

# tiny function-word profiles — deterministic n-gram-free language heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "with", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "que"},
    "zh": set(),  # CJK detected by codepoint range, not stopwords
}


def text_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """n_chars / n_tokens / n_punct — the SQL-oracle-checkable quality core."""
    texts = batch.column(text_col).to_pylist()
    n_chars = [len(t or "") for t in texts]
    n_tokens = [len((t or "").split()) for t in texts]
    n_punct = [len(_PUNCT.findall(t or "")) for t in texts]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_punct": pa.array(n_punct, type=pa.int64()),
        }
    )


# BPE-ish pre-tokenization (GPT-2-style word/number/punct split, simplified to
# an RE2-compatible pattern — no lookaheads — so a DuckDB oracle can replicate
# it exactly with regexp_extract_all)
BPE_ISH_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+"
_BPE_ISH = re.compile(BPE_ISH_PATTERN)


def bpe_ish_tokens(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Token counts: whitespace tokens + BPE-ish pre-tokens per document."""
    texts = batch.column(text_col).to_pylist()
    ws = [len((t or "").split()) for t in texts]
    bpe = [len(_BPE_ISH.findall(t or "")) for t in texts]
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_ws_tokens": pa.array(ws, type=pa.int64()),
            "n_bpe_tokens": pa.array(bpe, type=pa.int64()),
        }
    )


def quality_row(t: str, toks: list) -> tuple:
    """(mean_tok_len, stop_ratio, alpha_ratio, quality) for one document —
    THE quality contract (rounded to 6 dp), shared by quality_score and the
    curation gates so text is tokenized once per consumer, never re-derived."""
    stop = _LANG_PROFILES["en"]
    n = len(toks)
    mean_len = (sum(len(x) for x in toks) / n) if n else 0.0
    stop_r = (sum(1 for x in toks if x.lower() in stop) / n) if n else 0.0
    alpha = (sum(1 for c in t if c.isalpha()) / len(t)) if t else 0.0
    q = min(1.0, n / 50.0) * 0.4 + min(mean_len / 8.0, 1.0) * 0.2 + stop_r * 0.2 + alpha * 0.2
    return round(mean_len, 6), round(stop_r, 6), round(alpha, 6), round(q, 6)


def quality_score(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Composite quality heuristics (length / mean token length / stopword
    ratio / alpha ratio) — pipeline-filter material, rows-only checked."""
    sig = text_signals_batch(batch.column(text_col), want=("quality",))
    out = pa.table({id_col: batch.column(id_col)})
    for k in ("mean_tok_len", "stop_ratio", "alpha_ratio", "quality"):
        out = out.append_column(k, pa.array(sig[k], type=pa.float64()))
    return out


def detect_lang(text: str, toks: list | None = None) -> str:
    """n-gram-profile language heuristic. ``toks`` (= text.split(), unlowered)
    may be passed by callers that already tokenized the text — the result is
    identical by construction."""
    t = text or ""
    if any("一" <= c <= "鿿" for c in t[:400]):
        return "zh"
    if toks is None:
        toks = t.split()
    ltoks = [w.lower() for w in toks[:200]]
    if not ltoks:
        return "und"
    best_lang, best = "und", 0
    for lang in ("en", "de", "fr", "es"):
        hits = sum(1 for w in ltoks if w in _LANG_PROFILES[lang])
        if hits > best:
            best_lang, best = lang, hits
    return best_lang if best > 0 else "und"


def text_signals_batch(texts, want=("quality",)) -> dict:
    """Vectorized batch evaluation of the per-row text contracts — the
    hot-path replacement VERDICT r4 asked for ("the dominant per-byte CPU
    cost of pipeline_pretraining/curation_full").

    Bit-identical to ``quality_row`` / ``detect_lang`` by construction:
    ASCII rows take Arrow-kernel fast paths whose primitives were
    differentially verified against the Python semantics (utf8_split_
    whitespace + empty-token filter == str.split() for every ASCII char
    including the \\x1c-\\x1f separators; ascii_lower == str.lower;
    count_substring_regex('[A-Za-z]') == per-char isalpha; all divisions
    and the q polynomial are the same IEEE-double op sequence), and every
    non-ASCII row falls back to the per-row contract kernels themselves.
    A pytest equivalence suite pins batch == per-row on adversarial inputs.

    ``want`` ⊆ {"quality", "lang"}; returns the requested keys of
    {"mean_tok_len", "stop_ratio", "alpha_ratio", "quality" (all rounded
    to 6 dp like quality_row), "lang"} over a pa.Array/ChunkedArray of
    texts. One tokenization is shared by both signal families.
    """
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = pc.fill_null(texts.cast(pa.string()), "")
    n_rows = len(t)
    out: dict = {}
    if n_rows == 0:
        if "quality" in want:
            for k in ("mean_tok_len", "stop_ratio", "alpha_ratio", "quality"):
                out[k] = np.empty(0, dtype=np.float64)
        if "lang" in want:
            out["lang"] = []
        return out

    ascii_mask = pc.string_is_ascii(t).to_numpy(zero_copy_only=False)

    # shared tokenization (the whole point of the fused gate): split once,
    # drop empty tokens (edge-whitespace artifacts), keep row parentage
    s = pc.utf8_split_whitespace(t)
    lens = pc.list_value_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(s)
    parent = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    tok_len_all = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    ne = tok_len_all > 0
    parent_ne = parent[ne]
    flat_ne = flat.filter(pa.array(ne))
    tok_len = tok_len_all[ne]
    n_tok = np.bincount(parent_ne, minlength=n_rows).astype(np.int64)
    low = pc.ascii_lower(flat_ne)  # exact for ASCII rows; non-ASCII rows use fallback

    if "quality" in want:
        sum_len = np.bincount(parent_ne, weights=tok_len.astype(np.float64), minlength=n_rows)
        stop_hit = pc.is_in(low, value_set=pa.array(sorted(_LANG_PROFILES["en"]))).to_numpy(zero_copy_only=False)
        stop_cnt = np.bincount(parent_ne, weights=stop_hit.astype(np.float64), minlength=n_rows)
        alpha_cnt = pc.count_substring_regex(t, "[A-Za-z]").to_numpy(zero_copy_only=False).astype(np.float64)
        text_len = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.float64)
        nf = n_tok.astype(np.float64)
        safe_n, safe_tl = np.maximum(nf, 1.0), np.maximum(text_len, 1.0)
        mean_len = np.where(n_tok > 0, sum_len / safe_n, 0.0)
        stop_r = np.where(n_tok > 0, stop_cnt / safe_n, 0.0)
        alpha = np.where(text_len > 0, alpha_cnt / safe_tl, 0.0)
        # same IEEE op sequence as quality_row's q polynomial
        q = np.minimum(1.0, nf / 50.0) * 0.4 + np.minimum(mean_len / 8.0, 1.0) * 0.2 + stop_r * 0.2 + alpha * 0.2
        out["mean_tok_len"], out["stop_ratio"], out["alpha_ratio"], out["quality"] = mean_len, stop_r, alpha, q

    if "lang" in want:
        # first 200 non-empty tokens per row (parent_ne is row-sorted)
        row_starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        rank = np.arange(len(parent_ne), dtype=np.int64) - row_starts[parent_ne]
        m200 = rank < 200
        p200 = parent_ne[m200]
        low200 = low.filter(pa.array(m200))
        best = np.zeros(n_rows, dtype=np.int64)
        lang_idx = np.full(n_rows, -1, dtype=np.int64)
        order = ("en", "de", "fr", "es")
        for i, lang in enumerate(order):
            hit = pc.is_in(low200, value_set=pa.array(sorted(_LANG_PROFILES[lang]))).to_numpy(zero_copy_only=False)
            h = np.bincount(p200, weights=hit.astype(np.float64), minlength=n_rows).astype(np.int64)
            m = h > best  # strict >, preserving the contract's first-wins tie-break
            lang_idx[m] = i
            best[m] = h[m]
        langs_arr = np.array(["und", *order], dtype=object)
        out["lang"] = langs_arr[np.where(best > 0, lang_idx + 1, 0)].tolist()

    if not ascii_mask.all():
        # non-ASCII rows: the per-row contract kernels ARE the semantics
        texts_py = None
        for i in np.flatnonzero(~ascii_mask):
            if texts_py is None:
                texts_py = t.to_pylist()
            txt = texts_py[i]
            toks = txt.split()
            if "quality" in want:
                ml, sr, al, q4 = quality_row(txt, toks)
                # quality_row returns rounded values; unrounded slots are
                # re-derived below only for ASCII rows, so store rounded here
                out["mean_tok_len"][i], out["stop_ratio"][i] = ml, sr
                out["alpha_ratio"][i], out["quality"][i] = al, q4
            if "lang" in want:
                out["lang"][i] = detect_lang(txt, toks)

    if "quality" in want:
        # Python round(x, 6) is the contract (correctly-rounded decimal);
        # np.round is not guaranteed identical on ties — cheap scalar pass
        rounded_rows = set(np.flatnonzero(~ascii_mask).tolist())
        for k in ("mean_tok_len", "stop_ratio", "alpha_ratio", "quality"):
            v = out[k]
            out[k] = np.asarray(
                [x if i in rounded_rows else round(x, 6) for i, x in enumerate(v.tolist())],
                dtype=np.float64,
            )
    return out


def bigram_rep_batch(texts) -> tuple:
    """Vectorized ``bigram_repetition`` over a batch: returns (valid mask,
    n_bigrams, dup_frac, top_frac) numpy arrays; rows with < 2 tokens are
    invalid. split(' ') via pc.split_pattern is byte-exact to Python's
    str.split(' ') for ANY text (no ASCII guard needed); pair identity goes
    through an exact dictionary-encode (no hashing), and the two divisions
    are the same single IEEE ops as the per-row contract."""
    import pandas as pd
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = pc.fill_null(texts.cast(pa.string()), "")
    n_rows = len(t)
    if n_rows == 0:
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=bool), z, z.astype(np.float64), z.astype(np.float64)
    s = pc.split_pattern(t, " ")
    lens = pc.list_value_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
    valid = lens >= 2
    n_big = np.zeros(n_rows, dtype=np.int64)
    dup = np.zeros(n_rows, dtype=np.float64)
    top = np.zeros(n_rows, dtype=np.float64)
    if not valid.any():
        return valid, n_big, dup, top
    flat = pc.list_flatten(s)
    parent = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    rank = np.arange(len(parent), dtype=np.int64) - row_starts[parent]
    first_idx = np.flatnonzero(rank < lens[parent] - 1)
    denc = pc.dictionary_encode(flat)
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_dict = len(denc.dictionary)
    pair_key = codes[first_idx] * np.int64(max(n_dict, 1)) + codes[first_idx + 1]
    g = pd.DataFrame({"row": parent[first_idx], "k": pair_key}).groupby(
        ["row", "k"], sort=False
    ).size()
    gg = g.groupby(level=0)
    total, distinct, mx = gg.sum(), gg.size(), gg.max()
    rows_idx = total.index.to_numpy()
    tot = total.to_numpy(dtype=np.int64)
    n_big[rows_idx] = tot
    dup[rows_idx] = 1 - distinct.to_numpy(dtype=np.int64) / tot
    top[rows_idx] = mx.to_numpy(dtype=np.int64) / tot
    return valid, n_big, dup, top


LEXICAL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("n_types", pa.int64()),
        ("ttr", pa.float64()),
        ("token_entropy", pa.float64()),
    ]
)


def lexical_row(text: str) -> tuple:
    """(n_tokens, n_types, ttr, token_entropy) for one document — THE
    lexical-diversity contract. ttr = distinct/total tokens (type-token
    ratio); entropy is Shannon over the token frequency distribution,
    computed as log2(n) - (Σ round(c·log2(c)·1e9)) / 1e9 / n: quantizing
    each term to an int64 BEFORE summing makes the sum order-independent
    and bit-reproducible across the vectorized batch kernel, this per-row
    fallback, and the naive oracle (np.log2 scalar == np.log2 array,
    verified; math.log2 differs by 1 ulp on ~0.8% of integers, so np.log2
    IS the contract). Both floats round(·, 6)."""
    from collections import Counter

    toks = (text or "").split()
    n = len(toks)
    if n == 0:
        return 0, 0, 0.0, 0.0
    c = Counter(toks)
    cnts = np.asarray(list(c.values()), dtype=np.float64)
    s = int(np.rint(cnts * np.log2(cnts) * 1e9).astype(np.int64).sum())
    nf = np.float64(n)
    h = float(np.log2(nf) - (np.float64(s) / 1e9) / nf)
    return n, len(c), round(len(c) / n, 6), round(h, 6)


def lexical_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Vectorized ``lexical_row`` over a batch: token counts via the Arrow
    whitespace split (ASCII rows — differentially verified against
    str.split), per-(row, type) counts via exact dictionary codes + one
    pandas int groupby (no hashing in the identity), entropy terms
    quantized per the contract. Non-ASCII rows fall back to lexical_row."""
    import pandas as pd
    import pyarrow.compute as pc

    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = pc.fill_null(texts.cast(pa.string()), "")
    n_rows = len(t)
    ids = batch.column(id_col).cast(pa.int64())
    if n_rows == 0:
        return LEXICAL_SCHEMA.empty_table()
    ascii_mask = pc.string_is_ascii(t).to_numpy(zero_copy_only=False)

    s = pc.utf8_split_whitespace(t)
    lens = pc.list_value_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(s)
    parent = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    tok_len_all = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    ne = tok_len_all > 0
    parent_ne = parent[ne]
    flat_ne = flat.filter(pa.array(ne))
    n_tok = np.bincount(parent_ne, minlength=n_rows).astype(np.int64)

    n_types = np.zeros(n_rows, dtype=np.int64)
    sum_q = np.zeros(n_rows, dtype=np.int64)
    if len(parent_ne):
        codes = pc.dictionary_encode(flat_ne).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame({"row": parent_ne, "k": codes}).groupby(["row", "k"], sort=False).size()
        rows = g.index.get_level_values(0).to_numpy()
        cnt = g.to_numpy().astype(np.float64)
        term_q = np.rint(cnt * np.log2(cnt) * 1e9).astype(np.int64)
        np.add.at(n_types, rows, 1)
        np.add.at(sum_q, rows, term_q)

    nf = n_tok.astype(np.float64)
    safe = np.maximum(nf, 1.0)
    ttr = np.where(n_tok > 0, n_types.astype(np.float64) / safe, 0.0)
    with np.errstate(divide="ignore"):
        h = np.where(n_tok > 0, np.log2(safe) - (sum_q.astype(np.float64) / 1e9) / safe, 0.0)

    fb = set(np.flatnonzero(~ascii_mask).tolist())
    if fb:
        texts_py = t.to_pylist()
        for i in fb:
            n_tok[i], n_types[i], ttr[i], h[i] = lexical_row(texts_py[i])
    ttr = np.asarray([x if i in fb else round(x, 6) for i, x in enumerate(ttr.tolist())], dtype=np.float64)
    h = np.asarray([x if i in fb else round(x, 6) for i, x in enumerate(h.tolist())], dtype=np.float64)
    return pa.table({
        "doc_id": ids,
        "n_tokens": pa.array(n_tok, type=pa.int64()),
        "n_types": pa.array(n_types, type=pa.int64()),
        "ttr": pa.array(ttr, type=pa.float64()),
        "token_entropy": pa.array(h, type=pa.float64()),
    }, schema=LEXICAL_SCHEMA)


def lang_id(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    preds = text_signals_batch(batch.column(text_col), want=("lang",))["lang"]
    return pa.table({id_col: batch.column(id_col), "lang_pred": pa.array(preds, type=pa.string())})


def fingerprint(text: str, k: int = 5, window: int = 4) -> int:
    """Winnowing-style rolling fingerprint: min crc32 of char k-grams per
    window, xor-folded — a deterministic 32-bit document sketch."""
    t = text or ""
    if len(t) < k:
        return zlib.crc32(t.encode("utf-8"))
    grams = np.fromiter((zlib.crc32(t[i : i + k].encode("utf-8")) for i in range(len(t) - k + 1)), dtype=np.int64)
    if len(grams) < window:
        return int(grams.min())
    mins = np.lib.stride_tricks.sliding_window_view(grams, window).min(axis=1)
    out = 0
    for m in np.unique(mins):
        out ^= int(m)
    return out & 0xFFFFFFFF


def add_fingerprint(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    fps = [fingerprint(t) for t in batch.column(text_col).to_pylist()]
    return pa.table({id_col: batch.column(id_col), "fingerprint": pa.array(fps, type=pa.int64())})


def token_count_partial(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch token-frequency partial (Counter) — the combiner half of the
    corpus-vocabulary wordcount. One row per distinct token PER BATCH enters
    the exchange, so a 100 TB corpus ships its vocabulary, not its tokens."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column(text_col).to_pylist():
        c.update((t or "").split())
    items = sorted(c.items())
    return pa.table(
        {
            "token": pa.array([k for k, _ in items], type=pa.string()),
            "n": pa.array([v for _, v in items], type=pa.int64()),
        }
    )


def vocab_topk(ds, k: int = 50, text_col: str = "text"):
    """Corpus vocabulary top-k: flat-map to tokens with per-batch Counter
    partials, one groupby-sum over the (vocabulary-sized) partials, then
    sort desc + limit. Ties break on the token string so the DuckDB oracle
    ranks identically."""
    from ray.data.aggregate import Sum

    parts = ds.map_batches(lambda b: token_count_partial(b, text_col), batch_format="pyarrow")
    agg = parts.groupby("token").aggregate(Sum("n", alias_name="n"))
    return agg.sort(["n", "token"], descending=[True, False]).limit(k)


def doc_token_partial(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, token, tf) rows — one row per DISTINCT token per document.
    Documents are row-atomic, so per-doc term frequencies are exact without
    any exchange; this is the shared front end of tf-idf and the inverted
    index."""
    from collections import Counter

    ids_out, toks_out, tfs_out = [], [], []
    for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
        c = Counter((t or "").split())
        for tok in sorted(c):
            ids_out.append(i)
            toks_out.append(tok)
            tfs_out.append(c[tok])
    return pa.table(
        {
            id_col: pa.array(ids_out, type=pa.int64()),
            "token": pa.array(toks_out, type=pa.string()),
            "tf": pa.array(tfs_out, type=pa.int64()),
        }
    )


_POSTINGS_SCHEMA = pa.schema([("token", pa.string()), ("df", pa.int64()), ("postings", pa.string())])


def inverted_index(ds, min_df: int = 5, text_col: str = "text", id_col: str = "doc_id"):
    """token -> (document frequency, comma-joined sorted doc-id posting list).

    Scale shape: the exchange carries (token, doc_id) pairs — the postings
    themselves, irreducible for an exact index — hash-bucketed coarse so the
    per-bucket build is one vectorized sort + boundary scan (no per-token Ray
    dispatch). ``min_df`` prunes the hapax tail AFTER counting (exact df).
    A production index would shard hot tokens' postings by range; here a hot
    token is one bucket task, the same bound as any keyed groupby."""
    from text_to_graph_ray.functions.agg import BUCKET_COL, with_bucket

    pairs_schema = pa.schema([("token", pa.string()), ("doc_id", pa.int64())])

    def pairs(b: pa.Table) -> pa.Table:
        t = doc_token_partial(b, text_col, id_col)
        return pa.table({"token": t.column("token"), "doc_id": t.column(id_col)})

    def per_bucket(df) -> pa.Table:
        if len(df) == 0:
            return _POSTINGS_SCHEMA.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["token", "doc_id"], kind="mergesort")
        toks = df["token"].to_numpy()
        ids = df["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, toks[1:] != toks[:-1]])
        ends = np.r_[starts[1:], len(toks)]
        keep = (ends - starts) >= min_df
        id_strs = ids.astype("U")
        out_t = [toks[s] for s, k in zip(starts, keep) if k]
        out_df = (ends - starts)[keep]
        out_p = [",".join(id_strs[s:e]) for s, e, k in zip(starts, ends, keep) if k]
        return pa.table(
            {
                "token": pa.array(out_t, type=pa.string()),
                "df": pa.array(out_df, type=pa.int64()),
                "postings": pa.array(out_p, type=pa.string()),
            }
        )

    from text_to_graph_ray.functions.agg import bucket_exchange
    from text_to_graph_ray.util import sort_coalesced

    rows = ds.map_batches(pairs, batch_format="pyarrow")
    out = bucket_exchange(with_bucket(rows, "token", 64, in_schema=pairs_schema), per_bucket, _POSTINGS_SCHEMA, 64)
    return sort_coalesced(out, "token")


def tfidf_topk(ds, k: int = 3, text_col: str = "text", id_col: str = "doc_id", df_broadcast_max: int = 5_000_000):
    """Top-k tf-idf terms per document: score = tf * (ln((N+1)/(df+1)) + 1),
    ranked (score desc, token asc), score rounded to 6 dp BEFORE ranking so
    the DuckDB oracle orders identically.

    Scale shape: tf rows need no exchange (documents are row-atomic); df is
    ONE vocabulary-sized groupby-sum of per-batch distinct-token partials;
    the df table joins back by guarded broadcast (vocabulary-sized — ships
    once per worker via ray.put) with a distributed hash-join fallback above
    ``df_broadcast_max``; the final top-k uses the combiner-first
    ``topk_per_group`` (per-batch prune caps the exchange at k rows per doc
    per batch)."""
    import ray

    from text_to_graph_ray.functions.agg import bucketed_aggregate, topk_per_group

    n_docs = ds.count()
    tf_rows = ds.map_batches(lambda b: doc_token_partial(b, text_col, id_col), batch_format="pyarrow").materialize()

    df_parts_schema = pa.schema([("token", pa.string()), ("n", pa.int64())])
    df_schema = pa.schema([("token", pa.string()), ("df", pa.int64())])
    df_parts = tf_rows.map_batches(
        lambda b: pa.table(
            {"token": b.column("token"), "n": pa.array(np.ones(b.num_rows, dtype="int64"), type=pa.int64())}
        ),
        batch_format="pyarrow",
    )
    # vocabulary-cardinality key: coarse-bucketed vectorized aggregation, not
    # Ray's per-group combine (~200 us/group at 100k+ groups)
    df_tab = bucketed_aggregate(
        df_parts, "token", {"df": ("n", "sum")}, out_schema=df_schema, in_schema=df_parts_schema
    ).materialize()

    scored_schema = pa.schema(
        [(id_col, pa.int64()), ("token", pa.string()), ("tf", pa.int64()), ("score", pa.float64())]
    )

    def score_cols(tf_arr, df_arr):
        idf = np.log((n_docs + 1.0) / (df_arr + 1.0)) + 1.0
        return np.round(tf_arr * idf, 6)

    n_vocab = df_tab.count()
    if n_vocab <= df_broadcast_max:
        # broadcast once (ray.put), map vectorized per batch (pandas Series
        # .map — a C-level hash lookup, not a per-token Python loop)
        df_ser = df_tab.to_pandas().set_index("token")["df"].astype("float64")
        df_ser_ref = ray.put(df_ser)

        def attach(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return scored_schema.empty_table()
            import pandas as pd

            ser = ray.get(df_ser_ref)
            df_arr = pd.Index(b.column("token").to_pandas()).map(ser).to_numpy(dtype="float64")
            sc = score_cols(b.column("tf").to_numpy().astype("float64"), df_arr)
            return pa.table(
                {
                    id_col: b.column(id_col),
                    "token": b.column("token"),
                    "tf": b.column("tf"),
                    "score": pa.array(sc, type=pa.float64()),
                }
            )

        scored = tf_rows.map_batches(attach, batch_format="pyarrow")
    else:
        from text_to_graph_ray.functions.dedup import join_partitions_for

        joined = tf_rows.join(
            df_tab, join_type="inner", num_partitions=join_partitions_for(), on=("token",), partition_size_hint=32 << 20
        )

        def attach_joined(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return scored_schema.empty_table()
            sc = score_cols(b.column("tf").to_numpy().astype("float64"), b.column("df").to_numpy().astype("float64"))
            return pa.table(
                {
                    id_col: b.column(id_col),
                    "token": b.column("token"),
                    "tf": b.column("tf"),
                    "score": pa.array(sc, type=pa.float64()),
                }
            )

        scored = joined.map_batches(attach_joined, batch_format="pyarrow")

    from text_to_graph_ray.util import sort_coalesced

    top = topk_per_group(
        scored, id_col, "score", k=k, descending=True, tiebreak="token", out_schema=scored_schema, in_schema=scored_schema
    )
    return sort_coalesced(top, [id_col, "score", "token"], descending=[False, True, False])


REPETITION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bigrams", pa.int64()),
        ("dup_frac", pa.float64()),
        ("top_frac", pa.float64()),
    ]
)


def bigram_repetition(text: str) -> tuple:
    """(n_bigrams, dup_frac, top_frac) for one doc — THE bigram-repetition
    contract, shared by repetition_stats and the curation gate so the two
    cannot drift. (None, None, None) when the doc has < 2 tokens."""
    from collections import Counter

    toks = (text or "").split(" ")
    if len(toks) < 2:
        return None, None, None
    c = Counter(zip(toks, toks[1:]))
    total = sum(c.values())
    return total, 1 - len(c) / total, max(c.values()) / total


def repetition_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition quality signals per document: the duplicated
    2-gram fraction (1 - distinct/total) and the most-frequent-2-gram share
    (max count / total). Map-only (documents are row-atomic); each output
    float is ONE IEEE division (+ one subtraction) of exact ints, so values
    are bit-identical to the SQL oracle with no rounding. Docs with < 2
    tokens emit no row (they have no 2-grams), matching the SQL n-gram
    expansion."""
    if batch.num_rows == 0:
        return REPETITION_SCHEMA.empty_table()
    valid, n_big, dup, top = bigram_rep_batch(batch.column(text_col))
    ids = batch.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(ids[valid], type=pa.int64()),
        "n_bigrams": pa.array(n_big[valid], type=pa.int64()),
        "dup_frac": pa.array(dup[valid], type=pa.float64()),
        "top_frac": pa.array(top[valid], type=pa.float64()),
    }, schema=REPETITION_SCHEMA)


PII_PATTERNS = (
    # order matters and is part of the contract: counts are taken on the
    # progressively-redacted text (a replacement token can never retrigger
    # an earlier pattern)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Vectorized PII redaction (emails / IPv4 literals / NANP-style phone
    numbers) — a standard pretraining-corpus scrub, map-only. RE2 kernels
    (pyarrow ``replace_substring_regex`` / ``count_substring_regex``) — the
    same regex engine DuckDB uses, so the oracle is ``regexp_replace(...,
    'g')`` with the identical patterns. Returns (doc_id, text_redacted,
    n_redactions)."""
    import pyarrow.compute as pc

    txt = batch.column(text_col)
    total = None
    for pat, tok in PII_PATTERNS:
        c = pc.count_substring_regex(txt, pattern=pat)
        total = c if total is None else pc.add(total, c)
        txt = pc.replace_substring_regex(txt, pattern=pat, replacement=tok)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "text_redacted": txt,
            "n_redactions": pc.cast(total, pa.int64()),
        }
    )


def sliding_chunks(batch: pa.Table, size: int = 256, overlap: int = 64,
                   text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Sliding-window text chunking for embedding pipelines (the documents-
    table counterpart of the code-aware chunker in stages/chunker.py): fixed
    ``size``-char windows advancing by ``size - overlap``, last window
    clipped at the end of the doc — the standard RAG/embedding pre-pass.
    Pure per-batch fan-out (flat_map shape, no exchange); one output row per
    (doc, chunk) with the chunk's offset, length and exact window count
    n_chunks = 1 + ceil(max(0, len - size) / step).

    SQL-mirrored boundary rule: a doc shorter than (or equal to) one window
    emits exactly ONE chunk, even when empty."""
    out_schema = pa.schema(
        [(id_col, pa.int64()), ("chunk_idx", pa.int64()), ("off", pa.int64()),
         ("chunk_len", pa.int64()), ("n_chunks", pa.int64())]
    )
    if batch.num_rows == 0:
        return out_schema.empty_table()
    step = size - overlap
    ids_out, idx_out, off_out, len_out, n_out = [], [], [], [], []
    for i, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
        n = len(t or "")
        n_chunks = 1 + max(0, -(-(n - size) // step)) if n > size else 1
        for c in range(n_chunks):
            off = c * step
            ids_out.append(i)
            idx_out.append(c)
            off_out.append(off)
            len_out.append(min(size, n - off))
            n_out.append(n_chunks)
    return pa.table(
        {id_col: pa.array(ids_out, type=pa.int64()), "chunk_idx": pa.array(idx_out, type=pa.int64()),
         "off": pa.array(off_out, type=pa.int64()), "chunk_len": pa.array(len_out, type=pa.int64()),
         "n_chunks": pa.array(n_out, type=pa.int64())},
        schema=out_schema,
    )


_WS_RE = None


def normalize_text(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Curation-grade text normalization: lowercase + collapse every
    whitespace run to one space + strip ends. Emits the normalized length
    and the normalized text's sha-256 (hex) so the full transform is
    hash-checked without shipping normalized bodies through the gate.
    Explicit ASCII whitespace class (NOT ``\\s``: Python's ``\\s`` also
    matches unicode spaces, RE2's does not) so both engines run the
    byte-identical pattern — the redact_pii cross-engine regex discipline."""
    import hashlib
    import re

    global _WS_RE
    if _WS_RE is None:
        _WS_RE = re.compile(r"[ \t\n\r\f\v]+")
    out_schema = pa.schema([(id_col, pa.int64()), ("norm_len", pa.int64()), ("norm_sha", pa.string())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    ids = batch.column(id_col).to_pylist()
    lens, shas = [], []
    for t in batch.column(text_col).to_pylist():
        norm = _WS_RE.sub(" ", (t or "").lower()).strip(" ")  # plain-space strip == SQL trim()
        lens.append(len(norm))
        shas.append(hashlib.sha256(norm.encode("utf-8")).hexdigest())
    return pa.table(
        {id_col: pa.array(ids, type=pa.int64()), "norm_len": pa.array(lens, type=pa.int64()),
         "norm_sha": pa.array(shas, type=pa.string())},
        schema=out_schema,
    )


def segment_dedup(ds, seg_tokens: int = 16, text_col: str = "text", id_col: str = "doc_id",
                  num_buckets: int = 64, removed_broadcast_max: int = 25_000_000):
    """Corpus-level EXACT segment dedup — the MassiveText/Gopher "remove
    exact duplicate lines across the corpus" curation op, reshaped for
    single-line corpora: each document is cut into consecutive
    ``seg_tokens``-token segments (token = ``' '``-split — the engine's
    established ``string_split`` contract, see decontam._doc_grams), a
    segment whose exact text appears anywhere EARLIER in the corpus
    (ordered by ``(doc_id, seg_idx)``) is removed, and the survivors
    re-join in order.

    Plan — the exchange carries FIXED-WIDTH IDS, never segment text, and
    everything downstream of it is sized by the DUPLICATES, not the corpus
    (the round-5 part-7 inversion: the previous plan materialized,
    driver-lexsorted and broadcast the SURVIVOR set, which for a
    low-duplication corpus is ~every segment — a 640 MB broadcast plus
    ~23 s of serial driver time at 40M segments that capped 8→32 cpu
    scaling at ~0.37; the removed set for the same corpus is 32k rows):

    1. explode: one scan emits (sha256-as-4xint64, doc_id, seg_idx) per
       segment — full 256-bit identity in 32 fixed bytes (the exact_dedup
       raw-digest discipline) AND a native-int key for the vectorized
       bucketing kernels. The segment text is hashed and DROPPED. Rows
       that lose to an earlier (doc_id, seg_idx) within their OWN batch
       are flagged losers on the spot (they ride the same exchange —
       already 48-byte rows — but skip the reduce's winner scan).
    2. ONE digest-bucketed exchange; per bucket the reducer keeps the
       globally-first (doc_id, seg_idx) per digest and emits every OTHER
       row — the REMOVED set. Output is O(duplicate segments).
    3. reassembly re-reads the corpus: while the removed set fits
       ``removed_broadcast_max`` rows it is (doc,idx)-sorted (driver cost
       O(dups), not O(corpus)) and ``ray.put`` once; a second corpus scan
       passes every UNTOUCHED doc through zero-copy (text unchanged,
       n_segs via one vectorized count_substring — no split) and rebuilds
       only the docs that actually lost a segment. Past the guard it
       falls back to ONE side-tagged doc_id-bucketed exchange (doc text
       crosses once as uniform segment rows, removed ids ride alongside,
       per-bucket anti-merge) — both plans value-identical
       (removed_broadcast_max=-1 equivalence test; the removed set can be
       legitimately empty, so the test guard is negative).

    Output: (doc_id, text_dedup, n_kept, n_segs) sorted by doc_id. A doc
    whose EVERY segment was seen earlier drops out (mirrors SQL GROUP BY
    over surviving segments; callers holding the id universe left-join).
    ``doc_id`` must be unique (document-table contract).
    """
    import hashlib

    import pandas as pd
    import ray

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    hcols = ["__h1", "__h2", "__h3", "__h4"]
    seg_schema = pa.schema(
        [(c, pa.int64()) for c in hcols]
        + [(id_col, pa.int64()), ("seg_idx", pa.int64()), ("__loser", pa.int8())]
    )
    rem_schema = pa.schema([(id_col, pa.int64()), ("seg_idx", pa.int64())])

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return seg_schema.empty_table()
        ids = b.column(id_col).to_pylist()
        o_id, o_idx, digs = [], [], []
        for did, t in zip(ids, b.column(text_col).to_pylist()):
            toks = (t or "").split(" ")
            n = (len(toks) + seg_tokens - 1) // seg_tokens
            for i in range(n):
                seg = " ".join(toks[i * seg_tokens : (i + 1) * seg_tokens])
                o_id.append(did)
                o_idx.append(i)
                digs.append(hashlib.sha256(seg.encode("utf-8")).digest())
        h = np.frombuffer(b"".join(digs), dtype="<i8").reshape(-1, 4) if digs else np.empty((0, 4), dtype="<i8")
        # batch-local loser detection in explicit (doc_id, seg_idx) order —
        # block row order is NOT assumed ascending; the batch-min per digest
        # is the one forwarded candidate, so the global winner is never
        # flagged here
        a_id, a_idx = np.asarray(o_id, dtype=np.int64), np.asarray(o_idx, dtype=np.int64)
        order = np.lexsort((a_idx, a_id))
        dfo = pd.DataFrame({"h1": h[order, 0], "h2": h[order, 1], "h3": h[order, 2], "h4": h[order, 3]})
        ls = dfo.duplicated(["h1", "h2", "h3", "h4"], keep="first").to_numpy()
        loser = np.empty(len(order), dtype=bool)
        loser[order] = ls
        cols = {c: pa.array(h[:, j], type=pa.int64()) for j, c in enumerate(hcols)}
        cols[id_col] = pa.array(o_id, type=pa.int64())
        cols["seg_idx"] = pa.array(o_idx, type=pa.int64())
        cols["__loser"] = pa.array(loser.astype("int8"))
        return pa.table(cols, schema=seg_schema)

    def losers_per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return rem_schema.empty_table()
        if BUCKET_COL in df.columns:
            df = df.drop(columns=[BUCKET_COL])
        df = df.reset_index(drop=True)  # concat'd group frames can repeat labels
        cand = df[df["__loser"] == 0]
        win = (
            cand.sort_values([id_col, "seg_idx"], kind="mergesort")
            .drop_duplicates(hcols, keep="first")
        )
        lost = df.drop(win.index)
        return pa.table(
            {
                id_col: pa.array(lost[id_col], type=pa.int64()),
                "seg_idx": pa.array(lost["seg_idx"], type=pa.int64()),
            },
            schema=rem_schema,
        )

    segs = ds.map_batches(explode, batch_format="pyarrow")
    removed = bucket_exchange(
        with_bucket(segs, hcols, num_buckets, in_schema=seg_schema),
        losers_per_bucket, rem_schema, num_buckets,
    ).materialize()

    out_schema = pa.schema(
        [(id_col, pa.int64()), ("text_dedup", pa.string()), ("n_kept", pa.int64()), ("n_segs", pa.int64())]
    )

    def rebuild(did: int, t: str, gone) -> tuple | None:
        # gone: ascending array of removed seg_idx values for this doc
        toks = (t or "").split(" ")
        n = (len(toks) + seg_tokens - 1) // seg_tokens
        gone_set = set(int(x) for x in gone)
        keep = [i for i in range(n) if i not in gone_set]
        if not keep:
            return None
        parts = [" ".join(toks[i * seg_tokens : (i + 1) * seg_tokens]) for i in keep]
        return did, " ".join(parts), len(keep), n

    def rows_table(rows: list) -> pa.Table:
        if not rows:
            return out_schema.empty_table()
        return pa.table({
            id_col: pa.array([r[0] for r in rows], type=pa.int64()),
            "text_dedup": pa.array([r[1] for r in rows], type=pa.string()),
            "n_kept": pa.array([r[2] for r in rows], type=pa.int64()),
            "n_segs": pa.array([r[3] for r in rows], type=pa.int64()),
        }, schema=out_schema)

    n_removed = removed.count()
    if 0 <= n_removed <= removed_broadcast_max:
        if n_removed == 0:
            ref = None
        else:
            blocks = [t for t in ray.get(removed.to_arrow_refs()) if t.num_rows]
            tb = pa.concat_tables(blocks).combine_chunks()
            d = tb.column(id_col).to_numpy()
            i = tb.column("seg_idx").to_numpy()
            o = np.lexsort((i, d))  # O(dups), not O(corpus)
            ref = ray.put((np.ascontiguousarray(d[o]), np.ascontiguousarray(i[o])))

        def reassemble(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return out_schema.empty_table()
            txt = pc.fill_null(b.column(text_col), "")
            # vectorized n_segs: tokens = count_substring(' ')+1 (split(' ')
            # contract: "" -> [''] -> 1 token), segs = ceil(tokens/seg_tokens)
            ntok = pc.add(pc.count_substring(txt, " "), 1)
            nseg = pc.cast(
                pc.divide(pc.add(pc.cast(ntok, pa.int64()), seg_tokens - 1), seg_tokens), pa.int64()
            )
            ids = b.column(id_col).to_numpy()
            if ref is None:
                lo = hi = np.zeros(len(ids), dtype=np.int64)
                touched = np.zeros(len(ids), dtype=bool)
            else:
                docs_r, idxs_r = ray.get(ref)  # zero-copy int64 views into plasma
                lo = np.searchsorted(docs_r, ids, side="left")
                hi = np.searchsorted(docs_r, ids, side="right")
                touched = hi > lo
            clean = pa.table({
                id_col: b.column(id_col).filter(pa.array(~touched)),
                "text_dedup": txt.filter(pa.array(~touched)),
                "n_kept": nseg.filter(pa.array(~touched)),
                "n_segs": nseg.filter(pa.array(~touched)),
            }, schema=out_schema)
            if not touched.any():
                return clean
            texts = txt.take(pa.array(np.where(touched)[0])).to_pylist()
            rows = []
            for k, r in enumerate(np.where(touched)[0]):
                got = rebuild(int(ids[r]), texts[k], idxs_r[lo[r]:hi[r]])
                if got is not None:
                    rows.append(got)
            return pa.concat_tables([clean, rows_table(rows)])

        out = ds.map_batches(reassemble, batch_format="pyarrow")
        return sort_coalesced(out, id_col)

    # distributed fallback: ONE side-tagged doc_id-bucketed exchange over
    # SEGMENT-sized rows — a second scan re-explodes each doc into
    # (doc_id, seg_idx, seg, n_segs) rows (side 0) and the removed ids ride
    # alongside (side 1); per bucket an anti-merge drops the removed
    # segments and the groupby concat reassembles. Segment rows are uniform
    # ~100-byte rows, so the exchange's row-balanced repartition is also
    # byte-balanced — shipping whole docs here byte-skews the repartition
    # (2.3 KB doc rows cluster block-contiguous) and a block can blow
    # Arrow's 2 GB string-offset ceiling.
    comb = pa.schema([(id_col, pa.int64()), ("seg_idx", pa.int64()),
                      ("seg", pa.string()), ("n_segs", pa.int64()), ("__side", pa.int8())])

    def explode_txt(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return comb.empty_table()
        ids = b.column(id_col).to_pylist()
        o_id, o_idx, o_seg, o_n = [], [], [], []
        for did, t in zip(ids, b.column(text_col).to_pylist()):
            toks = (t or "").split(" ")
            n = (len(toks) + seg_tokens - 1) // seg_tokens
            for i in range(n):
                o_id.append(did)
                o_idx.append(i)
                o_seg.append(" ".join(toks[i * seg_tokens : (i + 1) * seg_tokens]))
                o_n.append(n)
        return pa.table({
            id_col: pa.array(o_id, type=pa.int64()),
            "seg_idx": pa.array(o_idx, type=pa.int64()),
            "seg": pa.array(o_seg, type=pa.string()),
            "n_segs": pa.array(o_n, type=pa.int64()),
            "__side": pa.array(np.zeros(len(o_id), dtype="int8")),
        }, schema=comb)

    def removed_side(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return comb.empty_table()
        n = b.num_rows
        return pa.table({
            id_col: b.column(id_col),
            "seg_idx": b.column("seg_idx"),
            "seg": pa.nulls(n, type=pa.string()),
            "n_segs": pa.nulls(n, type=pa.int64()),
            "__side": pa.array(np.ones(n, dtype="int8")),
        }, schema=comb)

    unioned = ds.map_batches(explode_txt, batch_format="pyarrow").union(
        removed.map_batches(removed_side, batch_format="pyarrow")
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL])
        segs_b = df[df.__side == 0]
        gone = df.loc[df.__side == 1, [id_col, "seg_idx"]]
        m = segs_b.merge(gone, on=[id_col, "seg_idx"], how="left", indicator=True)
        m = m[m["_merge"] == "left_only"]
        if len(m) == 0:
            return out_schema.empty_table()
        m = m.sort_values([id_col, "seg_idx"], kind="mergesort")
        g = m.groupby(id_col, sort=False).agg(
            text_dedup=("seg", " ".join), n_kept=("seg", "size"), n_segs=("n_segs", "first")
        ).reset_index()
        return pa.table({f.name: pa.array(g[f.name], type=f.type) for f in out_schema}, schema=out_schema)

    out = bucket_exchange(
        with_bucket(unioned, [id_col], num_buckets, in_schema=comb), per_bucket, out_schema, num_buckets
    )
    return sort_coalesced(out, id_col)


def grouped_vocab_topk(ds, group_col: str = "lang", k: int = 5,
                       text_col: str = "text", num_buckets: int = 64):
    """Top-k vocabulary PER GROUP (the per-language/per-domain token profile
    behind corpus balancing and lang-ID calibration): per-batch (group,
    token) Counter partials — one row per distinct (group, token) per batch
    enters the exchange, so the corpus ships its per-group vocabulary, not
    its tokens — then one bucketed sum and a combiner-pruned
    ``topk_per_group`` (n desc, token asc tiebreak, mirroring the DuckDB
    window order). Returns (group, token, n) sorted by (group, n desc,
    token)."""
    from collections import Counter

    import pandas as pd

    from text_to_graph_ray.functions.agg import bucketed_aggregate, topk_per_group
    from text_to_graph_ray.util import sort_coalesced

    s = ds.schema()
    gtype = dict(zip(s.names, s.types))[group_col]
    pair_schema = pa.schema([(group_col, gtype), ("token", pa.string()), ("n", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pair_schema.empty_table()
        c: Counter = Counter()
        for g, t in zip(b.column(group_col).to_pylist(), b.column(text_col).to_pylist()):
            for tok in (t or "").split():
                c[(g, tok)] += 1
        items = sorted(c.items())
        return pa.table({
            group_col: pa.array([g for (g, _), _ in items], type=gtype),
            "token": pa.array([tok for (_, tok), _ in items], type=pa.string()),
            "n": pa.array([v for _, v in items], type=pa.int64()),
        }, schema=pair_schema)

    counts = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), [group_col, "token"],
        {"n": ("n", "sum")}, out_schema=pair_schema, num_buckets=num_buckets, in_schema=pair_schema,
    )
    top = topk_per_group(counts, [group_col], "n", k=k, descending=True, tiebreak="token",
                         out_schema=pair_schema, in_schema=pair_schema)
    return sort_coalesced(top, [group_col, "n", "token"], descending=[False, True, False])


def search_topk(ds, terms, k: int = 10, text_col: str = "text", id_col: str = "doc_id"):
    """Query-term retrieval — score every document against a fixed term set
    by sum(tf_t * idf_t) and return the global top-k (the brute-force exact
    leg of a search stack; the inverted index covers the at-scale path).

    Exactness discipline: df/N come from one streamed scan (per-batch
    presence partials, len(terms)+1 scalars folded on the driver);
    idf_t = round(ln((N+1)/(df_t+1)), 6) — the round(6) absorbs the
    last-ulp difference between libm's log and the SQL engine's ln; the
    score is the FIXED-ORDER left-associated sum tf_1*idf_1 + tf_2*idf_2 +
    ... so both engines run the identical IEEE op sequence. Token = the
    ``' '``-split contract. Top-k: per-block combiner keeps k rows before
    one tiny global sort (score desc, id asc)."""
    import math

    import ray

    terms = list(terms)
    T = len(terms)

    part_schema = pa.schema([("n", pa.int64())] + [(f"df{i}", pa.int64()) for i in range(T)])

    def _tf_mat(b: pa.Table) -> np.ndarray:
        """tf per (row, term) under the SINGLE-SPACE split contract —
        vectorized: one split_pattern + index_in + bincount (empty parts
        never equal a non-empty term, so skipping them is a no-op)."""
        texts = b.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        t = pc.fill_null(texts.cast(pa.string()), "")
        n_rows = len(t)
        s = pc.split_pattern(t, " ")
        lens = pc.list_value_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(s)
        parent = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        code = pc.index_in(flat, value_set=pa.array(terms, type=pa.string()))
        hit = pc.is_valid(code).to_numpy(zero_copy_only=False)
        tf = np.zeros((n_rows, T), dtype=np.int64)
        if hit.any():
            cv = code.to_numpy(zero_copy_only=False)
            keyed = parent[hit] * T + cv[hit].astype(np.int64)
            tf = np.bincount(keyed, minlength=n_rows * T).reshape(n_rows, T).astype(np.int64)
        return tf

    def df_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        tf = _tf_mat(b)
        cols = {"n": pa.array([b.num_rows], type=pa.int64())}
        for i in range(T):
            cols[f"df{i}"] = pa.array([int((tf[:, i] > 0).sum())], type=pa.int64())
        return pa.table(cols, schema=part_schema)

    parts = ds.map_batches(df_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum())
    idfs = [round(math.log((n_docs + 1) / (int(parts[f"df{i}"].sum()) + 1)), 6) for i in range(len(terms))]
    ref = ray.put((terms, idfs))

    out_schema = pa.schema([(id_col, pa.int64()), ("score", pa.float64())])

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        tms, widf = ray.get(ref)
        tf = _tf_mat(b)
        s = np.zeros(b.num_rows, dtype=np.float64)
        for i in range(T):  # fixed-order left-associated adds
            s = s + tf[:, i].astype(np.float64) * widf[i]
        hit = tf.sum(axis=1) > 0
        out = pa.table(
            {id_col: b.column(id_col).cast(pa.int64()).filter(pa.array(hit)),
             "score": pa.array(s[hit])},
            schema=out_schema,
        )
        # per-block combiner: only k candidates per block reach the sort
        if out.num_rows > k:
            import pandas as pd

            df = out.to_pandas().sort_values(["score", id_col], ascending=[False, True]).head(k)
            out = pa.table({f.name: pa.array(df[f.name], type=f.type) for f in out_schema}, schema=out_schema)
        return out

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )


def length_band_stats(ds, lo_q: float = 0.05, hi_q: float = 0.95,
                      text_col: str = "text", group_col: str = "source",
                      max_groups: int = 100_000):
    """Per-group token-length percentile band filter (the CCNet/Gopher-style
    "drop the freak-length tails" curation gate), reported as per-group
    surviving counts: (group, kept, kept_tokens) for docs whose whitespace
    token count lies in [p(lo_q), p(hi_q)] of their OWN group's length
    distribution — each source's band adapts to that source's shape.

    Scale shape: one pass computes (group, n_tokens) rows (the established
    text_stats tokenization contract); the exact per-group quantiles ship
    through grouped_quantiles_cont's ONE keyed exchange; the thresholds
    table is answer-sized (2 rows per group, loudly guarded at max_groups)
    and rides into the filter pass as a closure broadcast — the filter then
    emits per-batch PARTIAL (group, kept, kept_tokens) sums, so the final
    exchange carries combiner output, never documents. Threshold floats are
    round(6)-quantized on both engines (the hash-green grouped-quantiles
    discipline); token counts are ints, so band membership is exact."""
    import pandas as pd
    import pyarrow.compute as pc

    from text_to_graph_ray.functions.quantiles import grouped_quantiles_cont

    pair_schema = pa.schema([(group_col, pa.string()), ("n_tokens", pa.int64())])

    def to_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pair_schema.empty_table()
        toks = [len((t or "").split()) for t in b.column(text_col).to_pylist()]
        return pa.table(
            {group_col: pc.cast(b.column(group_col), pa.string()),
             "n_tokens": pa.array(toks, type=pa.int64())},
            schema=pair_schema,
        )

    pairs = ds.map_batches(to_pairs, batch_format="pyarrow")
    qs = grouped_quantiles_cont(pairs, group_col, "n_tokens", [lo_q, hi_q]).materialize()
    if qs.count() > 2 * max_groups:
        raise ValueError(
            f"length_band_stats: >{max_groups} groups — the thresholds table is no longer "
            "answer-sized; raise max_groups deliberately or pre-bucket the group column"
        )
    th = qs.to_pandas()
    lo = dict(zip(th[th["q"] == lo_q][group_col], th[th["q"] == lo_q]["value"]))
    hi = dict(zip(th[th["q"] == hi_q][group_col], th[th["q"] == hi_q]["value"]))

    part_schema = pa.schema([(group_col, pa.string()), ("kept", pa.int64()), ("kept_tokens", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        df = pd.DataFrame({group_col: b.column(group_col).to_pylist(),
                           "n_tokens": b.column("n_tokens").to_numpy(zero_copy_only=False)})
        n = df["n_tokens"].to_numpy(dtype=np.int64)
        keep = (n >= df[group_col].map(lo).to_numpy(dtype=np.float64)) & (
            n <= df[group_col].map(hi).to_numpy(dtype=np.float64)
        )
        g = (
            df[keep]
            .groupby(group_col, sort=False, as_index=False)["n_tokens"]
            .agg(kept="size", kept_tokens="sum")
        )
        return pa.table(
            {group_col: pa.array(g[group_col], type=pa.string()),
             "kept": pa.array(g["kept"].to_numpy(dtype=np.int64), type=pa.int64()),
             "kept_tokens": pa.array(g["kept_tokens"].to_numpy(dtype=np.int64), type=pa.int64())},
            schema=part_schema,
        )

    partials = pairs.map_batches(partial, batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        g = (
            b.to_pandas()
            .groupby(group_col, sort=False, as_index=False)[["kept", "kept_tokens"]]
            .sum()
            .sort_values(group_col, kind="mergesort")
        )
        return pa.table(
            {group_col: pa.array(g[group_col], type=pa.string()),
             "kept": pa.array(g["kept"].to_numpy(dtype=np.int64), type=pa.int64()),
             "kept_tokens": pa.array(g["kept_tokens"].to_numpy(dtype=np.int64), type=pa.int64())},
            schema=part_schema,
        )

    return partials.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=None)


LM_NLL_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_bigrams", pa.int64()), ("nll", pa.float64())])

BG_SCHEMA = pa.schema([("doc_id", pa.int64()), ("bg", pa.string()), ("f", pa.string()), ("m", pa.int64())])


def _explode_bigrams_rows(ids, texts):
    """Per-row fallback: (doc_id, bg, f, m) lists for the given docs — THE
    bigram contract (whitespace .split() tokens, adjacent pairs, per-doc
    multiplicity)."""
    doc_out, bg_out, f_out, m_out = [], [], [], []
    for i, t in zip(ids, texts):
        toks = (t or "").split()
        if len(toks) < 2:
            continue
        local: dict = {}
        for fw, tw in zip(toks, toks[1:]):
            local[(fw, tw)] = local.get((fw, tw), 0) + 1
        for (fw, tw), m in local.items():
            doc_out.append(i)
            bg_out.append(fw + "\x1f" + tw)
            f_out.append(fw)
            m_out.append(m)
    return doc_out, bg_out, f_out, m_out


def explode_bigrams_batch(b: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Vectorized ``_explode_bigrams_rows`` over a batch: Arrow whitespace
    split + empty-edge-token filter (== str.split() for ASCII rows — empties
    only occur at row edges because utf8_split_whitespace collapses runs, so
    dropping them never bridges a false adjacency), exact dictionary codes,
    one pandas int groupby for per-doc multiplicities, and the bigram
    strings rebuilt from the dictionary only for the (distinct-per-batch)
    output rows. Non-ASCII rows fall back to the per-row contract. Output
    ROW ORDER differs from the per-row kernel; every consumer aggregates or
    joins, so the difference is unobservable (differential test asserts
    set-with-multiplicity equality).

    Oversized batches are processed in <=8192-row slices: the per-doc
    multiplicity reduction is doc-local, so slicing on row boundaries is
    exact, and it keeps the packed-key unique() in the regime where it
    beats the per-row kernel (measured 2.7x on a 100k-row single batch)."""
    import pandas as pd
    import pyarrow.compute as pc

    if b.num_rows == 0:
        return BG_SCHEMA.empty_table()
    if b.num_rows > 8192:
        return pa.concat_tables([
            explode_bigrams_batch(b.slice(off, 8192), text_col=text_col, id_col=id_col)
            for off in range(0, b.num_rows, 8192)
        ])
    texts = b.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = pc.fill_null(texts.cast(pa.string()), "")
    ids = b.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
    ascii_mask = pc.string_is_ascii(t).to_numpy(zero_copy_only=False)

    parts = []
    if ascii_mask.any():
        ta = t.filter(pa.array(ascii_mask))
        ids_a = ids[ascii_mask]
        s = pc.utf8_split_whitespace(ta)
        lens = pc.list_value_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(s)
        parent = np.repeat(np.arange(len(ids_a), dtype=np.int64), lens)
        ne = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        parent_ne = parent[ne]
        flat_ne = flat.filter(pa.array(ne))
        if len(parent_ne) >= 2:
            enc = pc.dictionary_encode(flat_ne)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            adj = parent_ne[1:] == parent_ne[:-1]
            if adj.any():
                dd = parent_ne[:-1][adj]
                ff = codes[:-1][adj]
                tt = codes[1:][adj]
                n_codes = int(codes.max()) + 1
                if len(ids_a) <= (1 << 23) and n_codes <= (1 << 20):
                    # pack (doc, f, t) into one int64 and np.unique it —
                    # several times faster than a 3-key pandas groupby
                    packed = (dd << np.int64(40)) | (ff << np.int64(20)) | tt
                    uk, m = np.unique(packed, return_counts=True)
                    d_u = (uk >> np.int64(40)).astype(np.int64)
                    f_u = ((uk >> np.int64(20)) & np.int64(0xFFFFF)).astype(np.int64)
                    t_u = (uk & np.int64(0xFFFFF)).astype(np.int64)
                    m = m.astype(np.int64)
                else:  # huge batch/vocab: exact pandas fallback
                    g = (
                        pd.DataFrame({"d": dd, "f": ff, "t": tt})
                        .groupby(["d", "f", "t"], sort=False)
                        .size()
                    )
                    d_u = g.index.get_level_values(0).to_numpy(dtype=np.int64)
                    f_u = g.index.get_level_values(1).to_numpy(dtype=np.int64)
                    t_u = g.index.get_level_values(2).to_numpy(dtype=np.int64)
                    m = g.to_numpy(dtype=np.int64)
                dict_arr = enc.dictionary
                f_str = dict_arr.take(pa.array(f_u, type=pa.int64()))
                t_str = dict_arr.take(pa.array(t_u, type=pa.int64()))
                parts.append(pa.table({
                    "doc_id": pa.array(ids_a[d_u], type=pa.int64()),
                    "bg": pc.binary_join_element_wise(f_str, t_str, "\x1f"),
                    "f": f_str,
                    "m": pa.array(m, type=pa.int64()),
                }, schema=BG_SCHEMA))
    if (~ascii_mask).any():
        tf = t.filter(pa.array(~ascii_mask)).to_pylist()
        doc_out, bg_out, f_out, m_out = _explode_bigrams_rows(ids[~ascii_mask].tolist(), tf)
        parts.append(pa.table({
            "doc_id": pa.array(doc_out, type=pa.int64()),
            "bg": pa.array(bg_out, type=pa.string()),
            "f": pa.array(f_out, type=pa.string()),
            "m": pa.array(m_out, type=pa.int64()),
        }, schema=BG_SCHEMA))
    if not parts:
        return BG_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def bigram_lm_nll(ds, text_col: str = "text", id_col: str = "doc_id",
                  counts_broadcast_max: int = 2_000_000, num_buckets: int = 64):
    """Per-document bigram language-model score — the CCNet/Gopher-style
    perplexity quality filter, self-trained on the corpus: fit a Laplace-
    smoothed bigram LM over the whole corpus (whitespace tokens, the
    established contract) in one counting pass, then score every document's
    mean negative log2-likelihood per bigram:

        p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1} ·) + V)
        nll = -(Σ round(log2(p)·1e9)) / 1e9 / n_bigrams        (round 6)

    with V = distinct token types corpus-wide. Quantizing each bigram term
    to int64 BEFORE summing makes the per-doc sum order- and plan-
    independent (the lexical_stats entropy discipline), so the broadcast
    and exchange scoring paths are bit-identical. Docs with < 2 tokens
    score (0, 0.0).

    Scale shape: the counting pass pre-combines bigram multiplicities per
    batch, so the count exchange carries (bigram, partial) rows; scoring
    attaches c(fw) and c(f·) via ``joins.lookup_join`` — ONE collected,
    key-sorted broadcast per table while counts fit
    ``counts_broadcast_max`` rows, a side-tagged bucketed exchange past it
    (lookup_join's own equivalence-tested fallback); the per-doc reduce is
    a combiner-first keyed sum. Returns (doc_id, n_bigrams, nll) sorted."""
    import pandas as pd
    import pyarrow.compute as pc

    from text_to_graph_ray.functions.agg import bucketed_aggregate, distinct_rows
    from text_to_graph_ray.functions.joins import lookup_join
    from text_to_graph_ray.util import sort_coalesced

    bg_schema = pa.schema([("doc_id", pa.int64()), ("bg", pa.string()), ("f", pa.string()), ("m", pa.int64())])
    tok_schema = pa.schema([("tok", pa.string())])

    def explode_bigrams(b: pa.Table) -> pa.Table:
        return explode_bigrams_batch(b, text_col=text_col, id_col=id_col)

    def explode_tokens(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return tok_schema.empty_table()
        s = pc.utf8_split_whitespace(pc.fill_null(b.column(text_col).cast(pa.string()), ""))
        flat = pc.list_flatten(s)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return pa.table({"tok": flat}, schema=tok_schema)

    docbg = ds.map_batches(explode_bigrams, batch_format="pyarrow").materialize()

    # corpus model: bigram counts, context counts, vocabulary size
    c_bg = bucketed_aggregate(docbg.select_columns(["bg", "m"]), "bg", {"c_fw": ("m", "sum")},
                              out_schema=pa.schema([("bg", pa.string()), ("c_fw", pa.int64())]),
                              num_buckets=num_buckets)
    c_f = bucketed_aggregate(docbg.select_columns(["f", "m"]), "f", {"c_f": ("m", "sum")},
                             out_schema=pa.schema([("f", pa.string()), ("c_f", pa.int64())]),
                             num_buckets=num_buckets)
    vocab = distinct_rows(ds.map_batches(explode_tokens, batch_format="pyarrow"), ["tok"], tok_schema)
    v_size = vocab.count()

    scored = lookup_join(docbg, c_bg, key="bg", cols=["c_fw"], broadcast_max=counts_broadcast_max,
                         num_buckets=num_buckets)
    scored = lookup_join(scored, c_f, key="f", cols=["c_f"], broadcast_max=counts_broadcast_max,
                         num_buckets=num_buckets)

    part_schema = pa.schema([("doc_id", pa.int64()), ("sq", pa.int64()), ("nb", pa.int64())])

    def term_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        m = b.column("m").to_numpy(zero_copy_only=False).astype(np.int64)
        c_fw = b.column("c_fw").to_numpy(zero_copy_only=False).astype(np.float64)
        cf = b.column("c_f").to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.rint(np.log2((c_fw + 1.0) / (cf + np.float64(v_size))) * 1e9).astype(np.int64)
        g = pd.DataFrame({"doc_id": b.column("doc_id").to_numpy(zero_copy_only=False),
                          "sq": q * m, "nb": m}).groupby("doc_id", sort=False, as_index=False).sum()
        return pa.table({"doc_id": pa.array(g["doc_id"].to_numpy(dtype=np.int64), type=pa.int64()),
                         "sq": pa.array(g["sq"].to_numpy(dtype=np.int64), type=pa.int64()),
                         "nb": pa.array(g["nb"].to_numpy(dtype=np.int64), type=pa.int64())}, schema=part_schema)

    def doc_zero(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        n = b.num_rows
        return pa.table({"doc_id": pc.cast(b.column(id_col), pa.int64()),
                         "sq": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64()),
                         "nb": pa.array(np.zeros(n, dtype=np.int64), type=pa.int64())}, schema=part_schema)

    partials = scored.map_batches(term_partials, batch_format="pyarrow").union(
        ds.map_batches(doc_zero, batch_format="pyarrow")
    )
    sums = bucketed_aggregate(partials, "doc_id", {"sq": ("sq", "sum"), "nb": ("nb", "sum")},
                              out_schema=pa.schema([("doc_id", pa.int64()), ("sq", pa.int64()), ("nb", pa.int64())]),
                              num_buckets=num_buckets)

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return LM_NLL_SCHEMA.empty_table()
        sq = b.column("sq").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = b.column("nb").to_numpy(zero_copy_only=False).astype(np.int64)
        safe = np.maximum(nb, 1).astype(np.float64)
        nll = np.where(nb > 0, -(sq.astype(np.float64) / 1e9) / safe, 0.0)
        nll = np.asarray([round(float(x), 6) for x in nll], dtype=np.float64)
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_bigrams": pa.array(nb, type=pa.int64()),
                         "nll": pa.array(nll, type=pa.float64())}, schema=LM_NLL_SCHEMA)

    return sort_coalesced(sums.map_batches(finish, batch_format="pyarrow"), "doc_id")


# Gopher-style rule-gate thresholds (Rae et al. 2021 "Scaling Language
# Models" App. A.1.1 document filters, re-parameterized to keep every rule
# LIVE on the synthetic corpus: each bound excludes a real slice of docs).
GOPHER_STOPS = ("the", "a", "of", "to", "and", "in", "is", "on")
GOPHER_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("mean_tok_len", pa.float64()),
        ("stop_hits", pa.int64()),
        ("r_len", pa.int64()),
        ("r_wordlen", pa.int64()),
        ("r_stop", pa.int64()),
        ("passed", pa.int64()),
    ]
)


def gopher_rules(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 30,
    max_tokens: int = 90,
    min_word_len: float = 4.3,
    max_word_len: float = 5.0,
    min_stop_hits: int = 2,
) -> pa.Table:
    """Gopher-style document rule gate, fully vectorized and REAL-SQL
    checkable: per doc (whitespace token contract) emit n_tokens,
    mean_tok_len = round(sum(len)/n, 6), stop_hits (total occurrences of
    the 8-word stop list), the three rule flags, and the AND. No exchange
    at all — embarrassingly parallel, the cheapest curation gate shape.

    Float discipline: mean token length is ONE int/int IEEE division then
    round(6); the rule compares the QUANTIZED value against dyadic-adjacent
    literals, so engine and SQL decide identically (the divide is the same
    correctly-rounded double op in numpy and DuckDB)."""
    if batch.num_rows == 0:
        return GOPHER_SCHEMA.empty_table()
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = pc.fill_null(texts.cast(pa.string()), "")
    n_rows = len(t)
    ids = batch.column(id_col).cast(pa.int64())

    s = pc.utf8_split_whitespace(t)
    lens = pc.list_value_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(s)
    parent = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    ne = tok_len > 0
    parent_ne = parent[ne]
    n_tok = np.bincount(parent_ne, minlength=n_rows).astype(np.int64)
    sum_len = np.bincount(parent_ne, weights=tok_len[ne], minlength=n_rows).astype(np.int64)
    is_stop = pc.is_in(flat, value_set=pa.array(GOPHER_STOPS)).to_numpy(zero_copy_only=False)
    stop_hits = np.bincount(parent_ne[is_stop[ne]], minlength=n_rows).astype(np.int64)

    mean_len = np.zeros(n_rows, dtype=np.float64)
    nz = n_tok > 0
    mean_len[nz] = np.round(sum_len[nz].astype(np.float64) / n_tok[nz].astype(np.float64), 6)
    r_len = ((n_tok >= min_tokens) & (n_tok <= max_tokens)).astype(np.int64)
    r_wordlen = ((mean_len >= min_word_len) & (mean_len <= max_word_len)).astype(np.int64)
    r_stop = (stop_hits >= min_stop_hits).astype(np.int64)
    return pa.table(
        {
            "doc_id": ids,
            "n_tokens": pa.array(n_tok),
            "mean_tok_len": pa.array(mean_len),
            "stop_hits": pa.array(stop_hits),
            "r_len": pa.array(r_len),
            "r_wordlen": pa.array(r_wordlen),
            "r_stop": pa.array(r_stop),
            "passed": pa.array(r_len & r_wordlen & r_stop),
        },
        schema=GOPHER_SCHEMA,
    )


def bm25_topk(ds, terms, k: int = 10, k1: float = 1.5, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"):
    """BM25 retrieval over a fixed query-term set — the doclen-normalized
    upgrade of ``search_topk``'s tf-idf scoring (Robertson/Sparck Jones;
    the Okapi BM25 form with k1/b). Two streamed passes:

    1. stats: per-batch partials (n_docs, sum_dl, df per term) — a
       (T+2)-scalar row per batch, folded on the driver (answer-sized).
    2. score: tf per (doc, term) via one index_in + bincount, then the
       BM25 sum accumulated LEFT-ASSOCIATED over terms in fixed order so
       numpy and the SQL mirror run the identical IEEE op sequence;
       idf_t = round(ln((N - df + 0.5)/(df + 0.5) + 1), 6) absorbs the
       last-ulp libm-vs-SQL ln drift (the search_topk discipline);
       k1/b default to dyadic values so 1-b and k1+1 are exact doubles.

    Tokenization is the whitespace contract. Per-block top-k combiner,
    then one tiny global sort (score desc, id asc) + limit."""
    import math

    import ray

    terms = [str(x) for x in terms]
    T = len(terms)
    part_schema = pa.schema(
        [("n", pa.int64()), ("sdl", pa.int64())] + [(f"df{i}", pa.int64()) for i in range(T)]
    )

    def _tf_dl(bt: pa.Table):
        texts = bt.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        t = pc.fill_null(texts.cast(pa.string()), "")
        n_rows = len(t)
        s = pc.utf8_split_whitespace(t)
        lens = pc.list_value_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(s)
        parent = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        ne = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        parent_ne = parent[ne]
        dl = np.bincount(parent_ne, minlength=n_rows).astype(np.int64)
        code = pc.index_in(flat, value_set=pa.array(terms, type=pa.string()))
        cv = code.to_numpy(zero_copy_only=False)
        hit = ~pc.is_null(code).to_numpy(zero_copy_only=False) & ne
        tf = np.zeros((n_rows, T), dtype=np.int64)
        if hit.any():
            keyed = parent[hit] * T + cv[hit].astype(np.int64)
            tf = np.bincount(keyed, minlength=n_rows * T).reshape(n_rows, T).astype(np.int64)
        return dl, tf

    def stats_partial(bt: pa.Table) -> pa.Table:
        if bt.num_rows == 0:
            return part_schema.empty_table()
        dl, tf = _tf_dl(bt)
        cols = {"n": pa.array([bt.num_rows], type=pa.int64()),
                "sdl": pa.array([int(dl.sum())], type=pa.int64())}
        for i in range(T):
            cols[f"df{i}"] = pa.array([int((tf[:, i] > 0).sum())], type=pa.int64())
        return pa.table(cols, schema=part_schema)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n"].sum())
    sum_dl = int(parts["sdl"].sum())
    avgdl = float(sum_dl) / float(n_docs) if n_docs else 1.0
    idfs = [
        round(math.log(((n_docs - int(parts[f"df{i}"].sum())) + 0.5) / (int(parts[f"df{i}"].sum()) + 0.5) + 1.0), 6)
        for i in range(T)
    ]
    ref = ray.put((idfs, avgdl))
    one_minus_b = 1.0 - b  # dyadic defaults: exact
    k1_plus_1 = k1 + 1.0

    out_schema = pa.schema([(id_col, pa.int64()), ("score", pa.float64())])

    def score(bt: pa.Table) -> pa.Table:
        if bt.num_rows == 0:
            return out_schema.empty_table()
        widf, av = ray.get(ref)
        dl, tf = _tf_dl(bt)
        dlf = dl.astype(np.float64)
        s = np.zeros(len(dl), dtype=np.float64)
        for i in range(T):  # fixed-order left-associated accumulation
            tfi = tf[:, i].astype(np.float64)
            s = s + widf[i] * ((tfi * k1_plus_1) / (tfi + k1 * (one_minus_b + (b * dlf) / av)))
        hit = tf.sum(axis=1) > 0
        out = pa.table(
            {id_col: bt.column(id_col).cast(pa.int64()).filter(pa.array(hit)),
             "score": pa.array(np.round(s[hit], 6))},
            schema=out_schema,
        )
        if out.num_rows > k:  # per-block combiner
            import pandas as pd

            df = out.to_pandas().sort_values(["score", id_col], ascending=[False, True]).head(k)
            out = pa.table({f.name: pa.array(df[f.name], type=f.type) for f in out_schema},
                           schema=out_schema)
        return out

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )


PMI_SCHEMA = pa.schema([("x", pa.string()), ("y", pa.string()), ("cxy", pa.int64()),
                        ("cx", pa.int64()), ("cy", pa.int64()), ("pmi", pa.float64())])


def pmi_topk(ds, k: int = 50, min_count: int = 5, text_col: str = "text",
             id_col: str = "doc_id", counts_broadcast_max: int = 2_000_000,
             num_buckets: int = 64):
    """Top-k collocations by pointwise mutual information over adjacent
    whitespace-token bigrams — the classic corpus-analysis op for finding
    multi-word expressions worth protecting from tokenization/dedup:

        pmi(x, y) = ln( n_bigrams * c(x,y) / (c(x) * c(y)) )      (round 6)

    with c(x)/c(y) the corpus-wide unigram OCCURRENCE counts and the
    ``min_count`` floor cutting the long noise tail (bare hapax pairs
    otherwise dominate any PMI ranking).

    Exact-math discipline: all counts fold as int64 through the same
    combiner-first bucketed exchanges as ``bigram_lm_nll`` (per-batch
    multiplicities via ``explode_bigrams_batch``); the PMI argument is a
    ratio of two exact INT64 PRODUCTS converted once to float64, so the SQL
    mirror (one CAST AS DOUBLE division inside ln, the shared ln contract)
    decides identically. Product-fits-int64 contract: n_bigrams * c(x,y)
    <= 2^63 — beyond ~10^9 total bigrams with 10^9-count pairs, split the
    ln into quantized log terms instead.

    Scale shape: the count exchanges carry (bigram, partial) rows only; the
    ``min_count`` filter runs before the unigram enrichment; unigram counts
    attach via ``joins.lookup_join`` (guarded broadcast, equivalence-tested
    bucketed fallback); the global top-k prunes per batch before ONE
    single-block final sort (k rows per upstream batch cross the wire).

    Returns (x, y, cxy, cx, cy, pmi) — the top ``k`` by (pmi DESC, x, y).
    """
    import pyarrow.compute as pc

    from text_to_graph_ray.functions.agg import bucketed_aggregate
    from text_to_graph_ray.functions.joins import lookup_join
    from text_to_graph_ray.util import read_parquet_clean  # noqa: F401  (doc symmetry)

    def explode_bg(b: pa.Table) -> pa.Table:
        return explode_bigrams_batch(b, text_col=text_col, id_col=id_col)

    tok_schema = pa.schema([("tok", pa.string())])

    def explode_toks(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return tok_schema.empty_table()
        s = pc.utf8_split_whitespace(pc.fill_null(b.column(text_col).cast(pa.string()), ""))
        flat = pc.list_flatten(s)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return pa.table({"tok": flat}, schema=tok_schema)

    docbg = ds.map_batches(explode_bg, batch_format="pyarrow")

    bg_counts = bucketed_aggregate(
        docbg.select_columns(["bg", "m"]), "bg", {"cxy": ("m", "sum")},
        out_schema=pa.schema([("bg", pa.string()), ("cxy", pa.int64())]),
        num_buckets=num_buckets,
    ).materialize()
    uni = bucketed_aggregate(
        ds.map_batches(explode_toks, batch_format="pyarrow"), "tok", {"c": ("tok", "size")},
        out_schema=pa.schema([("tok", pa.string()), ("c", pa.int64())]),
        num_buckets=num_buckets,
    ).materialize()

    # total bigram count: answer-sized fold of one partial per block
    n_bi = 0
    one = pa.schema([("nb", pa.int64())])
    for row in bg_counts.map_batches(
        lambda t: pa.table({"nb": pa.array([int(np.sum(t.column("cxy").to_numpy(zero_copy_only=False)))]
                                           if t.num_rows else [0], type=pa.int64())}, schema=one),
        batch_format="pyarrow", batch_size=None,
    ).take_all():
        n_bi += int(row["nb"])

    cand_schema = pa.schema([("x", pa.string()), ("y", pa.string()), ("cxy", pa.int64())])

    def split_pairs(t: pa.Table) -> pa.Table:
        # bg = x + "\x1f" + y (the explode kernel's packing); candidate rows
        # are the post-min_count survivors, so this per-row split touches a
        # filtered, aggregation-sized set — never the raw bigram stream
        keep = t.filter(pc.greater_equal(t.column("cxy"), min_count))
        if keep.num_rows == 0:
            return cand_schema.empty_table()
        xs, ys = [], []
        for s in keep.column("bg").to_pylist():
            a, b = s.split("\x1f", 1)
            xs.append(a)
            ys.append(b)
        return pa.table({"x": pa.array(xs, type=pa.string()),
                         "y": pa.array(ys, type=pa.string()),
                         "cxy": keep.column("cxy")}, schema=cand_schema)

    cand = bg_counts.map_batches(split_pairs, batch_format="pyarrow", batch_size=None)
    cand = lookup_join(cand, uni, key="x", right_key="tok", cols=["c"],
                       broadcast_max=counts_broadcast_max, num_buckets=num_buckets)
    cand = cand.map_batches(lambda t: t.rename_columns([{"c": "cx"}.get(n, n) for n in t.column_names]),
                            batch_format="pyarrow", batch_size=None)
    cand = lookup_join(cand, uni, key="y", right_key="tok", cols=["c"],
                       broadcast_max=counts_broadcast_max, num_buckets=num_buckets)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PMI_SCHEMA.empty_table()
        cxy = t.column("cxy").to_numpy(zero_copy_only=False).astype(np.int64)
        cx = t.column("cx").to_numpy(zero_copy_only=False).astype(np.int64)
        cy = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        pmi = np.log((np.int64(n_bi) * cxy).astype(np.float64) / (cx * cy).astype(np.float64))
        pmi = np.asarray([round(float(v), 6) for v in pmi], dtype=np.float64)
        out = pa.table({"x": t.column("x"), "y": t.column("y"),
                        "cxy": pa.array(cxy, type=pa.int64()),
                        "cx": pa.array(cx, type=pa.int64()),
                        "cy": pa.array(cy, type=pa.int64()),
                        "pmi": pa.array(pmi, type=pa.float64())}, schema=PMI_SCHEMA)
        # per-batch combiner: the global top-k is a subset of per-batch top-ks
        idx = pa.table({"pmi": out.column("pmi"), "x": out.column("x"), "y": out.column("y")})
        order = pc.sort_indices(idx, sort_keys=[("pmi", "descending"), ("x", "ascending"), ("y", "ascending")])
        return out.take(order[:k])

    scored = cand.map_batches(score, batch_format="pyarrow", batch_size=None)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return PMI_SCHEMA.empty_table()
        idx = pa.table({"pmi": t.column("pmi"), "x": t.column("x"), "y": t.column("y")})
        order = pc.sort_indices(idx, sort_keys=[("pmi", "descending"), ("x", "ascending"), ("y", "ascending")])
        return t.take(order[:k])

    return scored.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=None)


def naive_bayes_classify(ds, label_col: str = "lang", text_col: str = "text",
                         id_col: str = "doc_id", test_mod: int = 5,
                         scale: int = 10**12, num_buckets: int = 64):
    """Distributed multinomial Naive Bayes: train on docs with
    ``id % test_mod != 0``, classify the held-out rest — the lang-ID /
    domain-classifier training loop a curation pipeline runs at corpus
    scale. Returns (doc_id, lang, pred, correct) for every test doc.

    Float discipline: every log term is quantized ONCE to int64
    (``round(log(p)·scale)``) so per-doc scores are integer sums —
    order-independent, partition-invariant, and exactly reproducible by the
    naive single-threaded oracle (same np.log in the same environment; no
    cross-libm drift because the oracle is expected.py, not SQL libm).
    argmax tie-break: (score desc, class asc), exact on ints.

    Scale shape: the MODEL never funnels through the driver — per-(class,
    token) combiner partials -> one bucketed sum -> a token-keyed pivot to
    wide per-class weight columns; classification joins the exploded test
    token counts to the weight table via ``lookup_join`` (guarded broadcast
    under its row cap, bucketed left-merge past it — both plans inherit
    lookup_join's equivalence guarantee), then ONE doc-keyed sum per class.
    Only answer-sized facts (class list, per-class totals, vocab size) ever
    reach the driver. Empty/all-unseen docs still classify (prior +
    per-token unseen mass via null coalesce)."""
    from collections import Counter

    import numpy as np
    import pyarrow.compute as pc

    from text_to_graph_ray.functions.agg import bucketed_aggregate
    from text_to_graph_ray.functions.joins import lookup_join
    from text_to_graph_ray.util import sort_coalesced

    pair_schema = pa.schema([(label_col, pa.string()), ("token", pa.string()), ("n", pa.int64())])

    def train_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pair_schema.empty_table()
        ids = b.column(id_col).to_pylist()
        c: Counter = Counter()
        for i, g, t in zip(ids, b.column(label_col).to_pylist(), b.column(text_col).to_pylist()):
            if i % test_mod == 0:
                continue
            for tok in (t or "").split():
                c[(g, tok)] += 1
        items = sorted(c.items())
        return pa.table({
            label_col: pa.array([g for (g, _), _ in items], type=pa.string()),
            "token": pa.array([tok for (_, tok), _ in items], type=pa.string()),
            "n": pa.array([v for _, v in items], type=pa.int64()),
        }, schema=pair_schema)

    counts = bucketed_aggregate(
        ds.map_batches(train_pairs, batch_format="pyarrow"), [label_col, "token"],
        {"n": ("n", "sum")}, out_schema=pair_schema, num_buckets=num_buckets, in_schema=pair_schema,
    ).materialize()

    # answer-sized model facts: class list, per-class token totals, |V|,
    # per-class train-doc counts (combiner partials, driver folds ints)
    tot_schema = pa.schema([(label_col, pa.string()), ("nc", pa.int64()), ("nv", pa.int64())])
    per_class = bucketed_aggregate(counts, label_col, {"nc": ("n", "sum"), "nv": ("n", "size")},
                                   out_schema=tot_schema, num_buckets=num_buckets,
                                   in_schema=pair_schema).take_all()
    classes = sorted(r[label_col] for r in per_class)
    n_class_tokens = {r[label_col]: int(r["nc"]) for r in per_class}
    vocab_size = sum(int(r["nv"]) for r in per_class)  # (class, token) rows
    # |V| = distinct tokens, not (class, token) rows — count them exactly
    vocab_size = counts.map_batches(
        lambda t: pa.table({"token": pc.unique(t.column("token"))}) if t.num_rows
        else pa.schema([("token", pa.string())]).empty_table(),
        batch_format="pyarrow",
    )
    from text_to_graph_ray.functions.agg import distinct_rows

    vocab_size = distinct_rows(vocab_size, ["token"], pa.schema([("token", pa.string())]),
                               num_buckets=num_buckets).count()

    doc_cnt_schema = pa.schema([(label_col, pa.string()), ("docs", pa.int64())])

    def train_doc_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return doc_cnt_schema.empty_table()
        ids = np.asarray(b.column(id_col).to_pylist(), dtype=np.int64)
        keep = (ids % test_mod) != 0
        labs = np.asarray(b.column(label_col).to_pylist(), dtype=object)[keep]
        u, cnt = np.unique(labs, return_counts=True)
        return pa.table({label_col: pa.array(list(u), type=pa.string()),
                         "docs": pa.array(cnt.astype(np.int64), type=pa.int64())}, schema=doc_cnt_schema)

    doc_rows = ds.map_batches(train_doc_counts, batch_format="pyarrow").take_all()
    docs_per_class: dict = {}
    for r in doc_rows:
        docs_per_class[r[label_col]] = docs_per_class.get(r[label_col], 0) + int(r["docs"])
    total_train_docs = sum(docs_per_class.values())
    if not classes:
        out_schema = pa.schema([(id_col, pa.int64()), (label_col, pa.string()),
                                ("pred", pa.string()), ("correct", pa.int64())])
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())

    def q(x: float) -> int:
        return int(np.round(np.log(x) * scale))

    priors = {c: q(docs_per_class[c] / total_train_docs) for c in classes}
    unseen = {c: q(1.0 / (n_class_tokens[c] + vocab_size)) for c in classes}
    wcols = [f"w_{c}" for c in classes]

    # pivot the (class, token, n) model to wide per-token weight columns:
    # one token-keyed exchange, weights quantized vectorized per bucket
    wide_schema = pa.schema([("token", pa.string())] + [(w, pa.int64()) for w in wcols])

    def pivot_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return wide_schema.empty_table()
        labs = np.asarray(t.column(label_col).to_pylist(), dtype=object)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"token": t.column("token")}
        for c, w in zip(classes, wcols):
            m = labs == c
            nc = np.where(m, n, 0)
            # quantized log((cnt+1)/(Nc+V)); rows of other classes carry the
            # class's UNSEEN weight so the per-token max/sum pivot keeps it
            cols[w] = pa.array(np.round(
                np.log((nc + 1.0) / (n_class_tokens[c] + vocab_size)) * scale
            ).astype(np.int64), type=pa.int64())
        return pa.table(cols, schema=wide_schema)

    model = bucketed_aggregate(
        counts.map_batches(pivot_partial, batch_format="pyarrow"), "token",
        {w: (w, "max") for w in wcols},  # per (token, class) one real row; others hold unseen (the min)
        out_schema=wide_schema, num_buckets=num_buckets, in_schema=wide_schema,
    )

    # exploded test token counts (per-doc combiner)
    ex_schema = pa.schema([(id_col, pa.int64()), ("token", pa.string()), ("cnt", pa.int64())])

    def explode_test(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return ex_schema.empty_table()
        ids, toks, cnts = [], [], []
        for i, t in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()):
            if i % test_mod != 0:
                continue
            for tok, cnt in sorted(Counter((t or "").split()).items()):
                ids.append(i)
                toks.append(tok)
                cnts.append(cnt)
        return pa.table({id_col: pa.array(ids, type=pa.int64()),
                         "token": pa.array(toks, type=pa.string()),
                         "cnt": pa.array(cnts, type=pa.int64())}, schema=ex_schema)

    exploded = ds.map_batches(explode_test, batch_format="pyarrow")
    j = lookup_join(exploded, model, key="token", cols=wcols)

    score_schema = pa.schema([(id_col, pa.int64())] + [(f"s_{c}", pa.int64()) for c in classes])

    def term_scores(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return score_schema.empty_table()
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {id_col: t.column(id_col)}
        for c, w in zip(classes, wcols):
            # a token absent from the TRAIN vocabulary joins NULL: it carries
            # the class's unseen mass, same as the naive oracle
            wv = pc.fill_null(pc.cast(t.column(w), pa.int64()), unseen[c]).to_numpy(zero_copy_only=False).astype(np.int64)
            cols[f"s_{c}"] = pa.array(cnt * wv, type=pa.int64())
        return pa.table(cols, schema=score_schema)

    scores = bucketed_aggregate(
        j.map_batches(term_scores, batch_format="pyarrow"), id_col,
        {f"s_{c}": (f"s_{c}", "sum") for c in classes},
        out_schema=score_schema, num_buckets=num_buckets, in_schema=score_schema,
    )

    # attach the true label (and keep token-less test docs): LEFT join the
    # test metadata to the scores
    meta_schema = pa.schema([(id_col, pa.int64()), (label_col, pa.string())])

    def test_meta(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return meta_schema.empty_table()
        ids = np.asarray(b.column(id_col).to_pylist(), dtype=np.int64)
        keep = (ids % test_mod) == 0
        return pa.table({id_col: pa.array(ids[keep], type=pa.int64()),
                         label_col: pa.array(np.asarray(b.column(label_col).to_pylist(), dtype=object)[keep],
                                             type=pa.string())}, schema=meta_schema)

    meta = ds.map_batches(test_meta, batch_format="pyarrow")
    enriched = lookup_join(meta, scores, key=id_col, cols=[f"s_{c}" for c in classes])

    out_schema = pa.schema([(id_col, pa.int64()), (label_col, pa.string()),
                            ("pred", pa.string()), ("correct", pa.int64())])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        n = t.num_rows
        mat = np.empty((n, len(classes)), dtype=np.int64)
        for ci, c in enumerate(classes):
            # a token-less test doc joins NULL scores: prior-only prediction
            vals = pc.fill_null(pc.cast(t.column(f"s_{c}"), pa.int64()), 0).to_numpy(zero_copy_only=False).astype(np.int64)
            mat[:, ci] = vals + priors[c]
        # argmax with (score desc, class asc): classes are sorted, and
        # np.argmax returns the FIRST max — exactly the asc tie-break
        best = np.argmax(mat, axis=1)
        preds = np.asarray(classes, dtype=object)[best]
        true = np.asarray(t.column(label_col).to_pylist(), dtype=object)
        return pa.table({
            id_col: t.column(id_col), label_col: t.column(label_col),
            "pred": pa.array(list(preds), type=pa.string()),
            "correct": pa.array((preds == true).astype(np.int64), type=pa.int64()),
        }, schema=out_schema)

    return sort_coalesced(enriched.map_batches(finish, batch_format="pyarrow"), id_col)
