"""Text analysis over a documents table: stats/quality, language-ID,
token counting, document fingerprinting. All stateless vectorized-ish
``map_batches`` transforms (regexes/profiles compiled at module import, once
per worker process)."""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

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


def quality_score(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Composite quality heuristics (length / mean token length / stopword
    ratio / alpha ratio) — pipeline-filter material, rows-only checked."""
    texts = batch.column(text_col).to_pylist()
    rows = {"mean_tok_len": [], "stop_ratio": [], "alpha_ratio": [], "quality": []}
    stop = _LANG_PROFILES["en"]
    for t in texts:
        t = t or ""
        toks = t.split()
        n = len(toks)
        mean_len = (sum(len(x) for x in toks) / n) if n else 0.0
        stop_r = (sum(1 for x in toks if x.lower() in stop) / n) if n else 0.0
        alpha = (sum(1 for c in t if c.isalpha()) / len(t)) if t else 0.0
        q = min(1.0, n / 50.0) * 0.4 + min(mean_len / 8.0, 1.0) * 0.2 + stop_r * 0.2 + alpha * 0.2
        rows["mean_tok_len"].append(round(mean_len, 6))
        rows["stop_ratio"].append(round(stop_r, 6))
        rows["alpha_ratio"].append(round(alpha, 6))
        rows["quality"].append(round(q, 6))
    out = pa.table({id_col: batch.column(id_col)})
    for k, v in rows.items():
        out = out.append_column(k, pa.array(v, type=pa.float64()))
    return out


def detect_lang(text: str) -> str:
    t = text or ""
    if any("一" <= c <= "鿿" for c in t[:400]):
        return "zh"
    toks = [w.lower() for w in t.split()[:200]]
    if not toks:
        return "und"
    best_lang, best = "und", 0
    for lang in ("en", "de", "fr", "es"):
        hits = sum(1 for w in toks if w in _LANG_PROFILES[lang])
        if hits > best:
            best_lang, best = lang, hits
    return best_lang if best > 0 else "und"


def lang_id(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    preds = [detect_lang(t) for t in batch.column(text_col).to_pylist()]
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
