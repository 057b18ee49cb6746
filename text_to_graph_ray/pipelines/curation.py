"""Corpus-curation composition: the end-to-end pipeline a training-data job
actually runs over a raw document table —

    read(documents)                       pruned columns
      -> quality + language gate          one fused map_batches (vectorized
                                          heuristics from functions/text)
      -> near-dup removal                 minhash pairs -> connected
                                          components -> keep-min survivor
      -> surviving doc ids                sorted, resumable sink-ready

Each stage is an operator the driver already hash-checks in isolation
(text_quality, text_langid, dedup_survivors); this module composes them the
way a user would and is itself oracle-checked end-to-end against a naive
single-threaded reimplementation (expected.naive_clean_corpus).
"""

from __future__ import annotations

from text_to_graph_ray.util import read_parquet_clean

import pyarrow as pa


def quality_lang_gate(batch: pa.Table, min_quality: float = 0.45, langs: tuple = ("en",)) -> pa.Table:
    """Keep documents whose composite quality clears min_quality AND whose
    detected language is in ``langs`` — fused so the text is scanned once."""
    from text_to_graph_ray.functions.text import detect_lang, lang_id, quality_score  # noqa: F401

    texts = batch.column("text").to_pylist()
    qual = quality_score(batch)
    keep = [
        q >= min_quality and detect_lang(t or "") in langs
        for q, t in zip(qual.column("quality").to_pylist(), texts)
    ]
    return batch.filter(pa.array(keep))


def clean_corpus_survivors(sf_dir: str, min_quality: float = 0.45, threshold: float = 0.5):
    """documents -> gate -> near-dedup -> surviving doc ids (sorted)."""
    import ray.data as rd

    from text_to_graph_ray.functions.dedup import near_dup_survivors

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    gated = docs.map_batches(lambda b: quality_lang_gate(b, min_quality), batch_format="pyarrow")
    return near_dup_survivors(gated, threshold=threshold)
