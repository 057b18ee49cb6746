"""text_to_graph_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the query/data-processing semantics of the reference repo
``nobody-qwert/text-to-graph`` (LLM-driven triple extraction over documents,
entity canonicalization, graph materialize — see /root/reference) as
deterministic, testable Ray Data stages over Parquet tables of source-code
repositories:

    read_parquet(repo_files)                      # (repo, path, commit, lang, content)
      -> map_batches(add_sha256)                  # per-row invariant column
      -> map_batches(chunk_files)                 # code-aware chunking + context padding
      -> map_batches(extract_triples)             # per-lang deterministic extraction
      -> groupby(entity_key) canonicalize         # the canonicalization shuffle
      -> map_batches(EntityLinker, concurrency=N) # stateful actor pool (alias scorer)
      -> groupby(triple) dedup + sort             # graph materialize
      -> write_parquet(nodes/, edges/)            # partitioned, resumable output

Nothing here calls ``ray.init()``; callers (bench.py, tests, CLI) own the
Ray session.
"""

from text_to_graph_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
