"""The flagship KG-construction pipeline (SURVEY §3.4 lifecycle):

    read_parquet(repo_files)
      -> map_batches(add_sha256)                      stateless tasks
      -> map_batches(chunk_files)                     stateless (padding fused)
      -> map_batches(extract_records)                 stateless per-lang rules
      -> map_batches(AliasResolver, concurrency=N)    actor pool (broadcast defs index)
      -> map_batches(node/edge partials)              combiner (pre-shuffle)
      -> groupby(entity_key / triple).map_groups      the canonicalization shuffle
      -> sort + dense ids                             deterministic materialize
      -> write_parquet(nodes/, edges/)

Two entry shapes:
* ``nodes_table`` / ``edges_table`` — lazy Datasets for queries/tests
  (no checkpointing, stream straight through);
* ``run`` — the checkpointed job: extraction results land in per-partition
  parquet + manifests, interrupted runs resume via manifest anti-join without
  recomputing completed partitions.

Nothing here calls ray.init(); callers own the session.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc

from text_to_graph_ray.config import DEFAULT_CONFIG, PipelineConfig
from text_to_graph_ray.keys import entity_key, module_path
from text_to_graph_ray.stages.canonicalize import (
    add_dense_index,
    edge_partials,
    merge_edge_group,
    merge_node_group,
    node_partials,
)
from text_to_graph_ray.stages.chunker import chunk_files
from text_to_graph_ray.stages.extract import extract_records
from text_to_graph_ray.stages.hashing import add_sha256
from text_to_graph_ray.stages.linker import AliasResolver
from text_to_graph_ray.state.checkpoint import CheckpointStore, part_of

INPUT_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def records_dataset(input_path: str, cfg: PipelineConfig = DEFAULT_CONFIG, with_part: bool = False):
    """read -> sha -> chunk -> extract. Column-pruned at the read."""
    import ray.data as rd

    ds = rd.read_parquet(input_path, columns=["repo", "path", "lang", "content"])
    ds = ds.map_batches(add_sha256, batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(lambda b: chunk_files(b, cfg), batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(extract_records, batch_format="pyarrow", batch_size=cfg.batch_size)
    if with_part:
        ds = ds.map_batches(lambda b: _with_part(b, cfg.num_partitions), batch_format="pyarrow")
    return ds


def _with_part(batch: pa.Table, num_partitions: int) -> pa.Table:
    parts = [part_of(r, p, num_partitions) for r, p in zip(batch.column("repo").to_pylist(), batch.column("path").to_pylist())]
    return batch.append_column("part_id", pa.array(parts, type=pa.int64()))


def _defines_pairs(batch: pa.Table) -> pa.Table:
    """(name_key, module) pairs for the defs index — pre-deduped per batch."""
    mask = pc.and_(pc.equal(batch.column("kind"), "edge"), pc.equal(batch.column("b"), "defines"))
    sel = batch.filter(mask)
    pairs = sorted({(entity_key(c), module_path(p)) for c, p in zip(sel.column("c").to_pylist(), sel.column("path").to_pylist())})
    return pa.table(
        {
            "name_key": pa.array([a for a, _ in pairs], type=pa.string()),
            "module": pa.array([b for _, b in pairs], type=pa.string()),
        }
    )


def build_defs_index(records_ds) -> dict:
    """Collect the (small) definitions vocabulary to the driver for broadcast.
    One entry per defined function/class — the small side of the linking join."""
    pairs_ds = records_ds.map_batches(_defines_pairs, batch_format="pyarrow")
    idx: dict[str, set] = {}
    for b in pairs_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for n, m in zip(b.column("name_key").to_pylist(), b.column("module").to_pylist()):
            idx.setdefault(n, set()).add(m)
    return idx


def _plain_keys(batch: pa.Table) -> pa.Table:
    """No-linking key computation (link_aliases=False path)."""
    a_key = [entity_key(x) for x in batch.column("a").to_pylist()]
    c_key = [entity_key(x) if k == "edge" else "" for x, k in zip(batch.column("c").to_pylist(), batch.column("kind").to_pylist())]
    return batch.append_column("a_key", pa.array(a_key, type=pa.string())).append_column("c_key", pa.array(c_key, type=pa.string()))


def resolved_records(records_ds, cfg: PipelineConfig = DEFAULT_CONFIG, defs_idx: dict | None = None):
    """Attach resolved entity keys. With linking on, the defs index is
    ray.put() once and fetched per actor (broadcast join, no shuffle)."""
    if not cfg.link_aliases:
        return records_ds.map_batches(_plain_keys, batch_format="pyarrow", batch_size=cfg.linker_batch_size)
    import ray

    ref = ray.put(defs_idx if defs_idx is not None else {})
    # cap the pool so it never reserves every cluster CPU — an actor pool that
    # owns the whole node starves the shuffle stages downstream and the
    # pipeline deadlocks under backpressure (observed at num_cpus=4)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    pool_max = max(1, min(cfg.linker_concurrency, cpus - 2))
    return records_ds.map_batches(
        AliasResolver,
        batch_format="pyarrow",
        batch_size=cfg.linker_batch_size,
        concurrency=(1, pool_max),
        fn_constructor_kwargs={"defs_ref": ref},
    )


def _filter_stop(ds, cfg: PipelineConfig):
    if not cfg.stop_entities:
        return ds
    stop = pa.array(list(cfg.stop_entities), type=pa.string())

    def f(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.or_(pc.is_in(b.column("a_key"), value_set=stop), pc.is_in(b.column("c_key"), value_set=stop)))
        return b.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


def nodes_table(resolved, cfg: PipelineConfig = DEFAULT_CONFIG, with_ids: bool = True):
    """Canonical entity table: groupby(entity_key) with packed-set partials,
    sorted, dense ids by rank (FIXTURES F4 nodes)."""
    parts = resolved.map_batches(node_partials, batch_format="pyarrow")
    merged = parts.groupby("entity_key").map_groups(merge_node_group, batch_format="pandas")
    merged = merged.sort("entity_key")
    if with_ids:
        merged = add_dense_index(merged, col="entity_id")
    return merged


def edges_table(resolved, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Deduplicated triple table with provenance, deterministically sorted."""
    parts = resolved.map_batches(edge_partials, batch_format="pyarrow")
    merged = parts.groupby(["src_key", "pred", "dst_key"]).map_groups(merge_edge_group, batch_format="pandas")
    return merged.sort(["src_key", "pred", "dst_key"])


def graph_tables(input_path: str, cfg: PipelineConfig = DEFAULT_CONFIG, which: str = "both"):
    """Lazy end-to-end: returns (nodes_ds, edges_ds); either may be None per ``which``."""
    records = records_dataset(input_path, cfg)
    defs_idx = build_defs_index(records_dataset(input_path, cfg)) if cfg.link_aliases else None
    resolved = _filter_stop(resolved_records(records, cfg, defs_idx), cfg)
    nodes = nodes_table(resolved, cfg) if which in ("both", "nodes") else None
    # re-derive for edges only when both are needed (a Dataset is consumed once per sink)
    if which == "both":
        resolved2 = _filter_stop(resolved_records(records_dataset(input_path, cfg), cfg, defs_idx), cfg)
        edges = edges_table(resolved2, cfg)
    elif which == "edges":
        edges = edges_table(resolved, cfg)
    else:
        edges = None
    return nodes, edges


# ---------------------------------------------------------------------------
# checkpointed job (resume semantics)
# ---------------------------------------------------------------------------


def _unpack_lists(batch: pa.Table) -> pa.Table:
    """packed strings -> real list<string> columns for the final sink."""
    out = batch
    for packed, name in (("types_packed", "types"), ("repos_packed", "repos")):
        if packed in batch.column_names:
            vals = [s.split("|") if s else [] for s in batch.column(packed).to_pylist()]
            out = out.drop_columns([packed]).append_column(name, pa.array(vals, type=pa.list_(pa.string())))
    return out


def run(input_path: str, out_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG, resume: bool = True) -> dict:
    """Checkpointed pipeline. Layout:

        <out_dir>/checkpoints/<config_hash>/records/        per-partition extraction
        <out_dir>/checkpoints/<config_hash>/_manifest/...   completion markers
        <out_dir>/nodes/, <out_dir>/edges/                  final graph tables

    Returns counters {parts_total, parts_skipped, parts_computed, nodes, edges}.
    """
    import ray.data as rd

    t0 = time.monotonic()
    store = CheckpointStore(f"{out_dir}/checkpoints", cfg.config_hash())
    done = store.done_parts("records") if resume else set()

    # which partitions exist in the input (pruned read of just the key columns)
    key_ds = rd.read_parquet(input_path, columns=["repo", "path"])
    all_parts: set[int] = set()
    for b in key_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for r, p in zip(b.column("repo").to_pylist(), b.column("path").to_pylist()):
            all_parts.add(part_of(r, p, cfg.num_partitions))
    pending = sorted(all_parts - done)

    rec_dir = store.stage_dir("records")
    if pending:
        # a killed run can leave data files for partitions whose manifest was
        # never written — clear them so recompute is an idempotent overwrite
        # (the reference's delete-then-insert, sqlite_support.py:492-531)
        import shutil

        for p in pending:
            shutil.rmtree(f"{rec_dir}/part_id={p}", ignore_errors=True)
        pend = pa.array(pending, type=pa.int64())
        ds = rd.read_parquet(input_path, columns=["repo", "path", "lang", "content"])
        ds = ds.map_batches(lambda b: _with_part(b, cfg.num_partitions), batch_format="pyarrow")
        ds = ds.map_batches(lambda b: b.filter(pc.is_in(b.column("part_id"), value_set=pend)), batch_format="pyarrow")
        ds = ds.map_batches(add_sha256, batch_format="pyarrow", batch_size=cfg.batch_size)
        ds = ds.map_batches(lambda b: chunk_files(b, cfg), batch_format="pyarrow", batch_size=cfg.batch_size)
        ds = ds.map_batches(extract_records, batch_format="pyarrow", batch_size=cfg.batch_size)
        ds = ds.map_batches(lambda b: _with_part(b, cfg.num_partitions), batch_format="pyarrow")
        ds.write_parquet(rec_dir, partition_cols=["part_id"])

        # lineage + counters per freshly-computed partition (cheap pruned re-read)
        cnt_ds = rd.read_parquet(rec_dir, columns=["part_id"])
        counts: dict[int, int] = {}
        for b in cnt_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            for p in b.column("part_id").to_pylist():
                counts[p] = counts.get(p, 0) + 1
        wall_ms = int((time.monotonic() - t0) * 1000)
        for p in pending:
            store.mark_done("records", p, rows=counts.get(p, 0), input_fingerprint=str(input_path), wall_ms=wall_ms)

    # wide stages read the checkpointed records
    import os
    import shutil

    if not pending and store.manifest("graph", 0) and os.path.isdir(f"{out_dir}/nodes") and os.path.isdir(f"{out_dir}/edges"):
        m = store.manifest("graph", 0)
        return {
            "parts_total": len(all_parts),
            "parts_skipped": len(all_parts),
            "parts_computed": 0,
            "nodes": m["nodes"],
            "edges": m["edges"],
        }
    for d in (f"{out_dir}/nodes", f"{out_dir}/edges"):
        shutil.rmtree(d, ignore_errors=True)

    def read_records():
        return rd.read_parquet(rec_dir)

    defs_idx = build_defs_index(read_records()) if cfg.link_aliases else None
    nodes = nodes_table(_filter_stop(resolved_records(read_records(), cfg, defs_idx), cfg), cfg)
    nodes = nodes.map_batches(_unpack_lists, batch_format="pyarrow")
    nodes.write_parquet(f"{out_dir}/nodes")
    edges = edges_table(_filter_stop(resolved_records(read_records(), cfg, defs_idx), cfg), cfg)
    edges = edges.map_batches(_unpack_lists, batch_format="pyarrow")
    edges.write_parquet(f"{out_dir}/edges")

    n_nodes = rd.read_parquet(f"{out_dir}/nodes").count()
    n_edges = rd.read_parquet(f"{out_dir}/edges").count()
    store.mark_done("graph", 0, nodes=n_nodes, edges=n_edges, wall_ms=int((time.monotonic() - t0) * 1000))
    return {
        "parts_total": len(all_parts),
        "parts_skipped": len(all_parts) - len(pending),
        "parts_computed": len(pending),
        "nodes": n_nodes,
        "edges": n_edges,
    }
