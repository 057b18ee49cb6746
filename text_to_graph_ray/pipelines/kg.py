"""The flagship KG-construction pipeline (SURVEY §3.4 lifecycle):

    read_parquet(repo_files)                     block-split, column-pruned
      -> map_batches(add_sha256)                 stateless tasks (fused chain)
      -> map_batches(chunk_files)                code-aware chunking
      -> map_batches(extract_records)            per-lang rules (+ def-site rows)
      -> map_batches(_plain_keys)                vectorized entity keys
      -> map_batches(combined_partials)          combiner: distinct rows/batch
      -> groupby(bucket).map_groups(merge)       ONE canonicalization shuffle
                                                 (nodes + edges + def sites)
      -> relink_merged                           sparse vocabulary-level alias
                                                 linking (MergedLinker actor
                                                 pool, broadcast defs index;
                                                 only affected rows re-merge)
      -> split + sort + dense ids                deterministic materialize
      -> write_parquet(nodes/, edges/)

Two entry shapes:
* ``graph_tables`` — lazy end-to-end for queries/tests (only the
  vocabulary-sized merged graph is materialized);
* ``run`` — the checkpointed job: extraction lands in per-partition parquet +
  manifests; interrupted runs resume via manifest anti-join without
  recomputing completed partitions.

Nothing here calls ray.init(); callers own the session.
"""

from __future__ import annotations

import time

import pyarrow as pa

from text_to_graph_ray.util import pa_from_pandas, read_parquet_clean
import pyarrow.compute as pc

from text_to_graph_ray.config import DEFAULT_CONFIG, PipelineConfig
from text_to_graph_ray.stages.canonicalize import (
    add_dense_index,
    combined_partials,
    merge_bucket,
    split_edges,
    split_nodes,
)
from text_to_graph_ray.stages.chunker import chunk_files
from text_to_graph_ray.stages.extract import extract_records
from text_to_graph_ray.stages.hashing import add_sha256

from text_to_graph_ray.state.checkpoint import CheckpointStore, part_of

INPUT_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def _input_blocks(input_path: str) -> int:
    """Read-task count: ~4 MB of parquet per block (extraction is the
    bottleneck at ~1.6 MB/s/core, so a block is a few seconds of work —
    small enough to load-balance, big enough to amortize task overhead).
    Ray's default sizing targets much larger blocks and would serialize small
    corpora onto one task; capped so huge inputs don't explode the task
    count."""
    import os

    total = 0
    if os.path.isdir(input_path):
        for root, _, names in os.walk(input_path):
            total += sum(os.path.getsize(os.path.join(root, n)) for n in names if n.endswith(".parquet"))
    elif os.path.exists(input_path):
        total = os.path.getsize(input_path)
    return max(16, min(1024, total // (4 << 20) or 16))


def extract_chain(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """sha -> chunk -> extract over a (repo, path, lang, content) dataset —
    the ONE extraction chain, shared by ``records_dataset`` (lazy queries) and
    ``run`` (checkpointed job) so config knobs like ``two_pass`` can never
    silently diverge between the two entry points."""
    ds = ds.map_batches(add_sha256, batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(lambda b: chunk_files(b, cfg), batch_format="pyarrow", batch_size=cfg.batch_size)
    if cfg.two_pass:
        # L1 mentions -> L2 triples gated on the mention set (reference "high
        # resolution" path, graph_generator.py:378-382). Fused in one call so
        # a chunk's records never split across the filter's batch boundary.
        from text_to_graph_ray.stages.extract import mention_consistency_filter

        ds = ds.map_batches(
            lambda b: mention_consistency_filter(extract_records(b)), batch_format="pyarrow", batch_size=cfg.batch_size
        )
    else:
        ds = ds.map_batches(extract_records, batch_format="pyarrow", batch_size=cfg.batch_size)
    return ds


def records_dataset(input_path: str, cfg: PipelineConfig = DEFAULT_CONFIG, with_part: bool = False):
    """read -> sha -> chunk -> extract. Column-pruned at the read."""
    import ray.data as rd

    ds = read_parquet_clean(
        input_path, columns=["repo", "path", "lang", "content"], override_num_blocks=_input_blocks(input_path)
    )
    ds = extract_chain(ds, cfg)
    if with_part:
        ds = ds.map_batches(lambda b: _with_part(b, cfg.num_partitions), batch_format="pyarrow")
    return ds


def _with_part(batch: pa.Table, num_partitions: int) -> pa.Table:
    parts = [part_of(r, p, num_partitions) for r, p in zip(batch.column("repo").to_pylist(), batch.column("path").to_pylist())]
    return batch.append_column("part_id", pa.array(parts, type=pa.int64()))


def _defines_pairs(batch: pa.Table) -> pa.Table:
    """(name_key, module) pairs for the defs index — vectorized, pre-deduped
    per batch."""
    from text_to_graph_ray.stages.linker import entity_key_array

    mask = pc.and_(pc.equal(batch.column("kind"), "edge"), pc.equal(batch.column("b"), "defines"))
    sel = batch.filter(mask)
    import pandas as pd

    df = pd.DataFrame(
        {
            "name_key": entity_key_array(sel.column("c")).to_pandas(),
            "module": sel.column("path").to_pandas().str.rsplit(".", n=1).str[0].str.replace("/", ".", regex=False),
        }
    ).drop_duplicates()
    return pa_from_pandas(df)


def build_defs_index(records_ds) -> dict:
    """Collect the (small) definitions vocabulary to the driver for broadcast.
    One entry per defined function/class — the small side of the linking join."""
    pairs_ds = records_ds.map_batches(_defines_pairs, batch_format="pyarrow")
    idx: dict[str, set] = {}
    for b in pairs_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for n, m in zip(b.column("name_key").to_pylist(), b.column("module").to_pylist()):
            idx.setdefault(n, set()).add(m)
    return idx


def defs_index_from_merged(merged) -> dict:
    """Same index, read off the merged graph's ``kind='d'`` rows — definition
    sites rode the canonicalization shuffle, so no second extraction pass."""
    from text_to_graph_ray.stages.linker import defs_dict_from_table

    return {k: set(v) for k, v in defs_dict_from_table(defs_table_from_merged(merged)).items()}


_DEFS_SCHEMA = pa.schema([("k1", pa.string()), ("k2", pa.string())])


def last_dot_segment(arr: pa.Array) -> pa.Array:
    """Vectorized ``key.rsplit('.', 1)[-1]`` (Arrow kernels only): reverse,
    split at the FIRST dot, take the head, reverse back."""
    rev = pc.utf8_reverse(arr)
    return pc.utf8_reverse(pc.list_element(pc.split_pattern(rev, ".", max_splits=1), 0))


def _dotted_keys_of(b: pa.Table) -> pa.Array:
    """Distinct dotted entity keys of one merged-graph block (k1 of every
    row + k3 of edge rows) — the only keys the alias rule can ever rewrite."""
    ks = [pc.unique(b.column("k1").combine_chunks())]
    k3 = b.filter(pc.equal(b.column("kind"), "e")).column("k3").combine_chunks()
    ks.append(pc.unique(k3))
    allk = pc.unique(pa.concat_arrays([k.cast(pa.string()) for k in ks]))
    return allk.filter(pc.match_substring(allk, "."))


def dotted_query_names(merged):
    """Per-block-distinct LAST SEGMENTS of the vocabulary's dotted keys
    (lazy Dataset; its row count upper-bounds the true distinct count).

    These are the only names ``resolve_alias`` can ever probe the defs index
    with — so the broadcast defs table can be pruned to exactly these names
    before it ever leaves the workers. On code-shaped corpora this collapses
    the broadcast from |all defined names| (~1 row per function in the corpus)
    to |distinct dotted call targets| — orders of magnitude smaller."""
    return merged.map_batches(
        lambda b: pa.table({"name": pc.unique(last_dot_segment(_dotted_keys_of(b)))}),
        batch_format="pyarrow",
    )


def defs_table_from_merged(merged, names: pa.Array | None = None):
    """The (name, module) def-site pairs as ONE deduped Arrow table.

    This is the BROADCAST representation: at 800k defs, collecting a Python
    dict cost 4.4 s on the driver + 2.3 s to ``ray.put`` (pickle) + ~2 s to
    deserialize PER linker actor — all width-insensitive wall that capped
    scaling efficiency. Arrow buffers collect via ``to_arrow_refs`` (no
    driver-side row loop), ``ray.put`` zero-copy, and map zero-copy into
    every actor; each actor builds its lookup dict once from the table.

    ``names`` (small, from :func:`dotted_query_names`) pushes a semi-join
    prune INTO the workers: only def rows whose name can actually be probed
    are collected at all."""
    import ray

    def defs_of(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("kind"), "d")).select(["k1", "k2"])
        if names is not None:
            t = t.filter(pc.is_in(t.column("k1"), value_set=names))
        return t.group_by(["k1", "k2"]).aggregate([])

    d = merged.map_batches(defs_of, batch_format="pyarrow")
    tbls = [t for t in ray.get(d.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return _DEFS_SCHEMA.empty_table()
    t = pa.concat_tables([t.select(["k1", "k2"]).cast(_DEFS_SCHEMA) for t in tbls])
    return t.group_by(["k1", "k2"]).aggregate([])  # cross-block dedup, C speed


def _plain_keys(batch: pa.Table) -> pa.Table:
    """No-linking key computation (link_aliases=False path) — vectorized."""
    from text_to_graph_ray.stages.linker import entity_key_array

    return batch.append_column("a_key", entity_key_array(batch.column("a"))).append_column(
        "c_key", entity_key_array(batch.column("c"))
    )


def keyed_records(records_ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Attach normalized entity keys (vectorized) + optional stop-entity
    filter. Alias linking happens LATER, on the merged vocabulary
    (relink_merged) — resolving per distinct entity instead of per mention."""
    return _filter_stop(records_ds.map_batches(_plain_keys, batch_format="pyarrow", batch_size=cfg.linker_batch_size), cfg)


def _drop_def_rows(merged):
    return merged.map_batches(
        lambda b: b.filter(pc.invert(pc.equal(b.column("kind"), "d"))), batch_format="pyarrow"
    )  # def-site rows are only needed to build the linking index


def _rebucket_fn(cfg: PipelineConfig):
    from text_to_graph_ray.stages.canonicalize import SEP, _stable_bucket

    def rebucket(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        is_n = df["kind"] == "n"
        key = df["k1"].where(is_n, df["k1"] + SEP + df["k2"] + SEP + df["k3"])
        df["bucket"] = _stable_bucket(key, cfg.num_partitions)
        return pa_from_pandas(df)

    return rebucket


def _remerge_all(rows, cfg: PipelineConfig):
    """Full distributed re-merge of (possibly re-keyed) merged-graph rows —
    one vocabulary-sized shuffle, no driver involvement."""
    from text_to_graph_ray.stages.canonicalize import merge_bucket_packed

    return (
        rows.map_batches(_rebucket_fn(cfg), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge_bucket_packed, batch_format="pandas")
        .materialize()
    )


def link_merged(merged, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Entity linking over the merged vocabulary. The defs index is the small
    side of a join — and it is pruned to the names the alias rule can actually
    probe (distinct last segments of dotted vocabulary keys) BEFORE it is
    sized: broadcast while the pruned table fits (<= cfg.defs_broadcast_max
    rows), else fall back to the shuffle-join path where the def-site table
    stays distributed. Both paths produce hash-identical graphs (asserted in
    tests/test_linker.py by forcing the threshold to 0)."""
    import ray

    # ONE pass over merged produces the per-block-distinct name blocks; their
    # row counts (fetched as O(#blocks) scalars, not data) gate the collect
    qrefs = dotted_query_names(merged).to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    from text_to_graph_ray.keys import close_reexports

    closed = close_reexports(dict(cfg.reexports)) if cfg.reexports else {}

    lens = ray.get([_nrows.remote(r) for r in qrefs])
    n_upper = sum(lens)
    if n_upper == 0 and not closed:
        # nothing the alias rule could rewrite: skip the linker pass entirely
        return _drop_def_rows(merged)
    if n_upper <= cfg.defs_broadcast_max:
        name_arrays = [
            t.column("name").combine_chunks().cast(pa.string()) for t, n in zip(ray.get(qrefs), lens) if n
        ]
        if closed:
            # the def-rule hop also fires on CLOSED RE-EXPORT TARGETS that are
            # still dotted — their names must survive the defs pruning
            extra = sorted({t.rsplit(".", 1)[1] for t in closed.values() if "." in t})
            if extra:
                name_arrays.append(pa.array(extra, type=pa.string()))
        names = pc.unique(pa.concat_arrays(name_arrays)) if name_arrays else pa.array([], type=pa.string())
        pruned = defs_table_from_merged(merged, names=names)
        if pruned.num_rows == 0 and not closed:
            # no dotted key has any candidate definition: identity relink
            return _drop_def_rows(merged)
        if pruned.num_rows <= cfg.defs_broadcast_max:
            return relink_merged(merged, pruned, cfg, reexports=closed)
    return relink_merged_distributed(merged, cfg, reexports=closed)


def relink_merged(merged, defs_idx: dict, cfg: PipelineConfig = DEFAULT_CONFIG, reexports: dict | None = None):
    """SPARSE entity-linking pass over the vocabulary-sized merged graph
    (broadcast defs index).

    Alias resolution only ever rewrites dotted keys onto their definition key,
    so after ``MergedLinker`` re-keys the vocabulary, the only rows that need
    a second exchange are (a) rows whose key changed and (b) rows whose key a
    changed row landed on. Those affected keys are collected — bounded by
    ``cfg.relink_collect_max``; above that the whole vocabulary re-merges
    distributedly instead (``_remerge_all``) — broadcast, and only the
    affected slice re-shuffles; the rest of the graph passes through
    untouched. The linker pass executes exactly once (materialized)."""
    import ray

    from text_to_graph_ray.stages.canonicalize import merge_bucket_packed
    from text_to_graph_ray.stages.linker import MergedLinker

    # Arrow defs table broadcasts zero-copy; a plain dict (tests, small
    # inputs) still works — actors normalize either form in __init__
    ref = ray.put(defs_idx if isinstance(defs_idx, pa.Table) else {k: tuple(sorted(v)) for k, v in defs_idx.items()})
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # auto = cpus - 2 (config.py contract): the vocabulary pass must widen
    # with the cluster or it becomes a constant-time stage that caps scaling;
    # the pool floor is elastic (1), so idle actors cost nothing on small
    # inputs and the per-actor defs-index fetch is paid only by actors that
    # actually spin up
    pool_max = max(1, cfg.linker_concurrency if cfg.linker_concurrency > 0 else cpus - 2)
    merged_nd = _drop_def_rows(merged)

    # the ONE linker execution; everything below derives from this
    linked = merged_nd.map_batches(
        MergedLinker,
        batch_format="pyarrow",
        concurrency=(1, pool_max),
        fn_constructor_kwargs={"defs_ref": ref, "reexports": reexports or None},
    ).materialize()
    changed_ds = linked.map_batches(
        lambda b: b.filter(b.column("changed")).select(["kind", "k1", "k2", "k3"]), batch_format="pyarrow"
    ).materialize()
    n_changed = changed_ds.count()
    if n_changed == 0:
        return merged_nd  # lazy filter over the already-materialized merged
    if n_changed > cfg.relink_collect_max:
        # heavily-aliased vocabulary: the sparse split would collect too much —
        # re-merge everything distributedly instead (still vocabulary-sized)
        return _remerge_all(
            linked.map_batches(lambda b: b.drop_columns(["changed"]), batch_format="pyarrow"), cfg
        )

    changed_rows = changed_ds.take_all()  # bounded by relink_collect_max
    node_keys = {r["k1"] for r in changed_rows if r["kind"] == "n"}
    triple_keys = {(r["k1"], r["k2"], r["k3"]) for r in changed_rows if r["kind"] == "e"}
    aff_ref = ray.put((node_keys, triple_keys))

    def affected_mask(b: pa.Table) -> pa.Array:
        nk, tk = ray.get(aff_ref)
        import pandas as pd

        df = b.select(["kind", "k1", "k2", "k3", "changed"]).to_pandas()
        is_n = df["kind"] == "n"
        hit = df["changed"] | (is_n & df["k1"].isin(nk))
        if tk:
            trip = list(zip(df["k1"], df["k2"], df["k3"]))
            hit = hit | (~is_n & pd.Series([t in tk for t in trip], index=df.index))
        return pa.array(hit.to_numpy())

    def take_affected(b: pa.Table) -> pa.Table:
        return b.filter(affected_mask(b)).drop_columns(["changed"])

    def take_passthrough(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.invert(affected_mask(b))).drop_columns(["changed"])

    remerged = (
        linked.map_batches(take_affected, batch_format="pyarrow")
        .map_batches(_rebucket_fn(cfg), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge_bucket_packed, batch_format="pandas")
    )
    passthrough = linked.map_batches(take_passthrough, batch_format="pyarrow")
    return passthrough.union(remerged).materialize()


def relink_merged_distributed(merged, cfg: PipelineConfig = DEFAULT_CONFIG, reexports: dict | None = None):
    """Shuffle-join linking fallback: for defs vocabularies too large to
    broadcast, the def-site table NEVER leaves the object store.

    (1) def-site rows (name, module) and dotted vocabulary keys
        (name, prefix, full key) meet in one ``groupby(name)`` exchange where
        the alias rule (keys.resolve_alias: unique defining module whose path
        ends with the dotted prefix at a dot boundary) emits rewrite rows
        (old_key -> new_key);
    (2) the rewrite table hash-joins back onto the graph rows (k1 for all
        rows, k3 for edges) — Ray Data native shuffle joins;
    (3) re-keyed rows re-merge distributedly (``_remerge_all``).

    ``reexports`` (the CLOSED user alias map, vocabulary-small by contract)
    composes here too: re-export source keys are excluded from the exchange
    (the declared mapping wins) and their rewrites — including the def-rule
    hop on still-dotted targets, resolved against a name-pruned def-site
    collect bounded by the map size — are unioned into the rewrite table.

    Output is hash-identical to the broadcast path."""
    import pandas as pd

    merged_nd = _drop_def_rows(merged)
    reexports = reexports or {}
    rx_sources = pa.array(sorted(reexports), type=pa.string()) if reexports else None

    defs = merged.map_batches(
        lambda b: (
            lambda t: pa.table(
                {
                    "name": t.column("k1"),
                    "module": t.column("k2"),
                    "qkey": pa.array([""] * t.num_rows, type=pa.string()),
                    "src": pa.array(["d"] * t.num_rows, type=pa.string()),
                }
            )
        )(b.filter(pc.equal(b.column("kind"), "d"))),
        batch_format="pyarrow",
    )

    def dotted_rows(b: pa.Table) -> pa.Table:
        # vectorized: distinct dotted keys -> (last segment, prefix) pairs
        keys = _dotted_keys_of(b)
        if rx_sources is not None:
            # re-export sources resolve via the declared map (below), not the def rule
            keys = keys.filter(pc.invert(pc.is_in(keys, value_set=rx_sources)))
        keys = keys.take(pc.array_sort_indices(keys))
        names = last_dot_segment(keys)
        rev_tail = pc.list_element(pc.split_pattern(pc.utf8_reverse(keys), ".", max_splits=1), 1)
        prefixes = pc.utf8_reverse(rev_tail)
        return pa.table(
            {
                "name": names.cast(pa.string()),
                "module": prefixes.cast(pa.string()),
                "qkey": keys.cast(pa.string()),
                "src": pa.array(["q"] * len(keys), type=pa.string()),
            }
        )

    queries = merged_nd.map_batches(dotted_rows, batch_format="pyarrow")

    def resolve_group(g: pd.DataFrame) -> pa.Table:
        mods = set(g.loc[g["src"] == "d", "module"])
        out_old, out_new = [], []
        if mods:
            q = g[g["src"] == "q"][["module", "qkey", "name"]].drop_duplicates()
            for prefix, key, name in zip(q["module"], q["qkey"], q["name"]):
                matches = {m for m in mods if m == prefix or m.endswith("." + prefix)}
                if len(matches) == 1:
                    out_old.append(key)
                    out_new.append(name)
        # fixed Arrow schema so all-empty groups can't destabilize downstream blocks
        return pa.table({"old_key": pa.array(out_old, type=pa.string()), "new_key": pa.array(out_new, type=pa.string())})

    from text_to_graph_ray.util import compact_nonempty

    rewrites = compact_nonempty(
        defs.union(queries).groupby("name").map_groups(resolve_group, batch_format="pandas").materialize()
    )

    if reexports:
        # rewrites for the re-export sources: closed hop + def-rule hop on
        # still-dotted targets, against a def collect pruned to the handful
        # of target names (bounded by the declared map, not the corpus)
        import ray.data as rd

        from text_to_graph_ray.keys import resolve_alias

        wanted = sorted({t.rsplit(".", 1)[1] for t in reexports.values() if "." in t})
        small_idx: dict[str, set] = {}
        if wanted:
            wset = pa.array(wanted, type=pa.string())
            drows = merged.map_batches(
                lambda b: (lambda t: t.filter(pc.is_in(t.column("k1"), value_set=wset)).select(["k1", "k2"]))(
                    b.filter(pc.equal(b.column("kind"), "d"))
                ),
                batch_format="pyarrow",
            ).take_all()
            for r in drows:
                small_idx.setdefault(r["k1"], set()).add(r["k2"])
        rx_old, rx_new = [], []
        for src in sorted(reexports):
            tgt = reexports[src]
            hop = resolve_alias(tgt, small_idx) if "." in tgt else None
            final = hop if hop is not None else tgt
            if final != src:
                rx_old.append(src)
                rx_new.append(final)
        if rx_old:
            rx_tbl = rd.from_arrow(
                pa.table(
                    {
                        "old_key": pa.array(rx_old, type=pa.string()),
                        "new_key": pa.array(rx_new, type=pa.string()),
                    }
                )
            )
            # compact again: an all-empty exchange result would otherwise
            # contribute schema-less blocks and break the downstream joins
            rewrites = compact_nonempty(rewrites.union(rx_tbl).materialize())

    if rewrites.count() == 0:
        return merged_nd

    rw1 = rewrites.map_batches(
        lambda b: pa.table({"k1": b.column("old_key"), "__new_k1": b.column("new_key")}), batch_format="pyarrow"
    )
    rw3 = rewrites.map_batches(
        lambda b: pa.table({"k3": b.column("old_key"), "__new_k3": b.column("new_key")}), batch_format="pyarrow"
    )
    from text_to_graph_ray.functions.dedup import join_partitions_for

    n_parts = join_partitions_for(cfg.num_partitions)
    hint = 32 << 20
    j = merged_nd.join(rw1, join_type="left_outer", num_partitions=n_parts, on=("k1",), partition_size_hint=hint)
    j = j.join(rw3, join_type="left_outer", num_partitions=n_parts, on=("k3",), partition_size_hint=hint)

    def apply_rewrites(b: pa.Table) -> pa.Table:
        k1 = pc.if_else(pc.is_valid(b.column("__new_k1")), b.column("__new_k1"), b.column("k1"))
        is_edge = pc.equal(b.column("kind"), "e")
        k3_new_ok = pc.and_(is_edge, pc.is_valid(b.column("__new_k3")))
        k3 = pc.if_else(k3_new_ok, b.column("__new_k3"), b.column("k3"))
        out = b.set_column(b.schema.get_field_index("k1"), "k1", k1)
        out = out.set_column(out.schema.get_field_index("k3"), "k3", k3)
        return out.drop_columns(["__new_k1", "__new_k3"])

    return _remerge_all(j.map_batches(apply_rewrites, batch_format="pyarrow"), cfg)


def _filter_stop(ds, cfg: PipelineConfig):
    if not cfg.stop_entities:
        return ds
    stop = pa.array(list(cfg.stop_entities), type=pa.string())

    def f(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.or_(pc.is_in(b.column("a_key"), value_set=stop), pc.is_in(b.column("c_key"), value_set=stop)))
        return b.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


def merged_graph(resolved, cfg: PipelineConfig = DEFAULT_CONFIG):
    """The canonicalization shuffle: node mentions and edges travel together
    (kind column), combiner-reduced per batch, merged per hash bucket.
    Returns the (vocabulary-sized) merged dataset, materialized so nodes and
    edges can both be split from it without re-running extraction.

    ``cfg.salted_canonicalize`` switches to the SALTED TWO-PHASE plan for
    corpora with pathological hot entities (one key in a large fraction of
    all batches — think ``utils.py`` at 10^12 files): phase A merges
    (key, salt-of-value) groups with the ordinary ``merge_bucket`` so the hot
    key's set-union work spreads over up to ``cfg.salt_buckets`` tasks, and
    phase B (``_remerge_all`` — the same machinery the link path uses)
    unions the per-salt packed partials in one unsalted vocabulary-sized
    exchange. Value-identical to the single-phase plan (equivalence + skew
    tests in test_round4); costs one extra vocabulary-sized exchange, which
    is why it is opt-in rather than the default."""
    salt = cfg.salt_buckets if cfg.salted_canonicalize else 1
    parts = resolved.map_batches(
        lambda b: combined_partials(b, cfg.num_partitions, salt=salt),
        batch_format="pyarrow",
        batch_size=cfg.linker_batch_size,
    )
    merged = parts.groupby("bucket").map_groups(merge_bucket, batch_format="pandas")
    if salt > 1:
        return _remerge_all(merged, cfg)
    return merged.materialize()


def nodes_from_merged(merged, with_ids: bool = True):
    nodes = merged.map_batches(split_nodes, batch_format="pyarrow").sort("entity_key")
    if with_ids:
        nodes = add_dense_index(nodes, col="entity_id")
    return nodes


def edges_from_merged(merged):
    return merged.map_batches(split_edges, batch_format="pyarrow").sort(["src_key", "pred", "dst_key"])


def graph_tables(input_path: str, cfg: PipelineConfig = DEFAULT_CONFIG, which: str = "both"):
    """End-to-end: returns (nodes_ds, edges_ds); either may be None per
    ``which``. The record stream is consumed once for the combined
    canonicalization shuffle (plus once for the defs index when linking);
    only the vocabulary-sized merged graph is ever materialized. For
    disk-backed reuse/resume at scale, use ``run`` instead."""
    merged = merged_graph(keyed_records(records_dataset(input_path, cfg), cfg), cfg)
    if cfg.link_aliases:
        merged = link_merged(merged, cfg)
    nodes = nodes_from_merged(merged) if which in ("both", "nodes") else None
    edges = edges_from_merged(merged) if which in ("both", "edges") else None
    return nodes, edges


def scored_fallback_links(
    edges_ds,
    nodes_ds,
    threshold: float = 0.35,
    dim: int = 1024,
    concurrency: int = 4,
    vocab_broadcast_max: int = 200_000,
    shard_rows: int = 8192,
    mention_chunk_rows: int = 1_000_000,
):
    """Near-miss entity-link candidates via deterministic char-trigram cosine
    (reference analogue: the LLM re-query for unresolved mentions,
    /root/reference/graph_extractor/src/graph_generator.py:378-382).

    * vocabulary = plain (undotted) canonical entity keys;
    * mentions = DISTINCT module-qualified dotted endpoint keys that alias
      linking left unresolved ('.' in key, no '/': files keep their extension
      dot but are paths);
    * result = per mention, the best-scoring vocabulary word with raw cosine
      >= ``threshold`` (ties -> lexicographically smallest word), score
      rounded to 6 dp, sorted by mention.

    Two plans, guard sized like every other small-side collect in this repo
    (defs_broadcast_max / BROADCAST_JOIN_MAX_ROWS discipline):

    **Broadcast** (distinct vocabulary <= ``vocab_broadcast_max``): vocab
    collected once, ``ray.put``, each ScoredLinkStage actor builds the dense
    ``|vocab| x dim`` float64 matrix in ``__init__`` and scores mention
    batches with one matmul. The matrix is 8·dim bytes/word (8 KB at
    dim=1024), so the default guard caps it at ~1.6 GB per actor.

    **Distributed** (above the guard): the vocabulary STAYS a Dataset. The
    mention side — the small side here: distinct unresolved dotted keys — is
    turned into a trigram matrix once and broadcast zero-copy; vocabulary
    shards of ``shard_rows`` words are scored independently by stateless
    tasks (``score_vocab_shard``), each emitting at most one
    sub-threshold-pruned best row per mention, and a distributed
    ``topk_per_group(k=1)`` merge takes the global max (tie -> smallest
    word). Exact: the global best is the max of shard bests. Mentions beyond
    ``mention_chunk_rows`` are processed in chunks (bounding the broadcast
    matrix at ~8·dim·chunk bytes) and unioned — chunks partition mentions, so
    no cross-chunk merge is needed. Exchange bound: <= one candidate row per
    (mention, shard) that clears the threshold; for a pathological vocabulary
    where that explodes, the LSH-bucketed path in ``functions/ann.py`` is the
    documented escalation.

    Both plans are value-identical (threshold-0 equivalence test in
    tests/test_round4.py, mirroring test_distributed_linking_matches_broadcast)."""
    import ray

    from ray.data.aggregate import Count

    from text_to_graph_ray.stages.linker import ScoredLinkStage

    def plain_keys(b: pa.Table) -> pa.Table:
        keys = {k for k in b.column("entity_key").to_pylist() if "." not in k}
        return pa.table({"k": pa.array(sorted(keys), type=pa.string())})

    from text_to_graph_ray.functions.agg import distinct_rows
    from text_to_graph_ray.util import compact_nonempty

    vocab_schema = pa.schema([("k", pa.string())])
    vocab_ds = compact_nonempty(
        distinct_rows(
            nodes_ds.map_batches(plain_keys, batch_format="pyarrow"), ["k"], out_schema=vocab_schema
        ).materialize()
    )
    n_vocab = vocab_ds.count()

    def dotted_mentions(b: pa.Table) -> pa.Table:
        seen = set()
        for col in ("src_key", "dst_key"):
            for k in b.column(col).to_pylist():
                if "." in k and "/" not in k:
                    seen.add(k)
        return pa.table({"mention": pa.array(sorted(seen), type=pa.string())})

    mentions = (
        edges_ds.map_batches(dotted_mentions, batch_format="pyarrow")
        .groupby("mention")
        .aggregate(Count(alias_name="__n"))
        .map_batches(lambda b: b.select(["mention"]), batch_format="pyarrow")
    )

    if n_vocab <= vocab_broadcast_max or n_vocab == 0:
        vocab = sorted(vocab_ds.unique("k"))
        vocab_ref = ray.put(vocab)
        scored = mentions.map_batches(
            ScoredLinkStage,
            batch_format="pyarrow",
            concurrency=(1, concurrency),
            fn_constructor_kwargs={"vocab_ref": vocab_ref, "threshold": threshold, "dim": dim},
        )
        return _sorted_or_empty_scored(scored)

    return _scored_links_distributed(vocab_ds, mentions, threshold, dim, shard_rows, mention_chunk_rows)


def _sorted_or_empty_scored(scored):
    """Sort by mention, keeping the (mention, matched, score) schema when the
    result is empty (an all-empty-blocks dataset is schema-less in Ray — the
    fused map chain passes empty input blocks through UDF-less)."""
    import ray.data as rd

    from text_to_graph_ray.stages.linker import SCORE_SHARD_SCHEMA
    from text_to_graph_ray.util import compact_nonempty

    mat = compact_nonempty(scored.materialize())
    if mat.count() == 0:
        return rd.from_arrow(SCORE_SHARD_SCHEMA.empty_table())
    return mat.sort("mention")


def _scored_links_distributed(vocab_ds, mentions_ds, threshold, dim, shard_rows, mention_chunk_rows):
    """The above-the-guard plan: mention trigram matrix broadcast zero-copy,
    vocabulary sharded across stateless tasks, distributed top-1 merge."""
    import ray
    import ray.data as rd

    from text_to_graph_ray.functions.agg import topk_per_group
    from text_to_graph_ray.stages.linker import SCORE_SHARD_SCHEMA, score_vocab_shard, trigram_matrix

    # mention chunks: sorted for determinism; each chunk's trigram matrix is
    # built once on the driver (the same per-word cost the broadcast plan
    # pays per actor) and ray.put so every task on a node reads the one
    # plasma copy. The mention strings are the small side by construction
    # (distinct unresolved dotted keys); only their dense matrix needed the
    # chunk bound.
    words: list[str] = []
    for mb in mentions_ds.sort("mention").iter_batches(batch_format="pyarrow"):
        words.extend(mb.column("mention").to_pylist())

    chunk_dses = []
    for s0 in range(0, len(words), mention_chunk_rows):
        chunk = words[s0 : s0 + mention_chunk_rows]
        q_ref = ray.put(trigram_matrix(chunk, dim))
        m_ref = ray.put(chunk)
        chunk_dses.append(
            vocab_ds.map_batches(
                score_vocab_shard,
                batch_format="pyarrow",
                batch_size=shard_rows,
                fn_kwargs={"q_ref": q_ref, "mentions_ref": m_ref, "threshold": threshold, "dim": dim},
            )
        )

    if not chunk_dses:
        return rd.from_arrow(SCORE_SHARD_SCHEMA.empty_table())
    cands = chunk_dses[0]
    for extra in chunk_dses[1:]:
        cands = cands.union(extra)
    best = topk_per_group(
        cands, ["mention"], order_col="score", k=1, descending=True, tiebreak="matched", out_schema=SCORE_SHARD_SCHEMA
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return SCORE_SHARD_SCHEMA.empty_table()
        score = pa.array([round(s, 6) for s in b.column("score").to_pylist()], type=pa.float64())
        return b.select(["mention", "matched"]).append_column("score", score)

    return _sorted_or_empty_scored(best.map_batches(finish, batch_format="pyarrow"))


def degree_topk(edges_ds, k: int = 20):
    """Graph analytics over the edges table: total degree (in+out) per
    entity, top-k with deterministic (degree desc, key asc) ranking.
    Combiner-first: per-batch local degree counts, one vocabulary-sized
    groupby-sum, sort+limit."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column("src_key").to_pylist() + b.column("dst_key").to_pylist()
        s = pd.Series(keys).value_counts()
        return pa.table(
            {
                "entity_key": pa.array(s.index.tolist(), type=pa.string()),
                "n": pa.array(s.to_numpy(dtype="int64"), type=pa.int64()),
            }
        )

    agg = edges_ds.map_batches(partial, batch_format="pyarrow").groupby("entity_key").aggregate(
        Sum("n", alias_name="degree")
    )

    def fix(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity_key": b.column("entity_key"),
                "degree": pc.cast(b.column("degree"), pa.int64()),
            }
        )

    return agg.map_batches(fix, batch_format="pyarrow").sort(["degree", "entity_key"], descending=[True, False]).limit(k)


def component_sizes_topk(edges_ds, k: int = 20):
    """Weakly-connected components of the entity graph (shared
    functions.graph.connected_components operator over string keys) ->
    top-k component sizes with deterministic (size desc, representative asc)
    ranking."""
    from ray.data.aggregate import Count

    from text_to_graph_ray.functions.graph import connected_components

    pairs = edges_ds.map_batches(
        lambda b: pa.table({"a": b.column("src_key"), "b": b.column("dst_key")}), batch_format="pyarrow"
    )
    comp = connected_components(pairs)
    agg = comp.groupby("component").aggregate(Count(alias_name="size"))

    def fix(b: pa.Table) -> pa.Table:
        return pa.table({"component": b.column("component"), "size": pc.cast(b.column("size"), pa.int64())})

    return agg.map_batches(fix, batch_format="pyarrow").sort(["size", "component"], descending=[True, False]).limit(k)


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


def run(
    input_path: str,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    gc_keep_configs: int | None = 3,
) -> dict:
    """Checkpointed pipeline. Layout:

        <out_dir>/checkpoints/<config_hash>/records/        per-partition extraction
        <out_dir>/checkpoints/<config_hash>/_manifest/...   completion markers
        <out_dir>/nodes/, <out_dir>/edges/                  final graph tables

    On open, checkpoint trees for all but the ``gc_keep_configs``
    most-recently-used config hashes are dropped (None disables), and a
    completed run compacts its per-partition manifest rows into one snapshot
    — both keep a long-lived checkpoint root bounded on a 100-TB run that
    iterates on config.

    Returns counters {parts_total, parts_skipped, parts_computed, nodes, edges}.
    """
    import ray.data as rd

    from text_to_graph_ray.state.checkpoint import gc_config_roots, input_fingerprint

    t0 = time.monotonic()
    store = CheckpointStore(f"{out_dir}/checkpoints", cfg.config_hash())
    if gc_keep_configs is not None:
        gc_config_roots(f"{out_dir}/checkpoints", keep_last=gc_keep_configs, current=cfg.config_hash())
    fp = input_fingerprint(input_path)
    if resume:
        existing = store.counters("records")
        if any(m is None or m.get("input_fingerprint") != fp for m in existing.values()):
            # input changed since (part of) the checkpoint was written: stale
            # data files could alias partitions that no longer exist — wipe
            # the stage rather than trust any of it
            store.clear_stage("records")
            done: set[int] = set()
        else:
            done = set(existing)
    else:
        done = set()

    # which partitions exist in the input: distributed — per-batch distinct
    # part_ids, then one tiny groupby; only <= num_partitions rows ever reach
    # the driver (at 10^12 input rows the old iter_batches loop was the first
    # thing to die)
    key_ds = read_parquet_clean(input_path, columns=["repo", "path"])

    def batch_parts(b: pa.Table, n=cfg.num_partitions) -> pa.Table:
        seen = {part_of(r, p, n) for r, p in zip(b.column("repo").to_pylist(), b.column("path").to_pylist())}
        return pa.table({"part_id": pa.array(sorted(seen), type=pa.int64())})

    all_parts: set[int] = set(key_ds.map_batches(batch_parts, batch_format="pyarrow").unique("part_id"))
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
        ds = read_parquet_clean(input_path, columns=["repo", "path", "lang", "content"])
        ds = ds.map_batches(lambda b: _with_part(b, cfg.num_partitions), batch_format="pyarrow")
        ds = ds.map_batches(lambda b: b.filter(pc.is_in(b.column("part_id"), value_set=pend)), batch_format="pyarrow")
        ds = extract_chain(ds, cfg)  # the same chain as records_dataset — two_pass etc. honored
        ds = ds.map_batches(lambda b: _with_part(b, cfg.num_partitions), batch_format="pyarrow")
        ds.write_parquet(rec_dir, partition_cols=["part_id"])

        # lineage + counters per freshly-computed partition: distributed
        # groupby-count over the pruned re-read; <= num_partitions rows collected
        from ray.data.aggregate import Count

        cnt_tbl = (
            read_parquet_clean(rec_dir, columns=["part_id"]).groupby("part_id").aggregate(Count(alias_name="n")).take_all()
        )
        counts: dict[int, int] = {int(r["part_id"]): int(r["n"]) for r in cnt_tbl}
        wall_ms = int((time.monotonic() - t0) * 1000)
        for p in pending:
            store.mark_done("records", p, rows=counts.get(p, 0), input_fingerprint=fp, wall_ms=wall_ms)

    # wide stages read the checkpointed records
    import os
    import shutil

    gm = store.manifest("graph", 0)
    if (
        not pending
        and gm
        and gm.get("input_fingerprint") == fp
        and os.path.isdir(f"{out_dir}/nodes")
        and os.path.isdir(f"{out_dir}/edges")
    ):
        m = gm
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
        return read_parquet_clean(rec_dir)

    # second checkpoint level: the (vocabulary-sized) merged+linked graph.
    # A run that died between canonicalization and the final sink resumes
    # here without re-reading the records or re-running the shuffle.
    merged_dir = store.stage_dir("merged")
    mm = store.manifest("merged", 0)
    if not pending and mm and mm.get("input_fingerprint") == fp and any(os.scandir(merged_dir)):
        merged = read_parquet_clean(merged_dir)
    else:
        store.clear_stage("merged")
        merged = merged_graph(keyed_records(read_records(), cfg), cfg)
        if cfg.link_aliases:
            merged = link_merged(merged, cfg)
        merged.write_parquet(store.stage_dir("merged"))
        merged = read_parquet_clean(store.stage_dir("merged"))
        store.mark_done("merged", 0, rows=merged.count(), input_fingerprint=fp)
    nodes = nodes_from_merged(merged).map_batches(_unpack_lists, batch_format="pyarrow")
    nodes.write_parquet(f"{out_dir}/nodes")
    edges = edges_from_merged(merged).map_batches(_unpack_lists, batch_format="pyarrow")
    edges.write_parquet(f"{out_dir}/edges")

    n_nodes = read_parquet_clean(f"{out_dir}/nodes").count()
    n_edges = read_parquet_clean(f"{out_dir}/edges").count()
    store.mark_done(
        "graph", 0, nodes=n_nodes, edges=n_edges, input_fingerprint=fp, wall_ms=int((time.monotonic() - t0) * 1000)
    )
    # run completed: fold per-partition manifest rows into one snapshot so
    # the manifest dir stays O(1) files across arbitrarily many run/resume
    # cycles (resume reads the snapshot + any newer individual rows)
    store.compact()
    return {
        "parts_total": len(all_parts),
        "parts_skipped": len(all_parts) - len(pending),
        "parts_computed": len(pending),
        "nodes": n_nodes,
        "edges": n_edges,
    }


def merge_increment(
    merged_parts: list,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    delta: bool = False,
    delta_keys_max: int = 2_000_000,
):
    """Incremental KG maintenance: union ALREADY-MERGED (packed) graph
    increments — e.g. yesterday's persisted merged graph plus today's
    new-files increment — and re-merge in ONE vocabulary-sized exchange
    (``_remerge_all`` / ``merge_bucket_packed`` set-union semantics; the
    same machinery the salted phase-B and link paths use).

    Correctness: every merge rule is ASSOCIATIVE over set union — types /
    repos / edge provenance are pure unions, the canonical label is
    min-own-else-min (min distributes over union, and the own-filter
    commutes with it: the per-increment winner is own iff any own label
    exists in that increment) — so merge(A) ⊕ merge(B) == merge(A ∪ B) for
    ANY partition of the corpus into increments. The driver query
    kg_nodes_incremental hash-checks this against the full-rebuild oracle.

    Linking (``cfg.link_aliases``) runs AFTER the final merge: defs
    discovered in one increment must rewrite mentions extracted in another,
    so per-increment builds pass ``link_aliases=False`` and the combined
    graph links once here.

    ``delta=True`` scopes the re-merge exchange to the increment
    (VERDICT r4 #6): ``merged_parts[0]`` is treated as the BASE — an
    already-merged graph in which every merge identity ("n": k1; "e"/"d":
    (k1,k2,k3)) has exactly one row, which is what merged_graph /
    _remerge_all / a previous merge_increment produce — and only base rows
    whose identity appears in the increments join the bucket exchange;
    the rest stream through untouched (associativity: their merge groups
    have no increment member, so their merged row is already final). The
    increment identity set is collected under a loud guard
    (``delta_keys_max`` distinct upper-bound rows); past it, or with fewer
    than two parts, the full vocabulary-sized plan runs — both plans are
    hash-identical (equivalence-tested at delta_keys_max=0)."""
    import ray

    if delta and len(merged_parts) >= 2:
        base = merged_parts[0]
        inc = merged_parts[1]
        for p in merged_parts[2:]:
            inc = inc.union(p)
        inc = inc.materialize()  # increments are small by premise; scanned twice below

        def identity(b: pa.Table) -> pa.Array:
            is_n = pc.equal(b.column("kind"), "n")
            full = pc.binary_join_element_wise(
                b.column("kind"), b.column("k1"), b.column("k2"), b.column("k3"), "\x00"
            )
            node = pc.binary_join_element_wise(b.column("kind"), b.column("k1"), "\x00")
            return pc.if_else(is_n, node, full).cast(pa.string())

        # per-block-distinct identity blocks; O(#blocks) row counts gate the collect
        krefs = inc.map_batches(
            lambda b: pa.table({"ik": pc.unique(identity(b))}), batch_format="pyarrow"
        ).to_arrow_refs()

        @ray.remote
        def _nrows(t: pa.Table) -> int:
            return t.num_rows

        if sum(ray.get([_nrows.remote(r) for r in krefs])) <= delta_keys_max:
            arrays = [t.column("ik").combine_chunks().cast(pa.string()) for t in ray.get(krefs) if t.num_rows]
            keys = pc.unique(pa.concat_arrays(arrays)) if arrays else pa.array([], type=pa.string())
            kref = ray.put(keys)

            def split(b: pa.Table, want_touched: bool) -> pa.Table:
                hit = pc.is_in(identity(b), value_set=ray.get(kref))
                return b.filter(hit if want_touched else pc.invert(hit))

            touched = base.map_batches(lambda b: split(b, True), batch_format="pyarrow")
            untouched = base.map_batches(lambda b: split(b, False), batch_format="pyarrow")
            merged = untouched.union(_remerge_all(touched.union(inc), cfg)).materialize()
            if cfg.link_aliases:
                merged = link_merged(merged, cfg)
            return merged
        # guard tripped: fall through to the full re-merge below

    out = merged_parts[0]
    for p in merged_parts[1:]:
        out = out.union(p)
    merged = _remerge_all(out, cfg)
    if cfg.link_aliases:
        merged = link_merged(merged, cfg)
    return merged
