"""Edit-distance-1 fuzzy self-join via deletion neighborhoods (SymSpell-style).

Reference parity: the reference has no fuzzy matching; this belongs to the
beyond-reference training-data operator set (entity resolution / near-key
matching at corpus scale).

Scale shape: each input string ``s`` emits its DEDUPED deletion neighborhood
(``s`` itself plus the ``len(s)`` strings with one character removed) —
O(len+1) variant rows per input. ``ED(a, b) <= 1`` implies the two strings
share at least one variant (delete the edited position from the longer side,
or from both on a substitution), so ONE coarse-bucket hash exchange on a
64-bit hash of the variant brings every true pair into the same group. Shared-deletion
buckets also admit ED-2 false candidates; a global pair dedup plus an exact
ED<=1 verification filter removes them. Within-group pair generation is
bounded by ``max_bucket`` with the dropped-pair sentinel discipline of
``dedup._bucket_pairs`` (no silent caps). Strings RIDE ALONG with the
variant rows (one exchange, no post-join fetch) — right-sized for short keys
(names, tokens, codes, ids); for long strings flip to an id-only exchange +
hash-join fetch, the ``dedup.py`` signature-join pattern.
"""

from __future__ import annotations

import pyarrow as pa

# the exchange carries a 64-bit SipHash of each variant, not the variant
# string: equal variants hash equal (recall preserved), a hash collision only
# ADDS a candidate pair that the exact ED<=1 verify removes (~n^2/2^64 — nil),
# and the int64 key makes the exchange narrower and the per-bucket groupby a
# C-speed integer groupby instead of a string groupby
_VARIANT_SCHEMA = pa.schema([("v", pa.int64()), ("id", pa.int64()), ("s", pa.string())])
_CAND_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("a_s", pa.string()), ("b_s", pa.string())]
)
_OUT_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def deletion_variants(s: str) -> set:
    """The string itself plus every single-character deletion, deduped
    (zero-heavy or repetitive strings collapse many deletions into one)."""
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 in one O(len) scan (no DP table): skip the
    common prefix, then the tails must match either directly (substitution)
    or shifted by one (insert/delete)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > 1:
        return False
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    if la == lb:
        return a[i + 1 :] == b[i + 1 :]
    return a[i:] == b[i + 1 :]


def fuzzy_self_join_ed1(
    ds,
    text_col: str,
    id_col: str,
    num_buckets: int = 64,
    max_bucket: int = 200,
    stats: dict | None = None,
):
    """All id pairs ``(a < b)`` whose strings are within edit distance 1.

    Returns a Dataset with columns ``(a, b)`` (the id pairs), sorted.
    ``stats['fuzzy_pairs_dropped']`` (optional) receives the count of
    candidate pairs truncated by ``max_bucket`` on hot variants.
    """
    import pandas as pd

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, distinct_rows, with_bucket
    from text_to_graph_ray.util import compact_nonempty, sort_coalesced

    def variant_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        vs, vid, vstr = [], [], []
        for i, s in zip(ids, texts):
            s = s or ""
            for v in deletion_variants(s):
                vs.append(v)
                vid.append(i)
                vstr.append(s)
        # one vectorized SipHash pass (fixed key — deterministic across
        # processes and runs, the with_bucket hasher) over the variant strings
        vh = pd.util.hash_pandas_object(pd.Series(vs, dtype=object), index=False).to_numpy()
        return pa.table(
            {
                "v": pa.array(vh.view("int64"), type=pa.int64()),
                "id": pa.array(vid, type=pa.int64()),
                "s": pa.array(vstr, type=pa.string()),
            },
            schema=_VARIANT_SCHEMA,
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _CAND_SCHEMA.empty_table()
        # drop singleton variants VECTORIZED before the per-group Python loop:
        # almost every variant is globally unique, and iterating pandas groups
        # per singleton was the measured 32-cpu bottleneck (4M strings:
        # 47.3 s -> see NOTES.md)
        df = df[df.duplicated("v", keep=False)]
        if len(df) == 0:
            return _CAND_SCHEMA.empty_table()
        a_out, b_out, a_s, b_s = [], [], [], []
        dropped = 0
        for _, g in df.groupby("v", sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("id", kind="mergesort")
            m = len(g)
            if m > max_bucket:
                dropped += m * (m - 1) // 2 - max_bucket * (max_bucket - 1) // 2
                g = g.iloc[:max_bucket]
            ids = g["id"].to_numpy()
            strs = g["s"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(int(ids[i]))
                    b_out.append(int(ids[j]))
                    a_s.append(strs[i])
                    b_s.append(strs[j])
        if dropped:
            # one sentinel per coarse bucket (dedup.py discipline): unique key,
            # stripped + summed after the materialize — never silent
            a_out.append(-1 - int(df[BUCKET_COL].iloc[0]))
            b_out.append(dropped)
            a_s.append("")
            b_s.append("")
        return pa.table(
            {
                "a": pa.array(a_out, type=pa.int64()),
                "b": pa.array(b_out, type=pa.int64()),
                "a_s": pa.array(a_s, type=pa.string()),
                "b_s": pa.array(b_s, type=pa.string()),
            },
            schema=_CAND_SCHEMA,
        )

    variants = ds.map_batches(variant_rows, batch_format="pyarrow")
    cand = bucket_exchange(
        with_bucket(variants, "v", num_buckets, in_schema=_VARIANT_SCHEMA),
        per_bucket,
        _CAND_SCHEMA,
        num_buckets,
    )

    # strip truncation sentinels (a < 0) and surface the dropped-pair total
    import pyarrow.compute as pc

    sent = cand.map_batches(
        lambda t: t.filter(pc.less(t.column("a"), 0)), batch_format="pyarrow"
    ).take_all()
    dropped_total = int(sum(r["b"] for r in sent))
    if stats is not None:
        stats["fuzzy_pairs_dropped"] = dropped_total
    if dropped_total:
        print(
            f"WARNING: fuzzy_self_join_ed1 truncated {dropped_total} candidate pairs "
            f"across {len(sent)} hot variants (max_bucket={max_bucket}) — recall loss"
        )
        cand = compact_nonempty(
            cand.map_batches(
                lambda t: t.filter(pc.greater_equal(t.column("a"), 0)), batch_format="pyarrow"
            ).materialize()
        )

    # the same pair arises once per shared variant — global distinct before verify
    uniq = distinct_rows(cand, ["a", "b", "a_s", "b_s"], _CAND_SCHEMA, num_buckets)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        keep = pa.array(
            [ed_le1(x, y) for x, y in zip(t.column("a_s").to_pylist(), t.column("b_s").to_pylist())],
            type=pa.bool_(),
        )
        return t.filter(keep).select(["a", "b"])

    import ray.data as rd

    # pin the empty-result schema: Ray's map stage passes an all-empty block
    # through WITHOUT calling verify, so a no-pair corpus would otherwise
    # yield a schema-less Dataset (the bucket_exchange discipline)
    out = compact_nonempty(uniq.map_batches(verify, batch_format="pyarrow").materialize())
    if out.count() == 0:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    return sort_coalesced(out, ["a", "b"])


_VARIANT2_SCHEMA = pa.schema(
    [("v", pa.int64()), ("side", pa.int8()), ("id", pa.int64()), ("s", pa.string())]
)


def fuzzy_join_ed1(
    left,
    right,
    text_col: str,
    id_col: str,
    num_buckets: int = 64,
    max_bucket: int = 200,
    stats: dict | None = None,
):
    """Two-table ED<=1 fuzzy join (entity-resolution lookup): all pairs
    ``(a from left, b from right)`` whose strings are within edit distance 1.
    Same plan as ``fuzzy_self_join_ed1`` — hashed deletion-neighborhood
    exchange, ride-along strings, sentinel-counted hot-variant caps (each
    side capped at ``max_bucket``), global pair dedup, exact verify — but
    pair generation crosses SIDES only. Returns (a, b) sorted."""
    import numpy as np
    import pandas as pd

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, distinct_rows, with_bucket
    from text_to_graph_ray.util import compact_nonempty, sort_coalesced

    def variant_rows_for(side: int):
        def variant_rows(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_pylist()
            texts = t.column(text_col).to_pylist()
            vs, vid, vstr = [], [], []
            for i, s in zip(ids, texts):
                s = s or ""
                for v in deletion_variants(s):
                    vs.append(v)
                    vid.append(i)
                    vstr.append(s)
            vh = pd.util.hash_pandas_object(pd.Series(vs, dtype=object), index=False).to_numpy()
            return pa.table(
                {
                    "v": pa.array(vh.view("int64"), type=pa.int64()),
                    "side": pa.array(np.full(len(vid), side, dtype=np.int8)),
                    "id": pa.array(vid, type=pa.int64()),
                    "s": pa.array(vstr, type=pa.string()),
                },
                schema=_VARIANT2_SCHEMA,
            )

        return variant_rows

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _CAND_SCHEMA.empty_table()
        df = df[df.duplicated("v", keep=False)]
        if len(df) == 0:
            return _CAND_SCHEMA.empty_table()
        a_out, b_out, a_s, b_s = [], [], [], []
        dropped = 0
        for _, g in df.groupby("v", sort=False):
            ls = g[g["side"] == 0].sort_values("id", kind="mergesort")
            rs = g[g["side"] == 1].sort_values("id", kind="mergesort")
            if len(ls) == 0 or len(rs) == 0:
                continue
            if len(ls) > max_bucket or len(rs) > max_bucket:
                dropped += len(ls) * len(rs) - min(len(ls), max_bucket) * min(len(rs), max_bucket)
                ls, rs = ls.iloc[:max_bucket], rs.iloc[:max_bucket]
            for la, lsx in zip(ls["id"].to_numpy(), ls["s"].tolist()):
                for rb, rsx in zip(rs["id"].to_numpy(), rs["s"].tolist()):
                    a_out.append(int(la))
                    b_out.append(int(rb))
                    a_s.append(lsx)
                    b_s.append(rsx)
        if dropped:
            a_out.append(-1 - int(df[BUCKET_COL].iloc[0]))
            b_out.append(dropped)
            a_s.append("")
            b_s.append("")
        return pa.table(
            {
                "a": pa.array(a_out, type=pa.int64()),
                "b": pa.array(b_out, type=pa.int64()),
                "a_s": pa.array(a_s, type=pa.string()),
                "b_s": pa.array(b_s, type=pa.string()),
            },
            schema=_CAND_SCHEMA,
        )

    lv = left.map_batches(variant_rows_for(0), batch_format="pyarrow")
    rv = right.map_batches(variant_rows_for(1), batch_format="pyarrow")
    variants = lv.union(rv)
    cand = bucket_exchange(
        with_bucket(variants, "v", num_buckets, in_schema=_VARIANT2_SCHEMA),
        per_bucket,
        _CAND_SCHEMA,
        num_buckets,
    )

    import pyarrow.compute as pc
    import ray.data as rd

    sent = cand.map_batches(
        lambda t: t.filter(pc.less(t.column("a"), 0)), batch_format="pyarrow"
    ).take_all()
    dropped_total = int(sum(r["b"] for r in sent))
    if stats is not None:
        stats["fuzzy_pairs_dropped"] = dropped_total
    if dropped_total:
        print(
            f"WARNING: fuzzy_join_ed1 truncated {dropped_total} candidate pairs "
            f"across {len(sent)} hot variants (max_bucket={max_bucket}) — recall loss"
        )
        cand = compact_nonempty(
            cand.map_batches(
                lambda t: t.filter(pc.greater_equal(t.column("a"), 0)), batch_format="pyarrow"
            ).materialize()
        )

    uniq = distinct_rows(cand, ["a", "b", "a_s", "b_s"], _CAND_SCHEMA, num_buckets)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        keep = pa.array(
            [ed_le1(x, y) for x, y in zip(t.column("a_s").to_pylist(), t.column("b_s").to_pylist())],
            type=pa.bool_(),
        )
        return t.filter(keep).select(["a", "b"])

    out = compact_nonempty(uniq.map_batches(verify, batch_format="pyarrow").materialize())
    if out.count() == 0:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    return sort_coalesced(out, ["a", "b"])
