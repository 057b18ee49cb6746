"""General analytics pipelines over the test tables — demonstrates the engine's
relational operator surface (filter/project at the read, combiner-first
aggregation, broadcast join, sort/limit, windowed aggregate over an event log)
with DuckDB-oracle-checkable results.

Float discipline: every float aggregate is rounded (2-6 dp) identically in the
SQL oracle so association-order noise never flips a value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from text_to_graph_ray.util import pa_from_pandas, read_parquet_clean
import pyarrow.compute as pc


def _round_cols(df: pd.DataFrame, spec: dict) -> pd.DataFrame:
    for c, nd in spec.items():
        df[c] = df[c].round(nd)
    return df


def pricing_summary(sf_dir: str, cutoff: str = "1996-01-01"):
    """TPC-H-Q1-shaped: filtered lineitem -> per-(returnflag, linestatus)
    sums/avgs/count. Partial aggregation inside map_batches (one row per group
    per batch) then a tiny final groupby — the canonical combiner pattern."""
    import ray.data as rd

    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=cols)
    cut = np.datetime64(cutoff)

    # one fixed schema from BOTH partial arms: schema drift between the
    # empty and non-empty arms makes Ray's streaming executor re-derive
    # RefBundle schemas mid-stream (warning noise today, silent null-filled
    # columns after an upgrade)
    partial_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("s_qty", pa.float64()),
            ("s_price", pa.float64()),
            ("s_disc", pa.float64()),
            ("n", pa.float64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["l_shipdate"] < cut]
        if df.empty:
            return partial_schema.empty_table()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            s_qty=("l_quantity", "sum"),
            s_price=("l_extendedprice", "sum"),
            s_disc=("l_discount", "sum"),
            n=("l_quantity", "size"),
        )
        return pa.table({f.name: pa.array(g[f.name], type=f.type) for f in partial_schema})

    from ray.data.aggregate import Sum

    # coalesce the (tiny: #blocks × #groups rows) partials so the final
    # groupby's shuffle has no schema-less empty partitions
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).repartition(4)
    agg = parts.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("s_qty", alias_name="sum_qty"),
        Sum("s_price", alias_name="sum_price"),
        Sum("s_disc", alias_name="sum_disc"),
        Sum("n", alias_name="n_rows"),
    )

    out_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("sum_qty", pa.float64()),
            ("sum_price", pa.float64()),
            ("avg_qty", pa.float64()),
            ("avg_disc", pa.float64()),
            ("n_rows", pa.int64()),
        ]
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        if df.empty or "sum_qty" not in df.columns:  # empty aggregate partition
            return out_schema.empty_table()
        df["avg_qty"] = df["sum_qty"] / df["n_rows"]
        df["avg_disc"] = df["sum_disc"] / df["n_rows"]
        df["n_rows"] = df["n_rows"].astype("int64")
        df = _round_cols(df, {"sum_qty": 2, "sum_price": 2, "avg_qty": 4, "avg_disc": 4})
        return pa.table({f.name: pa.array(df[f.name], type=f.type) for f in out_schema})

    return agg.map_batches(finish, batch_format="pandas").sort(["l_returnflag", "l_linestatus"])


BROADCAST_JOIN_MAX_ROWS = 5_000_000  # small-side guard: beyond this, broadcast ships too much per worker


def segment_revenue(sf_dir: str):
    """orders ⋈ customer -> revenue per market segment. The customer map is
    broadcast (dict inside map_batches) while it is provably small
    (row-count guard); past BROADCAST_JOIN_MAX_ROWS it falls back to a
    distributed hash join — the "small side" assumption is checked, never
    assumed."""
    import ray
    import ray.data as rd

    from ray.data.aggregate import Sum

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cust_ds = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    n_cust = cust_ds.count()  # metadata-cheap on parquet

    partial_schema = pa.schema([("seg", pa.string()), ("total", pa.float64()), ("n", pa.float64())])

    if n_cust <= BROADCAST_JOIN_MAX_ROWS:
        cust = cust_ds.to_pandas()
        seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
        ref = ray.put(seg_of)

        def partial(b: pa.Table) -> pa.Table:
            m = ray.get(ref)
            df = b.to_pandas()
            df["seg"] = df["o_custkey"].map(m)
            g = df.groupby("seg", as_index=False).agg(total=("o_totalprice", "sum"), n=("o_totalprice", "size"))
            return pa.table({f.name: pa.array(g[f.name], type=f.type) for f in partial_schema})

        pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    else:
        # fallback: pre-aggregate per customer (combiner), hash-join to the
        # customer table, re-key to segment — no driver-side customer map
        from text_to_graph_ray.functions.dedup import join_partitions_for

        def per_cust(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            g = df.groupby("o_custkey", as_index=False).agg(total=("o_totalprice", "sum"), n=("o_totalprice", "size"))
            return pa.table(
                {
                    "o_custkey": pa.array(g["o_custkey"], type=pa.int64()),
                    "total": pa.array(g["total"], type=pa.float64()),
                    "n": pa.array(g["n"], type=pa.float64()),
                }
            )

        by_cust = (
            ds.map_batches(per_cust, batch_format="pyarrow", batch_size=None)
            .groupby("o_custkey")
            .aggregate(Sum("total", alias_name="total"), Sum("n", alias_name="n"))
        )
        j = by_cust.join(
            cust_ds,
            join_type="inner",
            num_partitions=join_partitions_for(),
            on=("o_custkey",),
            right_on=("c_custkey",),
            partition_size_hint=32 << 20,
        )
        pre = j.map_batches(
            lambda b: pa.table(
                {
                    "seg": b.column("c_mktsegment"),
                    "total": b.column("total"),
                    "n": b.column("n"),
                }
            ),
            batch_format="pyarrow",
        )

    agg = pre.repartition(4).groupby("seg").aggregate(Sum("total", alias_name="revenue"), Sum("n", alias_name="n_orders"))

    out_schema = pa.schema([("seg", pa.string()), ("revenue", pa.float64()), ("n_orders", pa.int64())])

    def finish(df: pd.DataFrame) -> pa.Table:
        if df.empty or "revenue" not in df.columns:
            return out_schema.empty_table()
        df["revenue"] = df["revenue"].round(2)
        df["n_orders"] = df["n_orders"].astype("int64")
        return pa.table({f.name: pa.array(df[f.name], type=f.type) for f in out_schema})

    return agg.map_batches(finish, batch_format="pandas").sort("seg")


def top_orders(sf_dir: str, k: int = 10):
    """sort desc + limit; deterministic tie-break on o_orderkey."""
    import ray.data as rd

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def order_revenue_topk(sf_dir: str, k: int = 10):
    """Top-k orders by lineitem revenue, joined to order metadata.

    Plan (rewritten from a full hash join after profiling showed Ray's
    sort-aggregate per-group Python combine dominating at ~200 µs/group over
    147k orderkeys):

    1. arrow-native per-block combiner (``Table.group_by`` — no pandas);
    2. ``bucketed_aggregate`` — coarse-bucket shuffle + vectorized in-bucket
       groupby (exact; see functions/agg.py);
    3. top-k pushdown THROUGH the FK join: ``revenue desc`` sort+limit runs
       before touching orders, because rev⋈orders is 1:1 on the FK — each
       aggregated rev row matches at most one order.  Only the k winners'
       metadata is then fetched with an ``is_in`` semijoin scan of orders
       (no join aggregator actors at all).  GUARDED: if any winner has no
       matching order row (FK violation — the inner join would have dropped
       it, changing the top-k), fall back to the full distributed hash join.
    """
    import ray
    import ray.data as rd

    from text_to_graph_ray.functions.agg import bucketed_aggregate
    from text_to_graph_ray.functions.dedup import join_partitions_for

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    partial_schema = pa.schema([("l_orderkey", pa.int64()), ("rev", pa.float64()), ("n", pa.float64())])

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        g = pa.table({"l_orderkey": b.column("l_orderkey"), "rev": rev}).group_by("l_orderkey").aggregate(
            [("rev", "sum"), ("rev", "count")]
        )
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "rev": g.column("rev_sum"),
                "n": pc.cast(g.column("rev_count"), pa.float64()),
            },
            schema=partial_schema,
        )

    rev_schema = pa.schema([("l_orderkey", pa.int64()), ("revenue", pa.float64()), ("n_items", pa.float64())])
    rev = bucketed_aggregate(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "l_orderkey",
        {"revenue": ("rev", "sum"), "n_items": ("n", "sum")},
        out_schema=rev_schema,
        in_schema=partial_schema,
    )
    # round BEFORE ranking — the oracle orders by the rounded value, so the
    # k-boundary tie-break must see the same numbers.  Top-k runs as a
    # per-block partial (k rows survive each block) + a bounded driver merge
    # of <= #blocks * k rows — no distributed sort shuffle needed.
    def block_topk(b: pa.Table) -> pa.Table:
        b = b.set_column(1, "revenue", pc.round(b.column("revenue"), ndigits=2))
        return b.sort_by([("revenue", "descending"), ("l_orderkey", "ascending")]).slice(0, k)

    partials = rev.map_batches(block_topk, batch_format="pyarrow", batch_size=None).take_all()
    topk = sorted(partials, key=lambda r: (-r["revenue"], r["l_orderkey"]))[:k]
    out_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()), ("revenue", pa.float64()), ("n_items", pa.int64())]
    )
    if not topk:
        return rd.from_arrow(out_schema.empty_table())

    keys = pa.array(sorted(r["l_orderkey"] for r in topk), type=pa.int64())
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    matched = orders.map_batches(
        lambda b: b.filter(pc.is_in(b.column("o_orderkey"), value_set=keys)), batch_format="pyarrow"
    ).take_all()
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in matched}

    if all(r["l_orderkey"] in cust_of for r in topk):
        return rd.from_arrow(
            pa.table(
                {
                    "o_orderkey": pa.array([r["l_orderkey"] for r in topk], type=pa.int64()),
                    "o_custkey": pa.array([cust_of[r["l_orderkey"]] for r in topk], type=pa.int64()),
                    "revenue": pa.array([round(r["revenue"], 2) for r in topk], type=pa.float64()),
                    "n_items": pa.array([int(r["n_items"]) for r in topk], type=pa.int64()),
                },
                schema=out_schema,
            )
        )

    # FK violation: an aggregated order is absent from orders — the pushdown
    # is unsound, run the full distributed hash join instead
    j = rev.join(
        orders,
        join_type="inner",
        num_partitions=join_partitions_for(),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        partition_size_hint=32 << 20,
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pa.array(df["l_orderkey"].to_numpy(dtype="int64"), type=pa.int64()),
                "o_custkey": pa.array(df["o_custkey"].to_numpy(dtype="int64"), type=pa.int64()),
                "revenue": pa.array(df["revenue"].round(2).to_numpy(dtype="float64"), type=pa.float64()),
                "n_items": pa.array(df["n_items"].to_numpy(dtype="int64"), type=pa.int64()),
            }
        )

    return j.map_batches(finish, batch_format="pandas").sort(["revenue", "o_orderkey"], descending=[True, False]).limit(k)


def shipping_priority(sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-01-01", k: int = 10):
    """TPC-H-Q3-shaped: customer(segment) ⋈ orders(before cutoff) ⋈
    lineitem(shipped after cutoff) -> top-k orders by discounted revenue.
    Physical plan: prune + filter at every read; lineitem pre-aggregates
    revenue per order (combiner) BEFORE its join; two chained distributed
    hash joins; deterministic (revenue desc, orderkey asc) ranking."""
    import ray.data as rd

    from ray.data.aggregate import Sum
    from text_to_graph_ray.functions.dedup import join_partitions_for

    cut = np.datetime64(cutoff)
    n_parts = join_partitions_for()
    hint = 32 << 20

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), segment)).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
    cut_ts = pa.scalar(cut.astype("datetime64[us]"))  # match the parquet timestamp unit, not date32
    orders = orders.map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), cut_ts)), batch_format="pyarrow"
    )
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    rev_schema = pa.schema([("l_orderkey", pa.int64()), ("rev", pa.float64())])

    def li_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["l_shipdate"].values.astype("datetime64[ns]") > cut]
        if df.empty:
            return rev_schema.empty_table()
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby("l_orderkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.table({f.name: pa.array(g[f.name], type=f.type) for f in rev_schema})

    rev = (
        li.map_batches(li_partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )

    j = orders.join(cust, join_type="inner", num_partitions=n_parts, on=("o_custkey",), right_on=("c_custkey",), partition_size_hint=hint)
    j = j.join(rev, join_type="inner", num_partitions=n_parts, on=("o_orderkey",), right_on=("l_orderkey",), partition_size_hint=hint)

    def finish(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(dtype="int64"), type=pa.int64()),
                "revenue": pa.array(df["revenue"].round(2).to_numpy(dtype="float64"), type=pa.float64()),
                "o_orderpriority": pa.array(df["o_orderpriority"], type=pa.string()),
            }
        )

    return j.map_batches(finish, batch_format="pandas").sort(["revenue", "o_orderkey"], descending=[True, False]).limit(k)


def region_supplier_balance(sf_dir: str):
    """supplier ⋈ nation ⋈ region — a multiway distributed hash-join chain
    over the dimension tables (exercises the non-broadcast join path even
    where a broadcast would fit; at catalog scale these tables are sharded).
    Returns per-(region, nation) supplier account-balance totals."""
    import ray.data as rd

    from text_to_graph_ray.functions.dedup import join_partitions_for

    n_parts = join_partitions_for()
    hint = 32 << 20
    sup = read_parquet_clean(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey", "s_acctbal"])
    nat = read_parquet_clean(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = read_parquet_clean(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    j = sup.join(nat, join_type="inner", num_partitions=n_parts, on=("s_nationkey",), right_on=("n_nationkey",), partition_size_hint=hint)
    j = j.join(reg, join_type="inner", num_partitions=n_parts, on=("n_regionkey",), right_on=("r_regionkey",), partition_size_hint=hint)

    from ray.data.aggregate import Count, Sum

    agg = j.groupby(["r_name", "n_name"]).aggregate(
        Sum("s_acctbal", alias_name="total_bal"), Count(alias_name="n_suppliers")
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        df["total_bal"] = df["total_bal"].round(2)
        df["n_suppliers"] = df["n_suppliers"].astype("int64")
        return pa_from_pandas(df[["r_name", "n_name", "total_bal", "n_suppliers"]])

    return agg.map_batches(finish, batch_format="pandas").sort(["r_name", "n_name"])


def events_tumbling_window(sf_dir: str, window_s: int = 300):
    """Streaming-shaped tumbling-window aggregate over the event log:
    (event_type, floor(epoch/window)) -> count + sum(value). Windowing is a
    pure column computation, so it pre-aggregates per batch and needs only the
    tiny final groupby — no ordering assumption at all."""
    import ray.data as rd

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        # normalize to ns first: parquet timestamps may surface as datetime64[us]
        epoch = df["ts"].values.astype("datetime64[ns]").astype("int64") / 1e9
        df["w"] = np.floor(epoch / window_s).astype("int64")
        g = df.groupby(["event_type", "w"], as_index=False).agg(s=("value", "sum"), n=("value", "size"))
        g["n"] = g["n"].astype("float64")
        return pa_from_pandas(g)

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby(["event_type", "w"]).aggregate(
        Sum("s", alias_name="sum_value"), Sum("n", alias_name="n_events")
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        df["sum_value"] = df["sum_value"].round(4)
        df["n_events"] = df["n_events"].astype("int64")
        return pa_from_pandas(df[["event_type", "w", "sum_value", "n_events"]])

    return agg.map_batches(finish, batch_format="pandas").sort(["event_type", "w"])


def events_hopping_window(sf_dir: str, window_s: int = 600, hop_s: int = 300):
    """Hopping (overlapping) windows: each event lands in
    ``window_s / hop_s`` windows — the per-batch transform REPLICATES rows
    per covering window (a flat-map, still order-free and combiner-friendly),
    then the same tiny pre-aggregated groupby as the tumbling case. Window w
    covers [w*hop, w*hop + window)."""
    import ray.data as rd

    assert window_s % hop_s == 0
    reps = window_s // hop_s
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        epoch = df["ts"].values.astype("datetime64[ns]").astype("int64") / 1e9
        last = np.floor(epoch / hop_s).astype("int64")  # last (highest-index) covering hop
        frames = []
        for r in range(reps):
            f = pd.DataFrame({"event_type": df["event_type"], "w": last - r, "value": df["value"]})
            frames.append(f)
        allf = pd.concat(frames, ignore_index=True)
        allf = allf[allf["w"] >= 0]
        g = allf.groupby(["event_type", "w"], as_index=False).agg(s=("value", "sum"), n=("value", "size"))
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "w": pa.array(g["w"], type=pa.int64()),
                "s": pa.array(g["s"], type=pa.float64()),
                "n": pa.array(g["n"].astype("float64"), type=pa.float64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby(["event_type", "w"]).aggregate(
        Sum("s", alias_name="sum_value"), Sum("n", alias_name="n_events")
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        df["sum_value"] = df["sum_value"].round(4)
        df["n_events"] = df["n_events"].astype("int64")
        return pa_from_pandas(df[["event_type", "w", "sum_value", "n_events"]])

    return agg.map_batches(finish, batch_format="pandas").sort(["event_type", "w"])


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Session windows per user: sort within user group by ts, split on gaps >
    gap_s (groupby(user).map_groups over the sorted group — the documented
    pattern for stream-shaped work in Ray Data). Returns per-session rows."""
    import ray.data as rd

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        epoch = pd.Series(g["ts"].values.astype("datetime64[ns]").astype("int64") / 1e9, index=g.index)
        new_sess = (epoch.diff().fillna(np.inf) > gap_s).cumsum()
        out = g.assign(sess=new_sess, epoch=epoch).groupby("sess").agg(
            user_id=("user_id", "first"),
            start_epoch=("epoch", "min"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        )
        out["start_epoch"] = out["start_epoch"].round(6)
        out["sum_value"] = out["sum_value"].round(4)
        out["n_events"] = out["n_events"].astype("int64")
        return pa_from_pandas(out.reset_index(drop=True))

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas").sort(["user_id", "start_epoch"])


def purchase_click_asof(sf_dir: str):
    """Latest click at-or-before each purchase, per user — a distributed
    as-of join (``functions/joins.py``): one keyed exchange, vectorized
    ``pandas.merge_asof`` per coarse user bucket.  Both sides are row-filtered
    AT THE READ (pyarrow filter pushdown) and column-pruned.  Inner semantics
    (purchases with no prior click drop), matching DuckDB ``ASOF JOIN``.
    Timestamps return as int64 epoch-us."""
    from pyarrow.dataset import field as ds_field

    from text_to_graph_ray.functions.joins import asof_join

    # event_type must stay in the pruned read schema for the pushed-down
    # row filter to bind; the join maps only the columns it needs
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    purchases = read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols, filter=ds_field("event_type") == "purchase")
    clicks = read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols, filter=ds_field("event_type") == "click")
    out = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        left_cols={"event_id": "event_id", "value": "value"},
        right_cols={"click_ts": "ts", "click_value": "value"},
    )
    from text_to_graph_ray.util import sort_coalesced

    return sort_coalesced(out, "event_id")


def view_purchase_window(sf_dir: str, window_s: int = 1800):
    """All purchases within ``window_s`` strictly after each view, per user —
    a distributed range (interval) join: one keyed exchange, per-bucket
    ``np.searchsorted`` span expansion (``functions/joins.py``)."""
    from pyarrow.dataset import field as ds_field

    from text_to_graph_ray.functions.joins import range_join

    cols = ["event_id", "ts", "user_id", "event_type", "value"]  # see purchase_click_asof
    views = read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols, filter=ds_field("event_type") == "view")
    purchases = read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols, filter=ds_field("event_type") == "purchase")
    out = range_join(
        views,
        purchases,
        on="ts",
        by="user_id",
        left_cols={"view_id": "event_id"},
        right_cols={"purchase_id": "event_id", "purchase_value": "value"},
        lower_us=0,
        upper_us=window_s * 1_000_000,
    )
    from text_to_graph_ray.util import sort_coalesced

    return sort_coalesced(out, ["view_id", "purchase_id"])


def customers_without_orders(sf_dir: str, min_totalprice: float = 400_000.0):
    """Customers with no high-value order (totalprice > threshold) — Ray
    Data's native distributed LEFT ANTI join (hash exchange on the key;
    nothing is broadcast or collected), with the row filter pushed into the
    parquet read. The same operator family (left_semi / left_anti) is what a
    100 TB curation pipeline uses for "keep only rows (not) seen
    elsewhere"."""
    from pyarrow.dataset import field as ds_field

    from text_to_graph_ray.functions.dedup import join_partitions_for

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"])
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        filter=ds_field("o_totalprice") > min_totalprice,
    )
    out = cust.join(
        orders,
        join_type="left_anti",
        num_partitions=join_partitions_for(),
        on=("c_custkey",),
        right_on=("o_custkey",),
        partition_size_hint=16 << 20,
    )
    from text_to_graph_ray.util import sort_coalesced

    return sort_coalesced(out, "c_custkey")


def customers_with_orders_bloom(sf_dir: str, min_totalprice: float = 400_000.0):
    """Customers WITH at least one high-value order — the semijoin complement
    of ``customers_without_orders``, computed through the Bloom-filter plan
    (``functions.bloom``): distributed partial-bitmap build over the order
    keys, one fixed-size broadcast, Bloom-negative customers drop without any
    exchange, and only the maybes are verified by the exact guarded semijoin.
    Exact by construction; at 100 TB the left stream never shuffles."""
    from pyarrow.dataset import field as ds_field

    from text_to_graph_ray.functions.bloom import bloom_filter_by_keys
    from text_to_graph_ray.util import sort_coalesced

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"])
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"],
        filter=ds_field("o_totalprice") > min_totalprice,
    ).select_columns(["o_custkey"])
    out = bloom_filter_by_keys(cust, orders, "c_custkey", "o_custkey", mode="semi")
    return sort_coalesced(out, "c_custkey")


def events_distinct_sketch(sf_dir: str, kind: str = "kmv"):
    """Distinct user/event-type counts over the event stream via a mergeable
    sketch (``functions.sketch``) — fixed-size partials folded on the driver,
    no distinct-value exchange. ``kind="kmv"`` is exact below k=8192 (the
    hash-checked query); ``kind="hll"`` is the always-estimate variant
    (rows-only check; error pinned by tests)."""
    from text_to_graph_ray.functions.sketch import hll_distinct, kmv_distinct

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    if kind == "kmv":
        return kmv_distinct(ev, ["event_type", "user_id"], k=8192)
    return hll_distinct(ev, ["event_type", "user_id"], p=14)


def event_heavy_hitters(sf_dir: str, threshold: float = 0.10):
    """Event types with > threshold of all events — exact counts via the
    Misra-Gries candidates + verification-pass plan (``sketch.heavy_hitters``):
    no groupby exchange, two streaming scans."""
    from text_to_graph_ray.functions.sketch import heavy_hitters

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type"])
    return heavy_hitters(ev, "event_type", threshold)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_event_matrix(sf_dir: str):
    """Per-user wide feature matrix: sum(value) per event type as columns
    (``agg.pivot_wide``) — per-batch local pivot combiner, one keyed
    exchange of (user × 5) partials."""
    from text_to_graph_ray.functions.agg import pivot_wide
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"])
    out = pivot_wide(ev, "user_id", "event_type", "value", EVENT_TYPES)
    return sort_coalesced(out, "user_id")


SKETCH_QUANTILES = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def events_quantile_sketch(sf_dir: str):
    """Quantiles of the event value via the mergeable MRL summary
    (``sketch.quantile_sketch``) — per-block fixed-memory partials folded on
    the driver, no sort exchange. k=131072 keeps both gate scales in the
    exact-below-k regime (hash-checked vs quantile_disc); the lossy-collapse
    estimator path is pinned by tests at 1M rows / k=1024."""
    from text_to_graph_ray.functions.sketch import quantile_sketch

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])
    return quantile_sketch(ev, "value", SKETCH_QUANTILES, k=131072)


def token_heavy_hitters(sf_dir: str, threshold: float = 0.005):
    """Corpus-frequent tokens (> threshold of all token occurrences) via the
    Misra-Gries + verification plan over the exploded token stream — the
    no-groupby alternative to vocab_topk when only the frequent tail matters
    (at 100 TB the (token, count) exchange is the cost; here the exchange is
    zero and the token stream is scanned twice, which is read-bound)."""
    from text_to_graph_ray.functions.sketch import heavy_hitters

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(b: pa.Table) -> pa.Table:
        toks: list = []
        for t in b.column("text").to_pylist():
            toks.extend((t or "").split())
        return pa.table({"token": pa.array(toks, type=pa.string())})

    return heavy_hitters(docs.map_batches(explode, batch_format="pyarrow"), "token", threshold)


def user_running_sum(sf_dir: str):
    """Per-user ordered cumulative sum over the event stream (the classic
    sessionless window function): one keyed exchange via coarse buckets, then
    a VECTORIZED per-bucket sort + groupby.cumsum (C speed, no per-user
    dispatch). Order (ts, event_id) matches the SQL window frame exactly, so
    the float accumulation order — and therefore every partial sum — is
    bit-identical to the oracle's."""
    import numpy as np
    import pyarrow as pa

    from text_to_graph_ray.functions.agg import BUCKET_COL, with_bucket

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    in_schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("value", pa.float64())]
    )
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("ts", pa.int64()), ("running", pa.float64())]
    )

    def per_bucket(df):
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # round(4): DuckDB's windowed sum reorders float additions (segment
        # tree), so raw cumsums differ in the last ulp; the true values carry
        # 2 decimals, so 4-dp rounding is unambiguous for both sides
        running = df.groupby("user_id", sort=False)["value"].cumsum().round(4)
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(), type=pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(), type=pa.int64()),
                "ts": pa.array(df["ts"].to_numpy().astype("datetime64[us]").astype("int64"), type=pa.int64()),
                "running": pa.array(running.to_numpy(), type=pa.float64()),
            }
        )

    from text_to_graph_ray.functions.agg import bucket_exchange

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema), per_bucket, out_schema, 64)
    from text_to_graph_ray.util import sort_coalesced

    return sort_coalesced(out, "event_id")


def pricing_rollup(sf_dir: str, cutoff: str = "1996-01-01"):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): subtotals at every prefix
    level plus the grand total, 'ALL' as the rolled-up sentinel.

    Scale shape — rollup via grouping-set EXPANSION IN THE COMBINER: each
    per-batch partial row is replicated once per grouping set ((rf,ls),
    (rf,ALL), (ALL,ALL)) before the exchange, so ONE tiny groupby-sum
    produces every level. The shuffle carries 3 x #groups rows per batch
    (grouping-set count x group cardinality, not row count), and no level is
    re-derived on the driver."""
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"]
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=cols)
    cut = np.datetime64(cutoff)

    partial_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("s_qty", pa.float64()),
            ("s_price", pa.float64()),
            ("n", pa.float64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["l_shipdate"] < cut]
        if df.empty:
            return partial_schema.empty_table()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            s_qty=("l_quantity", "sum"), s_price=("l_extendedprice", "sum"), n=("l_quantity", "size")
        )
        levels = [g]
        g1 = g.copy()
        g1["l_linestatus"] = "ALL"
        g2 = g.copy()
        g2["l_returnflag"] = "ALL"
        g2["l_linestatus"] = "ALL"
        # re-combine sentinel rows locally so the exchange stays minimal
        exp = (
            pd.concat([*levels, g1, g2], ignore_index=True)
            .groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .sum()
        )
        return pa.table({f.name: pa.array(exp[f.name], type=f.type) for f in partial_schema})

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).repartition(4)
    agg = parts.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("s_qty", alias_name="sum_qty"), Sum("s_price", alias_name="sum_price"), Sum("n", alias_name="n_rows")
    )

    out_schema = pa.schema(
        [
            ("rf", pa.string()),
            ("ls", pa.string()),
            ("sum_qty", pa.float64()),
            ("sum_price", pa.float64()),
            ("n_rows", pa.int64()),
        ]
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        if df.empty or "sum_qty" not in df.columns:
            return out_schema.empty_table()
        df = df.rename(columns={"l_returnflag": "rf", "l_linestatus": "ls"})
        df["n_rows"] = df["n_rows"].astype("int64")
        df = _round_cols(df, {"sum_qty": 2, "sum_price": 2})
        return pa.table({f.name: pa.array(df[f.name], type=f.type) for f in out_schema})

    return agg.map_batches(finish, batch_format="pandas").sort(["rf", "ls"])


def pricing_cube(sf_dir: str, cutoff: str = "1996-01-01"):
    """GROUP BY CUBE(l_returnflag, l_linestatus): every subset of the
    grouping keys, 'ALL' as the rolled-up sentinel — pricing_rollup's
    combiner-expansion generalized to all four grouping sets ((rf,ls),
    (rf,ALL), (ALL,ls), (ALL,ALL)). Each per-batch partial row replicates
    once per set before ONE tiny exchange; the shuffle carries
    4 x #groups rows per batch, never row count."""
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"]
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=cols)
    cut = np.datetime64(cutoff)

    partial_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("s_qty", pa.float64()),
            ("s_price", pa.float64()),
            ("n", pa.float64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["l_shipdate"] < cut]
        if df.empty:
            return partial_schema.empty_table()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            s_qty=("l_quantity", "sum"), s_price=("l_extendedprice", "sum"), n=("l_quantity", "size")
        )
        sets = [g]
        for mask_rf, mask_ls in ((False, True), (True, False), (True, True)):
            gi = g.copy()
            if mask_rf:
                gi["l_returnflag"] = "ALL"
            if mask_ls:
                gi["l_linestatus"] = "ALL"
            sets.append(gi)
        exp = (
            pd.concat(sets, ignore_index=True)
            .groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .sum()
        )
        return pa.table({f.name: pa.array(exp[f.name], type=f.type) for f in partial_schema})

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).repartition(4)
    agg = parts.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("s_qty", alias_name="sum_qty"), Sum("s_price", alias_name="sum_price"), Sum("n", alias_name="n_rows")
    )

    out_schema = pa.schema(
        [
            ("rf", pa.string()),
            ("ls", pa.string()),
            ("sum_qty", pa.float64()),
            ("sum_price", pa.float64()),
            ("n_rows", pa.int64()),
        ]
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        if df.empty or "sum_qty" not in df.columns:
            return out_schema.empty_table()
        df = df.rename(columns={"l_returnflag": "rf", "l_linestatus": "ls"})
        df["n_rows"] = df["n_rows"].astype("int64")
        df = _round_cols(df, {"sum_qty": 2, "sum_price": 2})
        return pa.table({f.name: pa.array(df[f.name], type=f.type) for f in out_schema})

    return agg.map_batches(finish, batch_format="pandas").sort(["rf", "ls"])


def funnel_steps(sf_dir: str, steps: tuple = ("view", "click", "purchase")):
    """Ordered-funnel conversion over the event stream: step k counts a user
    iff they have a ``steps[k]`` event STRICTLY AFTER their step-(k-1)
    qualifying time, where the qualifying time is the min such event time
    (min-ts funnel semantics; strict > on both engine and oracle).

    Scale shape: the read prunes to the funnel's event types and 3 columns;
    a per-batch distinct combiner drops exact-duplicate (user, type, ts)
    rows (the min-after recurrence needs arbitrary order statistics, so rows
    — the irreducible set — cross the exchange, like the inverted index's
    postings); ONE user-keyed coarse-bucket exchange lands each user's rows
    together, and the per-bucket kernel walks the steps vectorized
    (merge + filter + groupby-min per step), emitting <= len(steps) partial
    count rows per bucket; a tiny groupby-sum finishes."""
    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket

    cols = ["user_id", "event_type", "ts"]
    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols)
    step_set = pa.array(list(steps), type=pa.string())
    in_schema = pa.schema([("user_id", pa.int64()), ("event_type", pa.string()), ("ts", pa.timestamp("us"))])

    def local(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("event_type"), value_set=step_set))
        if t.num_rows == 0:
            return in_schema.empty_table()
        df = t.to_pandas().drop_duplicates()
        return pa.table({f.name: pa.array(df[f.name], type=f.type) for f in in_schema})

    pre = ev.map_batches(local, batch_format="pyarrow")

    part_schema = pa.schema([("step", pa.int64()), ("name", pa.string()), ("users", pa.int64())])

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return part_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL])
        thr = df[df["event_type"] == steps[0]].groupby("user_id")["ts"].min()
        counts = [len(thr)]
        for st in steps[1:]:
            rows = df[df["event_type"] == st].merge(thr.rename("__thr"), left_on="user_id", right_index=True)
            rows = rows[rows["ts"] > rows["__thr"]]
            thr = rows.groupby("user_id")["ts"].min()
            counts.append(len(thr))
        return pa.table(
            {
                "step": pa.array(range(1, len(steps) + 1), type=pa.int64()),
                "name": pa.array(list(steps), type=pa.string()),
                "users": pa.array(counts, type=pa.int64()),
            }
        )

    parts = bucket_exchange(with_bucket(pre, "user_id", 64, in_schema=in_schema), per_bucket, part_schema, 64)

    from ray.data.aggregate import Sum

    agg = parts.groupby(["step", "name"]).aggregate(Sum("users", alias_name="users"))

    def fix(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "step": b.column("step"),
                "name": b.column("name"),
                "users": pc.cast(b.column("users"), pa.int64()),
            }
        )

    return agg.map_batches(fix, batch_format="pyarrow").sort("step")


def event_type_profile(sf_dir: str):
    """Exact distributed COUNT(DISTINCT user_id) per event_type — the
    non-decomposable aggregate, via per-batch distinct combiner + coarse-bucket
    exchange (functions.agg.nunique_per_group)."""
    from text_to_graph_ray.functions.agg import nunique_per_group
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    # bucket_exchange sizes the shuffle to the bucket ids actually present,
    # so low-cardinality keys need no hand-tuned bucket count here
    out = nunique_per_group(ev, "event_type", "user_id", out_name="n_users")
    return sort_coalesced(out, "event_type")


def user_event_deltas(sf_dir: str):
    """Per-user LAG + ROW_NUMBER: each event's sequence index within its
    user's (ts, event_id)-ordered stream and the value delta vs the previous
    event (NULL for the first).

    Scale shape: same one keyed coarse-bucket exchange as user_running_sum —
    all of a user's rows land in one bucket task, where shift/diff/cumcount
    run vectorized (C speed). No accumulation crosses rows, so delta is one
    IEEE subtraction of the same doubles on both sides — bit-identical to the
    SQL window's lag() with no rounding needed."""
    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    in_schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("value", pa.float64())]
    )
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("rn", pa.int64()), ("delta", pa.float64())]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        rn = g.cumcount().to_numpy() + 1
        delta = g["value"].diff().to_numpy()
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(), type=pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(), type=pa.int64()),
                "rn": pa.array(rn, type=pa.int64()),
                "delta": pa.array(delta, type=pa.float64()),
            }
        )

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, "event_id")


def user_window_frame(sf_dir: str):
    """LEAD + explicit 3-row frame sum per user: for each event in its user's
    (ts, event_id)-ordered stream emit the NEXT value (lead) and
    ``w3_sum = value + lag(value,1) + lag(value,2)`` (NULL unless both lags
    exist — SQL NULL propagation == pandas NaN propagation).

    Same one keyed coarse-bucket exchange as user_event_deltas. Float
    discipline: the frame sum is built with the SAME left-associated adds as
    the SQL expression — two IEEE additions of identical doubles on both
    sides, so the result is bit-identical with no rounding."""
    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    in_schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("value", pa.float64())]
    )
    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("next_value", pa.float64()),
            ("w3_sum", pa.float64()),
        ]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)["value"]
        v = df["value"].to_numpy()
        lag1 = g.shift(1).to_numpy()
        lag2 = g.shift(2).to_numpy()
        nxt = g.shift(-1).to_numpy()
        w3 = (v + lag1) + lag2  # left-assoc, matches `value + lag1 + lag2`
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(), type=pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(), type=pa.int64()),
                "next_value": pa.array(nxt, type=pa.float64()),
                "w3_sum": pa.array(w3, type=pa.float64()),
            }
        )

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, "event_id")


def user_day_ranks(sf_dir: str):
    """RANK + DENSE_RANK with genuine ties: each event ranked within its user
    by event DAY (many same-day events per user). Rank depends only on value
    multiplicity — deterministic regardless of row order, so no tiebreaker
    column is needed (unlike row_number). One keyed coarse-bucket exchange;
    per-bucket ranks are pandas' C-level rank(method='min'/'dense')."""
    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])
    in_schema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64())])
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("rnk", pa.int64()), ("drnk", pa.int64())]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL])
        day = df["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        work = pd.DataFrame({"event_id": df["event_id"].to_numpy(), "user_id": df["user_id"].to_numpy(), "day": day})
        g = work.groupby("user_id", sort=False)["day"]
        rnk = g.rank(method="min").to_numpy().astype("int64")
        drnk = g.rank(method="dense").to_numpy().astype("int64")
        return pa.table(
            {
                "event_id": pa.array(work["event_id"], type=pa.int64()),
                "user_id": pa.array(work["user_id"], type=pa.int64()),
                "rnk": pa.array(rnk, type=pa.int64()),
                "drnk": pa.array(drnk, type=pa.int64()),
            }
        )

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, "event_id")


def user_value_ntiles(sf_dir: str, n_tiles: int = 4):
    """NTILE(k) per user over the event stream, ordered by (value, event_id)
    — the quantile-bucket assignment a curation pipeline uses to split a
    score distribution into per-key quartiles. Deterministic tiebreak on
    event_id; SQL NTILE fill semantics (first n%k tiles one row larger).
    Same single coarse-bucket exchange as the rank windows; the per-bucket
    kernel is one mergesort + vectorized position arithmetic."""
    import numpy as np

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"])
    in_schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()), ("value", pa.float64())])
    out_schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()), ("tile", pa.int64())])

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "value", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        pos = g.cumcount().to_numpy()
        n = g["value"].transform("size").to_numpy()
        big = -(-n // n_tiles)            # ceil(n/k)
        small = np.maximum(n // n_tiles, 1)
        rem = n % n_tiles
        cutoff = rem * big
        tile = np.where(pos < cutoff, pos // np.maximum(big, 1), rem + (pos - cutoff) // small) + 1
        return pa.table({
            "event_id": pa.array(df["event_id"].to_numpy(), type=pa.int64()),
            "user_id": pa.array(df["user_id"].to_numpy(), type=pa.int64()),
            "tile": pa.array(tile.astype("int64"), type=pa.int64()),
        })

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, "event_id")


def lineitem_melted(sf_dir: str, order_max: int = 2000):
    """Long-format reshape of the lineitem measures (``agg.melt`` — the
    UNPIVOT inverse of pivot_wide), row-filtered at the parquet read to keep
    the 4x fan-out bounded. Exchange-free: one map stage plus the output
    sort."""
    from pyarrow.dataset import field as ds_field

    from text_to_graph_ray.functions.agg import melt
    from text_to_graph_ray.util import sort_coalesced

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        filter=ds_field("l_orderkey") < order_max,
    )
    out = melt(li, ["l_orderkey", "l_linenumber"],
               ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
               var_name="measure", value_name="val")
    return sort_coalesced(out, ["l_orderkey", "l_linenumber", "measure"])


def user_day_percentiles(sf_dir: str):
    """PERCENT_RANK + CUME_DIST per user over event day — the remaining SQL
    window pair (rank/dense_rank/ntile live in their own queries). Same
    one-exchange coarse-bucket window plan; both statistics derive from the
    min/max rank vectors pandas already computes in C, and the divisions are
    single IEEE ops on identical operands, so they hash-match DuckDB
    bit-for-bit."""
    import numpy as np

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])
    in_schema = pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64())])
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("pct_rank", pa.float64()), ("cume_dist", pa.float64())]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL])
        day = df["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        work = pd.DataFrame({"event_id": df["event_id"].to_numpy(), "user_id": df["user_id"].to_numpy(), "day": day})
        g = work.groupby("user_id", sort=False)["day"]
        rnk_min = g.rank(method="min").to_numpy()
        rnk_max = g.rank(method="max").to_numpy()
        n = work.groupby("user_id", sort=False)["day"].transform("size").to_numpy().astype("float64")
        pr = np.where(n > 1, (rnk_min - 1.0) / (n - 1.0), 0.0)
        cd = rnk_max / n
        return pa.table({
            "event_id": pa.array(work["event_id"], type=pa.int64()),
            "user_id": pa.array(work["user_id"], type=pa.int64()),
            "pct_rank": pa.array(pr, type=pa.float64()),
            "cume_dist": pa.array(cd, type=pa.float64()),
        })

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, "event_id")


def customer_order_counts(sf_dir: str):
    """Distributed LEFT OUTER join + aggregate: every customer with its order
    count, ZERO for customers with no orders. Combiner-first: orders collapse
    to one (custkey, n) row per customer via a coarse-bucket aggregate BEFORE
    the join, so the outer join's right side is key-unique and
    customer-table-sized — the exchange never carries the raw order rows."""
    from text_to_graph_ray.functions.agg import bucketed_aggregate
    from text_to_graph_ray.functions.dedup import join_partitions_for
    from text_to_graph_ray.util import sort_coalesced

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    per_cust = bucketed_aggregate(
        orders,
        "o_custkey",
        {"n": ("o_custkey", "size")},
        out_schema=pa.schema([("o_custkey", pa.int64()), ("n", pa.int64())]),
        in_schema=pa.schema([("o_custkey", pa.int64())]),
    )
    j = cust.join(
        per_cust,
        join_type="left_outer",
        num_partitions=join_partitions_for(),
        on=("c_custkey",),
        right_on=("o_custkey",),
        partition_size_hint=16 << 20,
    )
    out_schema = pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()), ("n_orders", pa.int64())])

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        n = b.column("n").to_pylist()
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_name": b.column("c_name"),
                "n_orders": pa.array([0 if v is None else int(v) for v in n], type=pa.int64()),
            }
        )

    return sort_coalesced(j.map_batches(finish, batch_format="pyarrow"), "c_custkey")


def event_json_stats(sf_dir: str):
    """JSON-column extraction + aggregate: pull ``k`` out of the events
    table's ``props`` JSON payload and reduce per event_type (count / sum /
    min / max — all-int, exact). The parse is the per-row kernel (stdlib
    json, compiled C); the combiner collapses each batch to one row per
    event_type, so the exchange is vocabulary-sized no matter the corpus."""
    import json

    from ray.data.aggregate import Count, Max, Min, Sum

    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    partial_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("k_sum", pa.int64()),
            ("k_min", pa.int64()),
            ("k_max", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return partial_schema.empty_table()
        ks = np.fromiter(
            (json.loads(p or "{}").get("k", 0) for p in b.column("props").to_pylist()),
            dtype=np.int64,
            count=b.num_rows,
        )
        df = pd.DataFrame({"event_type": b.column("event_type").to_pylist(), "k": ks})
        g = df.groupby("event_type")["k"].agg(["size", "sum", "min", "max"]).reset_index()
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "n": pa.array(g["size"], type=pa.int64()),
                "k_sum": pa.array(g["sum"], type=pa.int64()),
                "k_min": pa.array(g["min"], type=pa.int64()),
                "k_max": pa.array(g["max"], type=pa.int64()),
            }
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("k_sum", alias_name="k_sum"),
            Min("k_min", alias_name="k_min"),
            Max("k_max", alias_name="k_max"),
        )
    )
    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("k_sum", pa.int64()),
            ("k_min", pa.int64()),
            ("k_max", pa.int64()),
        ]
    )

    def fix(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        return pa.table({f.name: b.column(f.name).cast(f.type) for f in out_schema})

    return sort_coalesced(agg.map_batches(fix, batch_format="pyarrow"), "event_type")


def brand_revenue(sf_dir: str):
    """lineitem ⋈ part -> discounted revenue per brand (TPC-H-Q14-shaped
    dimension join). The part->brand map is the guarded small side (broadcast
    dict under BROADCAST_JOIN_MAX_ROWS, distributed hash join past it —
    threshold-0 equivalence in tests); lineitem pre-aggregates per partkey in
    the combiner either way, so the exchange carries one row per part per
    batch, never the raw line items."""
    import ray

    from ray.data.aggregate import Sum

    from text_to_graph_ray.util import sort_coalesced

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_extendedprice", "l_discount"])
    part = read_parquet_clean(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    n_part = part.count()

    part_schema = pa.schema([("p_brand", pa.string()), ("rev", pa.float64())])

    if n_part <= BROADCAST_JOIN_MAX_ROWS:
        pdf = part.to_pandas()
        brand_of = dict(zip(pdf["p_partkey"], pdf["p_brand"]))
        ref = ray.put(brand_of)

        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return part_schema.empty_table()
            m = ray.get(ref)
            df = b.to_pandas()
            df["p_brand"] = df["l_partkey"].map(m)
            df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
            g = df.groupby("p_brand", as_index=False)["rev"].sum()
            return pa.table({"p_brand": pa.array(g["p_brand"], type=pa.string()), "rev": pa.array(g["rev"], type=pa.float64())})

        pre = li.map_batches(partial, batch_format="pyarrow", batch_size=None)
    else:
        from text_to_graph_ray.functions.dedup import join_partitions_for

        def per_part(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.schema([("l_partkey", pa.int64()), ("rev", pa.float64())]).empty_table()
            df = b.to_pandas()
            df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
            g = df.groupby("l_partkey", as_index=False)["rev"].sum()
            return pa.table({"l_partkey": pa.array(g["l_partkey"], type=pa.int64()), "rev": pa.array(g["rev"], type=pa.float64())})

        j = (
            li.map_batches(per_part, batch_format="pyarrow", batch_size=None)
            .join(part, join_type="inner", num_partitions=join_partitions_for(), on=("l_partkey",), right_on=("p_partkey",), partition_size_hint=16 << 20)
            .map_batches(
                lambda b: pa.table({"p_brand": b.column("p_brand"), "rev": b.column("rev")})
                if b.num_rows
                else part_schema.empty_table(),
                batch_format="pyarrow",
            )
        )
        pre = j

    agg = pre.groupby("p_brand").aggregate(Sum("rev", alias_name="rev"))

    def fix(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        df = b.to_pandas()
        df["rev"] = df["rev"].round(2)
        return pa.table({"p_brand": pa.array(df["p_brand"], type=pa.string()), "rev": pa.array(df["rev"], type=pa.float64())})

    return sort_coalesced(agg.map_batches(fix, batch_format="pyarrow"), "p_brand")


def customer_fuzzy_pairs(sf_dir: str):
    """Edit-distance-1 fuzzy self-join over customer names
    (``fuzzy.fuzzy_self_join_ed1``): SymSpell deletion-neighborhood candidate
    generation (one variant-hash exchange, strings ride along), global pair
    dedup, exact ED<=1 verification. Oracle: an independent delta-probe plan
    (hamming<=1 on a fixed-width digit suffix implies the numeric difference
    is d*10^p) + levenshtein verification — different candidate logic on
    purpose."""
    from text_to_graph_ray.functions.fuzzy import fuzzy_self_join_ed1

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    out = fuzzy_self_join_ed1(cust, text_col="c_name", id_col="c_custkey")
    return out.map_batches(
        lambda t: t.rename_columns(["a_custkey", "b_custkey"]), batch_format="pyarrow"
    )


def lineitem_corr(sf_dir: str):
    """Pearson corr(l_quantity, l_discount) per l_returnflag from
    integer-exact sufficient statistics (``stats.grouped_corr_int``,
    discount scaled x100 to an exact int) — kilobyte partials per block,
    driver fold in Python ints, one explicit IEEE op sequence mirrored in
    the oracle (bit-identical, no tolerance)."""
    from text_to_graph_ray.functions.stats import grouped_corr_int

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity", "l_discount"]
    )
    return grouped_corr_int(li, "l_returnflag", "l_quantity", "l_discount", y_scale=100, out_name="corr_qd")


def events_value_histogram(sf_dir: str, nbins: int = 16):
    """Exact fixed-width histogram of the event value
    (``stats.histogram_fixed``): one min/max scan + per-block bincount
    partials folded on the driver; the bin rule is IEEE-op-mirrored in the
    SQL oracle."""
    from text_to_graph_ray.functions.stats import histogram_fixed

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])
    return histogram_fixed(ev, "value", nbins=nbins)


def user_mode_event(sf_dir: str):
    """Most frequent event type per user (mode), ties to the lexicographically
    smallest type: per-batch (user, type) count partials ->
    ``bucketed_aggregate`` sum -> ``topk_per_group(k=1)`` — two coarse
    exchanges of count rows, never raw events."""
    from text_to_graph_ray.functions.agg import bucketed_aggregate, topk_per_group
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    cnt_schema = pa.schema([("user_id", pa.int64()), ("event_type", pa.string()), ("cnt", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return cnt_schema.empty_table()
        df = b.to_pandas()
        g = df.groupby(["user_id", "event_type"], as_index=False, sort=False).size()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"], type=pa.int64()),
                "event_type": pa.array(g["event_type"], type=pa.string()),
                "cnt": pa.array(g["size"], type=pa.int64()),
            },
            schema=cnt_schema,
        )

    pre = ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
    counts = bucketed_aggregate(
        pre,
        ["user_id", "event_type"],
        {"cnt": ("cnt", "sum")},
        out_schema=cnt_schema,
        in_schema=cnt_schema,
    )
    top = topk_per_group(
        counts,
        "user_id",
        "cnt",
        k=1,
        descending=True,
        tiebreak="event_type",
        out_schema=cnt_schema,
        in_schema=cnt_schema,
    )
    out = top.map_batches(
        lambda t: pa.table(
            {"user_id": t.column("user_id"), "mode_type": t.column("event_type"), "cnt": t.column("cnt")}
        ),
        batch_format="pyarrow",
    )
    return sort_coalesced(out, "user_id")


def daily_new_users(sf_dir: str):
    """New users per day (first-touch attribution) plus the cumulative user
    count: per-batch min-day combiner -> ``bucketed_aggregate`` min per user
    (one keyed exchange of (user, day) rows), then per-day counts fold on the
    driver (bounded by the day cardinality x blocks) and one cumulative sum.
    The running total is exact integer arithmetic — no float discipline
    needed."""
    import ray.data as rd

    from text_to_graph_ray.functions.agg import bucketed_aggregate

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    fd_schema = pa.schema([("user_id", pa.int64()), ("d", pa.date32())])

    def first_day_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return fd_schema.empty_table()
        df = b.to_pandas()
        df["d"] = df["ts"].dt.date
        g = df.groupby("user_id", as_index=False)["d"].min()
        return pa.table(
            {"user_id": pa.array(g["user_id"], type=pa.int64()), "d": pa.array(g["d"], type=pa.date32())},
            schema=fd_schema,
        )

    pre = ev.map_batches(first_day_partial, batch_format="pyarrow", batch_size=None)
    first = bucketed_aggregate(pre, "user_id", {"d": ("d", "min")}, out_schema=fd_schema, in_schema=fd_schema)

    cnt_schema = pa.schema([("d", pa.date32()), ("c", pa.int64())])

    def day_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return cnt_schema.empty_table()
        df = b.to_pandas()
        g = df.groupby("d", as_index=False).size()
        return pa.table(
            {"d": pa.array(g["d"], type=pa.date32()), "c": pa.array(g["size"], type=pa.int64())},
            schema=cnt_schema,
        )

    rows = first.map_batches(day_counts, batch_format="pyarrow").take_all()
    acc: dict = {}
    for r in rows:
        acc[r["d"]] = acc.get(r["d"], 0) + int(r["c"])
    days = sorted(acc)
    new = [acc[d] for d in days]
    cum, tot = [], 0
    for c in new:
        tot += c
        cum.append(tot)
    out = pa.table(
        {
            # ISO strings, not date32: DuckDB DATE comes back datetime64 while
            # arrow date32 comes back object — strings hash identically
            "d": pa.array([d.isoformat() for d in days], type=pa.string()),
            "new_users": pa.array(new, type=pa.int64()),
            "cum_users": pa.array(cum, type=pa.int64()),
        }
    )
    return rd.from_arrow(out)


def events_grouped_quantiles(sf_dir: str, qs: tuple = (0.25, 0.5, 0.9)):
    """Per-event-type value quantiles via the mergeable grouped MRL summary
    (``sketch.grouped_quantile_sketch``): per-(batch, type) fixed-memory
    combiner partials, one keyed exchange of sketch blobs (never raw rows).
    k=131072 keeps both gate scales in the exact-below-k-per-group regime
    (hash-checked vs per-group quantile_disc)."""
    from text_to_graph_ray.functions.sketch import grouped_quantile_sketch

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantile_sketch(ev, "event_type", "value", qs, k=131072)


def customer_fuzzy_lookup(sf_dir: str):
    """Two-table ED<=1 fuzzy lookup (``fuzzy.fuzzy_join_ed1``): even-keyed
    customers matched against odd-keyed ones — the entity-resolution shape
    (new records vs a canonical table). Oracle: the independent signed
    delta-probe plan + levenshtein."""
    import pyarrow.compute as pc

    from text_to_graph_ray.functions.fuzzy import fuzzy_join_ed1

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])

    def side(parity: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            keep = pc.equal(pc.bit_wise_and(t.column("c_custkey"), 1), parity)
            return t.filter(keep)

        return f

    left = cust.map_batches(side(0), batch_format="pyarrow")
    right = cust.map_batches(side(1), batch_format="pyarrow")
    out = fuzzy_join_ed1(left, right, text_col="c_name", id_col="c_custkey")
    return out.map_batches(
        lambda t: t.rename_columns(["a_custkey", "b_custkey"]), batch_format="pyarrow"
    )


def user_moving_sum(sf_dir: str, frame: int = 10):
    """Per-user MOVING-FRAME window sum (ROWS BETWEEN frame-1 PRECEDING AND
    CURRENT ROW) over the event stream: same one-keyed-exchange plan as
    ``user_running_sum``, with the frame computed as a vectorized
    cumsum-minus-lagged-cumsum per bucket (no per-row or per-user Python
    dispatch). Order (ts, event_id) matches the SQL frame exactly; round(4)
    for the same last-ulp reason as the running sum (true values carry 2
    decimals, both engines' float error is ~1e-11)."""
    import numpy as np
    import pyarrow as pa

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    in_schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("value", pa.float64())]
    )
    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("moving", pa.float64())]
    )

    def per_bucket(df):
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = df.groupby("user_id", sort=False)
        cs = grp["value"].cumsum()
        lag = cs.groupby(df["user_id"], sort=False).shift(frame)
        moving = (cs - lag.fillna(0.0)).round(4)
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(), type=pa.int64()),
                "user_id": pa.array(df["user_id"].to_numpy(), type=pa.int64()),
                "moving": pa.array(moving.to_numpy(), type=pa.float64()),
            }
        )

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, "event_id")


def lineitem_moments(sf_dir: str):
    """Grouped mean/stddev/skewness/kurtosis of l_quantity per returnflag
    from integer-exact power sums (``stats.grouped_moments_int``); the
    oracle recomputes the same explicit IEEE op sequence over HUGEINT-exact
    central-moment numerators."""
    from text_to_graph_ray.functions.stats import grouped_moments_int

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity"])
    return grouped_moments_int(li, "l_returnflag", "l_quantity")


def events_users_per_type_kmv(sf_dir: str, k: int = 8192):
    """Distinct users per event type via the grouped mergeable KMV sketch
    (exact below k per group — the hash-checked regime vs COUNT(DISTINCT)
    GROUP BY)."""
    from text_to_graph_ray.functions.sketch import grouped_kmv_distinct

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    return grouped_kmv_distinct(ev, "event_type", "user_id", k=k)


def user_time_range_sum(sf_dir: str, window_s: int = 3600):
    """Per-user TIME-RANGE window sum (SQL ``RANGE BETWEEN INTERVAL window
    PRECEDING AND CURRENT ROW``): unlike a ROWS frame the window is defined
    on the timestamp AXIS and includes ALL ts-peers of the current row, even
    ones ordered after it. One keyed exchange; inside each bucket the frame
    is cumsum + two searchsorted probes per user slice (hi = right-bisect on
    the row's own ts picks up peers; lo = left-bisect on ts - window keeps
    the boundary row IN, matching SQL's closed interval). round(4): same
    last-ulp argument as user_running_sum."""
    import numpy as np
    import pyarrow as pa

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    in_schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("value", pa.float64())]
    )
    out_schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()), ("range_sum", pa.float64())])
    win_us = np.int64(window_s) * np.int64(1_000_000)

    def per_bucket(df):
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        val = df["value"].to_numpy()
        uid = df["user_id"].to_numpy()
        out = np.empty(len(df), dtype=np.float64)
        # contiguous user slices after the sort; per-slice vectorized probes
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        bounds = np.r_[starts, len(uid)]
        for i in range(len(starts)):
            s, e = bounds[i], bounds[i + 1]
            t, cs = ts[s:e], np.cumsum(val[s:e])
            lo = np.searchsorted(t, t - win_us, side="left")
            hi = np.searchsorted(t, t, side="right")
            out[s:e] = cs[hi - 1] - np.where(lo > 0, cs[lo - 1], 0.0)
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(), type=pa.int64()),
                "user_id": pa.array(uid, type=pa.int64()),
                "range_sum": pa.array(np.round(out, 4), type=pa.float64()),
            }
        )

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, "event_id")


def clicks_purchases_full(sf_dir: str):
    """Per-(user, day) click counts FULL OUTER JOIN purchase counts — the
    generic one-exchange full-outer operator (``joins.keyed_full_outer``)
    over two combiner-aggregated sides; days where a user clicked without
    purchasing (and vice versa) surface with a real NULL on the missing
    side."""
    import pyarrow as pa

    from text_to_graph_ray.functions.agg import bucketed_aggregate
    from text_to_graph_ray.functions.joins import keyed_full_outer
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"])
    in_schema = pa.schema([("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("event_type", pa.string())])

    def side(evtype: str, out_name: str):
        def prep(t: pa.Table) -> pa.Table:
            part = pa.schema([("user_id", pa.int64()), ("d", pa.string())])
            if t.num_rows == 0:
                return part.empty_table()
            t = t.filter(pc.equal(t.column("event_type"), evtype))
            return pa.table(
                {"user_id": t.column("user_id"), "d": pc.strftime(t.column("ts"), format="%Y-%m-%d")},
                schema=part,
            )

        filtered = ev.map_batches(prep, batch_format="pyarrow")
        return bucketed_aggregate(
            filtered,
            ["user_id", "d"],
            {out_name: ("user_id", "size")},
            out_schema=pa.schema([("user_id", pa.int64()), ("d", pa.string()), (out_name, pa.int64())]),
            in_schema=pa.schema([("user_id", pa.int64()), ("d", pa.string())]),
        )

    joined = keyed_full_outer(
        side("click", "n_clicks"), side("purchase", "n_purchases"),
        ["user_id", "d"], "n_clicks", "n_purchases",
    )
    return sort_coalesced(joined, ["user_id", "d"])


def user_event_type_concat(sf_dir: str):
    """Per-user ordered event-type trace (SQL ``string_agg(event_type, ','
    ORDER BY ts, event_id)``) via the generic ordered_string_agg operator."""
    import pyarrow as pa

    from text_to_graph_ray.functions.agg import ordered_string_agg
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"])
    in_schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("event_type", pa.string())]
    )
    out = ordered_string_agg(
        ev, "user_id", "event_type", ["ts", "event_id"], sep=",", out_name="trace", in_schema=in_schema
    )
    return sort_coalesced(out, "user_id")


def user_type_entropy(sf_dir: str):
    """Shannon entropy (nats) of each user's event-type mix — exact integer
    counts through the combiner, round(6) on the final float (see
    stats.grouped_entropy)."""
    import pyarrow as pa

    from text_to_graph_ray.functions.stats import grouped_entropy

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    return grouped_entropy(ev, "user_id", "event_type", key_type=pa.int64())


def documents_hash_split(sf_dir: str):
    """Deterministic md5 train/test split assignment per document (see
    sample.hash_split; ~10% test at thresh '1999')."""
    from text_to_graph_ray.functions.sample import hash_split

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return hash_split(docs, "doc_id", thresh_hex="1999")


def documents_shuffle_shards(sf_dir: str, n_shards: int = 16):
    """Deterministic global corpus shuffle + round-robin shard assignment
    (see sample.shuffle_shards; md5-on-decimal-id shuffle key, exact per-row
    position cross-checked against DuckDB's row_number over the same key)."""
    from text_to_graph_ray.functions.sample import shuffle_shards

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return shuffle_shards(docs, n_shards=n_shards)


def documents_mixture_plan(sf_dir: str, budget_tokens: int = 1_000_000):
    """Domain-mixture token apportionment over documents.source (see
    sample.mixture_plan; largest-remainder integer allocation, exact)."""
    from text_to_graph_ray.functions.sample import mixture_plan

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return mixture_plan(docs, budget_tokens=budget_tokens, by="source")


def documents_mixture_temperature(sf_dir: str, budget_tokens: int = 1_000_000):
    """Temperature-scaled (alpha = 0.5) domain-mixture apportionment: the
    upsample-the-tail rebalancing used for multilingual/domain training
    mixes. Weights = int64-quantized sqrt(n_tokens) so every allocation is
    exact integer math the SQL oracle reproduces bit-for-bit."""
    from text_to_graph_ray.functions.sample import mixture_plan

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    return mixture_plan(docs, budget_tokens=budget_tokens, by="source", temperature=True)


def events_throttle_first(sf_dir: str, window_s: int = 60):
    """Event throttling / rate-limit dedup: keep the FIRST event per
    (user, ``window_s``-second tumbling window) under (ts, event_id), and
    count what was suppressed — the standard at-most-one-per-window gate in
    front of a notification or feature-update stream.

    Scale shape: per-batch combiner keeps one candidate + a count per
    (user, window) — the exchange carries one partial row per key per
    upstream batch, never raw events — then ONE user-bucketed exchange
    resolves global winners (min (ts_us, event_id)) and sums counts.
    Window id = ts_us // (window_s * 1e6); floor(epoch(ts)/window_s) in SQL
    is identical for microsecond timestamps (boundary analysis: 1 us is
    4x the double spacing at epoch magnitude, so the floor can't flip).

    Returns (user_id, w, first_event_id, n_events) sorted by (user_id, w).
    """
    from text_to_graph_ray.functions.agg import bucket_exchange, with_bucket, BUCKET_COL
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])
    win_us = int(window_s) * 1_000_000

    part_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("w", pa.int64()),
            ("ts_us", pa.int64()),
            ("event_id", pa.int64()),
            ("n", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("w", pa.int64()),
            ("first_event_id", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )

    def partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        ts_us = pc.cast(b.column("ts"), pa.int64())
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "w": pc.divide(ts_us, win_us),  # non-negative us: int floor-div
                "ts_us": ts_us,
                "event_id": b.column("event_id"),
            }
        )
        df = t.to_pandas()
        win = (
            df.sort_values(["ts_us", "event_id"], kind="mergesort")
            .drop_duplicates(["user_id", "w"], keep="first")
        )
        cnt = df.groupby(["user_id", "w"], as_index=False).size().rename(columns={"size": "n"})
        m = win.merge(cnt, on=["user_id", "w"])
        return pa.table({f.name: pa.array(m[f.name], type=f.type) for f in part_schema})

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        if BUCKET_COL in df.columns:
            df = df.drop(columns=[BUCKET_COL])
        win = (
            df.sort_values(["ts_us", "event_id"], kind="mergesort")
            .drop_duplicates(["user_id", "w"], keep="first")
        )
        cnt = df.groupby(["user_id", "w"], as_index=False)["n"].sum()
        m = win.drop(columns=["n"]).merge(cnt, on=["user_id", "w"]).sort_values(["user_id", "w"])
        return pa.table(
            {
                "user_id": pa.array(m["user_id"], type=pa.int64()),
                "w": pa.array(m["w"], type=pa.int64()),
                "first_event_id": pa.array(m["event_id"], type=pa.int64()),
                "n_events": pa.array(m["n"], type=pa.int64()),
            },
            schema=out_schema,
        )

    pre = ev.map_batches(partials, batch_format="pyarrow")
    out = bucket_exchange(with_bucket(pre, ["user_id"], 64, in_schema=part_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, ["user_id", "w"])


def user_longest_streak(sf_dir: str):
    """Longest run of CONSECUTIVE active days per user (the gaps-and-islands
    pattern): exact distinct (user, day) through the combiner, one keyed
    exchange, then fully-vectorized island detection per bucket — day number
    minus per-user rank is constant within a streak, so a groupby-size over
    that anchor finds every island with no per-user Python loop."""
    import numpy as np
    import pyarrow as pa

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, distinct_rows, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    day_schema = pa.schema([("user_id", pa.int64()), ("day", pa.int64())])
    out_schema = pa.schema([("user_id", pa.int64()), ("longest_streak", pa.int64())])

    def to_days(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return day_schema.empty_table()
        days = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[D]").astype("int64")
        return pa.table({"user_id": b.column("user_id"), "day": pa.array(days, type=pa.int64())}, schema=day_schema)

    days = distinct_rows(ev.map_batches(to_days, batch_format="pyarrow"), ["user_id", "day"], day_schema)

    def per_bucket(df):
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "day"], kind="mergesort")
        rnk = df.groupby("user_id", sort=False).cumcount()
        df = df.assign(anchor=df["day"].to_numpy() - rnk.to_numpy())
        runs = df.groupby(["user_id", "anchor"], sort=False).size().reset_index(name="len")
        best = runs.groupby("user_id", sort=False)["len"].max().reset_index()
        return pa.table(
            {
                "user_id": pa.array(best["user_id"].to_numpy(), type=pa.int64()),
                "longest_streak": pa.array(best["len"].to_numpy(), type=pa.int64()),
            },
            schema=out_schema,
        )

    out = bucket_exchange(with_bucket(days, "user_id", 64, in_schema=day_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, "user_id")


def events_quantiles_cont(sf_dir: str, qs: tuple = (0.25, 0.5, 0.9)):
    """Per-event-type INTERPOLATED quantiles (SQL quantile_cont) — the exact
    row-shipping path (a keyed exact quantile is a sort); the sketch variant
    covers the estimate-at-scale regime."""
    from text_to_graph_ray.functions.quantiles import grouped_quantiles_cont

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantiles_cont(ev, "event_type", "value", qs)


def documents_weighted_sample(sf_dir: str, k: int = 50):
    """Deterministic weighted sample over documents: weight = 1 + n_chars%4
    (content-derived small int), replicated-ticket minwise draw, k smallest
    keys win (see sample.weighted_topk)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from text_to_graph_ray.functions.sample import weighted_topk

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def add_wt(b: pa.Table) -> pa.Table:
        sch = pa.schema([("doc_id", pa.int64()), ("wt", pa.int64())])
        if b.num_rows == 0:
            return sch.empty_table()
        nc = b.column("n_chars").to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({"doc_id": b.column("doc_id"), "wt": pa.array(nc % 4 + 1, type=pa.int64())}, schema=sch)

    return weighted_topk(docs.map_batches(add_wt, batch_format="pyarrow"), "doc_id", "wt", k=k)


def window_distinct_users(sf_dir: str, window_s: int = 3600):
    """Distinct users per (tumbling window, event type) — the windowed
    COUNT(DISTINCT) composition: windowing is a pure column compute inside
    the scan, then ``agg.nunique_per_group`` does its distinct-pair combiner
    + one keyed exchange. Scale shape: the exchange carries the DISTINCT
    (window, type, user) triples, not the event rows."""
    import pyarrow as pa

    from text_to_graph_ray.functions.agg import nunique_per_group
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id"])
    sch = pa.schema([("w", pa.int64()), ("event_type", pa.string()), ("user_id", pa.int64())])

    def win(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return sch.empty_table()
        epoch = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype("int64")
        w = epoch // (window_s * 1_000_000)
        return pa.table(
            {"w": pa.array(w, type=pa.int64()), "event_type": b.column("event_type"), "user_id": b.column("user_id")},
            schema=sch,
        )

    out = nunique_per_group(ev.map_batches(win, batch_format="pyarrow"), ["w", "event_type"], "user_id",
                            out_name="n_users")
    return sort_coalesced(out, ["w", "event_type"])


def retention_cohorts(sf_dir: str, users_broadcast_max: int = 5_000_000, num_buckets: int = 64):
    """Weekly retention-cohort matrix — the product-analytics staple: cohort
    = each user's FIRST active ISO week (Monday-truncated, DuckDB
    date_trunc('week') semantics), cell (cohort, k) = distinct users of that
    cohort active k weeks later.

    Plan: (1) first-touch week per user — a per-batch min combiner then one
    bucketed min (user-vocabulary-sized output); (2) the cohort table is
    guard-collected (LOUD above ``users_broadcast_max``) and ray.put once —
    sorted arrays, vectorized searchsorted in the scan, the grouped_zscore
    two-pass shape: the event stream itself never shuffles for the join;
    (3) exact COUNT(DISTINCT user) per (cohort, week-offset) via
    ``nunique_per_group``'s distinct-pair combiner. All integer day/week
    arithmetic. Returns (cohort_week_day: days-since-epoch of the cohort
    Monday, wk, n_users) sorted."""
    import ray

    from text_to_graph_ray.functions.agg import bucketed_aggregate, nunique_per_group
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    first_schema = pa.schema([("user_id", pa.int64()), ("cw", pa.int64())])

    def week_start_days(ts_col: pa.ChunkedArray) -> np.ndarray:
        import pyarrow.compute as pc

        us = pc.cast(ts_col, pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        return day - (day + 3) % 7  # 1970-01-01 was a Thursday; Monday-start weeks

    def first_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return first_schema.empty_table()
        df = pd.DataFrame({"user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                           "cw": week_start_days(b.column("ts"))})
        g = df.groupby("user_id", as_index=False, sort=False)["cw"].min()
        return pa.table({"user_id": pa.array(g["user_id"], type=pa.int64()),
                         "cw": pa.array(g["cw"], type=pa.int64())}, schema=first_schema)

    cohort = bucketed_aggregate(
        ev.map_batches(first_partial, batch_format="pyarrow"), ["user_id"], {"cw": ("cw", "min")},
        out_schema=first_schema, num_buckets=num_buckets, in_schema=first_schema,
    ).materialize()
    n_users = cohort.count()
    if n_users > users_broadcast_max:
        raise ValueError(
            f"retention_cohorts: {n_users} users exceed users_broadcast_max — "
            "switch the cohort attach to the distributed hash join (joins.filter_by_keys shape)"
        )
    ct = pa.concat_tables([t for t in ray.get(cohort.to_arrow_refs()) if t.num_rows])
    uids = np.asarray(ct.column("user_id").to_pylist(), dtype=np.int64)
    order = np.argsort(uids)
    ref = ray.put((uids[order], np.asarray(ct.column("cw").to_pylist(), dtype=np.int64)[order]))

    pair_schema = pa.schema([("cohort_week_day", pa.int64()), ("wk", pa.int64()), ("user_id", pa.int64())])

    def offsets(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pair_schema.empty_table()
        su, scw = ray.get(ref)
        u = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cw = scw[np.searchsorted(su, u)]
        wk = (week_start_days(b.column("ts")) - cw) // 7
        return pa.table({"cohort_week_day": pa.array(cw, type=pa.int64()),
                         "wk": pa.array(wk, type=pa.int64()),
                         "user_id": pa.array(u, type=pa.int64())}, schema=pair_schema)

    pairs = ev.map_batches(offsets, batch_format="pyarrow")
    out = nunique_per_group(pairs, ["cohort_week_day", "wk"], "user_id", out_name="n_users",
                            num_buckets=num_buckets)
    return sort_coalesced(out, ["cohort_week_day", "wk"])


def rolling_active_users(sf_dir: str, window_days: int = 7, num_buckets: int = 64):
    """Rolling N-day active users (the WAU/MAU curve) — COUNT(DISTINCT user)
    over a SLIDING daily window, which no tumbling aggregate composes into:
    the classic trick is to reduce the stream to DISTINCT (user, day) pairs
    first (per-batch combiner + one exact distinct — day-granularity
    dedup collapses the event volume), then fan each pair out to the N
    window-ends it contributes to (vectorized np.repeat), and finish with
    one exact COUNT(DISTINCT) exchange keyed on window_end. Exchange cost:
    N x |distinct (user, day)| rows — proportional to the answer's
    granularity, never to raw events. Returns (we_day: days-since-epoch of
    the window END, n_users) sorted; window ends past the data's max day
    appear with their shrinking tails (mirrored in SQL)."""
    import pyarrow.compute as pc

    from text_to_graph_ray.functions.agg import distinct_rows, nunique_per_group
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    pair_schema = pa.schema([("user_id", pa.int64()), ("d", pa.int64())])

    def to_days(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pair_schema.empty_table()
        us = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                           "d": us // 86_400_000_000}).drop_duplicates()
        return pa.table({"user_id": pa.array(df["user_id"], type=pa.int64()),
                         "d": pa.array(df["d"], type=pa.int64())}, schema=pair_schema)

    ud = distinct_rows(ev.map_batches(to_days, batch_format="pyarrow"), ["user_id", "d"], pair_schema)
    fan_schema = pa.schema([("we_day", pa.int64()), ("user_id", pa.int64())])

    def fan(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return fan_schema.empty_table()
        u = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        d = b.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.tile(np.arange(window_days, dtype=np.int64), len(d))
        return pa.table({"we_day": pa.array(np.repeat(d, window_days) + offs, type=pa.int64()),
                         "user_id": pa.array(np.repeat(u, window_days), type=pa.int64())}, schema=fan_schema)

    out = nunique_per_group(ud.map_batches(fan, batch_format="pyarrow"), ["we_day"], "user_id",
                            out_name="n_users", num_buckets=num_buckets)
    return sort_coalesced(out, "we_day")


def event_type_transitions(sf_dir: str, num_buckets: int = 64):
    """Markov transition matrix over per-user event-type sequences: for each
    (from_type, to_type) adjacent pair in a user's (ts, event_id)-ordered
    stream, the global count ``n`` and row-conditional probability
    ``p = n / sum(n) over from_type`` (the session-model / next-action
    building block; reference parity: the same per-stream ordered scan as
    graph_extractor's chunk sequencing, generalized to event streams).

    Scale shape: ONE keyed coarse-bucket exchange on user_id (all of a
    user's rows land in one task); each bucket sorts vectorized, shifts
    event_type by one row, masks user boundaries, and emits LOCAL
    (from, to, partial-count) rows — the exchange after that carries at
    most num_buckets * |types|^2 rows, never events. The final sum +
    probability runs in one task because the answer is |types|^2-sized.
    Float discipline: p is ONE IEEE division of two int64-derived doubles,
    bit-identical to the SQL ``n::DOUBLE / sum(n)::DOUBLE`` with no
    rounding."""
    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"])
    in_schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("event_type", pa.string())]
    )
    part_schema = pa.schema([("from_type", pa.string()), ("to_type", pa.string()), ("n", pa.int64())])
    out_schema = pa.schema(
        [("from_type", pa.string()), ("to_type", pa.string()), ("n", pa.int64()), ("p", pa.float64())]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return part_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        to_t = df["event_type"].to_numpy()
        from_t = np.roll(to_t, 1)
        same_user = df["user_id"].to_numpy() == np.roll(df["user_id"].to_numpy(), 1)
        same_user[0] = False
        g = (
            pd.DataFrame({"from_type": from_t[same_user], "to_type": to_t[same_user]})
            .groupby(["from_type", "to_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "from_type": pa.array(g["from_type"], type=pa.string()),
                "to_type": pa.array(g["to_type"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64()),
            },
            schema=part_schema,
        )

    partials = bucket_exchange(
        with_bucket(ev, "user_id", num_buckets, in_schema=in_schema), per_bucket, part_schema, num_buckets
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        g = (
            b.to_pandas()
            .groupby(["from_type", "to_type"], sort=False, as_index=False)["n"]
            .sum()
            .sort_values(["from_type", "to_type"], kind="mergesort")
        )
        n = g["n"].to_numpy(dtype=np.int64)
        totals = g.groupby("from_type", sort=False)["n"].transform("sum").to_numpy(dtype=np.int64)
        return pa.table(
            {
                "from_type": pa.array(g["from_type"], type=pa.string()),
                "to_type": pa.array(g["to_type"], type=pa.string()),
                "n": pa.array(n, type=pa.int64()),
                "p": pa.array(n.astype(np.float64) / totals.astype(np.float64), type=pa.float64()),
            },
            schema=out_schema,
        )

    return partials.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=None)


def user_type_history(sf_dir: str):
    """SCD-type-2 version history of each user's event_type: one row per
    CHANGE (first occurrence, or type differs from the previous event in
    the user's (ts, event_id)-ordered stream) with effective_from = the
    change's ts and effective_to = the next change's ts (NULL while
    current) — the warehouse pattern for tracking attribute versions.

    Scale shape: the same one keyed coarse-bucket exchange as
    ``user_event_deltas`` — every user's rows land in one bucket task where
    the change mask, version index, and lead(ts) run vectorized; output is
    change-sized, not event-sized. No float math at all (timestamps and
    strings), so the SQL window mirror (lag/lead over the identical
    (ts, event_id) order) matches bit-for-bit."""
    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts", "user_id", "event_type"])
    in_schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")),
         ("user_id", pa.int64()), ("event_type", pa.string())]
    )
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("version", pa.int64()), ("event_type", pa.string()),
         ("effective_from", pa.timestamp("us")), ("effective_to", pa.timestamp("us"))]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort"
        )
        g = df.groupby("user_id", sort=False)
        change = (df["event_type"] != g["event_type"].shift()).to_numpy()
        change |= g.cumcount().to_numpy() == 0  # first row: shift() NaN != str is True, but be explicit
        ch = df[change]
        cg = ch.groupby("user_id", sort=False)
        version = cg.cumcount().to_numpy() + 1
        eff_to = cg["ts"].shift(-1)
        return pa.table(
            {
                "user_id": pa.array(ch["user_id"].to_numpy(), type=pa.int64()),
                "version": pa.array(version, type=pa.int64()),
                "event_type": pa.array(ch["event_type"].tolist(), type=pa.string()),
                "effective_from": pa.array(ch["ts"], type=pa.timestamp("us")),
                "effective_to": pa.array(eff_to, type=pa.timestamp("us")),
            },
            schema=out_schema,
        )

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema),
                          per_bucket, out_schema, 64)
    return sort_coalesced(out, ["user_id", "version"])


def local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
    broadcast_max: int = BROADCAST_JOIN_MAX_ROWS,
):
    """TPC-H-Q5-shaped six-table join: revenue per nation where the customer's
    nation == the supplier's nation, one region, one order-date window.

    Plan (100-TB posture):
      * nation ⋈ region is driver-side by construction (25 x 5 rows) — the
        region's nationkey set and the id->name map ride the task closure.
      * supplier and customer are GUARDED broadcasts (suppkey->nationkey,
        custkey->nationkey dicts via ray.put) with a distributed ds.join
        fallback past ``broadcast_max`` — never an unguarded collect.
      * lineitem is pre-aggregated per (l_orderkey, s_nationkey) inside
        map_batches (combiner) and REGION-PRUNED before the one big exchange:
        only orders/lineitems whose nation survives the region filter are
        shuffled.  Revenue is quantized to int64 cents per row
        (floor(x*100+0.5), the events_zorder contract) so sums are exact and
        association-order-free on both engines.
      * the single wide exchange is the rev ⋈ orders hash join on o_orderkey;
        the final per-nation groupby is 25 rows.
    """
    import ray
    import ray.data as rd

    from ray.data.aggregate import Sum

    from text_to_graph_ray.functions.dedup import join_partitions_for

    nat = read_parquet_clean(f"{sf_dir}/nation.parquet").to_pandas()  # 25 rows by construction
    reg = read_parquet_clean(f"{sf_dir}/region.parquet").to_pandas()  # 5 rows by construction
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"].astype("int64"))
    nat_in = nat[nat["n_regionkey"].astype("int64").isin(rkeys)]
    region_nations = frozenset(int(k) for k in nat_in["n_nationkey"])
    name_of = {int(k): str(v) for k, v in zip(nat_in["n_nationkey"], nat_in["n_name"])}

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    # ---- orders -> (o_orderkey, c_nationkey), window- and region-pruned ----
    cust_ds = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ord_ds = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    ord_schema = pa.schema([("o_orderkey", pa.int64()), ("c_nat", pa.int64())])

    region_nat_arr0 = np.array(sorted(region_nations), dtype=np.int64)
    n_cust = cust_ds.count()  # metadata-cheap on parquet
    if n_cust <= broadcast_max:
        cdf = cust_ds.to_pandas().sort_values("c_custkey")
        cref = ray.put((cdf["c_custkey"].to_numpy(dtype="int64"), cdf["c_nationkey"].to_numpy(dtype="int64")))

        def orders_part(b: pa.Table) -> pa.Table:
            ckeys, cvals = ray.get(cref)
            dates = np.asarray(b.column("o_orderdate"), dtype="datetime64[us]")
            win = (dates >= lo) & (dates < hi)
            if not win.any():
                return ord_schema.empty_table()
            okeys = np.asarray(b.column("o_orderkey"), dtype=np.int64)[win]
            custs = np.asarray(b.column("o_custkey"), dtype=np.int64)[win]
            idx = np.minimum(np.searchsorted(ckeys, custs), len(ckeys) - 1)
            cn = np.where(ckeys[idx] == custs, cvals[idx], np.int64(-1))
            keep = np.isin(cn, region_nat_arr0)
            return pa.table(
                {
                    "o_orderkey": pa.array(okeys[keep], type=pa.int64()),
                    "c_nat": pa.array(cn[keep], type=pa.int64()),
                },
                schema=ord_schema,
            )

        orders = ord_ds.map_batches(orders_part, batch_format="pyarrow", batch_size=None)
    else:
        # distributed fallback: window-filter orders first (selectivity cuts
        # the join's left side), hash-join to customer, region-prune after
        def win(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.greater_equal(b.column("o_orderdate"), pa.scalar(pd.Timestamp(date_lo))),
                pc.less(b.column("o_orderdate"), pa.scalar(pd.Timestamp(date_hi))),
            )
            return b.filter(keep).select(["o_orderkey", "o_custkey"])

        # Ray 2.49's JoinOperator raises on an EMPTY hash partition (the
        # schema-less empty block reaches acero); size the partition count so
        # every partition sees >=~1k right rows — at fallback scale (>5M
        # rows) this is join_partitions_for(), at test-forced scale it is 1
        j = ord_ds.map_batches(win, batch_format="pyarrow", batch_size=None).join(
            cust_ds,
            join_type="inner",
            num_partitions=max(1, min(join_partitions_for(), n_cust // 1000 + 1)),
            on=("o_custkey",),
            right_on=("c_custkey",),
            partition_size_hint=32 << 20,
        )
        nat_arr = np.array(sorted(region_nations), dtype=np.int64)

        def prune(b: pa.Table) -> pa.Table:
            cn = pc.cast(b.column("c_nationkey"), pa.int64())
            keep = pc.is_in(cn, value_set=pa.array(nat_arr))
            f = b.filter(keep)
            return pa.table(
                {"o_orderkey": pc.cast(f.column("o_orderkey"), pa.int64()), "c_nat": pc.cast(f.column("c_nationkey"), pa.int64())},
                schema=ord_schema,
            )

        orders = j.map_batches(prune, batch_format="pyarrow", batch_size=None)

    # ---- lineitem -> per-(orderkey, s_nationkey) cents partials ----
    supp_ds = read_parquet_clean(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    rev_schema = pa.schema([("l_orderkey", pa.int64()), ("s_nat", pa.int64()), ("cents", pa.int64()), ("n", pa.int64())])

    n_supp = supp_ds.count()
    region_nat_arr = np.array(sorted(region_nations), dtype=np.int64)
    if n_supp <= broadcast_max:
        sdf = supp_ds.to_pandas().sort_values("s_suppkey")
        # sorted (keys, nationkeys) arrays: the per-batch lookup is a
        # vectorized searchsorted, never a per-row dict probe
        sref = ray.put(
            (sdf["s_suppkey"].to_numpy(dtype="int64"), sdf["s_nationkey"].to_numpy(dtype="int64"))
        )

        def li_part(b: pa.Table) -> pa.Table:
            skeys, svals = ray.get(sref)
            ok = np.asarray(b.column("l_orderkey"), dtype=np.int64)
            sk = np.asarray(b.column("l_suppkey"), dtype=np.int64)
            idx = np.searchsorted(skeys, sk)
            idx_c = np.minimum(idx, len(skeys) - 1)
            valid = skeys[idx_c] == sk
            sn = np.where(valid, svals[idx_c], np.int64(-1))
            keep = np.isin(sn, region_nat_arr)
            if not keep.any():
                return rev_schema.empty_table()
            price = np.asarray(b.column("l_extendedprice"), dtype=np.float64)[keep]
            disc = np.asarray(b.column("l_discount"), dtype=np.float64)[keep]
            # ((price * (1-disc)) * 100) + 0.5 — the exact SQL expression tree
            cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            g = (
                pa.table(
                    {
                        "l_orderkey": pa.array(ok[keep], type=pa.int64()),
                        "s_nat": pa.array(sn[keep], type=pa.int64()),
                        "cents": pa.array(cents, type=pa.int64()),
                    }
                )
                .group_by(["l_orderkey", "s_nat"])
                .aggregate([("cents", "sum"), ("cents", "count")])
            )
            return pa.table(
                {
                    "l_orderkey": g.column("l_orderkey"),
                    "s_nat": g.column("s_nat"),
                    "cents": g.column("cents_sum"),
                    "n": pc.cast(g.column("cents_count"), pa.int64()),
                },
                schema=rev_schema,
            )

        rev = li.map_batches(li_part, batch_format="pyarrow", batch_size=None)
    else:
        # distributed fallback: region-prune supplier FIRST (5x shrink), then
        # hash-join lineitem to the pruned supplier table
        nat_arr = np.array(sorted(region_nations), dtype=np.int64)
        supp_pruned = supp_ds.map_batches(
            lambda b: b.filter(pc.is_in(pc.cast(b.column("s_nationkey"), pa.int64()), value_set=pa.array(nat_arr))),
            batch_format="pyarrow",
        )
        supp_pruned = supp_pruned.materialize()  # small by region-prune; counted to size the join
        n_supp_region = supp_pruned.count()
        j = li.join(
            supp_pruned,
            join_type="inner",
            num_partitions=max(1, min(join_partitions_for(), n_supp_region // 1000 + 1)),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
            partition_size_hint=32 << 20,
        )

        def li_fold(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return rev_schema.empty_table()
            price = np.asarray(b.column("l_extendedprice"), dtype=np.float64)
            disc = np.asarray(b.column("l_discount"), dtype=np.float64)
            cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            g = (
                pa.table(
                    {
                        "l_orderkey": pc.cast(b.column("l_orderkey"), pa.int64()),
                        "s_nat": pc.cast(b.column("s_nationkey"), pa.int64()),
                        "cents": pa.array(cents, type=pa.int64()),
                    }
                )
                .group_by(["l_orderkey", "s_nat"])
                .aggregate([("cents", "sum"), ("cents", "count")])
            )
            return pa.table(
                {
                    "l_orderkey": g.column("l_orderkey"),
                    "s_nat": g.column("s_nat"),
                    "cents": g.column("cents_sum"),
                    "n": pc.cast(g.column("cents_count"), pa.int64()),
                },
                schema=rev_schema,
            )

        rev = j.map_batches(li_fold, batch_format="pyarrow", batch_size=None)

    # ---- the one wide exchange: rev ⋈ orders on o_orderkey, expressed as a
    # tagged union + coarse-bucket cogroup (functions/joins.py idiom).  Ray
    # 2.49's JoinOperator raises when a hash partition's right side is empty
    # (schema-less empty block reaching acero), and an empty window/region IS
    # a legitimate runtime state here — the bucket exchange handles empty
    # sides/buckets by construction and ships the same bytes. ----
    from text_to_graph_ray.functions.agg import bucket_exchange, with_bucket

    union_schema = pa.schema(
        [
            ("k", pa.int64()),
            ("side", pa.int64()),
            ("s_nat", pa.int64()),
            ("cents", pa.int64()),
            ("n", pa.int64()),
            ("c_nat", pa.int64()),
        ]
    )

    def tag_rev(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(b.num_rows, dtype=np.int64))
        return pa.table(
            {
                "k": pc.cast(b.column("l_orderkey"), pa.int64()),
                "side": z,
                "s_nat": b.column("s_nat"),
                "cents": b.column("cents"),
                "n": b.column("n"),
                "c_nat": z,
            },
            schema=union_schema,
        )

    def tag_ord(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(b.num_rows, dtype=np.int64))
        one = pa.array(np.ones(b.num_rows, dtype=np.int64))
        return pa.table(
            {
                "k": pc.cast(b.column("o_orderkey"), pa.int64()),
                "side": one,
                "s_nat": z,
                "cents": z,
                "n": z,
                "c_nat": b.column("c_nat"),
            },
            schema=union_schema,
        )

    unioned = rev.map_batches(tag_rev, batch_format="pyarrow", batch_size=None).union(
        orders.map_batches(tag_ord, batch_format="pyarrow", batch_size=None)
    )

    part_schema = pa.schema([("s_nat", pa.int64()), ("cents", pa.int64()), ("n", pa.int64())])

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        left = df.loc[df["side"] == 0, ["k", "s_nat", "cents", "n"]]
        right = df.loc[df["side"] == 1, ["k", "c_nat"]]
        if left.empty or right.empty:
            return part_schema.empty_table()
        m = left.merge(right, on="k", how="inner")
        m = m[m["s_nat"] == m["c_nat"]]
        if m.empty:
            return part_schema.empty_table()
        g = m.groupby("s_nat", as_index=False).agg(cents=("cents", "sum"), n=("n", "sum"))
        return pa.table(
            {
                "s_nat": pa.array(g["s_nat"].to_numpy(dtype="int64")),
                "cents": pa.array(g["cents"].to_numpy(dtype="int64")),
                "n": pa.array(g["n"].to_numpy(dtype="int64")),
            },
            schema=part_schema,
        )

    parts = bucket_exchange(with_bucket(unioned, "k", 64, in_schema=union_schema), per_bucket, part_schema, 64)
    out_schema = pa.schema([("n_name", pa.string()), ("revenue", pa.float64()), ("n_items", pa.int64())])
    # parts is bounded (<= 25 rows per bucket) and already materialized by the
    # exchange; an empty result would lose its schema through groupby+sort
    if parts.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    agg = (
        parts.repartition(1)
        .groupby("s_nat")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n_items"))
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        names = [name_of[int(k)] for k in b.column("s_nat").to_pylist()]
        cents = np.asarray(b.column("cents"), dtype=np.int64)
        return pa.table(
            {
                "n_name": pa.array(names, type=pa.string()),
                "revenue": pa.array(np.round(cents / 100.0, 2), type=pa.float64()),
                "n_items": pc.cast(b.column("n_items"), pa.int64()),
            },
            schema=out_schema,
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(["revenue", "n_name"], descending=[True, False])


def user_ema(sf_dir: str, max_shift: int = 62):
    """Per-user exponential moving average (α = 0.5) of event value over the
    (ts, event_id) order — the classic smoothed-activity feature. Recursive
    EMAs are order-dependent float folds, so the CONTRACT makes every term
    integer: e_n = Σᵢ xᵢ / 2^wᵢ with wᵢ = n−i+1 (and n−1 for the first
    event) becomes q = Σᵢ (centsᵢ · 10⁶) >> min(wᵢ, max_shift) — each term
    floor-divided SEPARATELY (a right shift), so the sum is
    order-independent and bit-reproducible on both engines; terms older
    than ``max_shift`` halvings underflow to 0 exactly like the SQL mirror.
    Output ema = float(q) / 1e8 — one IEEE division of an exact int, no
    rounding call (round()'s half-away vs numpy's half-even WOULD diverge
    on q ≡ 50 mod 100).

    Scale shape: ONE user-keyed coarse-bucket exchange, then a vectorized
    per-bucket sort + segment kernel (np.add.reduceat over group starts —
    no per-user dispatch)."""
    import numpy as np
    import pyarrow as pa

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    in_schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("value", pa.float64())]
    )
    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()), ("ema_q", pa.int64()), ("ema", pa.float64())]
    )

    def per_bucket(df):
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy(dtype=np.int64)
        cents = np.floor(df["value"].to_numpy(dtype=np.float64) * 100 + 0.5).astype(np.int64)
        n = len(uid)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        cnt = np.repeat(sizes, sizes)
        rn = np.arange(n) - np.repeat(starts, sizes) + 1  # 1-based within user
        w = np.where(rn == 1, cnt - 1, cnt - rn + 1)
        terms = (cents * 1_000_000) >> np.minimum(w, max_shift)
        q = np.add.reduceat(terms, starts)
        return pa.table({
            "user_id": pa.array(uid[starts], type=pa.int64()),
            "n_events": pa.array(sizes.astype(np.int64), type=pa.int64()),
            "ema_q": pa.array(q.astype(np.int64), type=pa.int64()),
            "ema": pa.array(q.astype(np.float64) / 1e8, type=pa.float64()),
        }, schema=out_schema)

    out = bucket_exchange(with_bucket(ev, "user_id", 64, in_schema=in_schema), per_bucket, out_schema, 64)
    return sort_coalesced(out, "user_id")


def returned_revenue_topk(sf_dir: str, k: int = 20):
    """TPC-H-Q10-shaped: top-k customers by revenue lost to RETURNED items
    (l_returnflag = 'R'), enriched with name and nation.

    Integer-exact revenue: per row rev_q = cents · (100 − discount_pct),
    both quantized with floor(v·100 + 0.5) — the sum is an exact int64 at
    any block order, and revenue = float(rev_q)/1e4 is ONE int→double
    division mirrored verbatim in SQL (no rounding call).

    Plan: pruned filtered scan → per-block order-key combiner → distributed
    FK hash join to orders (order→customer fan-in) → customer-keyed
    bucketed sum → per-block top-k partials merged on the driver
    (answer-sized: ≤ blocks·k rows) → the k winners' name/nation fetched
    with an is_in scan of the dimension tables (no second join exchange).
    """
    import numpy as np
    import ray.data as rd

    from text_to_graph_ray.functions.agg import bucketed_aggregate
    from text_to_graph_ray.functions.dedup import join_partitions_for

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    part_schema = pa.schema([("l_orderkey", pa.int64()), ("rev_q", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        b = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        if b.num_rows == 0:
            return part_schema.empty_table()
        cents = np.floor(b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        dpct = np.floor(b.column("l_discount").to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        g = pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "rev_q": pa.array(cents * (100 - dpct), type=pa.int64()),
        }).group_by("l_orderkey").aggregate([("rev_q", "sum")])
        return pa.table({"l_orderkey": g.column("l_orderkey"), "rev_q": g.column("rev_q_sum")},
                        schema=part_schema)

    rev = bucketed_aggregate(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "l_orderkey", {"rev_q": ("rev_q", "sum")}, out_schema=part_schema, in_schema=part_schema,
    )
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    j = rev.join(orders, join_type="inner", num_partitions=join_partitions_for(),
                 on=("l_orderkey",), right_on=("o_orderkey",), partition_size_hint=32 << 20)
    cust_schema = pa.schema([("o_custkey", pa.int64()), ("rev_q", pa.int64())])
    by_cust = bucketed_aggregate(j, "o_custkey", {"rev_q": ("rev_q", "sum")},
                                 out_schema=cust_schema, in_schema=None)

    def block_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return cust_schema.empty_table()
        return b.sort_by([("rev_q", "descending"), ("o_custkey", "ascending")]).slice(0, k)

    partials = by_cust.map_batches(block_topk, batch_format="pyarrow", batch_size=None).take_all()
    topk = sorted(partials, key=lambda r: (-r["rev_q"], r["o_custkey"]))[:k]
    out_schema = pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()), ("n_name", pa.string()),
        ("revenue", pa.float64()),
    ])
    if not topk:
        return rd.from_arrow(out_schema.empty_table())
    keys = pa.array(sorted(r["o_custkey"] for r in topk), type=pa.int64())
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"])
    matched = cust.map_batches(
        lambda b: b.filter(pc.is_in(b.column("c_custkey"), value_set=keys)), batch_format="pyarrow"
    ).take_all()
    nations = {r["n_nationkey"]: r["n_name"]
               for r in read_parquet_clean(f"{sf_dir}/nation.parquet",
                                           columns=["n_nationkey", "n_name"]).take_all()}
    meta = {r["c_custkey"]: (r["c_name"], nations[r["c_nationkey"]]) for r in matched}
    return rd.from_arrow(pa.table({
        "c_custkey": pa.array([r["o_custkey"] for r in topk], type=pa.int64()),
        "c_name": pa.array([meta[r["o_custkey"]][0] for r in topk], type=pa.string()),
        "n_name": pa.array([meta[r["o_custkey"]][1] for r in topk], type=pa.string()),
        "revenue": pa.array([float(r["rev_q"]) / 1e4 for r in topk], type=pa.float64()),
    }, schema=out_schema))


def cusum_changepoint(sf_dir: str, overflow_guard: int = 1 << 62):
    """Per-event-type CUSUM change-point statistic over the (ts, event_id)
    order: the classic drift detector. To stay integer-exact, the centered
    cumulative sum S_k = Σ_{i≤k}(xᵢ − mean) is scaled by n:
    stat_k = n·prefix_k − k·total (all int64), and the output is
    (event_type, n_events, cusum_q = max|stat_k|, pos = first argmax k).
    Pure-integer result — order-independent and partition-invariant.

    Scale shape (the gini_exact discipline, NOT a per-type task): event_type
    is low-cardinality, so a type-keyed exchange would serialize each type's
    10⁸ rows into one task. Instead: ONE distributed sort by (type, ts,
    event_id) — the unavoidable exchange — then two streamed block passes.
    Pass 1 ships per-(block, type-segment) COUNT and SUM only; the driver
    folds blocks·types tuples into global totals and per-block running
    bases. Pass 2 recomputes each block's local prefix and maximizes
    |n·(base_pref + local_pref) − (base_k + local_k)·total| per segment —
    per-block maxima (answer-sized) merge on the driver by (stat desc,
    pos asc), reproducing the single-pass first-argmax exactly. Guarded
    loudly when n·|prefix| approaches 2^63 (n per type ≲ 4·10⁸ at cent
    scale; past that, fold in Python ints like gini_exact)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type", "value"])
    prep_schema = pa.schema([
        ("event_type", pa.string()), ("ts", pa.timestamp("us")), ("event_id", pa.int64()),
        ("cents", pa.int64()),
    ])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return prep_schema.empty_table()
        cents = np.floor(t.column("value").to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        return pa.table({
            "event_type": t.column("event_type"), "ts": t.column("ts"),
            "event_id": t.column("event_id"), "cents": pa.array(cents, type=pa.int64()),
        }, schema=prep_schema)

    out_schema = pa.schema([
        ("event_type", pa.string()), ("n_events", pa.int64()), ("cusum_q", pa.int64()),
        ("pos", pa.int64()),
    ])
    sorted_ds = ev.map_batches(prep, batch_format="pyarrow").sort(
        ["event_type", "ts", "event_id"]).materialize()
    refs = sorted_ds.to_arrow_refs()

    def _segments(t: pa.Table):
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        n = len(et)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = et[1:] != et[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        return et, starts, sizes

    @ray.remote
    def seg_sums(t: pa.Table):
        if t.num_rows == 0:
            return []
        et, starts, sizes = _segments(t)
        cents = t.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
        return [(str(et[s]), int(sz), int(cents[s:s + sz].sum(dtype=np.int64)))
                for s, sz in zip(starts, sizes)]

    per_block = ray.get([seg_sums.remote(r) for r in refs])
    totals_n: dict = {}
    totals_sum: dict = {}
    for segs in per_block:
        for ty, cnt, sm in segs:
            totals_n[ty] = totals_n.get(ty, 0) + cnt
            totals_sum[ty] = totals_sum.get(ty, 0) + sm
    if not totals_n:
        return rd.from_arrow(out_schema.empty_table())
    # per-block running bases (blocks are already in global sort order)
    bases = []  # one dict per block: type -> (base_k, base_pref)
    run_k: dict = {}
    run_p: dict = {}
    for segs in per_block:
        b = {ty: (run_k.get(ty, 0), run_p.get(ty, 0)) for ty, _, _ in segs}
        bases.append(b)
        for ty, cnt, sm in segs:
            run_k[ty] = run_k.get(ty, 0) + cnt
            run_p[ty] = run_p.get(ty, 0) + sm

    @ray.remote
    def block_max(t: pa.Table, base: dict, tn: dict, ts_: dict, guard: int):
        if t.num_rows == 0:
            return []
        et, starts, sizes = _segments(t)
        cents = t.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
        out = []
        for s, sz in zip(starts, sizes):
            ty = str(et[s])
            n_ty, tot = tn[ty], ts_[ty]
            bk, bp = base[ty]
            lp = np.cumsum(cents[s:s + sz]) + bp     # global prefix
            lk = np.arange(1, sz + 1, dtype=np.int64) + bk  # global k
            if int(np.abs(lp).max(initial=0)) * n_ty >= guard or abs(tot) * int(lk[-1]) >= guard:
                raise ValueError("cusum_changepoint: n*prefix risks int64 overflow; "
                                 "rescale the value column or fold in Python ints")
            stat = np.abs(n_ty * lp - lk * tot)
            j = int(np.argmax(stat))  # first max within this block
            out.append((ty, int(stat[j]), int(lk[j])))
        return out

    maxima = ray.get([
        block_max.remote(r, b, totals_n, totals_sum, overflow_guard)
        for r, b in zip(refs, bases)
    ])
    best: dict = {}
    for rows in maxima:
        for ty, st, pos in rows:
            cur = best.get(ty)
            if cur is None or (st, -pos) > (cur[0], -cur[1]):
                best[ty] = (st, pos)
    types = sorted(best)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(types, type=pa.string()),
        "n_events": pa.array([totals_n[t] for t in types], type=pa.int64()),
        "cusum_q": pa.array([best[t][0] for t in types], type=pa.int64()),
        "pos": pa.array([best[t][1] for t in types], type=pa.int64()),
    }, schema=out_schema))


def ohlc_bars(sf_dir: str, window_s: int = 300):
    """Per-(event_type, tumbling window) OHLC bars — open/high/low/close/
    volume, the classic time-series rollup whose open/close are
    ORDER-dependent firsts/lasts (not plain aggregates). All values are
    integer cents; open = cents at min (ts, event_id) within the bar,
    close = at max — exact on both engines with no float math.

    Scale shape: ONE (type, window)-keyed coarse-bucket exchange (bar
    cardinality grows with the time span, not the row count, but each
    bar's rows land whole in one bucket task), then a vectorized
    per-bucket sort + segment kernel."""
    import numpy as np
    import pyarrow as pa

    from text_to_graph_ray.functions.agg import BUCKET_COL, bucket_exchange, with_bucket
    from text_to_graph_ray.util import sort_coalesced

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type", "value"])
    prep_schema = pa.schema([
        ("event_type", pa.string()), ("w", pa.int64()), ("ts", pa.timestamp("us")),
        ("event_id", pa.int64()), ("cents", pa.int64()),
    ])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return prep_schema.empty_table()
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        w = ts // (window_s * 1_000_000)
        cents = np.floor(t.column("value").to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        return pa.table({
            "event_type": t.column("event_type"), "w": pa.array(w, type=pa.int64()),
            "ts": t.column("ts"), "event_id": t.column("event_id"),
            "cents": pa.array(cents, type=pa.int64()),
        }, schema=prep_schema)

    out_schema = pa.schema([
        ("event_type", pa.string()), ("w", pa.int64()), ("open", pa.int64()),
        ("high", pa.int64()), ("low", pa.int64()), ("close", pa.int64()),
        ("volume", pa.int64()),
    ])

    def per_bucket(df):
        if len(df) == 0:
            return out_schema.empty_table()
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["event_type", "w", "ts", "event_id"], kind="mergesort")
        g = df.groupby(["event_type", "w"], as_index=False, sort=False).agg(
            open=("cents", "first"), high=("cents", "max"), low=("cents", "min"),
            close=("cents", "last"), volume=("cents", "size"))
        return pa.table({f.name: pa.array(g[f.name], type=f.type) for f in out_schema},
                        schema=out_schema)

    out = bucket_exchange(
        with_bucket(ev.map_batches(prep, batch_format="pyarrow"), ["event_type", "w"], 64,
                    in_schema=prep_schema),
        per_bucket, out_schema, 64,
    )
    return sort_coalesced(out, ["event_type", "w"])
