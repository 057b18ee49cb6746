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
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
    cut = np.datetime64(cutoff)

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["l_shipdate"] < cut]
        if df.empty:
            return pa.table(
                {k: pa.array([], type=pa.string() if k in ("l_returnflag", "l_linestatus") else pa.float64())
                 for k in ["l_returnflag", "l_linestatus", "s_qty", "s_price", "s_disc", "n"]}
            )
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            s_qty=("l_quantity", "sum"),
            s_price=("l_extendedprice", "sum"),
            s_disc=("l_discount", "sum"),
            n=("l_quantity", "size"),
        )
        g["n"] = g["n"].astype("float64")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("s_qty", alias_name="sum_qty"),
        Sum("s_price", alias_name="sum_price"),
        Sum("s_disc", alias_name="sum_disc"),
        Sum("n", alias_name="n_rows"),
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_qty"] = df["sum_qty"] / df["n_rows"]
        df["avg_disc"] = df["sum_disc"] / df["n_rows"]
        df["n_rows"] = df["n_rows"].astype("int64")
        df = _round_cols(df, {"sum_qty": 2, "sum_price": 2, "avg_qty": 4, "avg_disc": 4})
        return df[["l_returnflag", "l_linestatus", "sum_qty", "sum_price", "avg_qty", "avg_disc", "n_rows"]]

    return agg.map_batches(finish, batch_format="pandas").sort(["l_returnflag", "l_linestatus"])


def segment_revenue(sf_dir: str):
    """orders ⋈ customer (broadcast small side inside map_batches — no
    shuffle join) -> revenue per market segment."""
    import ray
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    ref = ray.put(seg_of)

    def partial(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        df = b.to_pandas()
        df["seg"] = df["o_custkey"].map(m)
        g = df.groupby("seg", as_index=False).agg(total=("o_totalprice", "sum"), n=("o_totalprice", "size"))
        g["n"] = g["n"].astype("float64")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("seg").aggregate(
        Sum("total", alias_name="revenue"), Sum("n", alias_name="n_orders")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["revenue"].round(2)
        df["n_orders"] = df["n_orders"].astype("int64")
        return df[["seg", "revenue", "n_orders"]]

    return agg.map_batches(finish, batch_format="pandas").sort("seg")


def top_orders(sf_dir: str, k: int = 10):
    """sort desc + limit; deterministic tie-break on o_orderkey."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def events_tumbling_window(sf_dir: str, window_s: int = 300):
    """Streaming-shaped tumbling-window aggregate over the event log:
    (event_type, floor(epoch/window)) -> count + sum(value). Windowing is a
    pure column computation, so it pre-aggregates per batch and needs only the
    tiny final groupby — no ordering assumption at all."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        # normalize to ns first: parquet timestamps may surface as datetime64[us]
        epoch = df["ts"].values.astype("datetime64[ns]").astype("int64") / 1e9
        df["w"] = np.floor(epoch / window_s).astype("int64")
        g = df.groupby(["event_type", "w"], as_index=False).agg(s=("value", "sum"), n=("value", "size"))
        g["n"] = g["n"].astype("float64")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(["event_type", "w"]).aggregate(
        Sum("s", alias_name="sum_value"), Sum("n", alias_name="n_events")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(4)
        df["n_events"] = df["n_events"].astype("int64")
        return df[["event_type", "w", "sum_value", "n_events"]]

    return agg.map_batches(finish, batch_format="pandas").sort(["event_type", "w"])


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Session windows per user: sort within user group by ts, split on gaps >
    gap_s (groupby(user).map_groups over the sorted group — the documented
    pattern for stream-shaped work in Ray Data). Returns per-session rows."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

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
        return out.reset_index(drop=True)

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas").sort(["user_id", "start_epoch"])
