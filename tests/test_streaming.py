"""Streaming accumulator semantics: batch-equivalence under full lateness,
watermark firing, and late-event dropping."""

import pandas as pd
import pyarrow as pa
import pytest


def test_stream_equals_batch_windows(ray_session):
    import ray.data as rd

    from text_to_graph_ray.pipelines.analytics import events_tumbling_window
    from text_to_graph_ray.state.streaming import stream_tumbling_window

    sf = "/root/testdata/sf0.001"
    batch = events_tumbling_window(sf).to_pandas()
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["ts", "event_type", "value"])
    stream = stream_tumbling_window(ds, micro_batch_rows=257, num_shards=3)
    cols = ["event_type", "w", "sum_value", "n_events"]
    a = batch[cols].sort_values(cols).reset_index(drop=True)
    b = stream[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)


def test_ordered_stream_zero_lateness_drops_nothing(ray_session):
    """An in-order stream with lateness 0 must not drop its own batch's
    events (the batch applies BEFORE the watermark advances)."""
    import ray

    from text_to_graph_ray.state.streaming import WindowShard

    shard = WindowShard.remote(0, 1, window_s=10, lateness_s=0)

    def tbl(rows):
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], type=pa.string()),
                "epoch": pa.array([float(r[1]) for r in rows], type=pa.float64()),
                "value": pa.array([float(r[2]) for r in rows], type=pa.float64()),
            }
        )

    fired = ray.get(shard.feed.remote(tbl([("a", t, 1.0) for t in range(0, 25)])))  # [0,25) in order
    fired += ray.get(shard.feed.remote(tbl([("a", t, 1.0) for t in range(25, 45)])))
    fired += ray.get(shard.flush.remote())
    stats = ray.get(shard.stats.remote())
    assert stats["dropped"] == 0
    assert sum(f["n_events"] for f in fired) == 45


def test_watermark_fires_and_drops_late_events(ray_session):
    import ray

    from text_to_graph_ray.state.streaming import WindowShard

    shard = WindowShard.remote(0, 1, window_s=10, lateness_s=5)

    def tbl(rows):
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], type=pa.string()),
                "epoch": pa.array([float(r[1]) for r in rows], type=pa.float64()),
                "value": pa.array([float(r[2]) for r in rows], type=pa.float64()),
            }
        )

    # window [0,10) gets two events; then time advances to 40 -> watermark 35
    fired = ray.get(shard.feed.remote(tbl([("a", 1, 1.0), ("a", 2, 2.0)])))
    assert fired == []  # watermark still behind
    fired = ray.get(shard.feed.remote(tbl([("a", 40, 1.0)])))
    assert {(f["event_type"], f["w"], f["sum_value"], f["n_events"]) for f in fired} == {("a", 0, 3.0, 2)}

    # an event at epoch 3 is now far behind the watermark (35): dropped
    fired = ray.get(shard.feed.remote(tbl([("a", 3, 9.0)])))
    assert fired == []
    stats = ray.get(shard.stats.remote())
    assert stats["dropped"] == 1

    # flush emits the still-open window [40,50)
    flushed = ray.get(shard.flush.remote())
    assert {(f["event_type"], f["w"], f["n_events"]) for f in flushed} == {("a", 4, 1)}
