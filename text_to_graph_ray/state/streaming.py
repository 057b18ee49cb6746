"""Incremental (micro-batch) streaming window aggregation.

The batch pipelines (`analytics.events_tumbling_window`) window a COMPLETE
table; this module is the streaming shape: events arrive in arbitrary-order
micro-batches, sharded stateful actors keep per-(key, window) partial
aggregates, and a window finalizes ("fires") when the watermark
(= max event-time seen − allowed lateness) passes its end. Events later than
the watermark are counted as dropped, not applied — the standard
watermark/lateness contract.

This is one of the few places the Dataset API genuinely can't express the
semantics (shared mutable per-window state across an unbounded stream), so it
drops to raw Ray actors; sharding by key hash is the multi-node scale path
(each shard owns a disjoint key subspace, no cross-shard coordination).

Determinism: per-window sums are order-sensitive float adds, so emitted
sums are rounded (4 dp) like every float aggregate in this repo; counts and
window assignment are exact, so the fully-fed stream reproduces the batch
pipeline's result exactly (asserted in tests and by the driver oracle).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


@ray.remote
class WindowShard:
    """One shard of the streaming tumbling-window state. Owns keys with
    crc32(key) % num_shards == shard_id; ignores other rows."""

    def __init__(self, shard_id: int, num_shards: int, window_s: int, lateness_s: int):
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.window_s = window_s
        self.lateness_s = lateness_s
        self.state: dict[tuple, list] = {}  # (key, w) -> [sum, n]
        self.watermark = float("-inf")
        self.dropped = 0

    def _mine(self, key: str) -> bool:
        return zlib.crc32(key.encode("utf-8")) % self.num_shards == self.shard_id

    def feed(self, batch: pa.Table) -> list[dict]:
        """Apply one micro-batch; returns windows finalized by the advanced
        watermark (rows: key, w, sum_value, n_events).

        The batch is applied against the PRE-batch watermark and the
        watermark advances only afterwards — otherwise a perfectly ordered
        stream would retroactively drop a batch's own earlier events the
        moment its max timestamp arrived."""
        keys = batch.column("event_type").to_pylist()
        epochs = np.asarray(batch.column("epoch").to_pylist(), dtype=np.float64)
        values = np.asarray(batch.column("value").to_pylist(), dtype=np.float64)
        for k, e, v in zip(keys, epochs, values):
            if not self._mine(k):
                continue
            if e < self.watermark:
                self.dropped += 1  # too late: past-watermark event is not applied
                continue
            w = int(np.floor(e / self.window_s))
            st = self.state.get((k, w))
            if st is None:
                self.state[(k, w)] = [float(v), 1]
            else:
                st[0] += float(v)
                st[1] += 1
        if len(epochs):
            self.watermark = max(self.watermark, float(epochs.max()) - self.lateness_s)
        return self._fire()

    def _fire(self) -> list[dict]:
        out = []
        for (k, w) in sorted(self.state):
            if (w + 1) * self.window_s <= self.watermark:
                s, n = self.state.pop((k, w))
                out.append({"event_type": k, "w": w, "sum_value": round(s, 4), "n_events": n})
        return out

    def flush(self) -> list[dict]:
        """End of stream: emit everything still open."""
        out = [
            {"event_type": k, "w": w, "sum_value": round(s, 4), "n_events": n}
            for (k, w), (s, n) in sorted(self.state.items())
        ]
        self.state.clear()
        return out

    def stats(self) -> dict:
        return {"shard": self.shard_id, "open_windows": len(self.state), "watermark": self.watermark, "dropped": self.dropped}


@ray.remote
def _feed_split(it, shard_actors, num_shards: int, micro_batch_rows: int) -> list[dict]:
    """One parallel feeder: consumes its streaming_split iterator, partitions
    each micro-batch by owning shard (crc32(key) % num_shards — the shard's
    own ownership rule) and ships each shard ONLY its rows. Collects the
    windows its feeds fired."""
    rows: list[dict] = []
    for b in it.iter_batches(batch_size=micro_batch_rows, batch_format="pyarrow"):
        keys = b.column("event_type").to_pylist()
        owners = np.fromiter(
            (zlib.crc32(k.encode("utf-8")) % num_shards for k in keys), dtype=np.int64, count=len(keys)
        )
        futs = []
        for s in range(num_shards):
            mask = owners == s
            if mask.any():
                futs.append(shard_actors[s].feed.remote(b.filter(pa.array(mask))))
        for fired in ray.get(futs):
            rows.extend(fired)
    return rows


def stream_tumbling_window(
    ds,
    window_s: int = 300,
    lateness_s: int = 10**12,
    num_shards: int = 2,
    micro_batch_rows: int = 4096,
    num_feeders: int | None = None,
):
    """Drive a Dataset through the sharded accumulators as a micro-batch
    stream fed by PARALLEL Ray tasks: ``Dataset.streaming_split(num_feeders)``
    hands each feeder task its own iterator, so ingestion scales with feeders
    × shards and the driver never touches a micro-batch (it only launches the
    feeders and collects their fired-window lists — no per-batch ``ray.get``
    loop). Returns the concatenated finalized windows as pandas (sorted).

    With lateness covering the full disorder of the input, the result equals
    the batch pipeline's tumbling windows exactly (driver oracle + tests).
    With FINITE lateness, drop behavior depends on arrival order, which
    parallel feeding makes nondeterministic — order-sensitive lateness tests
    drive ``WindowShard.feed`` directly instead."""
    shards = [WindowShard.remote(i, num_shards, window_s, lateness_s) for i in range(num_shards)]

    def prep(b: pa.Table) -> pa.Table:
        epochs = b.column("ts").to_pandas().values.astype("datetime64[ns]").astype("int64") / 1e9
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "epoch": pa.array(epochs, type=pa.float64()),
                "value": b.column("value"),
            }
        )

    n_feed = num_feeders or num_shards
    splits = ds.map_batches(prep, batch_format="pyarrow").streaming_split(n_feed, equal=False)
    rows: list[dict] = []
    for part in ray.get([_feed_split.remote(it, shards, num_shards, micro_batch_rows) for it in splits]):
        rows.extend(part)
    for flushed in ray.get([s.flush.remote() for s in shards]):
        rows.extend(flushed)

    df = pd.DataFrame(rows, columns=["event_type", "w", "sum_value", "n_events"])
    df["w"] = df["w"].astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    return df.sort_values(["event_type", "w"]).reset_index(drop=True)
