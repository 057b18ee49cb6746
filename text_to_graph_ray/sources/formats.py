"""Multi-format ingest: JSONL / CSV readers normalized onto the documents
schema, plus deterministic format-conversion helpers for the oracle gate.

Reference parity: the reference's sources are PDF extractors feeding a text
column (SURVEY §2.1 S1/S2 — N/A for a text-parquet engine); a COMPLETE data
engine still needs the common interchange formats. Both readers are thin
wrappers over Ray Data's native distributed readers (`read_json` /
`read_csv` stream file shards exactly like `read_parquet` streams row
groups), with the same schema-metadata hygiene as ``read_parquet_clean`` and
explicit column projection applied immediately after the scan (JSON/CSV
cannot prune at the read the way parquet does — the projection bounds what
enters the object store to the requested columns).
"""

from __future__ import annotations

import os

import pyarrow as pa

_CACHE_ROOT = "/tmp/graft_formats/v1"


def read_jsonl(path: str, columns: list[str] | None = None):
    """Distributed JSONL read -> column-pruned Arrow blocks."""
    import ray.data as rd

    ds = rd.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_csv(path: str, columns: list[str] | None = None):
    """Distributed CSV read -> column-pruned Arrow blocks."""
    import ray.data as rd

    ds = rd.read_csv(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def _ensure_converted(sf_dir: str, fmt: str) -> str:
    """Deterministic one-time conversion of documents.parquet into JSONL/CSV
    under /tmp (cached by sf dir; the gate's oracle reads the SAME file with
    DuckDB's read_json_auto / read_csv_auto, so the conversion cannot hide an
    engine bug). Only metadata columns are exported — text stays out of the
    interchange fixtures to keep them byte-stable across writers."""
    import duckdb

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(_CACHE_ROOT, tag, f"documents.{fmt}")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    con = duckdb.connect()
    src = os.path.join(sf_dir, "documents.parquet")
    tmp = out + ".tmp"
    if fmt == "jsonl":
        con.sql(
            f"COPY (SELECT doc_id, source, lang, n_chars FROM read_parquet('{src}') ORDER BY doc_id) "
            f"TO '{tmp}' (FORMAT JSON)"
        )
    elif fmt == "csv":
        con.sql(
            f"COPY (SELECT doc_id, source, lang, n_chars FROM read_parquet('{src}') ORDER BY doc_id) "
            f"TO '{tmp}' (FORMAT CSV, HEADER)"
        )
    else:
        raise ValueError(fmt)
    os.replace(tmp, out)
    return out


def source_stats_from(ds):
    """Per-(source, lang) doc counts + char sums over any documents-shaped
    dataset — the combiner-first catalog aggregate, format-agnostic."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from text_to_graph_ray.util import pa_from_pandas, sort_coalesced

    part_schema = pa.schema(
        [("source", pa.string()), ("lang", pa.string()), ("n_docs", pa.int64()), ("chars", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return part_schema.empty_table()
        df = pd.DataFrame(
            {
                "source": b.column("source").to_pylist(),
                "lang": b.column("lang").to_pylist(),
                "n_chars": b.column("n_chars").to_numpy(zero_copy_only=False).astype("int64"),
            }
        )
        g = df.groupby(["source", "lang"], as_index=False).agg(n_docs=("n_chars", "size"), chars=("n_chars", "sum"))
        return pa.table({f.name: pa.array(g[f.name], type=f.type) for f in part_schema}, schema=part_schema)

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby(["source", "lang"]).aggregate(
        Sum("n_docs", alias_name="n_docs"), Sum("chars", alias_name="chars")
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        df["n_docs"] = df["n_docs"].astype("int64")
        df["chars"] = df["chars"].astype("int64")
        return pa_from_pandas(df[["source", "lang", "n_docs", "chars"]])

    return sort_coalesced(agg.map_batches(finish, batch_format="pandas"), ["source", "lang"])


def parquet_profile(path: str) -> pa.Table:
    """Column-chunk storage profile from the parquet FOOTER only — the
    catalog op behind every prune-at-the-read decision (which columns are
    worth projecting away, how compressed each is, whether row groups are
    sized for the scan): per column, chunk count, value count, compressed
    and uncompressed byte totals. Metadata-only: no data pages are read, no
    Ray stage is launched — cost is O(columns x row_groups) footer entries,
    the same source dedup._metadata_row_count uses for plan sizing. Returns
    an Arrow table sorted by column name; oracle = DuckDB parquet_metadata()
    over the same file."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    agg: dict = {}
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        for j in range(rg.num_columns):
            c = rg.column(j)
            a = agg.setdefault(c.path_in_schema, [0, 0, 0, 0])
            a[0] += 1
            a[1] += c.num_values
            a[2] += c.total_compressed_size
            a[3] += c.total_uncompressed_size
    names = sorted(agg)
    return pa.table(
        {
            "column": pa.array(names, type=pa.string()),
            "n_chunks": pa.array([agg[n][0] for n in names], type=pa.int64()),
            "n_values": pa.array([agg[n][1] for n in names], type=pa.int64()),
            "compressed_bytes": pa.array([agg[n][2] for n in names], type=pa.int64()),
            "uncompressed_bytes": pa.array([agg[n][3] for n in names], type=pa.int64()),
        }
    )
