"""Edge-relabel taxonomy cleanup as a distributed op (reference
edge_utils.py:29-41 ``apply_edge_mappings``): a user-supplied old->new label
mapping applied over the edges table — broadcast dict, vectorized per batch,
no shuffle."""

from __future__ import annotations

import pyarrow as pa


def relabel_edges(edges_ds, mapping: dict[str, str], pred_col: str = "pred"):
    if not mapping:
        return edges_ds
    import ray

    ref = ray.put(dict(mapping))

    def apply(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)

        col = batch.column(pred_col).to_pandas().map(lambda x: m.get(x, x))
        return batch.set_column(batch.schema.get_field_index(pred_col), pred_col, pa.array(col, type=pa.string()))

    return edges_ds.map_batches(apply, batch_format="pyarrow")
