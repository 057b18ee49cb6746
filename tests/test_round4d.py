"""Round-4 part 5 operator tests: segment-level corpus dedup, bucketed
co-partitioned storage join, z-order clustered layout, bounded k-core."""

import pandas as pd
import pyarrow as pa
import pytest
import ray


def _docs_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


class TestSegmentDedup:
    def test_first_occurrence_wins_and_reassembly_order(self, ray_session):
        from text_to_graph_ray.functions.text import segment_dedup

        # seg_tokens=2: doc0 = [a b][c d]; doc1 repeats [a b] then adds [x y];
        # doc2 is entirely doc0's segments -> drops out of the result
        rows = [
            (0, "a b c d"),
            (1, "a b x y"),
            (2, "c d a b"),
        ]
        out = segment_dedup(_docs_ds(rows), seg_tokens=2).to_pandas()
        assert list(out.doc_id) == [0, 1]
        assert out.loc[out.doc_id == 0, "text_dedup"].item() == "a b c d"
        # doc1 loses its first segment but keeps order of survivors
        assert out.loc[out.doc_id == 1, "text_dedup"].item() == "x y"
        assert out.loc[out.doc_id == 1, "n_kept"].item() == 1
        assert out.loc[out.doc_id == 1, "n_segs"].item() == 2

    def test_tail_segment_and_duplicate_within_doc(self, ray_session):
        from text_to_graph_ray.functions.text import segment_dedup

        # 5 tokens at seg_tokens=2 -> segments [a b][a b][c]; the second
        # [a b] inside the SAME doc is removed too (global exact dedup)
        out = segment_dedup(_docs_ds([(7, "a b a b c")]), seg_tokens=2).to_pandas()
        assert out.text_dedup.item() == "a b c"
        assert out.n_kept.item() == 2 and out.n_segs.item() == 3

    def test_partition_invariance(self, ray_session):
        from text_to_graph_ray.functions.text import segment_dedup

        rows = [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(40))) for i in range(60)]
        base = segment_dedup(_docs_ds(rows), seg_tokens=4).to_pandas()
        rep = segment_dedup(_docs_ds(rows).repartition(13), seg_tokens=4).to_pandas()
        pd.testing.assert_frame_equal(base.reset_index(drop=True), rep.reset_index(drop=True))

    def test_empty_text_doc(self, ray_session):
        from text_to_graph_ray.functions.text import segment_dedup

        # '' splits to [''] -> one empty segment; first doc keeps it, the
        # second empty doc loses its only segment and drops out
        out = segment_dedup(_docs_ds([(1, ""), (2, "")]), seg_tokens=16).to_pandas()
        assert list(out.doc_id) == [1]
        assert out.text_dedup.item() == ""
