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

    def test_broadcast_and_exchange_plans_identical(self, ray_session):
        # removed_broadcast_max=-1 forces the side-tagged doc-bucketed
        # exchange (the removed set can legitimately be empty, so the forcing
        # value is negative); both reassembly plans must be byte-identical
        from text_to_graph_ray.functions.text import segment_dedup

        rows = [(i, " ".join(f"w{(i * 5 + j) % 31}" for j in range(37))) for i in range(80)]
        rows.append((80, ""))  # all-dup empty doc exercises the drop path
        rows.append((81, ""))
        ds = _docs_ds(rows).repartition(9)
        bcast = segment_dedup(ds, seg_tokens=4).to_pandas()
        exch = segment_dedup(ds, seg_tokens=4, removed_broadcast_max=-1).to_pandas()
        pd.testing.assert_frame_equal(bcast.reset_index(drop=True), exch.reset_index(drop=True))
        assert (bcast.n_kept <= bcast.n_segs).all() and len(bcast) > 0


class TestBucketedJoin:
    def _write_sides(self, tmp_path, num_buckets=8, n=200):
        import ray

        from text_to_graph_ray.sources.bucketed import write_bucketed

        left = ray.data.from_arrow(
            pa.table({"k": pa.array(range(n), type=pa.int64()),
                      "name": pa.array([f"n{i}" for i in range(n)])})
        )
        # right side: two rows per key for even keys, none for odd -> join
        # must fan out matches and drop non-matching keys
        rk = [i for i in range(n) if i % 2 == 0 for _ in range(2)]
        right = ray.data.from_arrow(
            pa.table({"rk": pa.array(rk, type=pa.int64()),
                      "val": pa.array(range(len(rk)), type=pa.int64())})
        )
        write_bucketed(left, "k", str(tmp_path / "left"), num_buckets=num_buckets)
        write_bucketed(right, "rk", str(tmp_path / "right"), num_buckets=num_buckets)
        return left, right

    def test_join_matches_pandas_oracle(self, ray_session, tmp_path):
        from text_to_graph_ray.sources.bucketed import bucketed_join

        left, right = self._write_sides(tmp_path)
        got = (
            bucketed_join(str(tmp_path / "left"), str(tmp_path / "right"), on=("k", "rk"))
            .to_pandas().sort_values(["k", "val"]).reset_index(drop=True)
        )
        want = (
            left.to_pandas().merge(right.to_pandas(), left_on="k", right_on="rk")
            .drop(columns=["rk"]).sort_values(["k", "val"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["k", "name", "val"]], want[["k", "name", "val"]])

    def test_bucket_count_mismatch_raises(self, ray_session, tmp_path):
        import ray

        from text_to_graph_ray.sources.bucketed import bucketed_join, write_bucketed

        self._write_sides(tmp_path, num_buckets=8)
        other = ray.data.from_arrow(pa.table({"rk": pa.array([1], type=pa.int64())}))
        write_bucketed(other, "rk", str(tmp_path / "right16"), num_buckets=16)
        with pytest.raises(ValueError, match="bucket-count mismatch"):
            bucketed_join(str(tmp_path / "left"), str(tmp_path / "right16"), on=("k", "rk"))

    def test_manifest_counts_and_write_idempotent(self, ray_session, tmp_path):
        from text_to_graph_ray.sources.bucketed import write_bucketed
        import ray

        ds = ray.data.from_arrow(pa.table({"k": pa.array(range(100), type=pa.int64())}))
        m1 = write_bucketed(ds, "k", str(tmp_path / "t"), num_buckets=4)
        m2 = write_bucketed(ds, "k", str(tmp_path / "t"), num_buckets=4)  # overwrite
        assert m1.rows.sum() == 100 and m2.rows.sum() == 100
        pd.testing.assert_frame_equal(m1, m2)


class TestZOrder:
    def test_morton_kernel_known_values(self):
        import numpy as np

        from text_to_graph_ray.sources.zorder import morton2

        x = np.array([0, 1, 0, 3], dtype=np.uint32)
        y = np.array([0, 0, 1, 3], dtype=np.uint32)
        # x bits land on odd positions, y on even: (1,0)->2, (0,1)->1, (3,3)->15
        assert list(morton2(x, y)) == [0, 2, 1, 15]

    def _events(self, n=8000):
        import numpy as np

        # two independent uniform dims -> a rectangle covering ~1/16 of the
        # space should prune hard under z-order, not at all unsorted
        rng = np.random.RandomState(7)
        return pa.table({
            "u": pa.array(rng.randint(0, 1000, size=n), type=pa.int64()),
            "t": pa.array(rng.randint(0, 1_000_000, size=n), type=pa.int64()),
            "v": pa.array(np.arange(n), type=pa.int64()),
        })

    def test_pruning_beats_unsorted_and_results_exact(self, ray_session, tmp_path):
        import ray

        from text_to_graph_ray.sources.zorder import pruned_read, write_zordered

        t = self._events()
        ds = ray.data.from_arrow(t).repartition(8)
        write_zordered(ds, "u", "t", str(tmp_path / "z"), rows_per_file=1000, row_group_size=125)
        ranges = [("u", 100, 349, "both"), ("t", 200_000, 450_000, "left")]
        zs, us = {}, {}
        got = pruned_read(str(tmp_path / "z"), ranges, stats=zs).to_pandas()

        # unsorted baseline: same writer, same granule, no clustering
        import pyarrow.parquet as pq

        (tmp_path / "flat").mkdir()
        pq.write_table(t, str(tmp_path / "flat" / "part-0.parquet"), row_group_size=125)
        flat = pruned_read(str(tmp_path / "flat"), ranges, stats=us).to_pandas()

        df = t.to_pandas()
        want = df[(df.u >= 100) & (df.u <= 349) & (df.t >= 200_000) & (df.t < 450_000)]
        assert sorted(got.v) == sorted(want.v) == sorted(flat.v)
        # z-order must read well under half the granules; the random layout
        # cannot prune a ~1/16-selectivity rectangle at 125-row granules
        assert zs["rg_kept"] < 0.5 * zs["rg_total"], zs
        assert us["rg_kept"] > 0.9 * us["rg_total"], us

    def test_empty_rectangle(self, ray_session, tmp_path):
        import ray

        from text_to_graph_ray.sources.zorder import pruned_read, write_zordered

        ds = ray.data.from_arrow(self._events(500))
        write_zordered(ds, "u", "t", str(tmp_path / "z2"), rows_per_file=200, row_group_size=50)
        st = {}
        out = pruned_read(str(tmp_path / "z2"), [("u", 5000, 6000, "both")], stats=st).to_pandas()
        assert len(out) == 0 and st["rg_kept"] == 0


class TestKCore:
    def _edges(self, pairs):
        import ray

        return ray.data.from_arrow(pa.table({
            "src": pa.array([a for a, _ in pairs], type=pa.int64()),
            "dst": pa.array([b for _, b in pairs], type=pa.int64()),
        }))

    def test_known_small_graph(self, ray_session):
        from text_to_graph_ray.functions.graph import kcore_bounded

        # K4 on {0,1,2,3} plus a pendant chain 3-4-5: the 2-core is exactly
        # the K4 (4 and 5 peel away over two rounds)
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        out = kcore_bounded(self._edges(k4 + [(3, 4), (4, 5)]), k=2, max_rounds=4).to_pandas()
        assert list(out.node) == [0, 1, 2, 3]
        assert list(out.deg) == [3, 3, 3, 3]

    def test_fixpoint_early_stop_matches_more_rounds(self, ray_session):
        import numpy as np

        from text_to_graph_ray.functions.graph import kcore_bounded

        rng = np.random.RandomState(3)
        pairs = list(zip(rng.randint(0, 60, 400).tolist(), rng.randint(0, 60, 400).tolist()))
        a = kcore_bounded(self._edges(pairs), k=4, max_rounds=4).to_pandas()
        b = kcore_bounded(self._edges(pairs), k=4, max_rounds=12).to_pandas()
        # converged within 4 rounds -> extra rounds are no-ops
        pd.testing.assert_frame_equal(a, b)

    def test_whole_graph_peels_to_empty(self, ray_session):
        from text_to_graph_ray.functions.graph import kcore_bounded

        chain = [(i, i + 1) for i in range(10)]
        out = kcore_bounded(self._edges(chain), k=3, max_rounds=5).to_pandas()
        assert len(out) == 0

    def test_self_loops_and_duplicates_ignored(self, ray_session):
        from text_to_graph_ray.functions.graph import kcore_bounded

        tri = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 2)]
        out = kcore_bounded(self._edges(tri), k=2, max_rounds=3).to_pandas()
        assert list(out.node) == [0, 1, 2] and list(out.deg) == [2, 2, 2]


class TestMergeUpsert:
    def _mk(self, rows):
        import ray

        return ray.data.from_arrow(pa.table({
            "k": pa.array([r[0] for r in rows], type=pa.int64()),
            "v": pa.array([r[1] for r in rows], type=pa.int64()),
            "ver": pa.array([r[2] for r in rows], type=pa.int64()),
            "deleted": pa.array([r[3] for r in rows], type=pa.bool_()),
        }))

    def test_upsert_latest_and_tombstone(self, ray_session):
        from text_to_graph_ray.functions.agg import merge_upsert

        base = self._mk([(1, 10, 0, False), (2, 20, 0, False), (3, 30, 0, False), (4, 40, 0, False)])
        # k=1 two change versions (v2 wins), k=2 tombstone, k=5 insert-only
        ch = self._mk([(1, 11, 1, False), (1, 12, 2, False), (2, 0, 1, True), (5, 50, 1, False)])
        out = (
            merge_upsert(base, ch, key="k", order_by=["ver"], deleted_col="deleted")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert list(out.k) == [1, 3, 4, 5]
        assert list(out.v) == [12, 30, 40, 50]

    def test_change_beats_base_even_with_lower_ver(self, ray_session):
        from text_to_graph_ray.functions.agg import merge_upsert

        # side dominates ver: a ver-0 change still overrides a ver-9 base row
        base = self._mk([(1, 10, 9, False)])
        ch = self._mk([(1, 99, 0, False)])
        out = merge_upsert(base, ch, key="k", order_by=["ver"], deleted_col="deleted").to_pandas()
        assert list(out.v) == [99]

    def test_no_changes_is_identity(self, ray_session):
        from text_to_graph_ray.functions.agg import merge_upsert

        base = self._mk([(i, i * 10, 0, False) for i in range(20)])
        empty = self._mk([])
        out = (
            merge_upsert(base, empty, key="k", order_by=["ver"], deleted_col="deleted")
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, base.to_pandas().sort_values("k").reset_index(drop=True))


class TestQuotaPerGroup:
    def test_cap_and_determinism(self, ray_session):
        import hashlib

        import ray

        from text_to_graph_ray.functions.sample import quota_per_group

        t = pa.table({
            "doc_id": pa.array(range(100), type=pa.int64()),
            "source": pa.array([f"s{i % 4}" for i in range(100)]),
        })
        out = quota_per_group(ray.data.from_arrow(t), "source", n=5).to_pandas()
        assert (out.groupby("source").size() == 5).all()
        # winners = the 5 smallest md5 keys per group (independent recompute)
        df = t.to_pandas()
        df["hkey"] = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in df.doc_id]
        want = df.sort_values(["hkey", "doc_id"]).groupby("source").head(5)
        assert set(zip(out.source, out.doc_id)) == set(zip(want.source, want.doc_id))
        # partition invariance
        rep = quota_per_group(ray.data.from_arrow(t).repartition(9), "source", n=5).to_pandas()
        pd.testing.assert_frame_equal(out, rep)

    def test_group_smaller_than_quota_kept_whole(self, ray_session):
        import ray

        from text_to_graph_ray.functions.sample import quota_per_group

        t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()), "source": pa.array(["a", "a"])})
        out = quota_per_group(ray.data.from_arrow(t), "source", n=10).to_pandas()
        assert len(out) == 2


class TestPartitionedLayout:
    def test_directory_pruned_read(self, ray_session, tmp_path):
        import ray

        from text_to_graph_ray.sources.formats import read_partition_values, write_partitioned

        t = pa.table({
            "lang": pa.array(["en", "de", "en", "fr", "de", "en"]),
            "val": pa.array(range(6), type=pa.int64()),
        })
        write_partitioned(ray.data.from_arrow(t), str(tmp_path / "p"), ["lang"])
        # only the requested directories exist in the read plan
        out = read_partition_values(str(tmp_path / "p"), "lang", ["en", "fr"]).to_pandas()
        assert sorted(out.val) == [0, 2, 3, 5]
        assert set(out.lang) == {"en", "fr"}
        with pytest.raises(ValueError, match="no partition"):
            read_partition_values(str(tmp_path / "p"), "lang", ["zz"])


class TestWinsorize:
    def test_known_bounds_and_clipped_sum(self, ray_session):
        import ray

        from text_to_graph_ray.functions.stats import winsorize_group_stats

        # group g: values 1..10 -> disc p10 = ceil(0.1*10)-1 = idx 0 -> 1;
        # p90 = ceil(9)-1 = idx 8 -> 9; clip only the 10 -> sum 54
        t = pa.table({
            "g": pa.array(["g"] * 10 + ["h"] * 3),
            "v": pa.array(list(range(1, 11)) + [100, 200, 300], type=pa.int64()),
        })
        out = winsorize_group_stats(ray.data.from_arrow(t), "g", "v").to_pandas()
        g = out[out.g == "g"].iloc[0]
        assert (g.n, g.n_lo, g.n_hi, g.sum_clipped) == (10, 0, 1, 54)
        # h: n=3 -> p10 idx ceil(0.3)-1=0 -> 100; p90 idx ceil(2.7)-1=2 -> 300: nothing clips
        h = out[out.g == "h"].iloc[0]
        assert (h.n, h.n_lo, h.n_hi, h.sum_clipped) == (3, 0, 0, 600)

    def test_groups_max_guard(self, ray_session):
        import ray

        from text_to_graph_ray.functions.stats import winsorize_group_stats

        t = pa.table({"g": pa.array([f"g{i}" for i in range(50)]), "v": pa.array(range(50), type=pa.int64())})
        with pytest.raises(ValueError, match="groups_max"):
            winsorize_group_stats(ray.data.from_arrow(t), "g", "v", groups_max=10)


class TestFilterByAllKeys:
    def test_broadcast_matches_distributed_and_anti(self, ray_session):
        import ray

        from text_to_graph_ray.functions.joins import filter_by_all_keys

        edges = ray.data.from_arrow(pa.table({
            "a": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "b": pa.array([1, 2, 3, 4, 0], type=pa.int64()),
        }))
        alive = ray.data.from_arrow(pa.table({"node": pa.array([0, 1, 2], type=pa.int64())}))
        semi_b = filter_by_all_keys(edges, alive, keys=("a", "b"), right_key="node").to_pandas()
        semi_d = filter_by_all_keys(edges, alive, keys=("a", "b"), right_key="node",
                                    broadcast_max=0).to_pandas()
        want = {(0, 1), (1, 2)}
        assert set(zip(semi_b.a, semi_b.b)) == set(zip(semi_d.a, semi_d.b)) == want
        anti = filter_by_all_keys(edges, alive, keys=("a", "b"), right_key="node", mode="anti").to_pandas()
        assert set(zip(anti.a, anti.b)) == {(2, 3), (3, 4), (4, 0)}
        with pytest.raises(NotImplementedError):
            filter_by_all_keys(edges, alive, keys=("a", "b"), right_key="node",
                               mode="anti", broadcast_max=0).to_pandas()


class TestQuantizeInt8:
    def test_known_values_and_constant_dim(self, ray_session):
        import ray

        from text_to_graph_ray.functions.embeddings import quantize_int8_profile

        # dim0: [0, 1, 2] -> lo 0 hi 2 -> q floor(v*127.5) = 0,127,255
        # dim1 constant 5 -> hi==lo guard -> all q 0
        vecs = [[0.0, 5.0], [1.0, 5.0], [2.0, 5.0]]
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(3), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        }))
        out = quantize_int8_profile(ds).to_pandas()
        assert list(out.dim) == [0, 1]
        assert out.iloc[0].lo == 0.0 and out.iloc[0].hi == 2.0
        assert out.iloc[0].sum_q == 0 + 127 + 255
        assert out.iloc[1].sum_q == 0 and out.iloc[1].n == 3

    def test_partition_invariance(self, ray_session):
        import numpy as np

        import ray

        from text_to_graph_ray.functions.embeddings import quantize_int8_profile

        rng = np.random.RandomState(11)
        vecs = rng.rand(200, 8).astype(np.float32).tolist()
        t = pa.table({"vec_id": pa.array(range(200), type=pa.int64()),
                      "embedding": pa.array(vecs, type=pa.list_(pa.float32()))})
        a = quantize_int8_profile(ray.data.from_arrow(t)).to_pandas()
        b = quantize_int8_profile(ray.data.from_arrow(t).repartition(7)).to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestBudgetSelect:
    def test_prefix_semantics_and_budget(self, ray_session):
        import ray

        from text_to_graph_ray.functions.sample import budget_select

        # qualities rank doc order; explicit budget: strict window prefix —
        # once cum passes budget NOTHING later is taken, even if it would fit
        rows = [
            (1, "the and of to in is that it with for"),        # high quality (stopwords)
            (2, "zz qq ww ee rr tt yy uu ii oo"),               # lower
            (3, "aa bb"),                                        # tiny, lowest-ish
        ]
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }))
        out = budget_select(ds, budget_tokens=12).to_pandas()
        # doc1 (10 toks) fits; doc2 pushes cum to 20 > 12 -> excluded; doc3
        # (2 toks) would fit a knapsack but NOT the window prefix
        assert list(out.doc_id) == [1]
        assert list(out.cum_tokens) == [10]

    def test_derived_budget_and_partition_invariance(self, ray_session):
        import ray

        from text_to_graph_ray.functions.sample import budget_select

        rows = [(i, " ".join(["the word"] * (5 + i % 7))) for i in range(80)]
        t = pa.table({"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                      "text": pa.array([r[1] for r in rows])})
        a = budget_select(ray.data.from_arrow(t)).to_pandas()
        b = budget_select(ray.data.from_arrow(t).repartition(11)).to_pandas()
        pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
        total = sum(len(r[1].split()) for r in rows)
        assert a.cum_tokens.max() <= total // 3 < a.cum_tokens.max() + a.n_tokens.min() + total


class TestMergeIncrement:
    def _mk_files(self, rows):
        import ray

        return ray.data.from_arrow(pa.table({
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "lang": pa.array(["python"] * len(rows)),
            "content": pa.array([r[2] for r in rows]),
        }))

    def test_three_way_increment_equals_full(self, ray_session):
        from text_to_graph_ray.config import PipelineConfig
        from text_to_graph_ray.pipelines import kg

        rows = [
            ("r1", f"m{i}.py", f"import os\n\ndef f{i}():\n    g{(i + 1) % 9}()\n")
            for i in range(9)
        ]
        full_cfg = PipelineConfig(link_aliases=True)
        nolink = PipelineConfig(link_aliases=False)

        def build(ds, cfg):
            return kg.merged_graph(kg.keyed_records(kg.extract_chain(ds, cfg), cfg), cfg)

        full = kg.nodes_from_merged(
            kg.link_merged(build(self._mk_files(rows), nolink), full_cfg)
        ).to_pandas()
        parts = [build(self._mk_files(rows[i::3]), nolink) for i in range(3)]
        inc = kg.nodes_from_merged(kg.merge_increment(parts, full_cfg)).to_pandas()
        pd.testing.assert_frame_equal(full.reset_index(drop=True), inc.reset_index(drop=True))

    def test_label_casing_rule_crosses_increments(self, ray_session):
        # the canonical-label min-own rule must pick the SAME winner whether
        # the label variants arrive in one increment or split across two
        from text_to_graph_ray.config import PipelineConfig
        from text_to_graph_ray.pipelines import kg

        a = [("r1", "a.py", "def Alpha():\n    pass\n")]
        b = [("r2", "b.py", "def alpha():\n    pass\n")]
        nolink = PipelineConfig(link_aliases=False)

        def build(rows):
            ds = self._mk_files(rows)
            return kg.merged_graph(kg.keyed_records(kg.extract_chain(ds, nolink), nolink), nolink)

        full = kg.nodes_from_merged(build(a + b), with_ids=False).to_pandas()
        inc = kg.nodes_from_merged(
            kg.merge_increment([build(a), build(b)], nolink), with_ids=False
        ).to_pandas()
        pd.testing.assert_frame_equal(full.reset_index(drop=True), inc.reset_index(drop=True))
        row = inc[inc.entity_key == "alpha"]
        assert len(row) == 1


class TestKeySkewProfile:
    def test_known_distribution(self, ray_session):
        import ray

        from text_to_graph_ray.functions.agg import key_skew_profile

        # counts: a=1, b=2, c=3 (sorted ranks 1,2,3; n_keys=3, n_rows=6)
        # gini = ((2*1-4)*1 + (2*2-4)*2 + (2*3-4)*3) / (3*6) = (-2+0+6)/18
        rows = ["a"] + ["b"] * 2 + ["c"] * 3
        ds = ray.data.from_arrow(pa.table({"k": pa.array(rows)}))
        out = key_skew_profile(ds, "k").to_pandas()
        assert out.n_rows.item() == 6 and out.n_keys.item() == 3
        assert out.max_n.item() == 3 and out.top_key.item() == "c"
        assert out.gini.item() == 4.0 / 18.0

    def test_uniform_is_zero_and_tie_picks_min_key(self, ray_session):
        import ray

        from text_to_graph_ray.functions.agg import key_skew_profile

        rows = [f"k{i % 5}" for i in range(50)]
        out = key_skew_profile(ray.data.from_arrow(pa.table({"k": pa.array(rows)})), "k").to_pandas()
        assert out.gini.item() == 0.0
        assert out.top_key.item() == "k0"  # all tie at 10 -> min key

    def test_partition_invariance(self, ray_session):
        import ray

        from text_to_graph_ray.functions.agg import key_skew_profile

        rows = [f"k{(i * i) % 37}" for i in range(500)]
        t = pa.table({"k": pa.array(rows)})
        a = key_skew_profile(ray.data.from_arrow(t), "k").to_pandas()
        b = key_skew_profile(ray.data.from_arrow(t).repartition(13), "k").to_pandas()
        pd.testing.assert_frame_equal(a, b)


def test_column_stats_nulls_and_minmax(ray_session):
    import ray

    from text_to_graph_ray.sources.formats import column_stats

    t = pa.table({
        "a": pa.array([1, None, 3, None], type=pa.int64()),
        "b": pa.array([10, 20, 30, 40], type=pa.int64()),
    })
    out = column_stats(ray.data.from_arrow(t).repartition(3), ["a", "b"]).to_pandas()
    a = out[out["column"] == "a"].iloc[0]
    assert (a.n_rows, a.n_null, a.vmin, a.vmax) == (4, 2, 1, 3)
    b = out[out["column"] == "b"].iloc[0]
    assert (b.n_rows, b.n_null, b.vmin, b.vmax) == (4, 0, 10, 40)


class TestRetentionCohorts:
    def test_two_cohorts_and_week_math(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from text_to_graph_ray.pipelines.analytics import retention_cohorts

        # 2024-01-01 is a Monday (day 19723). u1 starts week 0, active weeks
        # 0 and 2; u2 starts week 1 only; u3 starts week 0, active week 0
        def ts(day, h=12):
            return pd.Timestamp("1970-01-01") + pd.Timedelta(days=day, hours=h)

        rows = [
            (1, ts(19723)), (1, ts(19723 + 14)),
            (2, ts(19723 + 7)),
            (3, ts(19723 + 2)),
        ]
        t = pa.table({
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array(["click"] * len(rows)),
        })
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        out = retention_cohorts(str(d)).to_pandas()
        got = {(r.cohort_week_day, r.wk): r.n_users for r in out.itertuples()}
        assert got == {(19723, 0): 2, (19723, 2): 1, (19730, 0): 1}

    def test_users_guard(self, ray_session):
        from text_to_graph_ray.pipelines.analytics import retention_cohorts

        with pytest.raises(ValueError, match="users_broadcast_max"):
            retention_cohorts("/root/testdata/sf0.001", users_broadcast_max=1)


def test_rolling_active_users_window_membership(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from text_to_graph_ray.pipelines.analytics import rolling_active_users

    # u1 active day 0 and day 10; u2 active day 3: a day-0 event counts in
    # window ends 0..6, day-3 in 3..9, day-10 in 10..16
    t = pa.table({
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "ts": pa.array([pd.Timestamp("1970-01-01 05:00"), pd.Timestamp("1970-01-11 07:00"),
                        pd.Timestamp("1970-01-04 09:00")], type=pa.timestamp("us")),
        "event_type": pa.array(["click"] * 3),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    out = rolling_active_users(str(d)).to_pandas()
    got = dict(zip(out.we_day, out.n_users))
    want = {}
    for day, u in [(0, 1), (10, 1), (3, 2)]:
        for we in range(day, day + 7):
            want.setdefault(we, set()).add(u)
    assert got == {we: len(us) for we, us in want.items()}


def test_grouped_mad_known_values_and_guard(ray_session):
    import ray

    from text_to_graph_ray.functions.stats import grouped_mad

    # g: [1,2,3,4,100] -> median 3, |x-3| = [2,1,0,1,97] -> mad 1
    # h: [10, 20] -> median 15, devs [5, 5] -> mad 5
    t = pa.table({
        "g": pa.array(["g"] * 5 + ["h"] * 2),
        "v": pa.array([1, 2, 3, 4, 100, 10, 20], type=pa.int64()),
    })
    out = grouped_mad(ray.data.from_arrow(t), "g", "v").to_pandas()
    assert dict(zip(out.g, out["mad"])) == {"g": 1.0, "h": 5.0}
    with pytest.raises(ValueError, match="groups_max"):
        grouped_mad(ray.data.from_arrow(t), "g", "v", groups_max=1)


def test_search_topk_scoring_and_rank(ray_session):
    import math

    import ray

    from text_to_graph_ray.functions.text import search_topk

    docs = [
        (1, "apple apple banana"),   # tf(apple)=2
        (2, "apple cherry"),         # tf(apple)=1
        (3, "banana banana banana"),  # tf(banana)=3
        (4, "plum"),                  # no query term -> excluded
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
        "text": pa.array([d[1] for d in docs]),
    }))
    out = search_topk(ds, ["apple", "banana"], k=3).to_pandas()
    idf = round(math.log(5 / 3), 6)  # df(apple)=df(banana)=2, N=4
    # doc1 = 2*idf + 1*idf = 3 units, doc3 = 3 units (ties -> id asc), doc2 = 1
    got = dict(zip(out.doc_id, out.score))
    assert set(got) == {1, 3, 2}
    assert abs(got[3] - 3 * idf) < 1e-12 and abs(got[1] - 3 * idf) < 1e-12
    assert list(out.doc_id) == [1, 3, 2]
