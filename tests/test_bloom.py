"""Bloom-filter semi/anti key filtering (functions/bloom.py).

The exactness contract is the whole point: whatever the FP rate of the
bitmap, exact=True must be value-identical to the guarded exact plans in
joins.filter_by_keys — including under a deliberately undersized bitmap
where false positives are guaranteed."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from text_to_graph_ray.functions.bloom import bloom_filter_by_keys, build_bloom
from text_to_graph_ray.functions.joins import filter_by_keys


def _left(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    return ray.data.from_arrow(
        pa.table({"k": pa.array(rng.permutation(n).astype("int64")), "v": pa.array(np.arange(n, dtype="int64"))})
    ).repartition(8)


def _right(n=5000, members=500, seed=11):
    rng = np.random.default_rng(seed)
    ks = rng.choice(n, size=members, replace=False).astype("int64")
    # duplicates on the right must not matter (bloom sets the same bits)
    ks = np.concatenate([ks, ks[: members // 3]])
    return ray.data.from_arrow(pa.table({"rk": pa.array(ks)})).repartition(4)


def _sorted_df(ds):
    return ds.sort("k").to_pandas().reset_index(drop=True)


class TestBloomExactness:
    @pytest.mark.parametrize("mode", ["semi", "anti"])
    def test_matches_exact_plan(self, ray_session, mode):
        left, right = _left(), _right()
        got = _sorted_df(bloom_filter_by_keys(left, right, "k", "rk", mode=mode))
        want = _sorted_df(filter_by_keys(left, right, "k", "rk", mode=mode))
        assert got.equals(want)
        assert len(got) == (500 if mode == "semi" else 4500)

    @pytest.mark.parametrize("mode", ["semi", "anti"])
    def test_exact_under_forced_false_positives(self, ray_session, mode):
        """1 bit/key, 1 hash — the bitmap saturates and almost everything is
        a Bloom-maybe; the verification join must still make the result
        exact."""
        left, right = _left(), _right()
        got = _sorted_df(
            bloom_filter_by_keys(left, right, "k", "rk", mode=mode, bits_per_key=1, num_hashes=1)
        )
        want = _sorted_df(filter_by_keys(left, right, "k", "rk", mode=mode))
        assert got.equals(want)

    def test_empty_right(self, ray_session):
        left = _left(200)
        right = ray.data.from_arrow(pa.table({"rk": pa.array([], type=pa.int64())}))
        assert bloom_filter_by_keys(left, right, "k", "rk", mode="semi").count() == 0
        assert bloom_filter_by_keys(left, right, "k", "rk", mode="anti").count() == 200

    def test_string_keys(self, ray_session):
        left = ray.data.from_arrow(pa.table({"k": [f"doc-{i}" for i in range(300)], "v": list(range(300))}))
        right = ray.data.from_arrow(pa.table({"rk": [f"doc-{i}" for i in range(0, 300, 3)]}))
        got = _sorted_df(bloom_filter_by_keys(left, right, "k", "rk", mode="semi"))
        want = _sorted_df(filter_by_keys(left, right, "k", "rk", mode="semi"))
        assert got.equals(want) and len(got) == 100


class TestBloomApproximate:
    def test_semi_superset_with_bounded_fp(self, ray_session):
        """exact=False semi keeps every true match plus at most ~FP-rate of
        the non-matches (theoretical ~0.8% at 10 bits/key, 7 hashes; assert a
        loose 3% so the test is not seed-sensitive)."""
        left, right = _left(20000), _right(20000, 2000)
        approx = bloom_filter_by_keys(left, right, "k", "rk", mode="semi", exact=False)
        ks = set()
        for b in approx.iter_batches(batch_size=8192, batch_format="pyarrow"):
            ks.update(b.column("k").to_pylist())
        true = set(filter_by_keys(left, right, "k", "rk", mode="semi").to_pandas()["k"])
        assert true <= ks
        assert len(ks - true) <= 0.03 * (20000 - len(true))

    def test_anti_subset_missing_only_fps(self, ray_session):
        left, right = _left(20000), _right(20000, 2000)
        approx = set(
            bloom_filter_by_keys(left, right, "k", "rk", mode="anti", exact=False).to_pandas()["k"]
        )
        true = set(filter_by_keys(left, right, "k", "rk", mode="anti").to_pandas()["k"])
        assert approx <= true
        assert len(true - approx) <= 0.03 * len(true)


def test_build_bloom_fixed_size(ray_session):
    """The broadcast payload is bits_per_key * n bits regardless of key bytes
    — the property that makes the plan viable at 10^8 right keys."""
    right = _right(50000, 5000)
    _, _, m_bytes = build_bloom(right, "rk", bits_per_key=10)
    n = right.count()
    assert m_bytes == max(1024, (n * 10 + 7) // 8)
