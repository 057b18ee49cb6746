"""Wide pivot / conditional aggregation (agg.pivot_wide)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from text_to_graph_ray.functions.agg import pivot_wide

CATS = ["a", "b", "c"]


def _events(n=20_000, seed=17, parts=16):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "k": pa.array(rng.integers(0, 500, size=n)),
        "cat": pa.array(np.array(CATS, dtype=object)[rng.integers(0, 3, size=n)]),
        "val": pa.array(rng.normal(10, 3, size=n)),
    })
    return ray.data.from_arrow(t).repartition(parts), t.to_pandas()


def _expected(df, agg):
    pt = df.pivot_table(index="k", columns="cat", values="val", aggfunc=agg,
                        fill_value=0 if agg in ("sum", "count") else None)
    return pt.reindex(columns=CATS, fill_value=0 if agg in ("sum", "count") else None).sort_index()


class TestPivotWide:
    def test_sum_matches_pandas(self, ray_session):
        ds, df = _events()
        got = pivot_wide(ds, "k", "cat", "val", CATS, agg="sum").sort("k").to_pandas()
        want = _expected(df, "sum")
        assert list(got["k"]) == list(want.index)
        for c in CATS:
            np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(), rtol=1e-12)

    def test_count_int64_zero_filled(self, ray_session):
        ds, df = _events()
        got = pivot_wide(ds, "k", "cat", "val", CATS, agg="count").sort("k").to_pandas()
        want = _expected(df, "count")
        assert got[CATS].dtypes.map(str).eq("int64").all()
        for c in CATS:
            assert (got[c].to_numpy() == want[c].to_numpy()).all()

    @pytest.mark.parametrize("agg", ["min", "max"])
    def test_minmax_null_for_absent(self, ray_session, agg):
        # key 1 never sees category "c"
        t = pa.table({"k": [1, 1, 2], "cat": ["a", "b", "c"], "val": [5.0, 7.0, 9.0]})
        ds = ray.data.from_arrow(t).repartition(2)
        got = pivot_wide(ds, "k", "cat", "val", CATS, agg=agg).sort("k").to_pandas()
        assert np.isnan(got.loc[got.k == 1, "c"].iloc[0])
        assert got.loc[got.k == 2, "c"].iloc[0] == 9.0

    def test_partition_invariance(self, ray_session):
        ds2, _ = _events(parts=2)
        ds31, _ = _events(parts=31)
        a = pivot_wide(ds2, "k", "cat", "val", CATS).sort("k").to_pandas()
        b = pivot_wide(ds31, "k", "cat", "val", CATS).sort("k").to_pandas()
        for c in CATS:
            np.testing.assert_allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=1e-12)

    def test_rejects_nondecomposable(self, ray_session):
        ds, _ = _events(n=100)
        with pytest.raises(ValueError):
            pivot_wide(ds, "k", "cat", "val", CATS, agg="median")


class TestMelt:
    def test_roundtrip_with_pivot(self, ray_session):
        """melt then pivot_wide(sum) reconstructs the original wide frame
        (keys unique, so sum is identity)."""
        from text_to_graph_ray.functions.agg import melt, pivot_wide

        t = pa.table({
            "id": pa.array([1, 2, 3], type=pa.int64()),
            "m1": pa.array([1.5, 2.5, 3.5]),
            "m2": pa.array([10.0, 20.0, 30.0]),
        })
        ds = ray.data.from_arrow(t).repartition(2)
        long = melt(ds, "id", ["m1", "m2"])
        assert long.count() == 6
        wide = pivot_wide(long, "id", "variable", "value", ["m1", "m2"]).sort("id").to_pandas()
        assert list(wide["m1"]) == [1.5, 2.5, 3.5]
        assert list(wide["m2"]) == [10.0, 20.0, 30.0]

    def test_int_values_cast_and_order(self, ray_session):
        from text_to_graph_ray.functions.agg import melt

        t = pa.table({"id": pa.array([7], type=pa.int64()),
                      "a": pa.array([2], type=pa.int64()),
                      "b": pa.array([3.0])})
        got = melt(ray.data.from_arrow(t), "id", ["b", "a"]).to_pandas()
        # per-row fan-out order follows value_cols order
        assert list(got["variable"]) == ["b", "a"]
        assert list(got["value"]) == [3.0, 2.0]
        assert str(got["value"].dtype) == "float64"
