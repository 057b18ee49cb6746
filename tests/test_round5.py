"""Round-5 tests: degree-ordered triangle orientation (both plans), the
pinned bucketed-write schema, filter_by_all_keys type guard, and the
half-up cents rounding contract."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _tri_counts(edges, parts=4, **kw):
    import ray as _ray

    from text_to_graph_ray.functions.graph import triangle_counts

    t = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                  "dst": pa.array([b for _, b in edges], type=pa.int64())})
    got = triangle_counts(_ray.data.from_arrow(t).repartition(parts), **kw).to_pandas()
    return dict(zip(got["node"], got["triangles"]))


class TestDegreeOrientedTriangles:
    def test_broadcast_and_join_plans_identical(self, ray_session):
        """deg_broadcast_max=0 forces the two-hash-join degree attachment;
        both plans must match each other and the naive O(n^3) count."""
        import itertools

        rng = np.random.default_rng(51)
        n = 35
        adj = np.zeros((n, n), dtype=bool)
        edges = []
        for a, b in itertools.combinations(range(n), 2):
            if rng.random() < 0.3:
                adj[a, b] = adj[b, a] = True
                edges.append((a, b))
        naive = {}
        for x, y, z in itertools.combinations(range(n), 3):
            if adj[x, y] and adj[y, z] and adj[x, z]:
                for v in (x, y, z):
                    naive[v] = naive.get(v, 0) + 1
        assert _tri_counts(edges) == naive
        assert _tri_counts(edges, deg_broadcast_max=0) == naive

    def test_celebrity_star_graph(self, ray_session):
        """Hub node 0 connected to everyone; spokes form a ring. The old
        id-oriented plan would enumerate deg(hub)^2 wedges from the hub;
        degree orientation sources every wedge at a degree-3 spoke. Each
        ring edge (i, i+1) + hub closes one triangle."""
        n = 60
        edges = [(0, i) for i in range(1, n)] + [(i, i + 1) for i in range(1, n - 1)]
        got = _tri_counts(edges, parts=6)
        # hub is in all n-2 triangles; interior spokes in 2; end spokes in 1
        expect = {0: n - 2, 1: 1, n - 1: 1}
        for i in range(2, n - 1):
            expect[i] = 2
        assert got == expect

    def test_degree_tie_breaks_by_id(self, ray_session):
        """K3: all degrees equal — orientation must fall back to id order
        and still count each triangle once."""
        assert _tri_counts([(2, 1), (0, 2), (1, 0)]) == {0: 1, 1: 1, 2: 1}


class TestBucketedPinnedSchema:
    def test_int_column_with_nulls_keeps_type_across_buckets(self, ray_session, tmp_path):
        """A bucket whose int64 column holds only nulls must still be
        written int64 (pandas inference alone would produce float64 for
        that bucket and break the join's pinned-schema rebuild)."""
        import ray as _ray

        from text_to_graph_ray.sources.bucketed import bucketed_join, write_bucketed

        k = pa.array(list(range(40)), type=pa.int64())
        v = pa.array([None if i % 2 else i * 10 for i in range(40)], type=pa.int64())
        left = pa.table({"k": k, "v": v})
        right = pa.table({"k2": k, "w": pa.array([i + 1 for i in range(40)], type=pa.int64())})
        pl, pr = str(tmp_path / "L"), str(tmp_path / "R")
        write_bucketed(_ray.data.from_arrow(left).repartition(4), "k", pl, num_buckets=8)
        write_bucketed(_ray.data.from_arrow(right).repartition(4), "k2", pr, num_buckets=8)
        import os

        for d in sorted(os.listdir(pl)):
            if d.startswith("bucket="):
                f = os.path.join(pl, d, "part-0.parquet")
                assert pq.read_schema(f).field("v").type == pa.int64()
        out = bucketed_join(pl, pr, on=("k", "k2")).to_pandas().sort_values("k").reset_index(drop=True)
        assert len(out) == 40
        assert out["w"].tolist() == [i + 1 for i in range(40)]
        got_v = [None if pa.compute.is_null(x).as_py() else x for x in pa.array(out["v"], type=pa.int64())]
        assert [x.as_py() if x is not None else None for x in got_v] == [
            None if i % 2 else i * 10 for i in range(40)
        ]

    def test_join_rejects_divergent_footer(self, ray_session, tmp_path):
        """A bucket file whose stored schema diverges from the pinned one
        fails loudly instead of corrupt-casting."""
        import os

        import ray as _ray

        from text_to_graph_ray.sources.bucketed import bucketed_join, write_bucketed

        t = pa.table({"k": pa.array(range(20), type=pa.int64()),
                      "v": pa.array(range(20), type=pa.int64())})
        pl, pr = str(tmp_path / "A"), str(tmp_path / "B")
        write_bucketed(_ray.data.from_arrow(t), "k", pl, num_buckets=4)
        write_bucketed(_ray.data.from_arrow(t), "k", pr, num_buckets=4)
        # corrupt one non-first bucket on the right with a float64 v
        victim = None
        for d in sorted(os.listdir(pr)):
            if d.startswith("bucket="):
                victim = os.path.join(pr, d, "part-0.parquet")
        bad = pq.read_table(victim)
        bad = bad.set_column(bad.schema.get_field_index("v"),
                             "v", bad.column("v").cast(pa.float64()))
        pq.write_table(bad, victim)
        with pytest.raises(Exception, match="diverges from the pinned schema"):
            bucketed_join(pl, pr, on=("k", "k")).materialize()


class TestFilterByAllKeysTypeGuard:
    def test_heterogeneous_key_types_rejected(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.joins import filter_by_all_keys

        left = _ray.data.from_arrow(pa.table({
            "x": pa.array([1, 2], type=pa.int64()),
            "y": pa.array(["1", "2"], type=pa.string()),
        }))
        right = _ray.data.from_arrow(pa.table({"k": pa.array([1], type=pa.int64())}))
        with pytest.raises(TypeError, match="must share one type"):
            filter_by_all_keys(left, right, keys=["x", "y"], right_key="k")


class TestRealMediaDecode:
    """Env-gated coverage for the real-PIL decode path (VERDICT r4: the
    import-guarded branch was dead code no test could execute). Skips
    cleanly in this sandbox (no PIL); runs for real wherever codecs exist,
    so the branch cannot rot silently."""

    def test_pil_decode_real_png(self):
        PIL = pytest.importorskip("PIL")  # noqa: F841
        import io

        from PIL import Image

        from text_to_graph_ray.functions.multimodal import DecodeImage

        img = Image.new("RGB", (4, 2))
        px = img.load()
        vals = [(10, 20, 30), (200, 100, 0), (0, 0, 0), (255, 255, 255),
                (1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
        for i, v in enumerate(vals):
            px[i % 4, i // 4] = v
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        batch = pa.table({
            "media_id": pa.array([1], type=pa.int64()),
            "payload": pa.array([buf.getvalue()], type=pa.binary()),
            "width": pa.array([4], type=pa.int64()),
            "height": pa.array([2], type=pa.int64()),
        })
        out = DecodeImage(fake=False)(batch)
        arr = np.asarray(vals, dtype=np.float32)
        assert out.column("pixel_mean")[0].as_py() == round(float(arr.mean()), 4)
        assert out.column("pixel_std")[0].as_py() == round(float(arr.std()), 4)

    def test_fake_path_raises_cleanly_without_pil(self):
        """Wherever PIL is absent, fake=False must fail loudly, not
        mis-decode — the documented NotImplementedError contract."""
        from text_to_graph_ray.functions import multimodal as mm

        if mm._PILImage is not None:
            pytest.skip("PIL present — covered by test_pil_decode_real_png")
        batch = pa.table({
            "media_id": pa.array([1], type=pa.int64()),
            "payload": pa.array([b"notanimage"], type=pa.binary()),
            "width": pa.array([4], type=pa.int64()),
            "height": pa.array([2], type=pa.int64()),
        })
        with pytest.raises(NotImplementedError, match="requires PIL"):
            mm.DecodeImage(fake=False)(batch)


def _adversarial_texts():
    """Texts chosen to stress every divergence between Arrow kernels and the
    Python contracts: edge whitespace, control-char separators (\\x1c-\\x1f
    ARE str.split whitespace), non-ASCII (forces the fallback), CJK (zh
    path), repeated spaces for split(' ') empty tokens, ties in the lang
    profile hit counts, and empty/null-ish rows."""
    return [
        "",
        " ",
        "   ",
        "x",
        "the and of to in is that it with for",  # all-stopword English
        "der die das und ist nicht",  # German
        "le la les et est",  # French
        "el la los y es",  # Spanish
        "la est un une le y",  # cross-language tie material
        "  leading and trailing  ",
        "tab\tsep\nnewline\x0bvt\x0cff\rcr",
        "\x1cfile\x1dgroup\x1erecord\x1funit",  # control separators
        "word " * 120,  # >200 tokens after repetition
        "a b " * 150,  # 300 tokens: the [:200] lang cap binds
        "café naïve résumé the and of",  # non-ASCII fallback
        "一二三 some ascii after cjk",  # zh detection
        "double  space  split",  # split(' ') empty tokens
        "ALL CAPS THE AND OF",
        "punct.!?,;: only",
        "the the the the the",  # max-repetition bigrams
        "1 2 3 4 5 6 7 8 9 10",
        "x" * 500,  # one huge token
        "mixed ümläut the and text",
        "Αβγ greek the and of to in",
    ]


class TestBatchKernelEquivalence:
    def test_quality_and_lang_match_per_row(self):
        from text_to_graph_ray.functions.text import detect_lang, quality_row, text_signals_batch

        texts = _adversarial_texts()
        sig = text_signals_batch(pa.array(texts, type=pa.string()), want=("quality", "lang"))
        for i, t in enumerate(texts):
            toks = t.split()
            ml, sr, al, q = quality_row(t, toks)
            assert sig["mean_tok_len"][i] == ml, (i, t)
            assert sig["stop_ratio"][i] == sr, (i, t)
            assert sig["alpha_ratio"][i] == al, (i, t)
            assert sig["quality"][i] == q, (i, t)
            assert sig["lang"][i] == detect_lang(t, toks), (i, t)

    def test_quality_nulls_and_random_fuzz(self):
        from text_to_graph_ray.functions.text import detect_lang, quality_row, text_signals_batch

        rng = np.random.default_rng(55)
        alphabet = list("abcdefg THEandofto\t\n.!?\x1cé一 0123")
        texts = ["".join(rng.choice(alphabet, size=rng.integers(0, 80))) for _ in range(300)]
        arr = pa.array([None if i % 37 == 0 else t for i, t in enumerate(texts)], type=pa.string())
        sig = text_signals_batch(arr, want=("quality", "lang"))
        for i in range(len(texts)):
            t = "" if i % 37 == 0 else texts[i]
            toks = t.split()
            assert sig["quality"][i] == quality_row(t, toks)[3], (i, repr(t))
            assert sig["lang"][i] == detect_lang(t, toks), (i, repr(t))

    def test_bigram_batch_matches_per_row(self):
        from text_to_graph_ray.functions.text import bigram_rep_batch, bigram_repetition

        texts = _adversarial_texts() + ["a a a a", "a b a b a b", "  ", "one"]
        valid, n_big, dup, top = bigram_rep_batch(pa.array(texts, type=pa.string()))
        for i, t in enumerate(texts):
            total, df, tf = bigram_repetition(t)
            if total is None:
                assert not valid[i], (i, repr(t))
            else:
                assert valid[i] and n_big[i] == total, (i, repr(t))
                assert dup[i] == df and top[i] == tf, (i, repr(t))

    def test_gates_match_old_per_row_logic(self, ray_session):
        from text_to_graph_ray.functions.text import bigram_repetition, detect_lang, quality_row
        from text_to_graph_ray.pipelines.curation import pretraining_gate, quality_lang_gate

        texts = _adversarial_texts()
        batch = pa.table({
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        })

        def old_keep(t, with_rep):
            toks = t.split()
            if quality_row(t, toks)[3] < 0.45 or detect_lang(t, toks) not in ("en",):
                return False
            if not with_rep:
                return True
            _, df, _ = bigram_repetition(t)
            return not (df is not None and df > 0.06)

        got_q = quality_lang_gate(batch, 0.45)
        assert got_q.column("doc_id").to_pylist() == [
            i for i, t in enumerate(texts) if old_keep(t, with_rep=False)
        ]
        got_p = pretraining_gate(batch, 0.45, ("en",), 0.06)
        assert got_p.column("doc_id").to_pylist() == [
            i for i, t in enumerate(texts) if old_keep(t, with_rep=True)
        ]


class TestLookupJoin:
    def _sides(self, ray_session):
        import ray as _ray

        left = pa.table({
            "k": pa.array([1, 2, 3, 4, 2, 9], type=pa.int64()),
            "v": pa.array([10, 20, 30, 40, 21, 90], type=pa.int64()),
        })
        right = pa.table({
            "rk": pa.array([2, 3, 5], type=pa.int64()),
            "name": pa.array(["two", "three", "five"], type=pa.string()),
            "w": pa.array([200, 300, 500], type=pa.int64()),
        })
        return (_ray.data.from_arrow(left).repartition(3),
                _ray.data.from_arrow(right).repartition(2))

    def _expect(self):
        m = {2: ("two", 200), 3: ("three", 300)}
        rows = [(1, 10), (2, 20), (3, 30), (4, 40), (2, 21), (9, 90)]
        return sorted((k, v, *(m.get(k, (None, None)))) for k, v in rows)

    def test_broadcast_left_outer_semantics(self, ray_session):
        from text_to_graph_ray.functions.joins import lookup_join

        left, right = self._sides(ray_session)
        got = lookup_join(left, right, key="k", right_key="rk").to_pandas()
        rows = sorted(
            (int(r.k), int(r.v), None if r.name is None or r.name != r.name else r.name,
             None if r.w != r.w else int(r.w))
            for r in got.itertuples()
        )
        assert rows == self._expect()

    def test_fallback_plan_identical(self, ray_session):
        from text_to_graph_ray.functions.joins import lookup_join

        left, right = self._sides(ray_session)
        got = lookup_join(left, right, key="k", right_key="rk", broadcast_max=0).to_pandas()
        rows = sorted(
            (int(r.k), int(r.v), None if r.name is None or r.name != r.name else r.name,
             None if r.w != r.w else int(r.w))
            for r in got.itertuples()
        )
        assert rows == self._expect()

    def test_duplicate_right_keys_rejected_both_plans(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.joins import lookup_join

        left = _ray.data.from_arrow(pa.table({"k": pa.array([1], type=pa.int64())}))
        dup = _ray.data.from_arrow(pa.table({
            "k": pa.array([7, 7], type=pa.int64()),
            "x": pa.array([1, 2], type=pa.int64()),
        }))
        with pytest.raises(Exception, match="not unique"):
            lookup_join(left, dup, key="k").materialize()
        with pytest.raises(Exception, match="not unique"):
            lookup_join(left, dup, key="k", broadcast_max=0).materialize()

    def test_column_clash_rejected(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.joins import lookup_join

        left = _ray.data.from_arrow(pa.table({"k": pa.array([1], type=pa.int64()),
                                              "x": pa.array([1], type=pa.int64())}))
        right = _ray.data.from_arrow(pa.table({"k": pa.array([1], type=pa.int64()),
                                               "x": pa.array([2], type=pa.int64())}))
        with pytest.raises(ValueError, match="already exist"):
            lookup_join(left, right, key="k")


class TestMadOutliers:
    def test_counts_match_naive(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.stats import mad_outliers

        rng = np.random.default_rng(19)
        keys, vals = [], []
        data = {"a": rng.normal(10.0, 2.0, 200), "b": rng.normal(50.0, 5.0, 150)}
        # inject extreme outliers that would wreck a mean/stddev z-score
        data["a"][:3] = [1000.0, -900.0, 800.0]
        for k, arr in data.items():
            keys += [k] * len(arr)
            vals += arr.tolist()
        t = pa.table({"g": pa.array(keys, type=pa.string()), "x": pa.array(vals, type=pa.float64())})
        got = mad_outliers(_ray.data.from_arrow(t).repartition(5), "g", "x", k=3.0).to_pandas()

        expect = {}
        for k, arr in data.items():
            med = round(float(np.quantile(arr, 0.5, method="linear")), 6)
            mad = round(float(np.quantile(np.abs(arr - med), 0.5, method="linear")), 6)
            anom = int((np.abs(arr - med) > 3.0 * mad).sum())
            expect[k] = (len(arr), anom)
        assert {r.g: (int(r.n), int(r.n_anomalies)) for r in got.itertuples()} == expect
        # the planted extremes must be flagged (robustness property)
        assert expect["a"][1] >= 3


class TestLexicalStats:
    def test_batch_matches_row_contract(self):
        from text_to_graph_ray.functions.text import lexical_row, lexical_stats

        texts = _adversarial_texts() + ["a a b", "x y z x y x", "unique words only here"]
        batch = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                          "text": pa.array(texts, type=pa.string())})
        got = lexical_stats(batch)
        for i, t in enumerate(texts):
            n, ty, ttr, h = lexical_row(t)
            assert got.column("n_tokens")[i].as_py() == n, (i, repr(t))
            assert got.column("n_types")[i].as_py() == ty, (i, repr(t))
            assert got.column("ttr")[i].as_py() == ttr, (i, repr(t))
            assert got.column("token_entropy")[i].as_py() == h, (i, repr(t))

    def test_matches_independent_naive(self):
        from text_to_graph_ray.expected import naive_lexical
        from text_to_graph_ray.functions.text import lexical_row

        for t in _adversarial_texts():
            assert lexical_row(t) == naive_lexical(t), repr(t)

    def test_entropy_values_sane(self):
        from text_to_graph_ray.functions.text import lexical_row

        # uniform distribution over 4 types -> exactly 2 bits
        n, ty, ttr, h = lexical_row("a b c d")
        assert (n, ty, ttr) == (4, 4, 1.0)
        assert h == 2.0
        # single repeated token -> zero entropy
        assert lexical_row("a a a a")[3] == 0.0


class TestMinhashCrossPairs:
    def _corpora(self):
        base = [
            "alpha beta gamma delta epsilon zeta eta theta " * 4,
            "one two three four five six seven eight nine ten " * 3,
            "the quick brown fox jumps over the lazy dog again " * 3,
        ]
        ev_texts = base + ["totally unrelated eval document about astrophysics"]
        tr_texts = (
            [t.replace("gamma", "gamma2", 1) for t in base[:1]]  # near-dup of ev 0
            + [base[1]]                                           # exact dup of ev 1
            + ["training doc with no counterpart whatsoever in eval"] * 3
        )
        ev = pa.table({"doc_id": pa.array(range(len(ev_texts)), type=pa.int64()),
                       "text": pa.array(ev_texts, type=pa.string())})
        tr = pa.table({"doc_id": pa.array(range(100, 100 + len(tr_texts)), type=pa.int64()),
                       "text": pa.array(tr_texts, type=pa.string())})
        return ev, tr, ev_texts, tr_texts

    def test_matches_naive_and_no_within_side_pairs(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.expected import naive_cross_minhash_pairs
        from text_to_graph_ray.functions.dedup import minhash_cross_pairs

        ev, tr, ev_texts, tr_texts = self._corpora()
        got = minhash_cross_pairs(
            _ray.data.from_arrow(ev).repartition(2),
            _ray.data.from_arrow(tr).repartition(3),
            threshold=0.5,
        ).to_pandas()
        na, nb, ne = naive_cross_minhash_pairs(
            list(range(len(ev_texts))), ev_texts,
            list(range(100, 100 + len(tr_texts))), tr_texts,
        )
        naive = [(a, b, e) for (a, b), e in zip(zip(na, nb), ne) if e >= 0.5]
        assert [(int(r.a), int(r.b), float(r.est_jaccard)) for r in got.itertuples()] == naive
        assert len(naive) >= 2  # the planted near-dup and exact dup both fire
        # every pair is cross-side: a in eval id space, b in train id space
        assert all(r.a < 100 <= r.b for r in got.itertuples())

    def test_id_range_guard(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.dedup import minhash_cross_pairs

        bad = _ray.data.from_arrow(pa.table({
            "doc_id": pa.array([-1], type=pa.int64()),
            "text": pa.array(["x"], type=pa.string()),
        }))
        ok = _ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["x"], type=pa.string()),
        }))
        with pytest.raises(Exception, match="ids must be in"):
            minhash_cross_pairs(bad, ok).materialize()


class TestKnnClassify:
    def test_majority_vote_matches_numpy(self, ray_session):
        """Tiny embedding space with engineered clusters: the engine's vote
        must equal a dense numpy recomputation of cosine top-10 + majority
        (votes desc, label asc tie-break)."""
        import ray as _ray

        import __ray_entry__ as E

        rng = np.random.default_rng(7)
        centers = {0: np.array([1.0, 0.0, 0.0]), 1: np.array([0.0, 1.0, 0.0]), 2: np.array([0.0, 0.0, 1.0])}
        vecs, labels = [], []
        for i in range(60):
            lab = i % 3
            v = centers[lab] + rng.normal(0, 0.15, 3)
            vecs.append(v.astype(np.float32))
            labels.append(lab)
        import os
        import tempfile

        import pyarrow.parquet as pq

        with tempfile.TemporaryDirectory() as d:
            pq.write_table(pa.table({
                "vec_id": pa.array(range(60), type=pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32())),
                "label": pa.array(labels, type=pa.int32()),
            }), os.path.join(d, "embeddings.parquet"))
            got = E._q_emb_knn_classify(d).to_pandas().sort_values("query_id").reset_index(drop=True)

        # naive: cosine sims rounded like the contract, top-10 by (sim desc, id)
        M = np.asarray([v.astype(np.float64) for v in vecs])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        for q in range(8):
            sims = np.round(Mn @ Mn[q], 6)
            order = sorted(range(60), key=lambda i: (-sims[i], i))[:10]
            cnt: dict = {}
            for i in order:
                cnt[labels[i]] = cnt.get(labels[i], 0) + 1
            best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            row = got[got["query_id"] == q].iloc[0]
            assert (int(row["label"]), int(row["votes"])) == best, q


class TestHalfUpCents:
    def test_floor_plus_half_matches_duckdb_round(self):
        """floor(x*100 + 0.5) must agree with DuckDB's round() (half away
        from zero for positives) on values where np.round (half-even)
        disagrees — e.g. 0.125*100 = 12.5."""
        import duckdb

        vals = [0.125, 0.135, 0.005, 0.015, 1.005, 2.675, 0.1, 0.33]
        engine = np.floor(np.asarray(vals) * 100.0 + 0.5).astype(np.int64)
        sql = duckdb.sql(
            "SELECT CAST(floor(v * 100 + 0.5) AS BIGINT) c FROM (SELECT unnest(?::DOUBLE[]) v)",
            params=[vals],
        ).fetchall()
        assert engine.tolist() == [r[0] for r in sql]
        # and np.round genuinely differs on the half-even cases, proving the
        # old formula was only saved by the 2-decimal synth contract
        assert np.round(0.125 * 100).astype(np.int64) != engine[0]


class TestMarkovTransitions:
    def test_matches_pandas_naive(self, ray_session, tmp_path):
        """Engine transition counts + probabilities must equal a pandas
        lag-within-user recomputation, including the user-boundary mask
        (no cross-user transition) and single-event users (no row)."""
        import pandas as pd

        from text_to_graph_ray.pipelines.analytics import event_type_transitions

        rng = np.random.default_rng(11)
        n = 400
        ts = pd.to_datetime(rng.permutation(n), unit="s")
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 30, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
            "value": rng.normal(size=n),
            "props": ["{}"] * n,
        })
        # one single-event user: contributes nothing
        df.loc[0, "user_id"] = 999
        df = df[~((df.user_id == 999) & (df.index != 0))]
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(tmp_path / "events.parquet"))

        got = event_type_transitions(str(tmp_path)).to_pandas()

        s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = s.groupby("user_id", sort=False)["event_type"].shift(1)
        t = (
            pd.DataFrame({"from_type": prev, "to_type": s["event_type"]})
            .dropna()
            .groupby(["from_type", "to_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .sort_values(["from_type", "to_type"], kind="mergesort")
            .reset_index(drop=True)
        )
        t["p"] = t["n"].to_numpy(np.int64).astype(np.float64) / t.groupby("from_type")["n"].transform(
            "sum"
        ).to_numpy(np.int64).astype(np.float64)

        assert got[["from_type", "to_type"]].values.tolist() == t[["from_type", "to_type"]].values.tolist()
        assert got["n"].tolist() == t["n"].tolist()
        assert got["p"].tolist() == t["p"].tolist()  # bit-exact: one IEEE division
        assert "999" not in set(got["from_type"]) and not (got["from_type"] == "999").any()


class TestLengthBandStats:
    def test_matches_numpy_linear_quantiles(self, ray_session):
        """Per-group band membership must match numpy linear-interpolated
        quantiles (the quantile_cont contract) with round(6) thresholds,
        including a group whose p5/p95 land on fractional positions."""
        import ray as _ray

        from text_to_graph_ray.functions.text import length_band_stats

        rng = np.random.default_rng(23)
        rows = []
        for g, sizes in (("g0", rng.integers(1, 50, 37)), ("g1", rng.integers(5, 500, 83)),
                         ("g2", np.array([7]))):  # single-doc group: band == its own length
            for s in sizes:
                rows.append((g, "w " * int(s)))
        t = pa.table({"source": pa.array([g for g, _ in rows], type=pa.string()),
                      "doc_id": pa.array(range(len(rows)), type=pa.int64()),
                      "text": pa.array([x for _, x in rows], type=pa.string())})
        got = length_band_stats(_ray.data.from_arrow(t).repartition(5)).to_pandas()

        import pandas as pd
        df = pd.DataFrame({"source": [g for g, _ in rows],
                           "n": [len(x.split()) for _, x in rows]})
        want = []
        for g, grp in df.groupby("source"):
            lo = round(float(np.quantile(grp["n"], 0.05, method="linear")), 6)
            hi = round(float(np.quantile(grp["n"], 0.95, method="linear")), 6)
            keep = grp[(grp["n"] >= lo) & (grp["n"] <= hi)]
            want.append((g, len(keep), int(keep["n"].sum())))
        assert [tuple(r) for r in got.itertuples(index=False)] == want
        assert (got.set_index("source").loc["g2"] == (1, 7)).all()

    def test_group_count_guard(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.text import length_band_stats

        t = pa.table({"source": pa.array([f"s{i}" for i in range(40)], type=pa.string()),
                      "text": pa.array(["a b c"] * 40, type=pa.string())})
        with pytest.raises(ValueError, match="answer-sized"):
            length_band_stats(_ray.data.from_arrow(t), max_groups=10)


class TestCommonNeighbors:
    def _edges(self, seed=3, n=40, p=0.18):
        rng = np.random.default_rng(seed)
        adj = np.triu(rng.random((n, n)) < p, 1)
        pairs = np.argwhere(adj)
        return [(int(a), int(b)) for a, b in pairs], n, adj | adj.T

    def _run(self, edges, **kw):
        import ray as _ray

        from text_to_graph_ray.functions.graph import common_neighbor_topk

        t = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                      "dst": pa.array([b for _, b in edges], type=pa.int64())})
        return common_neighbor_topk(_ray.data.from_arrow(t).repartition(4), **kw).to_pandas()

    def _naive(self, n, adj, k, min_common):
        rows = []
        for u in range(n):
            for v in range(u + 1, n):
                if adj[u, v]:
                    continue
                cn = int((adj[u] & adj[v]).sum())
                if cn >= min_common:
                    rows.append((u, v, cn))
        rows.sort(key=lambda r: (-r[2], r[0], r[1]))
        return rows[:k]

    def test_matches_naive_dense_recount(self, ray_session):
        edges, n, adj = self._edges()
        got = self._run(edges, k=25, min_common=2)
        assert [tuple(r) for r in got.itertuples(index=False)] == self._naive(n, adj, 25, 2)

    def test_broadcast_and_antijoin_plans_identical(self, ray_session):
        """edge_broadcast_max=0 forces the side-tagged bucketed anti-join;
        both adjacency-removal plans must produce identical top-k."""
        edges, n, adj = self._edges(seed=9)
        a = self._run(edges, k=30, min_common=1)
        b = self._run(edges, k=30, min_common=1, edge_broadcast_max=0)
        assert a.values.tolist() == b.values.tolist()
        assert len(a) == 30

    def test_hub_cap_skips_and_surfaces(self, ray_session):
        """A star hub above the cap stops voting: pairs of its leaves lose
        their only common neighbor, and the skipped count surfaces."""
        hub_edges = [(100, i) for i in range(20)] + [(0, 1), (1, 2), (0, 2), (3, 4)]
        stats = {}
        got = self._run(hub_edges, k=50, min_common=1, hub_degree_cap=5, stats=stats)
        assert stats["cn_hubs_skipped"] == 1
        # with the hub silenced, EVERY remaining candidate pair is adjacent
        # (the triangle 0-1-2 and the hub spokes), so the capped answer is
        # empty — all leaf-pair signal came from the hub
        assert len(got) == 0
        exact = self._run(hub_edges, k=50, min_common=1)
        # hub votes restored: leaf pairs (i, j) now share the hub; e.g. (0, 3)
        pairs = {(int(r.u), int(r.v)) for r in exact.itertuples()}
        assert (0, 3) in pairs and len(exact) == 50


class TestBigramLM:
    def _docs(self):
        texts = [
            "the cat sat on the mat",
            "the cat ate",
            "solo",
            "",
            "the cat sat on the mat",  # exact dup: identical score
            "unseen words entirely here",
        ]
        return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                         "text": pa.array(texts, type=pa.string())}), texts

    def test_matches_naive_and_edge_cases(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.expected import naive_bigram_lm
        from text_to_graph_ray.functions.text import bigram_lm_nll

        t, texts = self._docs()
        got = bigram_lm_nll(_ray.data.from_arrow(t).repartition(3)).to_pandas()
        nb, nll = naive_bigram_lm(list(range(len(texts))), texts)
        assert got["n_bigrams"].tolist() == nb
        assert got["nll"].tolist() == nll
        assert got.loc[2, "n_bigrams"] == 0 and got.loc[2, "nll"] == 0.0  # 1 token
        assert got.loc[3, "n_bigrams"] == 0 and got.loc[3, "nll"] == 0.0  # empty
        assert got.loc[0, "nll"] == got.loc[4, "nll"]  # dup docs score equal
        # dup'd doc is MORE likely under the corpus model than the unique one
        assert got.loc[0, "nll"] < got.loc[5, "nll"]

    def test_broadcast_and_exchange_plans_identical(self, ray_session):
        """counts_broadcast_max=0 forces lookup_join's bucketed fallback for
        both count attachments; quantized term sums make the paths
        bit-identical."""
        import ray as _ray

        from text_to_graph_ray.functions.text import bigram_lm_nll

        t, _ = self._docs()
        a = bigram_lm_nll(_ray.data.from_arrow(t).repartition(3)).to_pandas()
        b = bigram_lm_nll(_ray.data.from_arrow(t).repartition(3), counts_broadcast_max=0).to_pandas()
        assert a.values.tolist() == b.values.tolist()


class TestDriftChi2:
    def test_matches_naive_and_detects_planted_drift(self, ray_session):
        """Category 'z' appears only in cohort B: its chi2 term must
        dominate; a perfectly balanced category contributes ~0; totals and
        terms must match a plain-dict recomputation."""
        import ray as _ray

        from text_to_graph_ray.functions.stats import categorical_drift_chi2

        cats = ["x"] * 50 + ["y"] * 30 + ["z"] * 20
        side = [False, True] * 25 + [False] * 15 + [True] * 15 + [True] * 20
        t = pa.table({"cat": pa.array(cats, type=pa.string()),
                      "side": pa.array(side, type=pa.bool_())})
        got = categorical_drift_chi2(_ray.data.from_arrow(t).repartition(4), "cat", "side").to_pandas()

        from collections import Counter
        ca = Counter(c for c, s in zip(cats, side) if not s)
        cb = Counter(c for c, s in zip(cats, side) if s)
        ta, tb = float(sum(ca.values())), float(sum(cb.values()))
        want = []
        for c in sorted(set(cats)):
            na, nb = ca.get(c, 0), cb.get(c, 0)
            ea = (na + nb) * ta / (ta + tb)
            eb = (na + nb) * tb / (ta + tb)
            term = (0.0 if ea == 0 else (na - ea) * (na - ea) / ea) + (
                0.0 if eb == 0 else (nb - eb) * (nb - eb) / eb)
            want.append((c, na, nb, round(term, 6)))
        assert [tuple(r) for r in got.itertuples(index=False)] == want
        terms = dict(zip(got["cat"], got["chi2_term"]))
        # the planted one-sided category dominates (13.33 vs <= 2.09: note
        # even x's 25/25 split is drifted against the 40:60 cohort baseline)
        assert terms["z"] == max(terms.values()) and terms["z"] > 5.0
        assert max(terms["x"], terms["y"]) < 2.5


class TestResourceAllocationLink:
    def test_ra_matches_naive_and_reranks(self, ray_session):
        """RA scores must equal a dense recomputation (sum of 10^9//deg per
        common neighbor, /1e9, round 6); ranking by RA must downweight
        hub-mediated pairs relative to count ranking."""
        import ray as _ray

        from text_to_graph_ray.functions.graph import common_neighbor_topk

        rng = np.random.default_rng(17)
        n = 30
        adj = np.triu(rng.random((n, n)) < 0.25, 1)
        # add a hub adjacent to everyone: every non-adjacent pair gains a
        # weak (1/deg≈1/29) vote; low-degree shared neighbors dominate RA
        edges = [(int(a), int(b)) for a, b in np.argwhere(adj)] + [(i, 99) for i in range(n)]
        sym = adj | adj.T
        full = np.zeros((100, 100), dtype=bool)
        full[:n, :n] = sym
        full[99, :n] = True
        full[:n, 99] = True
        t = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                      "dst": pa.array([b for _, b in edges], type=pa.int64())})
        got = common_neighbor_topk(_ray.data.from_arrow(t).repartition(4),
                                   k=40, min_common=1, rank_by="ra", include_ra=True).to_pandas()

        deg = full.sum(axis=1).astype(np.int64)
        w = np.zeros(100, dtype=np.int64)
        w[deg > 0] = np.int64(1_000_000_000) // deg[deg > 0]
        rows = []
        for u in range(100):
            for v in range(u + 1, 100):
                if full[u, v]:
                    continue
                commons = np.flatnonzero(full[u] & full[v])
                if len(commons) < 1:
                    continue
                q = int(w[commons].sum())
                rows.append((u, v, len(commons), q))
        rows.sort(key=lambda r: (-r[3], r[0], r[1]))
        want = [(u, v, cn, round(q / 1e9, 6)) for u, v, cn, q in rows[:40]]
        assert [tuple(r) for r in got.itertuples(index=False)] == want
        # every surviving pair shares the hub, so cn >= 1 everywhere; the
        # top RA rows must carry MORE weight than the hub alone provides
        assert got.iloc[0]["ra"] > round(int(w[99]) / 1e9, 6)


class TestIncrementalMinhash:
    def test_incremental_equals_full_rebuild_slice(self, ray_session):
        """pairs(new) ∪ cross(old, new) must hash-equal the full corpus
        recompute restricted to pairs involving a new doc — planted dups in
        all three configurations: old-old (must NOT appear), old-new and
        new-new (must appear)."""
        import ray as _ray

        from text_to_graph_ray.functions.dedup import (
            minhash_cross_pairs, minhash_near_dup_pairs,
        )

        base = [
            "alpha beta gamma delta epsilon zeta " * 5,
            "one two three four five six seven " * 5,
            "lorem ipsum dolor sit amet consectetur " * 5,
        ]
        texts = (
            [base[0], base[0] + " tailword"]       # old-old near-dup (ids 0,1)
            + [base[1], "filler doc about nothing relevant"]   # 2, 3
            + [base[1] + " coda", base[2], base[2]]  # new: 4 (dups old 2), 5/6 (new-new dup)
        )
        t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        full = minhash_near_dup_pairs(
            _ray.data.from_arrow(t).repartition(3), threshold=0.5).to_pandas()
        cutoff = 4
        old_t, new_t = t.slice(0, cutoff), t.slice(cutoff)
        inc = (
            minhash_near_dup_pairs(_ray.data.from_arrow(new_t).repartition(2), threshold=0.5)
            .union(minhash_cross_pairs(_ray.data.from_arrow(old_t).repartition(2),
                                       _ray.data.from_arrow(new_t).repartition(2), threshold=0.5))
            .sort(["a", "b"])
            .to_pandas()
        )
        want = full[full["b"] >= cutoff].reset_index(drop=True)
        assert inc.values.tolist() == want.values.tolist()
        pairs = {(int(r.a), int(r.b)) for r in inc.itertuples()}
        assert (2, 4) in pairs and (5, 6) in pairs   # old-new and new-new found
        assert (0, 1) not in pairs                   # old-old never re-enumerated
        assert (0, 1) in {(int(r.a), int(r.b)) for r in full.itertuples()}


class TestExplodeBigramsVectorized:
    def test_differential_vs_per_row_contract(self):
        """Batch kernel == per-row kernel as a multiset of (doc, bg, f, m),
        over adversarial inputs: every ASCII char as separator candidates,
        leading/trailing/repeated whitespace, 0/1-token docs, dup bigrams,
        non-ASCII fallback rows, nulls."""
        import pandas as pd

        from text_to_graph_ray.functions.text import (
            _explode_bigrams_rows, explode_bigrams_batch,
        )

        texts = [
            "a b a b a",                    # dup bigrams
            "  leading and  trailing  ",
            "single",
            "",
            None,
            "café au lait café au",  # non-ascii fallback
            "x\ty\nz\x0b w \x0c q",
            "\x1c a \x1d b \x1e c \x1f d",  # ascii control seps (str.split strips)
            " ".join(f"w{i%7}" for i in range(50)),
        ]
        ids = list(range(len(texts)))
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        got = explode_bigrams_batch(t).to_pandas()
        d, bgs, f, m = _explode_bigrams_rows(ids, ["" if x is None else x for x in texts])
        want = pd.DataFrame({"doc_id": d, "bg": bgs, "f": f, "m": m})
        key = ["doc_id", "bg", "f", "m"]
        assert (
            got.sort_values(key).reset_index(drop=True)[key].values.tolist()
            == want.sort_values(key).reset_index(drop=True)[key].values.tolist()
        )
        assert (got["m"] > 0).all() and len(got) > 0

    def test_all_128_ascii_one_char_seps(self):
        """For every ASCII char c, 'a<c>b' must tokenize identically in the
        batch kernel and str.split (whitespace chars split, others glue)."""
        import pandas as pd

        from text_to_graph_ray.functions.text import (
            _explode_bigrams_rows, explode_bigrams_batch,
        )

        texts = [f"a{chr(c)}b x" for c in range(128)]
        ids = list(range(128))
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        got = explode_bigrams_batch(t).to_pandas()
        d, bgs, f, m = _explode_bigrams_rows(ids, texts)
        want = pd.DataFrame({"doc_id": d, "bg": bgs, "f": f, "m": m})
        key = ["doc_id", "bg", "f", "m"]
        assert (
            got.sort_values(key).reset_index(drop=True)[key].values.tolist()
            == want.sort_values(key).reset_index(drop=True)[key].values.tolist()
        )


class TestCheckpointCompactionAndGC:
    """VERDICT r4 #8: manifest compaction + config-hash retention keep a
    long-lived checkpoint root bounded."""

    def test_overlay_individual_row_wins_until_next_compaction(self, tmp_path):
        from text_to_graph_ray.state.checkpoint import CheckpointStore

        st = CheckpointStore(str(tmp_path), "cfgA")
        st.mark_done("s", 1, rows=10)
        st.mark_done("s", 2, rows=20)
        assert st.compact_stage("s") == 2
        mdir = os.path.join(st.base, "_manifest", "s")
        assert sorted(os.listdir(mdir)) == ["compacted.json"]
        assert st.done_parts("s") == {1, 2}
        assert st.manifest("s", 2)["rows"] == 20
        # a newer individual row shadows the snapshot...
        st.mark_done("s", 2, rows=99)
        assert st.manifest("s", 2)["rows"] == 99
        # ...and survives the next compaction
        assert st.compact_stage("s") == 2
        assert st.manifest("s", 2)["rows"] == 99
        assert sorted(os.listdir(mdir)) == ["compacted.json"]
        # invalidation removes from the snapshot too
        st.invalidate_parts("s", [1])
        assert st.done_parts("s") == {2}
        assert st.manifest("s", 1) is None

    def test_resume_after_compaction_skips_completed(self, ray_session, small_corpus, tmp_path_factory):
        from text_to_graph_ray.config import PipelineConfig
        from text_to_graph_ray.pipelines import kg
        from text_to_graph_ray.state.checkpoint import CheckpointStore

        cfg = PipelineConfig(num_partitions=8)
        out = str(tmp_path_factory.mktemp("ckpt_compact"))
        r1 = kg.run(small_corpus["path"], out, cfg)
        store = CheckpointStore(f"{out}/checkpoints", cfg.config_hash())
        # a completed run leaves exactly one manifest file per stage
        for stage in ("records", "merged", "graph"):
            mdir = os.path.join(store.base, "_manifest", stage)
            assert sorted(os.listdir(mdir)) == ["compacted.json"], stage
        r2 = kg.run(small_corpus["path"], out, cfg)
        assert r2["parts_computed"] == 0
        assert r2["parts_skipped"] == r1["parts_total"]
        # forget two partitions -> resume recomputes exactly those
        victims = sorted(store.done_parts("records"))[:2]
        store.invalidate_parts("records", victims)
        for p in victims:
            shutil.rmtree(os.path.join(store.stage_dir("records"), f"part_id={p}"), ignore_errors=True)
        r3 = kg.run(small_corpus["path"], out, cfg)
        assert r3["parts_computed"] == len(victims)
        assert (r3["nodes"], r3["edges"]) == (r1["nodes"], r1["edges"])

    def test_gc_keeps_recent_and_current(self, tmp_path):
        import time as _time

        from text_to_graph_ray.state.checkpoint import CheckpointStore, gc_config_roots

        root = str(tmp_path / "ck")
        for i in range(4):
            st = CheckpointStore(root, f"cfg{i}")
            st.mark_done("s", 0, rows=i)
            # distinct marker mtimes (ns resolution is enough, but be safe)
            _time.sleep(0.01)
        removed = gc_config_roots(root, keep_last=2, current="cfg0")
        # cfg3/cfg2 newest -> kept; cfg0 is current -> kept; cfg1 dropped
        assert removed == ["cfg1"]
        assert sorted(os.listdir(root)) == ["cfg0", "cfg2", "cfg3"]
        # re-opening an old store refreshes its recency
        CheckpointStore(root, "cfg2")
        _time.sleep(0.01)
        assert sorted(gc_config_roots(root, keep_last=1, current="cfg2")) == ["cfg0", "cfg3"]

    def test_run_gc_drops_stale_config_tree(self, ray_session, small_corpus, tmp_path_factory):
        from text_to_graph_ray.config import PipelineConfig
        from text_to_graph_ray.pipelines import kg

        out = str(tmp_path_factory.mktemp("ckpt_gc"))
        c1 = PipelineConfig(num_partitions=4)
        c2 = PipelineConfig(num_partitions=4, chunk_size=300)
        kg.run(small_corpus["path"], out, c1)
        kg.run(small_corpus["path"], out, c2, gc_keep_configs=0)  # keep only current
        assert sorted(os.listdir(f"{out}/checkpoints")) == [c2.config_hash()]


class TestDeltaScopedIncrementalMerge:
    """VERDICT r4 #6: merge_increment(delta=True) scopes the re-merge
    exchange to identities the increment touches; untouched base rows
    stream through. Must be hash-identical to the full plan — including
    with linking, with the guard tripped, and on overlapping key sets."""

    def _mk_files(self, rows):
        import ray

        return ray.data.from_arrow(pa.table({
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "lang": pa.array(["python"] * len(rows)),
            "content": pa.array([r[2] for r in rows]),
        }))

    def _build(self, rows, cfg):
        from text_to_graph_ray.pipelines import kg

        ds = self._mk_files(rows)
        return kg.merged_graph(kg.keyed_records(kg.extract_chain(ds, cfg), cfg), cfg)

    def test_delta_equals_full_with_linking(self, ray_session):
        from text_to_graph_ray.config import PipelineConfig
        from text_to_graph_ray.pipelines import kg

        # base and increment SHARE entities (f0..f8 call-chain wraps) and the
        # increment adds new defs that must rewrite base mentions via linking
        base_rows = [
            ("r1", f"m{i}.py", f"import os\n\ndef f{i}():\n    g{(i + 1) % 9}()\n")
            for i in range(9)
        ]
        inc_rows = [
            ("r2", "new.py", "import os\n\ndef g1():\n    f0()\n"),
            ("r2", "new2.py", "def brand_new():\n    g1()\n"),
        ]
        full_cfg = PipelineConfig(link_aliases=True)
        nolink = PipelineConfig(link_aliases=False)
        parts = [self._build(base_rows, nolink), self._build(inc_rows, nolink)]

        full_nodes = kg.nodes_from_merged(kg.merge_increment(parts, full_cfg)).to_pandas()
        full_edges = kg.edges_from_merged(kg.merge_increment(parts, full_cfg)).to_pandas()
        delta_m = kg.merge_increment(parts, full_cfg, delta=True)
        import pandas as pd

        pd.testing.assert_frame_equal(
            kg.nodes_from_merged(delta_m).to_pandas().reset_index(drop=True),
            full_nodes.reset_index(drop=True),
        )
        pd.testing.assert_frame_equal(
            kg.edges_from_merged(delta_m).to_pandas().reset_index(drop=True),
            full_edges.reset_index(drop=True),
        )

    def test_guard_zero_forces_full_plan_same_result(self, ray_session):
        import pandas as pd

        from text_to_graph_ray.config import PipelineConfig
        from text_to_graph_ray.pipelines import kg

        nolink = PipelineConfig(link_aliases=False)
        a = [("r1", "a.py", "def Alpha():\n    beta()\n")]
        b = [("r2", "b.py", "def beta():\n    Alpha()\n")]
        parts = [self._build(a, nolink), self._build(b, nolink)]
        want = kg.nodes_from_merged(kg.merge_increment(parts, nolink), with_ids=False).to_pandas()
        got = kg.nodes_from_merged(
            kg.merge_increment(parts, nolink, delta=True, delta_keys_max=0), with_ids=False
        ).to_pandas()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))

    def test_untouched_rows_bypass_the_exchange(self, ray_session):
        """The plan property itself: with a disjoint increment, only
        increment-identity rows enter the bucket exchange (counted via the
        touched-side filter), and label-casing merges still resolve when the
        increment DOES touch a base identity."""
        import pandas as pd

        from text_to_graph_ray.config import PipelineConfig
        from text_to_graph_ray.pipelines import kg

        nolink = PipelineConfig(link_aliases=False)
        base_rows = [("r1", f"m{i}.py", f"def f{i}():\n    pass\n") for i in range(8)]
        inc_rows = [("r2", "x.py", "def F3():\n    pass\n")]  # touches f3 only
        base_m = self._build(base_rows, nolink).materialize()
        inc_m = self._build(inc_rows, nolink)
        got = kg.nodes_from_merged(
            kg.merge_increment([base_m, inc_m], nolink, delta=True), with_ids=False
        ).to_pandas()
        want = kg.nodes_from_merged(
            kg.merge_increment([base_m, inc_m], nolink), with_ids=False
        ).to_pandas()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))
        # min-own rule resolved across increments: ONE row for f3, with the
        # ASCII-min own label ("F3" < "f3") and both repos in provenance
        row = got[got.entity_key == "f3"]
        assert len(row) == 1 and row.iloc[0]["label"] == "F3"
        assert row.iloc[0]["repos_packed"] == "r1|r2"


class TestBucketedJoinNodeAffinity:
    """VERDICT r4 #9: node-local-storage co-location behind a flag. The
    affinity plan (one soft-pinned raw task per bucket, results re-entering
    Ray Data via from_arrow_refs) must be value-identical to the default
    map_batches plan; single-node we can only pin to the local node, but
    the wiring (strategy construction, per-bucket fan-out, ref assembly)
    is fully exercised."""

    def test_affinity_plan_matches_default(self, ray_session, tmp_path):
        import ray as _ray

        from text_to_graph_ray.sources.bucketed import bucketed_join, write_bucketed

        n = 200
        left = pa.table({"k": pa.array(range(n), type=pa.int64()),
                         "v": pa.array([i * 3 for i in range(n)], type=pa.int64())})
        right = pa.table({"k2": pa.array(range(0, n, 2), type=pa.int64()),
                          "w": pa.array([i + 7 for i in range(0, n, 2)], type=pa.int64())})
        pl, pr = str(tmp_path / "L"), str(tmp_path / "R")
        write_bucketed(_ray.data.from_arrow(left).repartition(4), "k", pl, num_buckets=8)
        write_bucketed(_ray.data.from_arrow(right).repartition(4), "k2", pr, num_buckets=8)

        base = bucketed_join(pl, pr, on=("k", "k2")).to_pandas().sort_values("k").reset_index(drop=True)
        me = _ray.get_runtime_context().get_node_id()
        # mixed map: some buckets pinned, some unmapped (falls back to default scheduling)
        amap = {k: me for k in range(0, 8, 2)}
        aff = (
            bucketed_join(pl, pr, on=("k", "k2"), node_affinity=amap)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(aff, base)
        assert len(base) == n // 2 and (base["w"] == base["k"] + 7).all()


class TestShuffleShards:
    def test_permutation_balance_and_naive_match(self, ray_session):
        import hashlib

        import ray as _ray

        from text_to_graph_ray.functions.sample import shuffle_shards

        ids = [7, 1, 42, 300, 5, 19, 88, 250, 3, 1001, 64, 12]
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
        got = shuffle_shards(_ray.data.from_arrow(t).repartition(3), n_shards=5).to_pandas()
        # pos is a permutation of 0..N-1
        assert sorted(got["pos"]) == list(range(len(ids)))
        # shard striping: pos % n_shards, so shard sizes balanced within 1
        assert (got["shard"] == got["pos"] % 5).all()
        sizes = got.groupby("shard").size()
        assert sizes.max() - sizes.min() <= 1
        # exact per-row position matches the naive md5-ordered rank
        order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want = {i: p for p, i in enumerate(order)}
        assert {r.doc_id: r.pos for r in got.itertuples()} == want


class TestMixturePlan:
    @staticmethod
    def _naive(rows, budget):
        # rows: list of (source, tokens-per-doc lists)
        tot = {s: sum(ts) for s, ts in rows}
        total = sum(tot.values())
        base = {s: budget * v // total for s, v in tot.items()}
        left = budget - sum(base.values())
        for s in sorted(tot, key=lambda s: (-(budget * tot[s] % total), s))[:left]:
            base[s] += 1
        return tot, base

    def test_exact_hamilton_allocation(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.sample import mixture_plan

        rows = [
            ("web", ["a b c", "d e", "f"]),           # 6 tokens
            ("code", ["x y z w", "q"]),               # 5 tokens
            ("books", ["l m n o p r s"]),             # 7 tokens
        ]
        flat_src, flat_txt = [], []
        for s, ts in rows:
            for txt in ts:
                flat_src.append(s)
                flat_txt.append(txt)
        t = pa.table({"source": pa.array(flat_src, type=pa.string()),
                      "text": pa.array(flat_txt, type=pa.string())})
        budget = 100
        got = mixture_plan(_ray.data.from_arrow(t).repartition(4), budget_tokens=budget).to_pandas()
        tok_rows = [(s, [len(x.split(" ")) for x in ts]) for s, ts in rows]
        tot, want = self._naive(tok_rows, budget)
        assert got["alloc_tokens"].sum() == budget
        assert dict(zip(got["source"], got["n_tokens"])) == tot
        assert dict(zip(got["source"], got["alloc_tokens"])) == want
        assert dict(zip(got["source"], got["n_docs"])) == {s: len(ts) for s, ts in rows}

    def test_ties_and_empty_text(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.sample import mixture_plan

        # equal token counts force remainder ties -> source-ASC tiebreak
        t = pa.table({"source": pa.array(["b", "a", "c"], type=pa.string()),
                      "text": pa.array(["x y", "p q", ""], type=pa.string())})
        got = mixture_plan(_ray.data.from_arrow(t), budget_tokens=7).to_pandas()
        # tokens: b=2, a=2, c=1 (empty text = 1 token by the split contract)
        tot, want = self._naive([("b", [2]), ("a", [2]), ("c", [1])], 7)
        assert dict(zip(got["source"], got["alloc_tokens"])) == want
        assert got["alloc_tokens"].sum() == 7


class TestBpeTrain:
    def _docs(self, texts):
        import ray as _ray

        return _ray.data.from_arrow(pa.table({"text": pa.array(texts, type=pa.string())})).repartition(3)

    def test_hand_checked_merges(self, ray_session):
        """'low low low lower' x1: first merge is the most frequent adjacent
        pair; hand-derived sequence for a corpus small enough to eyeball."""
        from text_to_graph_ray.functions.bpe import bpe_train

        got = bpe_train(self._docs(["low low low", "lower"]), n_merges=3).to_pandas()
        # pairs: (l,o)x4 (o,w)x4 (w,</w>)x3 (w,e)x1 (e,r)x1 (r,</w>)x1
        # rank1 = ('l','o') count 4 (ties with ('o','w'), left asc wins)
        assert list(got.itertuples(index=False, name=None)) == [
            (1, "l", "o", 4),
            (2, "lo", "w", 4),
            (3, "low", "</w>", 3),
        ]

    def test_plans_identical_and_match_naive(self, ray_session):
        """Driver (collect) and distributed (word_collect_max=0) plans must
        produce identical merge tables, and both must match the independent
        full-recount naive implementation."""
        import pandas as pd

        from text_to_graph_ray.expected import naive_bpe_merges
        from text_to_graph_ray.functions.bpe import bpe_train

        rng = np.random.default_rng(55)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
        texts = [" ".join(rng.choice(words, size=rng.integers(3, 30))) for _ in range(40)]
        ds = self._docs(texts)
        a = bpe_train(ds, n_merges=15).to_pandas()
        b = bpe_train(ds, n_merges=15, word_collect_max=0).to_pandas()
        exp = pd.DataFrame(naive_bpe_merges(texts, 15))
        assert a.equals(b)
        assert a.reset_index(drop=True).equals(exp.reset_index(drop=True))

    def test_stops_when_pairs_exhausted(self, ray_session):
        """A one-word corpus runs out of adjacent pairs before n_merges; the
        merge table must stop early, not pad."""
        from text_to_graph_ray.functions.bpe import bpe_train

        got = bpe_train(self._docs(["ab ab"]), n_merges=10).to_pandas()
        # 'ab</w>' has pairs (a,b), (b,</w>) -> merges collapse to ONE symbol
        # in 2 steps; after that no pair remains
        assert len(got) == 2
        assert got["rank"].tolist() == [1, 2]

    def test_unicode_fallback_rows(self, ray_session):
        """Non-ASCII rows take the per-row str.split path; results must match
        the naive oracle (which always uses str.split)."""
        import pandas as pd

        from text_to_graph_ray.expected import naive_bpe_merges
        from text_to_graph_ray.functions.bpe import bpe_train

        texts = ["héllo wörld héllo", "plain ascii words here", "héllo wörld"]
        got = bpe_train(self._docs(texts), n_merges=8).to_pandas()
        exp = pd.DataFrame(naive_bpe_merges(texts, 8))
        assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


class TestSemDeDup:
    def _emb(self, ids, vecs):
        import ray as _ray

        t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                      "embedding": pa.array([list(map(float, v)) for v in vecs],
                                            type=pa.list_(pa.float32()))})
        return _ray.data.from_arrow(t).repartition(3)

    def test_matches_naive_and_min_id_kept(self, ray_session):
        """Planted near-dup pairs: engine == naive oracle, and within every
        removed group the smallest id survives."""
        from text_to_graph_ray.expected import naive_semdedup
        from text_to_graph_ray.functions.dedup import semdedup
        import pandas as pd

        rng = np.random.default_rng(7)
        base = rng.standard_normal((40, 8))
        vecs = list(base)
        # ids 100/101 nearly identical; 200/201/202 a near-dup triple
        vecs += [base[0] + 1e-4 * rng.standard_normal(8) for _ in range(2)]
        ids = list(range(40)) + [100, 101]
        dup = rng.standard_normal(8)
        vecs += [dup, dup + 1e-4 * rng.standard_normal(8), dup + 1e-4 * rng.standard_normal(8)]
        ids += [200, 201, 202]
        got = semdedup(self._emb(ids, vecs), tau=0.95, n_centroids=4).to_pandas()
        exp = pd.DataFrame(naive_semdedup(np.asarray(ids, dtype=np.int64),
                                          np.asarray(vecs, dtype=np.float32).astype(np.float64),
                                          tau=0.95, n_centroids=4))
        assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))
        k = dict(zip(got["vec_id"], got["kept"]))
        # 100 is itself a near-dup of vec 0 (same cluster guaranteed? both
        # derive from base[0]) — at minimum the planted triples behave:
        assert k[200] and not k[201] and not k[202]
        assert not k[101]  # 100 < 101, same cluster (identical direction)

    def test_cluster_cap_raises_loudly(self, ray_session):
        from text_to_graph_ray.functions.dedup import semdedup

        rng = np.random.default_rng(9)
        vecs = rng.standard_normal((30, 4))
        ds = self._emb(list(range(30)), list(vecs))
        with pytest.raises(Exception, match="cluster_rows_max"):
            semdedup(ds, tau=0.99, n_centroids=1, cluster_rows_max=10).to_pandas()


class TestMixtureTemperature:
    def test_sqrt_weights_hand_checked(self, ray_session):
        """Two sources, 9x token imbalance: plain plan splits 90/10, the
        alpha=0.5 plan splits 75/25 (sqrt(9):sqrt(1) = 3:1)."""
        import ray as _ray

        from text_to_graph_ray.functions.sample import mixture_plan

        t = pa.table({
            "source": pa.array(["big"] * 9 + ["small"], type=pa.string()),
            # one token per doc -> n_tokens = doc counts
            "text": pa.array(["x"] * 10, type=pa.string()),
        })
        ds = _ray.data.from_arrow(t).repartition(2)
        plain = mixture_plan(ds, budget_tokens=100, by="source").to_pandas()
        temp = mixture_plan(ds, budget_tokens=100, by="source", temperature=True).to_pandas()
        assert dict(zip(plain["source"], plain["alloc_tokens"])) == {"big": 90, "small": 10}
        assert dict(zip(temp["source"], temp["alloc_tokens"])) == {"big": 75, "small": 25}
        assert temp["alloc_tokens"].sum() == 100


class TestEventsThrottle:
    def test_hand_fixture(self, ray_session, tmp_path):
        """Three users; windows and winners derived by hand, including a
        same-timestamp tie broken by event_id."""
        import pandas as pd

        from text_to_graph_ray.pipelines.analytics import events_throttle_first

        rows = [
            # user 1: two events in window 0 (ts 5s, 50s), one in window 1 (65s)
            (10, 5_000_000, 1), (11, 50_000_000, 1), (12, 65_000_000, 1),
            # user 2: same-ts tie in window 0 -> event_id 20 wins over 21
            (21, 30_000_000, 2), (20, 30_000_000, 2),
            # user 3: single event far out (window 100)
            (30, 6_000_000_000, 3),
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array(["x"] * len(rows), type=pa.string()),
            "value": pa.array([0.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        })
        pq.write_table(t, tmp_path / "events.parquet")
        got = events_throttle_first(str(tmp_path), window_s=60).to_pandas()
        expect = pd.DataFrame({
            "user_id": [1, 1, 2, 3],
            "w": [0, 1, 0, 100],
            "first_event_id": [10, 12, 20, 30],
            "n_events": [2, 1, 2, 1],
        })
        assert got.reset_index(drop=True).equals(expect)


class TestGramMatrix:
    def _emb(self, vecs):
        import ray as _ray

        t = pa.table({"embedding": pa.array([list(map(float, v)) for v in vecs],
                                            type=pa.list_(pa.float32()))})
        return _ray.data.from_arrow(t).repartition(2)

    def test_hand_checked_cells(self, ray_session):
        from text_to_graph_ray.functions.stats import gram_matrix

        got = gram_matrix(self._emb([[1, 2], [3, 4]])).to_pandas()
        cells = {(r.i, r.j): r.g for r in got.itertuples(index=False)}
        assert cells == {(0, 0): 10_000_000, (0, 1): 14_000_000,
                         (1, 0): 14_000_000, (1, 1): 20_000_000}

    def test_half_up_quantization_not_bankers(self, ray_session):
        """Product 1.25 at scale=2 -> 2.5 -> half-up 3 (np.round would give
        the banker's 2); all values exact in float32 so the cell is exact."""
        from text_to_graph_ray.functions.stats import gram_matrix

        got = gram_matrix(self._emb([[1.0, 1.25]]), scale=2).to_pandas()
        cells = {(r.i, r.j): r.g for r in got.itertuples(index=False)}
        assert cells[(0, 1)] == 3 and cells[(1, 0)] == 3
        assert cells[(0, 0)] == 2 and cells[(1, 1)] == 3  # 1.5625*2 = 3.125 -> 3

    def test_partials_sum_across_blocks(self, ray_session):
        """Many blocks, one row each: the answer-sized exchange must sum the
        per-block partials to the same cells as a single-block run."""
        import ray as _ray

        from text_to_graph_ray.functions.stats import gram_matrix

        rng = np.random.default_rng(13)
        vecs = rng.standard_normal((50, 6)).astype(np.float32)
        a = gram_matrix(self._emb(list(vecs))).to_pandas()
        t = pa.table({"embedding": pa.array([list(map(float, v)) for v in vecs],
                                            type=pa.list_(pa.float32()))})
        b = gram_matrix(_ray.data.from_arrow(t).repartition(25)).to_pandas()
        assert a.equals(b)


class TestBpeEncode:
    def test_train_then_apply_matches_naive(self, ray_session):
        import pandas as pd
        import ray as _ray

        from text_to_graph_ray.expected import naive_bpe_doclens, naive_bpe_merges
        from text_to_graph_ray.functions.bpe import bpe_encode_counts, bpe_train

        rng = np.random.default_rng(77)
        words = ["lower", "newest", "widest", "low", "new", "wide"]
        texts = [" ".join(rng.choice(words, size=rng.integers(1, 20))) for _ in range(30)]
        texts += ["", "héllo wörld", "a  b"]  # empty / unicode / run-of-spaces
        ids = list(range(len(texts)))
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        ds = _ray.data.from_arrow(t).repartition(4)
        merges = [(r["left"], r["right"]) for r in bpe_train(ds, n_merges=10).take_all()]
        got = bpe_encode_counts(ds, merges).to_pandas()
        exp = pd.DataFrame(naive_bpe_doclens(ids, texts, merges))
        assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))

    def test_full_merge_collapses_word_to_one_token(self, ray_session):
        """With enough merges a frequent word collapses to a single symbol:
        'low' -> l o w </w> needs 3 merges."""
        import ray as _ray

        from text_to_graph_ray.functions.bpe import bpe_encode_counts, bpe_train

        t = pa.table({"doc_id": pa.array([0], type=pa.int64()),
                      "text": pa.array(["low low low low"], type=pa.string())})
        ds = _ray.data.from_arrow(t)
        merges = [(r["left"], r["right"]) for r in bpe_train(ds, n_merges=10).take_all()]
        got = bpe_encode_counts(ds, merges).to_pandas()
        assert got.n_words.item() == 4 and got.n_subwords.item() == 4


class TestGopherRules:
    def _naive(self, doc_id, text):
        toks = (text or "").split()
        n = len(toks)
        stops = {"the", "a", "of", "to", "and", "in", "is", "on"}
        sh = sum(1 for t in toks if t in stops)
        ml = round(sum(len(t) for t in toks) / n, 6) if n else 0.0
        r1 = int(30 <= n <= 90)
        r2 = int(4.3 <= ml <= 5.0)
        r3 = int(sh >= 2)
        return (doc_id, n, ml, sh, r1, r2, r3, r1 & r2 & r3)

    def test_matches_naive_per_row(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.text import gopher_rules

        texts = [
            "",                                     # empty
            "a  b",                                 # run of spaces
            "the " * 50,                            # token-count band edge, 1-char words
            " ".join(["abcd"] * 30),                # exactly min_tokens, mean 4.0
            " ".join(["abcde"] * 30) + " the a",    # stop hits = 2 boundary
            "héllo wörld the a of",                 # unicode lengths
            " ".join(["words"] * 91),               # one past max_tokens
        ]
        ids = list(range(len(texts)))
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        got = (_ray.data.from_arrow(t).repartition(3)
               .map_batches(gopher_rules, batch_format="pyarrow").to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        for i, row in got.iterrows():
            assert tuple(row) == self._naive(ids[i], texts[i]), texts[i]

    def test_rules_live_on_corpus(self, ray_session):
        """Each rule must exclude SOMETHING at sf0.001 or the gate is dead."""
        from text_to_graph_ray.functions.text import gopher_rules
        from text_to_graph_ray.util import read_parquet_clean

        ds = read_parquet_clean("/root/testdata/sf0.001/documents.parquet",
                                columns=["doc_id", "text"])
        df = ds.map_batches(gopher_rules, batch_format="pyarrow").to_pandas()
        for col in ("r_len", "r_wordlen", "r_stop"):
            assert df[col].min() == 0 and df[col].max() == 1, col
        assert 0 < df["passed"].sum() < len(df)


class TestBm25:
    def _naive_scores(self, ids, texts, terms, k1=1.5, b=0.75):
        import math

        N = len(texts)
        toklists = [(t or "").split() for t in texts]
        dls = [len(tk) for tk in toklists]
        avgdl = float(sum(dls)) / float(N)
        dfs = [sum(1 for tk in toklists if term in tk) for term in terms]
        idfs = [round(math.log(((N - df) + 0.5) / (df + 0.5) + 1.0), 6) for df in dfs]
        out = {}
        for did, toks, dl in zip(ids, toklists, dls):
            s = 0.0
            hit = False
            for term, idf in zip(terms, idfs):
                tf = float(toks.count(term))
                if tf:
                    hit = True
                s = s + idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * float(dl)) / avgdl)))
            if hit:
                out[did] = round(s, 6)
        return out

    def test_matches_naive_and_ranks(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.text import bm25_topk

        rng = np.random.default_rng(55)
        vocab = ["table", "query", "fast", "stream", "row", "scan", "agg", "the"]
        texts = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 40)))) for _ in range(60)]
        texts += ["table table", "table " + "filler " * 60]  # dl-normalization pair
        ids = list(range(len(texts)))
        terms = ["table", "query"]
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
        got = bm25_topk(_ray.data.from_arrow(t).repartition(4), terms, k=10).to_pandas()
        naive = self._naive_scores(ids, texts, terms)
        want = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(zip(got["doc_id"], got["score"])) == [(d, s) for d, s in want]
        # doc-length normalization: same tf=2, shorter doc scores higher
        assert naive[60] > naive[61]

    def test_term_absent_everywhere(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.text import bm25_topk

        t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                      "text": pa.array(["row scan", "agg merge"], type=pa.string())})
        got = bm25_topk(_ray.data.from_arrow(t), ["zzz"], k=5).to_pandas()
        assert len(got) == 0


class TestPcaProject:
    def test_matches_naive_and_partition_invariant(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.expected import naive_pca_project
        from text_to_graph_ray.functions.stats import pca_project

        rng = np.random.default_rng(99)
        # anisotropic cloud so the top-2 directions are well separated
        base = rng.normal(size=(200, 8)).astype(np.float32)
        base[:, 0] *= 5.0
        base[:, 1] *= 2.0
        ids = np.arange(200, dtype=np.int64)
        t = pa.table({"vec_id": pa.array(ids),
                      "embedding": pa.array([list(map(float, v)) for v in base],
                                            type=pa.list_(pa.float32()))})
        exp = naive_pca_project(ids, np.asarray(base, dtype=np.float64), n_components=2)
        for parts in (1, 7):
            got = pca_project(_ray.data.from_arrow(t).repartition(parts),
                              n_components=2).to_pandas()
            assert got["vec_id"].tolist() == exp["vec_id"]
            assert got["pc0"].tolist() == exp["pc0"]
            assert got["pc1"].tolist() == exp["pc1"]

    def test_first_component_captures_dominant_axis(self, ray_session):
        """Variance along pc0 must dominate pc1 on an anisotropic cloud —
        the projection is a real PCA, not an arbitrary rotation."""
        import ray as _ray

        from text_to_graph_ray.functions.stats import pca_project

        rng = np.random.default_rng(3)
        v = rng.normal(size=(300, 6)).astype(np.float32)
        v[:, 2] *= 10.0
        t = pa.table({"vec_id": pa.array(np.arange(300, dtype=np.int64)),
                      "embedding": pa.array([list(map(float, x)) for x in v],
                                            type=pa.list_(pa.float32()))})
        got = pca_project(_ray.data.from_arrow(t), n_components=2).to_pandas()
        assert got["pc0"].astype(float).var() > 5.0 * got["pc1"].astype(float).var()


class TestHoldoutSplit:
    def test_counts_and_stability_under_repartition(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.sample import holdout_split

        ids = np.arange(1000, dtype=np.int64)
        sizes = (ids % 37 + 1).astype(np.int64)
        t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(sizes)})
        # naive: same hash rule, plain python
        lab = [("train" if b < 80 else "val" if b < 90 else "test")
               for b in ((ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(100))]
        import collections
        want_n = collections.Counter(lab)
        want_s = collections.defaultdict(int)
        for l, s in zip(lab, sizes):
            want_s[l] += int(s)
        for parts in (1, 9):
            got = holdout_split(_ray.data.from_arrow(t).repartition(parts),
                                size_col="n_chars").to_pandas()
            assert dict(zip(got["split"], got["n_docs"])) == dict(want_n)
            assert dict(zip(got["split"], got["sum_size"])) == dict(want_s)
        # roughly 80/10/10
        assert 700 < want_n["train"] < 900 and 50 < want_n["val"] < 160


class TestClusteringCoefficients:
    def test_matches_naive(self, ray_session):
        import itertools

        import ray as _ray

        from text_to_graph_ray.functions.graph import clustering_coefficients

        rng = np.random.default_rng(13)
        nodes = list(range(20))
        edges = sorted({(a, b) for a, b in
                        ((int(rng.integers(0, 20)), int(rng.integers(0, 20))) for _ in range(80))
                        if a != b for (a, b) in [(min(a, b), max(a, b))]})
        adj = {n: set() for n in nodes}
        for a, b in edges:
            adj[a].add(b); adj[b].add(a)
        want = {}
        for n in nodes:
            d = len(adj[n])
            if d == 0:
                continue
            t = sum(1 for u, v in itertools.combinations(sorted(adj[n]), 2) if v in adj[u])
            cc = round((2.0 * t) / (d * (d - 1.0)), 6) if d >= 2 else 0.0
            want[n] = (d, t, cc)
        t_in = pa.table({"src": pa.array([a for a, _ in edges] * 2, type=pa.int64()),
                         "dst": pa.array([b for _, b in edges] + [a for a, _ in edges],
                                         type=pa.int64())})
        got = clustering_coefficients(_ray.data.from_arrow(t_in).repartition(4)).to_pandas()
        got_d = {int(r.node): (int(r.degree), int(r.triangles), float(r.cc))
                 for r in got.itertuples()}
        assert got_d == want

    def test_triangle_free_and_complete(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import clustering_coefficients

        # path graph (triangle-free) + K4 (all cc = 1.0)
        path = [(0, 1), (1, 2), (2, 3)]
        k4 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
        edges = path + k4
        t = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                      "dst": pa.array([b for _, b in edges], type=pa.int64())})
        got = clustering_coefficients(_ray.data.from_arrow(t)).to_pandas()
        cc = dict(zip(got["node"], got["cc"]))
        assert cc[1] == 0.0 and cc[2] == 0.0  # path interior: degree 2, no triangle
        assert all(cc[n] == 1.0 for n in (10, 11, 12, 13))


class TestQuantizeGrid:
    """The L2-blocked half-up quantizer must be bit-identical to the naive
    one-liner it replaced in the PCA hot path (round 5: the naive chain's
    DRAM traffic cost 44x under 32-way concurrency)."""

    def test_blocked_matches_naive_all_shapes(self):
        from text_to_graph_ray.util import quantize_grid

        rng = np.random.default_rng(5)
        for shape in ((1, 1), (3, 64), (1000, 7), (4097, 64)):
            v = rng.standard_normal(shape) * rng.choice([1e-6, 1.0, 1e4])
            naive = np.floor(v * 1_000_000 + 0.5).astype(np.int64)
            assert (quantize_grid(v, 1_000_000) == naive).all()

    def test_negative_half_up_and_1d(self):
        from text_to_graph_ray.util import quantize_grid

        v = np.array([-1.5, -0.5, -0.49999, 0.49999, 0.5, 1.5]) / 1_000_000
        # floor(x*scale + 0.5): half-up, negative-safe (-1.5 -> -1, not -2)
        assert quantize_grid(v, 1_000_000).tolist() == [-1, 0, 0, 0, 1, 2]

    def test_noncontiguous_input(self):
        from text_to_graph_ray.util import quantize_grid

        rng = np.random.default_rng(6)
        base = rng.standard_normal((100, 128))
        v = base[::2, ::2]  # non-contiguous view
        naive = np.floor(v * 1_000 + 0.5).astype(np.int64)
        assert (quantize_grid(v, 1_000) == naive).all()


class TestDegreeAssortativity:
    def _run(self, edges, **kw):
        import ray as _ray

        from text_to_graph_ray.functions.graph import degree_assortativity

        t = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                      "dst": pa.array([b for _, b in edges], type=pa.int64())})
        return degree_assortativity(_ray.data.from_arrow(t).repartition(3), **kw)

    def test_known_graphs(self, ray_session):
        # star K1,3 and path are perfectly disassortative; a cycle is
        # regular (zero degree variance) -> defined as 0.0
        assert self._run([(0, 1), (0, 2), (0, 3)]).to_pydict() == {"m_edges": [3], "r": [-1.0]}
        assert self._run([(0, 1), (1, 2)]).to_pydict() == {"m_edges": [2], "r": [-1.0]}
        assert self._run([(0, 1), (1, 2), (2, 0)]).to_pydict() == {"m_edges": [3], "r": [0.0]}

    def test_matches_naive_and_join_fallback(self, ray_session):
        rng = np.random.default_rng(11)
        raw = {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(300, 2)) if a != b}
        edges = sorted((min(a, b), max(a, b)) for a, b in raw)
        edges = sorted(set(edges))
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        m = len(edges)
        ss = sum(deg[a] + deg[b] for a, b in edges)
        sp = sum(deg[a] * deg[b] for a, b in edges)
        sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in edges)
        want = round(float(4 * m * sp - ss * ss) / float(2 * m * sq - ss * ss), 6)
        # duplicate + reversed input rows must not change the distinct graph
        noisy = edges + [(b, a) for a, b in edges[:50]] + edges[:20]
        got = self._run(noisy).to_pydict()
        assert got == {"m_edges": [m], "r": [want]}
        # the distributed join fallback (deg_broadcast_max=0) is value-identical
        got_j = self._run(noisy, deg_broadcast_max=0).to_pydict()
        assert got_j == got


class TestCohensKappa:
    def _run(self, a, b):
        import ray as _ray

        from text_to_graph_ray.functions.stats import cohens_kappa

        t = pa.table({"p": pa.array(a), "q": pa.array(b)})
        return cohens_kappa(_ray.data.from_arrow(t).repartition(3), "p", "q").to_pydict()

    def test_textbook_2x2(self, ray_session):
        # classic 2x2: diag 20/15, off-diag 5/10 -> po=0.7, pe=0.5, kappa=0.4
        a = ["y"] * 25 + ["n"] * 25
        b = ["y"] * 20 + ["n"] * 5 + ["y"] * 10 + ["n"] * 15
        assert self._run(a, b) == {"n_rows": [50], "agree": [35], "kappa": [0.4]}

    def test_degenerate_and_disjoint(self, ray_session):
        # single shared label on both sides: den == 0 -> 1.0 by contract
        assert self._run(["x"] * 5, ["x"] * 5)["kappa"] == [1.0]
        # disjoint label sets: agree = 0, pe = 0 -> kappa = 0/1 scaled = 0.0
        got = self._run(["a", "a", "b"], ["c", "c", "d"])
        assert got == {"n_rows": [3], "agree": [0], "kappa": [0.0]}

    def test_matches_naive_random(self, ray_session):
        rng = np.random.default_rng(3)
        labels = np.array(["en", "de", "fr", "und"])
        a = labels[rng.integers(0, 4, 500)].tolist()
        b = labels[rng.integers(0, 4, 500)].tolist()
        n = 500
        agree = sum(1 for x, y in zip(a, b) if x == y)
        from collections import Counter
        rm, cm = Counter(a), Counter(b)
        s = sum(rm[k] * cm.get(k, 0) for k in rm)
        want = round(float(n * agree - s) / float(n * n - s), 6)
        assert self._run(a, b) == {"n_rows": [n], "agree": [agree], "kappa": [want]}


class TestClassificationReport:
    def test_matches_naive_and_pred_only_labels(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.stats import classification_report

        truth = ["en", "en", "de", "de", "fr", "fr", "fr"]
        pred = ["en", "de", "de", "de", "fr", "und", "fr"]  # 'und' never true
        t = pa.table({"t": pa.array(truth), "p": pa.array(pred)})
        got = classification_report(_ray.data.from_arrow(t).repartition(2), "t", "p").to_pydict()
        assert got["label"] == ["de", "en", "fr", "und"]
        # de: n_true 2, n_pred 3, tp 2 -> p=2/3, r=1, f1=4/5
        i = got["label"].index("de")
        assert (got["n_true"][i], got["n_pred"][i], got["tp"][i]) == (2, 3, 2)
        assert got["precision"][i] == round(2 / 3, 6)
        assert got["recall"][i] == 1.0 and got["f1"][i] == 0.8
        # und: pred-only label gets a row with zero recall/f1 denominator rules
        j = got["label"].index("und")
        assert (got["n_true"][j], got["n_pred"][j], got["tp"][j]) == (0, 1, 0)
        assert got["precision"][j] == 0.0 and got["recall"][j] == 0.0
        assert got["f1"][j] == 0.0


class TestTopkRecall:
    def test_partial_overlap_and_empty_query(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.ann import topk_recall

        def tbl(rows):
            return _ray.data.from_arrow(pa.table({
                "query_id": pa.array([q for q, _ in rows], type=pa.int64()),
                "vec_id": pa.array([v for _, v in rows], type=pa.int64()),
            }))

        approx = tbl([(0, 1), (0, 2), (0, 9), (1, 5)])       # q0: 2/3 hit, q1: 0 hit
        exact = tbl([(0, 1), (0, 2), (0, 3), (1, 7), (1, 8)])
        got = topk_recall(approx, exact, k=3).to_pydict()
        assert got == {"query_id": [0, 1], "hits": [2, 0],
                       "recall": [round(2 / 3, 6), 0.0]}
        # a query absent from approx has no row (the SQL frame is
        # distinct-from-approx)
        assert 2 not in got["query_id"]


class TestScd2History:
    def test_hand_computed_history(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow.parquet as pq

        from text_to_graph_ray.pipelines.analytics import user_type_history

        def ts(s):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

        # user 1: a a b b a  -> versions a@0, b@2, a@4
        # user 2: x          -> one open version
        rows = [
            (10, ts(0), 1, "a"), (11, ts(1), 1, "a"), (12, ts(2), 1, "b"),
            (13, ts(3), 1, "b"), (14, ts(4), 1, "a"), (20, ts(5), 2, "x"),
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([0.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        })
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = user_type_history(str(tmp_path)).to_pandas()
        recs = [(int(r.user_id), int(r.version), r.event_type,
                 r.effective_from.to_pydatetime(),
                 None if pd.isna(r.effective_to) else r.effective_to.to_pydatetime())
                for r in got.itertuples()]
        assert recs == [
            (1, 1, "a", ts(0), ts(2)),
            (1, 2, "b", ts(2), ts(4)),
            (1, 3, "a", ts(4), None),
            (2, 1, "x", ts(5), None),
        ]


class TestPmiTopk:
    def test_hand_computed_and_partition_invariance(self, ray_session):
        import math

        import ray as _ray

        from text_to_graph_ray.functions.text import pmi_topk

        docs = [
            "new york is a big city",
            "new york has new people",
            "york new city",
            "a a a a a a",
            "big city big city new york",
        ]
        t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                      "text": pa.array(docs, type=pa.string())})
        got = pmi_topk(_ray.data.from_arrow(t).repartition(3), k=5, min_count=2).to_pandas()
        # n_bigrams = 5+4+2+5+5 = 21; hand-checked survivors of min_count=2
        n = 21
        want = [
            ("big", "city", 3, 3, 4),
            ("new", "york", 3, 5, 4),
            ("a", "a", 5, 7, 7),
        ]
        assert [(r.x, r.y, int(r.cxy), int(r.cx), int(r.cy)) for r in got.itertuples()] == want
        for r, (x, y, cxy, cx, cy) in zip(got.itertuples(), want):
            assert r.pmi == round(math.log(float(n * cxy) / float(cx * cy)), 6)
        # partition invariance: counts and ranking identical on 1 block
        got1 = pmi_topk(_ray.data.from_arrow(t), k=5, min_count=2).to_pandas()
        assert got1.equals(got)

    def test_min_count_floor_excludes_hapax(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.text import pmi_topk

        t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                      "text": pa.array(["unique pair here", "unique pair again"], type=pa.string())})
        got = pmi_topk(_ray.data.from_arrow(t), k=10, min_count=2).to_pandas()
        # only "unique pair" repeats; every other bigram is a hapax
        assert list(zip(got["x"], got["y"])) == [("unique", "pair")]


class TestSampleNeighbors:
    def test_matches_naive_and_repartition_stable(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import sample_neighbors

        rng = np.random.default_rng(21)
        raw = {(int(a), int(b)) for a, b in rng.integers(0, 30, size=(200, 2)) if a != b}
        edges = sorted(raw)
        t = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                      "dst": pa.array([b for _, b in edges], type=pa.int64())})
        knuth, mix, modp = 2654435761, 40503, 1_000_003
        adj = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)

        def rank(s, k):
            return sorted(adj.get(s, []), key=lambda v: ((s * knuth + v * mix) % modp, v))[:k]

        want = sorted((seed, n1, n2)
                      for seed in adj if seed % 3 == 0
                      for n1 in rank(seed, 3)
                      for n2 in rank(n1, 2))
        got = sample_neighbors(_ray.data.from_arrow(t).repartition(4),
                               fanout=(3, 2), seed_mod=3).to_pandas()
        assert list(got.itertuples(index=False, name=None)) == want
        # determinism under a different partitioning + duplicate edges
        noisy = _ray.data.from_arrow(pa.concat_tables([t, t.slice(0, 40)])).repartition(7)
        got2 = sample_neighbors(noisy, fanout=(3, 2), seed_mod=3).to_pandas()
        assert got2.equals(got)


class TestLocalSupplierVolume:
    """TPC-H-Q5-shaped six-table join (pipelines/analytics.local_supplier_volume)."""

    def test_matches_duckdb_and_fallback_identical(self, ray_session):
        import duckdb

        from text_to_graph_ray.pipelines.analytics import local_supplier_volume

        sf = "/root/testdata/sf0.001"
        got = local_supplier_volume(sf).to_pandas()
        want = duckdb.sql(
            "WITH li AS (SELECT l_orderkey, s_nationkey, "
            "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents "
            f"FROM '{sf}/lineitem.parquet' JOIN '{sf}/supplier.parquet' ON l_suppkey = s_suppkey), "
            "o AS (SELECT o_orderkey, c_nationkey FROM "
            f"'{sf}/orders.parquet' JOIN '{sf}/customer.parquet' ON o_custkey = c_custkey "
            "WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01') "
            "SELECT n_name, round(sum(cents)::DOUBLE / 100.0, 2) AS revenue, count(*)::BIGINT AS n_items "
            "FROM li JOIN o ON l_orderkey = o_orderkey AND c_nationkey = s_nationkey "
            f"JOIN '{sf}/nation.parquet' ON n_nationkey = s_nationkey "
            f"JOIN '{sf}/region.parquet' ON r_regionkey = n_regionkey "
            "WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY revenue DESC, n_name"
        ).df()
        assert list(got.itertuples(index=False, name=None)) == list(want.itertuples(index=False, name=None))
        # threshold-0 forces BOTH distributed ds.join fallback arms
        fb = local_supplier_volume(sf, broadcast_max=0).to_pandas()
        assert fb.equals(got)

    def test_empty_region_window(self, ray_session):
        from text_to_graph_ray.pipelines.analytics import local_supplier_volume

        out = local_supplier_volume("/root/testdata/sf0.001", date_lo="1990-01-01", date_hi="1990-01-02")
        assert out.count() == 0
        # Ray's to_pandas() drops columns on an all-empty dataset; the
        # Dataset-level schema is the stable contract
        assert out.schema().names == ["n_name", "revenue", "n_items"]


class TestGiniExact:
    def test_hand_computed_and_partition_invariant(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.stats import gini_exact

        t = pa.table({"cents": pa.array([8, 1, 1], type=pa.int64())})
        out = gini_exact(_ray.data.from_arrow(t)).to_pandas()
        # sorted [1,1,8]: S1=27, Sx=10, n=3 -> (54-40)/30
        assert out["n_rows"][0] == 3 and out["total"][0] == 10
        assert out["gini"][0] == round(14 / 30, 6)
        # equal values -> 0; partitioning must not change the result
        eq = pa.table({"cents": pa.array([5] * 40, type=pa.int64())})
        out_eq = gini_exact(_ray.data.from_arrow(eq).repartition(7)).to_pandas()
        assert out_eq["gini"][0] == 0.0
        big = pa.table({"cents": pa.array(list(range(1, 201)), type=pa.int64())})
        a = gini_exact(_ray.data.from_arrow(big)).to_pandas()
        b = gini_exact(_ray.data.from_arrow(big).repartition(9)).to_pandas()
        assert a.equals(b)

    def test_chunked_accumulation_is_exact_near_int64(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.stats import gini_exact

        # values large enough that a single-block Σ rank·x overflows int64
        # (forces the reduceat chunking + Python-int fold path)
        v = 2_000_000_000_000_000
        t = pa.table({"cents": pa.array([v] * 2000, type=pa.int64())})
        out = gini_exact(_ray.data.from_arrow(t).repartition(3)).to_pandas()
        assert out["gini"][0] == 0.0
        assert int(out["total"][0]) == v * 2000


class TestStronglyConnectedComponents:
    def _scc_naive(self, edges):
        # reachability by repeated squaring over sets; scc_id = min of the
        # mutual-reach class — an independent oracle (no Tarjan machinery)
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        reach = {v: {v} for v in nodes}
        changed = True
        while changed:
            changed = False
            for a, b in edges:
                for v in nodes:
                    if a in reach[v] and b not in reach[v]:
                        reach[v].add(b)
                        changed = True
        out = {}
        for v in nodes:
            cls = {u for u in reach[v] if v in reach[u]}
            out[v] = min(cls)
        return [(v, out[v]) for v in nodes]

    def test_hand_graph_both_plans(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import strongly_connected_components as scc

        edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (6, 1), (7, 7)]
        t = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                      "dst": pa.array([b for _, b in edges], type=pa.int64())})
        want = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6), (7, 7)]
        a = scc(_ray.data.from_arrow(t)).to_pandas()
        assert list(a.itertuples(index=False, name=None)) == want
        b = scc(_ray.data.from_arrow(t).repartition(3), collect_max=0).to_pandas()
        assert b.equals(a)

    def test_random_graph_matches_naive_both_plans(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import strongly_connected_components as scc

        rng = np.random.default_rng(11)
        edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, size=(55, 2)) if a != b})
        want = self._scc_naive(edges)
        t = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                      "dst": pa.array([b for _, b in edges], type=pa.int64())})
        a = scc(_ray.data.from_arrow(t)).to_pandas()
        assert list(a.itertuples(index=False, name=None)) == want
        b = scc(_ray.data.from_arrow(t).repartition(5), collect_max=0).to_pandas()
        assert b.equals(a)

    def test_chain_of_cycles_and_empty(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import strongly_connected_components as scc

        # 3 two-node cycles chained: {0,1} -> {2,3} -> {4,5}; peeling needs
        # multiple outer rounds on the distributed plan
        edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (4, 5), (5, 4)]
        t = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                      "dst": pa.array([b for _, b in edges], type=pa.int64())})
        want = [(0, 0), (1, 0), (2, 2), (3, 2), (4, 4), (5, 4)]
        b = scc(_ray.data.from_arrow(t), collect_max=0).to_pandas()
        assert list(b.itertuples(index=False, name=None)) == want
        empty = pa.table({"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())})
        out = scc(_ray.data.from_arrow(empty))
        assert out.count() == 0


class TestJaccardLinkPrediction:
    def test_matches_naive_random(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import common_neighbor_topk

        rng = np.random.default_rng(5)
        raw = {(int(a), int(b)) for a, b in rng.integers(0, 25, size=(120, 2)) if a != b}
        edges = sorted({(min(a, b), max(a, b)) for a, b in raw})
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = []
        nodes = sorted(adj)
        eset = set(edges)
        for i, u in enumerate(nodes):
            for v in nodes[i + 1:]:
                if (u, v) in eset:
                    continue
                cn = len(adj[u] & adj[v])
                if cn >= 2:
                    q = (10**9 * cn) // (len(adj[u]) + len(adj[v]) - cn)
                    want.append((u, v, cn, q))
        want.sort(key=lambda r: (-r[3], r[0], r[1]))
        want = [(u, v, cn, round(q / 1e9, 6)) for u, v, cn, q in want[:10]]

        t = pa.table({"src": pa.array([a for a, _ in raw], type=pa.int64()),
                      "dst": pa.array([b for _, b in raw], type=pa.int64())})
        got = common_neighbor_topk(_ray.data.from_arrow(t).repartition(3), k=10,
                                   min_common=2, rank_by="jaccard", include_ra=True).to_pandas()
        assert list(got.columns) == ["u", "v", "cn", "jaccard"]
        assert list(got.itertuples(index=False, name=None)) == want

    def test_min_common_guard(self, ray_session):
        import ray as _ray
        import pytest as _pytest

        from text_to_graph_ray.functions.graph import common_neighbor_topk

        t = pa.table({"src": pa.array([1], type=pa.int64()), "dst": pa.array([2], type=pa.int64())})
        with _pytest.raises(ValueError):
            common_neighbor_topk(_ray.data.from_arrow(t), min_common=0, rank_by="jaccard")


class TestHits:
    def test_matches_naive_and_l1(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import hits_scores

        rng = np.random.default_rng(9)
        edges = sorted({(int(a), int(b)) for a, b in rng.integers(0, 20, size=(60, 2))})
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        h = np.full(n, round(1.0 / n, 9))
        a = None
        for _ in range(2):
            ar = np.zeros(n)
            for s, d in edges:
                ar[idx[d]] += h[idx[s]]
            a = np.round(ar / ar.sum(), 9)
            hr = np.zeros(n)
            for s, d in edges:
                hr[idx[s]] += a[idx[d]]
            h = np.round(hr / hr.sum(), 9)
        t = pa.table({"src": pa.array([s for s, _ in edges], type=pa.int64()),
                      "dst": pa.array([d for _, d in edges], type=pa.int64())})
        got = hits_scores(_ray.data.from_arrow(t).repartition(4), iters=2).to_pandas()
        assert got["node"].tolist() == nodes
        assert np.array_equal(got["authority"].to_numpy(), a)
        assert np.array_equal(got["hub"].to_numpy(), h)
        assert abs(got["authority"].sum() - 1.0) < 1e-6
        assert abs(got["hub"].sum() - 1.0) < 1e-6

    def test_empty(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import hits_scores

        empty = pa.table({"src": pa.array([], type=pa.int64()), "dst": pa.array([], type=pa.int64())})
        assert hits_scores(_ray.data.from_arrow(empty)).count() == 0


def _naive_ktruss(pairs, k, max_rounds):
    """Reference bounded k-truss peel + final within-set support recount."""
    E = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    for _ in range(max_rounds):
        adj = {}
        for a, b in E:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in E}
        e2 = {e for e in E if sup[e] >= k - 2}
        if len(e2) == len(E):
            break
        E = e2
    adj = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sorted((a, b, len(adj[a] & adj[b])) for a, b in E)


class TestKTruss:
    def _run(self, pairs, **kw):
        import ray as _ray

        from text_to_graph_ray.functions.graph import ktruss_bounded

        t = pa.table({"src": pa.array([a for a, _ in pairs], type=pa.int64()),
                      "dst": pa.array([b for _, b in pairs], type=pa.int64())})
        got = ktruss_bounded(_ray.data.from_arrow(t).repartition(4), **kw).take_all()
        return sorted((r["a"], r["b"], r["sup"]) for r in got)

    def test_k4_complete_is_4truss(self, ray_session):
        pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        # K4: every edge closes 2 triangles — the whole graph survives k=4
        assert self._run(pairs, k=4, max_rounds=3) == [(a, b, 2) for a, b in pairs]

    def test_k4_minus_edge_peels_away(self, ray_session):
        pairs = [(i, j) for i in range(4) for j in range(i + 1, 4) if (i, j) != (2, 3)]
        # removing one edge leaves every edge with support <= 1 < k-2
        assert self._run(pairs, k=4, max_rounds=3) == []

    def test_random_matches_naive_all_round_budgets(self, ray_session):
        rng = np.random.default_rng(11)
        pairs = list(zip(rng.integers(0, 50, 400).tolist(), rng.integers(0, 50, 400).tolist()))
        for k in (4, 6):
            for mr in (1, 2, 4):
                assert self._run(pairs, k=k, max_rounds=mr) == _naive_ktruss(pairs, k, mr), (k, mr)

    def test_fallback_plan_identical(self, ray_session):
        # deg_broadcast_max=0 forces the distributed degree joins AND the
        # side-tagged closing exchange in _edge_support
        rng = np.random.default_rng(12)
        pairs = list(zip(rng.integers(0, 40, 300).tolist(), rng.integers(0, 40, 300).tolist()))
        exp = self._run(pairs, k=5, max_rounds=2)
        assert self._run(pairs, k=5, max_rounds=2, deg_broadcast_max=0) == exp
        assert exp == _naive_ktruss(pairs, 5, 2)

    def test_mid_peel_zero_support_surfaces(self, ray_session):
        # a triangle chain: peeling the tail with a 1-round budget leaves
        # edges whose within-set support is 0 — they must appear with sup=0
        pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4), (4, 5)]
        got = self._run(pairs, k=3, max_rounds=1)
        assert got == _naive_ktruss(pairs, 3, 1)
        assert all(s >= 0 for _, _, s in got)

    def test_stats_and_fixpoint(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import ktruss_bounded

        pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]  # K5
        t = pa.table({"src": pa.array([a for a, _ in pairs], type=pa.int64()),
                      "dst": pa.array([b for _, b in pairs], type=pa.int64())})
        stats = {}
        got = ktruss_bounded(_ray.data.from_arrow(t), k=5, max_rounds=4, stats=stats).take_all()
        assert stats["ktruss_fixpoint"] is True
        assert stats["ktruss_rounds"][-1] == len(got) == len(pairs)  # K5 is a 5-truss

    def test_empty(self, ray_session):
        assert self._run([], k=4, max_rounds=2) == []


class TestGroupedOls:
    def test_matches_closed_form(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.stats import grouped_ols_int

        rng = np.random.default_rng(21)
        n = 500
        key = rng.choice(["a", "b", "c"], n)
        x = rng.integers(1, 50, n).astype(np.float64)
        y = (3.25 * x + rng.normal(0, 5, n)).round(2)
        t = pa.table({"k": pa.array(key), "x": pa.array(x), "y": pa.array(y)})
        got = grouped_ols_int(
            _ray.data.from_arrow(t).repartition(4), "k", "x", "y", y_scale=100, chunk_rows=37
        ).to_pandas()
        for _, r in got.iterrows():
            m = key == r["k"]
            xi = np.floor(x[m] + 0.5).astype(np.int64)
            yi = np.floor(y[m] * 100 + 0.5).astype(np.int64)
            nn, sx, sy = len(xi), int(xi.sum()), int(yi.sum())
            sxy = int((xi * yi).sum())
            sxx = int((xi * xi).sum())
            syy = int((yi * yi).sum())
            num, varx, vary = nn * sxy - sx * sy, nn * sxx - sx * sx, nn * syy - sy * sy
            slope = float(num) / float(varx)
            assert r["slope"] == slope
            assert r["intercept"] == (float(sy) - slope * float(sx)) / float(nn)
            corr = float(num) / (np.sqrt(float(varx)) * np.sqrt(float(vary)))
            assert r["r2"] == corr * corr
            # sanity: slope in cents/unit ≈ 325
            assert 250 < r["slope"] < 400

    def test_zero_variance_group_is_null(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.stats import grouped_ols_int

        t = pa.table({"k": pa.array(["z"] * 5 + ["w"] * 5),
                      "x": pa.array([2.0] * 5 + [1, 2, 3, 4, 5.0]),
                      "y": pa.array([1.0, 2, 3, 4, 5] * 2)})
        got = grouped_ols_int(_ray.data.from_arrow(t), "k", "x", "y").to_pandas().set_index("k")
        assert np.isnan(got.loc["z", "slope"])  # varx == 0
        assert got.loc["w", "slope"] == 1.0


class TestUserEma:
    def _naive(self, rows, max_shift=62):
        # rows: (user_id, ts_us, event_id, value)
        from collections import defaultdict

        per = defaultdict(list)
        for u, ts, e, v in rows:
            per[u].append((ts, e, v))
        out = {}
        for u, evs in per.items():
            evs.sort()
            n = len(evs)
            q = 0
            for i, (_, _, v) in enumerate(evs, start=1):
                cents = int(np.floor(v * 100 + 0.5))
                w = n - 1 if i == 1 else n - i + 1
                q += (cents * 1_000_000) >> min(w, max_shift)
            out[u] = (n, q, float(q) / 1e8)
        return out

    def test_matches_naive_and_partition_invariant(self, ray_session, tmp_path):
        import ray as _ray

        rng = np.random.default_rng(31)
        n = 400
        rows = [(int(rng.integers(0, 12)), int(rng.integers(0, 10**9)), i,
                 round(float(rng.uniform(0.01, 400)), 2)) for i in range(n)]
        t = pa.table({
            "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "value": pa.array([r[3] for r in rows], type=pa.float64()),
            "event_type": pa.array(["x"] * n),
            "props": pa.array(["{}"] * n),
        })
        import pyarrow.parquet as _pq

        d = tmp_path / "sf"
        d.mkdir()
        _pq.write_table(t, str(d / "events.parquet"))
        from text_to_graph_ray.pipelines.analytics import user_ema

        got = user_ema(str(d)).to_pandas()
        exp = self._naive(rows)
        assert len(got) == len(exp)
        for _, r in got.iterrows():
            en, eq, ema = exp[r["user_id"]]
            assert (r["n_events"], r["ema_q"], r["ema"]) == (en, eq, ema)
        # shuffled row order must not change a single bit
        perm = rng.permutation(n)
        _pq.write_table(t.take(perm), str(d / "events.parquet"))
        got2 = user_ema(str(d)).to_pandas()
        assert got2.equals(got)


class TestKgSchemaAndNegatives:
    def test_schema_summary_covers_every_edge(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E._q_kg_schema_summary(sf).to_pandas()
        _, edges = E._kg_tables(sf, link=True)
        assert got["n_edges"].sum() == len(edges)  # every edge classified
        assert got["src_type"].notna().all() and got["dst_type"].notna().all()
        # the summary is a rollup of the real join, recomputed naively
        nodes, _ = E._kg_tables(sf, link=True)
        tp = dict(zip(nodes["entity_key"], nodes["types_packed"]))
        naive = (
            edges.assign(src_type=edges["src_key"].map(tp), dst_type=edges["dst_key"].map(tp))
            .groupby(["src_type", "pred", "dst_type"], as_index=False).size()
            .rename(columns={"size": "n_edges"})
            .sort_values(["src_type", "pred", "dst_type"]).reset_index(drop=True)
        )
        g = got.sort_values(["src_type", "pred", "dst_type"]).reset_index(drop=True)
        assert g[["src_type", "pred", "dst_type"]].values.tolist() == naive[["src_type", "pred", "dst_type"]].values.tolist()
        assert g["n_edges"].tolist() == naive["n_edges"].astype("int64").tolist()

    def test_negative_samples_deterministic_and_clean(self, ray_session):
        import hashlib

        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E._q_kg_negative_samples(sf).to_pandas()
        got2 = E._q_kg_negative_samples(sf).to_pandas()
        assert got.equals(got2)  # deterministic end to end
        nodes, edges = E._kg_tables(sf, link=True)
        truth = set(zip(edges["src_key"], edges["pred"], edges["dst_key"]))
        # no emitted negative is a true triple
        assert not any((s, p, g) in truth for s, p, g in got.itertuples(index=False))
        # the hash contract: recompute a few rows by hand
        keys_by_id = nodes.sort_values("entity_id")["entity_key"].to_numpy()
        n = len(keys_by_id)
        sample = edges.head(20)
        expected = {}
        for s, p, d in zip(sample["src_key"], sample["pred"], sample["dst_key"]):
            neg = keys_by_id[int(hashlib.sha256(f"{s}|{p}|{d}".encode()).hexdigest()[:8], 16) % n]
            if (s, p, neg) not in truth:
                expected[(s, p)] = neg
        emitted = {(s, p): g for s, p, g in got.itertuples(index=False)}
        for k, v in expected.items():
            assert emitted.get(k) == v or v in got[got["src_key"] == k[0]]["neg_key"].values


class TestCusumAndQ10:
    def test_cusum_matches_naive(self, ray_session, tmp_path):
        import pyarrow.parquet as _pq

        from text_to_graph_ray.pipelines.analytics import cusum_changepoint

        rng = np.random.default_rng(41)
        n = 300
        # engineered level shift: type "a" jumps halfway through
        types = ["a"] * 150 + ["b"] * 150
        vals = np.concatenate([rng.uniform(1, 2, 75), rng.uniform(8, 9, 75), rng.uniform(3, 4, 150)])
        t = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array(np.arange(n) * 1000, type=pa.timestamp("us")),
            "event_type": pa.array(types),
            "value": pa.array(np.round(vals, 2), type=pa.float64()),
            "user_id": pa.array([0] * n, type=pa.int64()),
            "props": pa.array(["{}"] * n),
        })
        d = tmp_path / "sf"
        d.mkdir()
        _pq.write_table(t, str(d / "events.parquet"))
        got = cusum_changepoint(str(d)).to_pandas().set_index("event_type")
        df = t.to_pandas()
        for et in ("a", "b"):
            g = df[df["event_type"] == et].sort_values(["ts", "event_id"])
            cents = np.floor(g["value"].to_numpy() * 100 + 0.5).astype(np.int64)
            nn = len(cents)
            pref = np.cumsum(cents)
            stat = np.abs(nn * pref - np.arange(1, nn + 1) * cents.sum())
            assert got.loc[et, "n_events"] == nn
            assert got.loc[et, "cusum_q"] == stat.max()
            assert got.loc[et, "pos"] == int(np.argmax(stat)) + 1
        # the engineered shift is detected near the midpoint of "a"
        assert 60 <= got.loc["a", "pos"] <= 90

    def test_q10_matches_duckdb(self, ray_session):
        import duckdb

        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E._q_rel_returned_revenue(sf).to_pandas()
        con = duckdb.connect()
        for tb in ("lineitem", "orders", "customer", "nation"):
            con.sql(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{sf}/{tb}.parquet')")
        # direct naive recompute (avoids oracle's sf0.01-pinned siblings)
        exp = con.sql(
            "WITH r AS (SELECT l_orderkey, sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * "
            "(100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS rev_q "
            "FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1), "
            "c AS (SELECT o_custkey, sum(rev_q) AS rev_q FROM r JOIN orders ON l_orderkey = o_orderkey GROUP BY 1) "
            "SELECT c_custkey, c_name, n_name, CAST(rev_q AS DOUBLE) / 1e4 AS revenue "
            "FROM c JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey "
            "ORDER BY rev_q DESC, c_custkey LIMIT 20"
        ).df()
        assert got["c_custkey"].tolist() == exp["c_custkey"].tolist()
        assert got["c_name"].tolist() == exp["c_name"].tolist()
        assert got["n_name"].tolist() == exp["n_name"].tolist()
        assert got["revenue"].tolist() == exp["revenue"].tolist()


class TestNaiveBayes:
    def test_matches_naive_and_learns(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.expected import naive_nb
        from text_to_graph_ray.functions.text import naive_bayes_classify

        rng = np.random.default_rng(51)
        vocabs = {"aa": ["red", "green", "blue", "shared"],
                  "bb": ["cat", "dog", "bird", "shared"],
                  "cc": ["one", "two", "three", "shared"]}
        ids, texts, labels = [], [], []
        for i in range(120):
            lab = ["aa", "bb", "cc"][i % 3]
            toks = list(rng.choice(vocabs[lab], 12)) + list(rng.choice(["shared", "noise"], 3))
            ids.append(i)
            texts.append(" ".join(toks))
            labels.append(lab)
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "lang": pa.array(labels, type=pa.string()),
                      "text": pa.array(texts, type=pa.string())})
        got = naive_bayes_classify(_ray.data.from_arrow(t).repartition(4)).to_pandas()
        exp = naive_nb(ids, texts, labels)
        assert list(map(tuple, got[["doc_id", "lang", "pred", "correct"]].values)) == exp
        # distinct class vocabularies: the classifier must actually learn
        assert got["correct"].mean() > 0.9

    def test_unseen_tokens_and_empty_doc(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.expected import naive_nb
        from text_to_graph_ray.functions.text import naive_bayes_classify

        ids = list(range(12))
        labels = ["p", "q"] * 6
        texts = ["ppp ppp" if l == "p" else "qqq qqq" for l in labels]
        texts[0] = "zzz yyy"   # test doc with only unseen tokens
        texts[5] = ""          # empty test doc (id 5 % 5 == 0)
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "lang": pa.array(labels, type=pa.string()),
                      "text": pa.array(texts, type=pa.string())})
        got = naive_bayes_classify(_ray.data.from_arrow(t).repartition(3)).to_pandas()
        exp = naive_nb(ids, texts, labels)
        assert list(map(tuple, got[["doc_id", "lang", "pred", "correct"]].values)) == exp


class TestKmeansProfile:
    def test_matches_naive_and_partition_invariant(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.expected import naive_kmeans_profile
        from text_to_graph_ray.functions.ann import kmeans_profile

        rng = np.random.default_rng(61)
        n, d = 300, 16
        vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
        ids = np.arange(n, dtype=np.int64)
        t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                      "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32()))})
        exp = naive_kmeans_profile(ids, np.asarray(vecs, dtype=np.float64), n_centroids=8, train_rows=128)
        for parts in (2, 7):
            got = kmeans_profile(_ray.data.from_arrow(t).repartition(parts),
                                 n_centroids=8, train_rows=128).to_pandas()
            assert got["list_id"].tolist() == exp["list_id"]
            assert got["n_vecs"].tolist() == exp["n_vecs"]
            assert got["simq_sum"].tolist() == exp["simq_sum"]
        assert sum(exp["n_vecs"]) == n  # every vector assigned exactly once

    def test_empty(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.ann import kmeans_profile

        t = pa.table({"vec_id": pa.array([], type=pa.int64()),
                      "embedding": pa.array([], type=pa.list_(pa.float32()))})
        assert kmeans_profile(_ray.data.from_arrow(t)).count() == 0


def _naive_kruskal_pairs(rows):
    best = {}
    for s, d, w in rows:
        if s == d:
            continue
        k = (min(s, d), max(s, d))
        if k not in best or w < best[k]:
            best[k] = w
    edges = sorted((w, a, b) for (a, b), w in best.items())
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    out = []
    for w, a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, w))
    return sorted(out)


class TestMst:
    def _run(self, rows, **kw):
        import ray as _ray

        from text_to_graph_ray.functions.graph import minimum_spanning_forest

        t = pa.table({"src": pa.array([r[0] for r in rows], type=pa.int64()),
                      "dst": pa.array([r[1] for r in rows], type=pa.int64()),
                      "w": pa.array([r[2] for r in rows], type=pa.int64())})
        got = minimum_spanning_forest(_ray.data.from_arrow(t).repartition(4), **kw).take_all()
        return sorted((r["a"], r["b"], r["w"]) for r in got)

    def test_random_with_ties_matches_kruskal(self, ray_session):
        rng = np.random.default_rng(71)
        for trial in range(3):
            n = [30, 80, 40][trial]
            m = [100, 250, 45][trial]
            rows = list(zip(rng.integers(0, n, m).tolist(), rng.integers(0, n, m).tolist(),
                            rng.integers(1, 25, m).tolist()))  # heavy weight ties
            assert self._run(rows) == _naive_kruskal_pairs(rows), trial

    def test_disconnected_forest(self, ray_session):
        rows = [(0, 1, 5), (1, 2, 3), (0, 2, 4), (10, 11, 1), (11, 12, 1), (10, 12, 9)]
        got = self._run(rows)
        assert got == _naive_kruskal_pairs(rows)
        assert len(got) == 4  # two trees: 3 nodes + 3 nodes -> 2 + 2 edges

    def test_parallel_edges_collapse_to_min(self, ray_session):
        rows = [(0, 1, 9), (1, 0, 2), (0, 1, 5), (1, 2, 7)]
        assert self._run(rows) == [(0, 1, 2), (1, 2, 7)]

    def test_round_budget_raises_loudly(self, ray_session):
        # a path graph merges only neighbors per round: 1 round can't finish
        rows = [(i, i + 1, 10 + i) for i in range(16)]
        with pytest.raises(ValueError, match="Borůvka rounds"):
            self._run(rows, max_rounds=1)


class TestOhlc:
    def test_matches_pandas_naive(self, ray_session, tmp_path):
        import pyarrow.parquet as _pq

        from text_to_graph_ray.pipelines.analytics import ohlc_bars

        rng = np.random.default_rng(81)
        n = 500
        t = pa.table({
            "event_id": pa.array(rng.permutation(n), type=pa.int64()),  # ids shuffled vs ts
            "ts": pa.array(rng.integers(0, 3600 * 10**6, n), type=pa.timestamp("us")),
            "event_type": pa.array(rng.choice(["x", "y"], n)),
            "value": pa.array(np.round(rng.uniform(0.01, 99, n), 2), type=pa.float64()),
            "user_id": pa.array([0] * n, type=pa.int64()),
            "props": pa.array(["{}"] * n),
        })
        d = tmp_path / "sf"
        d.mkdir()
        _pq.write_table(t, str(d / "events.parquet"))
        got = ohlc_bars(str(d)).to_pandas()
        df = t.to_pandas()
        df["w"] = df["ts"].astype("int64") // (300 * 10**6)
        df["cents"] = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        df = df.sort_values(["event_type", "w", "ts", "event_id"], kind="mergesort")
        exp = df.groupby(["event_type", "w"], as_index=False).agg(
            open=("cents", "first"), high=("cents", "max"), low=("cents", "min"),
            close=("cents", "last"), volume=("cents", "size"))
        exp = exp.sort_values(["event_type", "w"]).reset_index(drop=True)
        for c in ("event_type", "w", "open", "high", "low", "close", "volume"):
            assert got[c].tolist() == exp[c].tolist(), c
        # invariants: low <= open/close <= high
        assert (got["low"] <= got["open"]).all() and (got["open"] <= got["high"]).all()
        assert (got["low"] <= got["close"]).all() and (got["close"] <= got["high"]).all()


class TestMetapathAndIntegrity:
    def test_metapath_matches_pandas(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E._q_kg_metapath_counts(sf).to_pandas()
        _, edges = E._kg_tables(sf, link=True)
        d = edges[edges["pred"] == "defines"][["src_key", "dst_key"]]
        c = edges[edges["pred"] == "calls"][["src_key", "dst_key"]]
        j = d.merge(c, left_on="dst_key", right_on="src_key", suffixes=("", "_c"))
        exp = j.groupby("src_key", as_index=False).size().rename(columns={"size": "n_paths"})
        exp = exp.sort_values("src_key").reset_index(drop=True)
        assert got["src_key"].tolist() == exp["src_key"].tolist()
        assert got["n_paths"].tolist() == exp["n_paths"].astype("int64").tolist()
        assert len(got) > 0  # the synth KG has defines->calls chains

    def test_integrity_report(self, ray_session):
        import duckdb

        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E._q_rel_integrity_check(sf).to_pandas().set_index("chk")["n_violations"]
        con = duckdb.connect()
        for tb in ("lineitem", "orders", "customer"):
            con.sql(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{sf}/{tb}.parquet')")
        for chk, sql in [
            ("orphan_lineitem", "SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)"),
            ("orphan_orders", "SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)"),
            ("childless_orders", "SELECT count(*) FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)"),
            ("dup_custkey", "SELECT count(*) FROM (SELECT c_custkey FROM customer GROUP BY 1 HAVING count(*) > 1)"),
        ]:
            assert got[chk] == con.sql(sql).fetchone()[0], chk


class TestLmTercilesAndRewrites:
    def test_terciles_are_exact_ntile(self, ray_session):
        import duckdb

        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E._q_docs_lm_terciles(sf).to_pandas()
        con = duckdb.connect()
        exp = con.execute(
            "SELECT doc_id, ntile(3) OVER (ORDER BY nll, doc_id) AS tercile FROM got ORDER BY doc_id"
        ).df()
        assert got["tercile"].tolist() == exp["tercile"].astype("int64").tolist()
        # tile sizes differ by at most 1 and are ordered big-first
        sizes = got.groupby("tercile").size()
        assert sizes.max() - sizes.min() <= 1
        assert sizes.sort_index().is_monotonic_decreasing or sizes.nunique() == 1

    def test_link_rewrites_match_pandas_except(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E._q_kg_link_rewrites(sf).to_pandas()
        _, raw = E._kg_tables(sf, link=False)
        _, linked = E._kg_tables(sf, link=True)
        r = set(map(tuple, raw[["src_key", "pred", "dst_key"]].values))
        l = set(map(tuple, linked[["src_key", "pred", "dst_key"]].values))
        diff = r - l
        exp = {}
        for _, p, _d in diff:
            exp[p] = exp.get(p, 0) + 1
        assert dict(zip(got["pred"], got["n_rewritten"])) == exp
        assert got["n_rewritten"].sum() == len(diff) > 0  # linking is live


class TestKmeansOutliers:
    def test_matches_naive_and_partition_invariant(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.expected import naive_kmeans_outliers
        from text_to_graph_ray.functions.ann import kmeans_outliers

        rng = np.random.default_rng(73)
        n, d = 400, 12
        vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
        # plant a few far-off vectors so the z-screen has real positives
        vecs[::97] *= -3.0
        ids = np.arange(n, dtype=np.int64)
        t = pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                      "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32()))})
        exp = naive_kmeans_outliers(ids, np.asarray(vecs, dtype=np.float64),
                                    n_centroids=8, train_rows=128)
        assert len(exp["vec_id"]) > 0  # screen is live on this corpus
        for parts in (2, 7):
            got = kmeans_outliers(_ray.data.from_arrow(t).repartition(parts),
                                  n_centroids=8, train_rows=128).to_pandas()
            assert got["vec_id"].tolist() == exp["vec_id"]
            assert got["list_id"].tolist() == exp["list_id"]
            assert got["simq"].tolist() == exp["simq"]

    def test_uniform_cluster_flags_nothing(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.ann import kmeans_outliers

        # every vector identical: zero variance AND zero below-mean members
        v = [1.0, 0.0, 0.0, 0.0]
        t = pa.table({"vec_id": pa.array(list(range(50)), type=pa.int64()),
                      "embedding": pa.array([v] * 50, type=pa.list_(pa.float32()))})
        assert kmeans_outliers(_ray.data.from_arrow(t), n_centroids=4).count() == 0

    def test_empty(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.ann import kmeans_outliers

        t = pa.table({"vec_id": pa.array([], type=pa.int64()),
                      "embedding": pa.array([], type=pa.list_(pa.float32()))})
        assert kmeans_outliers(_ray.data.from_arrow(t)).count() == 0


class TestKgDegreeDistribution:
    def test_frexp_bucketing_is_exact_bit_length(self):
        # the engine buckets deg -> floor(log2(deg)) via frexp; must equal
        # int.bit_length()-1 across powers of two and their neighbours
        ds = np.array(sorted({1, 2, 3, 4, 7, 8, 9, 255, 256, 257,
                              (1 << 20) - 1, 1 << 20, (1 << 40) + 3}), dtype=np.int64)
        got = np.frexp(ds.astype(np.float64))[1].astype(np.int64) - 1
        exp = [int(x).bit_length() - 1 for x in ds.tolist()]
        assert got.tolist() == exp

    def test_histogram_counts_every_endpoint(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E._q_kg_degree_distribution(sf).to_pandas()
        _, edges = E._kg_tables(sf, link=True)
        from collections import Counter

        deg = Counter(edges["src_key"]) + Counter(edges["dst_key"])
        exp = Counter(int(v).bit_length() - 1 for v in deg.values())
        assert dict(zip(got["bucket"], got["n_nodes"])) == dict(exp)
        assert got["n_nodes"].sum() == len(deg)
        assert got["bucket"].is_monotonic_increasing


class TestForestDepths:
    def _naive(self, edges):
        parent = {c: p for p, c in edges}
        roots = {p for p, _ in edges} - set(parent)
        depth = {}

        def d(n):
            if n in depth:
                return depth[n]
            depth[n] = 0 if n in roots else d(parent[n]) + 1
            return depth[n]

        nodes = roots | set(parent)
        return sorted((n, d(n)) for n in nodes)

    def test_two_trees_matches_naive(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import forest_depths

        edges = [("r1", "a"), ("r1", "b"), ("a", "c"), ("c", "d"),
                 ("r2", "x"), ("x", "y"), ("x", "z"), ("z", "w")]
        t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.string()),
                      "dst": pa.array([e[1] for e in edges], type=pa.string())})
        got = forest_depths(_ray.data.from_arrow(t).repartition(3),
                            node_type=pa.string()).to_pandas()
        assert list(map(tuple, got[["node", "depth"]].values)) == self._naive(edges)

    def test_cycle_raises(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import forest_depths

        # r -> a -> b -> a : node 'a' has a root-reachable cycle below it
        t = pa.table({"src": pa.array(["r", "a", "b"], type=pa.string()),
                      "dst": pa.array(["a", "b", "a"], type=pa.string())})
        with pytest.raises(ValueError, match="max_depth"):
            forest_depths(_ray.data.from_arrow(t), node_type=pa.string(), max_depth=5)

    def test_single_root_no_children(self, ray_session):
        import ray as _ray

        from text_to_graph_ray.functions.graph import forest_depths

        t = pa.table({"src": pa.array(["only"], type=pa.string()),
                      "dst": pa.array(["leaf"], type=pa.string())})
        got = forest_depths(_ray.data.from_arrow(t), node_type=pa.string()).to_pandas()
        assert list(map(tuple, got[["node", "depth"]].values)) == [("leaf", 1), ("only", 0)]


class TestKgRepoTriples:
    def test_matches_python_explode(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E._q_kg_repo_triples(sf).to_pandas()
        _, edges = E._kg_tables(sf, link=True)
        from collections import Counter

        exp = Counter()
        for packed in edges["repos_packed"]:
            for r in packed.split("|"):
                exp[r] += 1
        assert dict(zip(got["repo"], got["n_triples"])) == dict(exp)
        # every triple counted at least once per packed repo
        assert got["n_triples"].sum() >= len(edges)
        assert got["repo"].is_monotonic_increasing

    def test_explode_fans_out_packed_provenance(self, ray_session):
        import pyarrow.compute as pc

        # the pure-Arrow kernel itself: multi-repo packs must fan out
        packed = pa.chunked_array([pa.array(["a|b", "a", "b|c|a"], type=pa.string())])
        repos = pc.list_flatten(pc.split_pattern(packed.combine_chunks(), "|"))
        vc = repos.value_counts()
        assert dict(zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist())) == {"a": 3, "b": 2, "c": 1}


class TestForestDepthsProperty:
    @staticmethod
    def _forest_edges(draw):
        from hypothesis import strategies as st

        n = draw(st.integers(min_value=2, max_value=24))
        edges = []
        for child in range(1, n):
            # parent strictly below the child's index => acyclic forest;
            # None leaves the node an isolated root (not in any edge)
            parent = draw(st.one_of(st.none(), st.integers(min_value=0, max_value=child - 1)))
            if parent is not None:
                edges.append((f"n{parent}", f"n{child}"))
        return edges

    def test_random_forests_match_naive(self, ray_session):
        import ray as _ray
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from text_to_graph_ray.functions.graph import forest_depths

        outer = self

        @settings(max_examples=12, deadline=None)
        @given(st.data())
        def run(data):
            edges = outer._forest_edges(data.draw)
            if not edges:
                return
            t = pa.table({"src": pa.array([e[0] for e in edges], type=pa.string()),
                          "dst": pa.array([e[1] for e in edges], type=pa.string())})
            got = forest_depths(_ray.data.from_arrow(t).repartition(2),
                                node_type=pa.string()).to_pandas()
            assert list(map(tuple, got[["node", "depth"]].values)) == \
                TestForestDepths._naive(TestForestDepths(), edges)

        run()
