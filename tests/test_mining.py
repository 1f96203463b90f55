"""Round-6 mining operators: fuzzy join, triangle count, count-min sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_api_etl_spark.operators.fuzzy import edit_distance_self_join


class TestFuzzyJoin:
    def test_planted_typos_found(self, spark):
        rows = [
            (1, "jonathan smith"),
            (2, "jonathan smyth"),  # 1 substitution from 1
            (3, "jonathon smith"),  # 1 substitution from 1
            (4, "completely different"),
            (5, "jon smith"),  # far from all (distance > 1)
        ]
        df = spark.createDataFrame(rows, ["id", "name"])
        got = {
            (r.id_l, r.id_r, r.dist)
            for r in edit_distance_self_join(df, "id", "name", max_dist=1).collect()
        }
        assert got == {(1, 2, 1), (1, 3, 1)}

    def test_exact_duplicates_distance_zero(self, spark):
        df = spark.createDataFrame([(1, "same text"), (2, "same text")], ["id", "s"])
        got = edit_distance_self_join(df, "id", "s", max_dist=1).collect()
        assert [(r.id_l, r.id_r, r.dist) for r in got] == [(1, 2, 0)]

    def test_matches_naive_all_pairs(self, spark):
        # Lossless pruning: prefix-filter output == brute force on a corpus
        # with heavy gram overlap (the adversarial case for prefix filters).
        rows = [(i, f"item-{i:04d}") for i in range(60)]
        df = spark.createDataFrame(rows, ["id", "s"])
        fast = {
            (r.id_l, r.id_r)
            for r in edit_distance_self_join(df, "id", "s", max_dist=1).collect()
        }
        a, b = df.alias("a"), df.alias("b")
        naive = {
            (r[0], r[1])
            for r in a.join(b, F.col("a.id") < F.col("b.id"))
            .filter(F.levenshtein(F.col("a.s"), F.col("b.s")) <= 1)
            .select(F.col("a.id"), F.col("b.id"))
            .collect()
        }
        assert fast == naive


class TestTriangleCount:
    def test_known_graph(self, spark):
        # K4 on {1,2,3,4} has 4 triangles; pendant vertex 5 adds none.
        # Edges fed through the same oriented-wedge pipeline used by the
        # registry query, via a direct mini-replica.
        edges = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)] + [(4, 5)]
        e0 = spark.createDataFrame(edges, ["u", "v"])
        sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = sym.groupBy(F.col("u").alias("node")).agg(
            F.count("*").cast("long").alias("deg")
        )
        du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
        dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
        keyed = e0.join(du, "u").join(dv, "v")
        u_first = F.struct("du", "u") < F.struct("dv", "v")
        o = keyed.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ydeg"),
        )
        e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
        tri = (
            e1.join(
                e2,
                (F.col("e1.x") == F.col("e2.x"))
                & (F.struct("e1.ydeg", "e1.y") < F.struct("e2.ydeg", "e2.y")),
            )
            .select(F.col("e1.y").alias("w1"), F.col("e2.y").alias("w2"))
            .join(e3, (F.col("w1") == F.col("e3.x")) & (F.col("w2") == F.col("e3.y")))
            .count()
        )
        assert tri == 4

    def test_registry_query_consistent(self, spark):
        from clinical_api_etl_spark.plans.mining import graph_triangle_count

        row = graph_triangle_count(spark, "/root/testdata/sf0.001").collect()[0]
        spark.catalog.clearCache()
        assert row.n_vertices >= 0 and row.n_edges >= 0 and row.n_triangles >= 0


class TestCountMin:
    def test_never_undercounts(self, spark):
        from clinical_api_etl_spark.plans.mining import sketch_cm_user_counts

        rows = sketch_cm_user_counts(spark, "/root/testdata/sf0.001").collect()
        assert rows, "expected at least one user"
        assert all(r.never_under for r in rows)
        assert all(r.cm_est >= r.true_cnt for r in rows)
        assert all(r.overcount == r.cm_est - r.true_cnt for r in rows)

    def test_sketch_is_mergeable(self, spark):
        # Sketch(all) == cellwise sum of Sketch(half1) + Sketch(half2):
        # the defining property that lets partial sketches combine
        # map-side / across files at 100 TB.
        from clinical_api_etl_spark.plans.mining import _CM_D, _CM_W

        ev = spark.range(0, 500).select(
            (F.col("id") % 37).cast("string").alias("key")
        )

        def sketch(df):
            cols = []
            for d in range(_CM_D):
                h = F.md5(F.concat(F.lit(f"cm{d}:"), F.col("key")))
                cols.append(
                    F.struct(
                        F.lit(d).alias("d"),
                        (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % _CM_W).alias(
                            "slot"
                        ),
                    )
                )
            return (
                df.select(F.explode(F.array(*cols)).alias("e"))
                .groupBy("e.d", "e.slot")
                .agg(F.count("*").alias("c"))
            )

        whole = {(r.d, r.slot): r.c for r in sketch(ev).collect()}
        h1 = {(r.d, r.slot): r.c for r in sketch(ev.filter(F.col("id") < 250)).collect()}
        h2 = {(r.d, r.slot): r.c for r in sketch(ev.filter(F.col("id") >= 250)).collect()}
        merged: dict = {}
        for part in (h1, h2):
            for k, v in part.items():
                merged[k] = merged.get(k, 0) + v
        assert merged == whole


class TestWeightedSampling:
    def test_extreme_weights(self, spark):
        from clinical_api_etl_spark.operators.sampling import weighted_hash_sample

        df = spark.range(0, 200).select(
            F.col("id"),
            F.when(F.col("id") < 100, 0).otherwise(10_000).alias("w"),
        )
        kept = weighted_hash_sample(df, "id", "w", scale=1000)
        ids = [r.id for r in kept.collect()]
        # weight 0 never survives; weight >= scale always does
        assert all(i >= 100 for i in ids)
        assert len(ids) == 100

    def test_keep_rate_tracks_weight(self, spark):
        from clinical_api_etl_spark.operators.sampling import weighted_hash_sample

        df = spark.range(0, 4000).select(
            F.col("id"), F.when(F.col("id") % 2 == 0, 250).otherwise(750).alias("w")
        )
        kept = weighted_hash_sample(df, "id", "w", scale=1000).groupBy("w").count()
        rates = {r.w: r["count"] / 2000 for r in kept.collect()}
        assert abs(rates[250] - 0.25) < 0.05
        assert abs(rates[750] - 0.75) < 0.05

    def test_deterministic_under_repartition(self, spark):
        from clinical_api_etl_spark.operators.sampling import weighted_hash_sample

        df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 500).alias("w"))
        a = {r.id for r in weighted_hash_sample(df, "id", "w", scale=400).collect()}
        b = {
            r.id
            for r in weighted_hash_sample(
                df.repartition(17), "id", "w", scale=400
            ).collect()
        }
        assert a == b


class TestGroupHoldout:
    def test_no_group_straddles_splits(self, spark):
        from clinical_api_etl_spark.operators.sampling import group_holdout_split

        from clinical_api_etl_spark.sources.catalog import load

        ev = load(spark, "/root/testdata/sf0.001", "events")
        per_user = (
            group_holdout_split(ev, "user_id")
            .groupBy("user_id")
            .agg(F.count_distinct("split").alias("n_splits"))
        )
        assert per_user.filter(F.col("n_splits") > 1).count() == 0


class TestLabelCentroids:
    def test_matches_numpy(self, spark):
        import numpy as np

        from clinical_api_etl_spark.plans.mining import emb_label_centroids

        got = {r.label: r for r in emb_label_centroids(spark, "/root/testdata/sf0.001").collect()}
        import pyarrow.parquet as pq

        tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet").to_pandas()
        for label, grp in tbl.groupby("label"):
            mat = np.stack(grp["embedding"].to_numpy())
            units = np.floor(mat.astype(np.float64) * 1_000_000.0 + 0.5).astype(np.int64)
            sums = units.sum(axis=0)
            row = got[label]
            assert row.n == len(grp)
            for j in (0, 1, 31, 63):
                assert row[f"s{j}"] == sums[j]


class TestAudioFeatures:
    def test_matches_pure_python_replay(self, spark):
        import hashlib

        import numpy as np

        from clinical_api_etl_spark.operators.multimodal import (
            audio_frame_features,
            synth_pcm,
        )

        ids = spark.range(0, 7).select(F.col("id").alias("doc_id"))
        got = {
            (r.doc_id, r.frame_idx): (r.n_samples, r.sum_sq, r.zero_crossings)
            for r in audio_frame_features(synth_pcm(ids)).collect()
        }
        for doc in range(7):
            raw = b"".join(
                bytes.fromhex(hashlib.md5(f"au{c}:{doc}".encode()).hexdigest())
                for c in range(4)
            )
            samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            for f in range(2):
                fr = samples[f * 16 : (f + 1) * 16]
                expect = (
                    16,
                    int((fr * fr).sum()),
                    int(((fr[:-1] * fr[1:]) < 0).sum()),
                )
                assert got[(doc, f)] == expect

    def test_ragged_tail_frame(self, spark):
        from clinical_api_etl_spark.operators.multimodal import audio_frame_features

        # 3 samples with frame_len=2: one full frame + one 1-sample tail
        pcm = bytes([1, 0, 255, 255, 2, 0])  # LE int16: [1, -1, 2]
        df = spark.createDataFrame([(1, bytearray(pcm))], ["doc_id", "pcm"])
        rows = {
            r.frame_idx: r
            for r in audio_frame_features(df, frame_len=2).collect()
        }
        assert rows[0].n_samples == 2 and rows[0].sum_sq == 2
        assert rows[0].zero_crossings == 1  # 1 -> -1
        assert rows[1].n_samples == 1 and rows[1].sum_sq == 4
        assert rows[1].zero_crossings == 0


class TestDeletionVariants:
    def test_expression_matches_python_enumeration(self, spark):
        from clinical_api_etl_spark.operators.fuzzy import (
            _deletion_variants,
            deletion_variants_py,
        )

        for s in ["abc", "abcd", "aab", "x"]:
            for k in (1, 2):
                df = spark.createDataFrame([(s,)], ["s"])
                got = set(
                    df.select(
                        F.explode(
                            F.array_distinct(_deletion_variants("s", k))
                        ).alias("v")
                    )
                    .toPandas()["v"]
                    .tolist()
                )
                assert got == deletion_variants_py(s, k), (s, k)

    def test_max_dist_2_join(self, spark):
        from clinical_api_etl_spark.operators.fuzzy import edit_distance_self_join

        rows = [(1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "mitten")]
        got = {
            (r.id_l, r.id_r, r.dist)
            for r in edit_distance_self_join(
                spark.createDataFrame(rows, ["id", "s"]), "id", "s", max_dist=2
            ).collect()
        }
        assert got == {
            (1, 2, 1),
            (1, 3, 2),
            (1, 4, 1),
            (2, 3, 1),
            (2, 4, 1),
            (3, 4, 2),
        }


class TestCompressionRatio:
    def test_repetitive_compresses_below_diverse(self, spark):
        import random

        from clinical_api_etl_spark.operators.textstats import compression_ratios

        rng = random.Random(7)
        diverse = " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
            for _ in range(100)
        )
        rows = [(1, "spam " * 180), (2, diverse)]
        got = {
            r.doc_id: r
            for r in compression_ratios(
                spark.createDataFrame(rows, ["doc_id", "text"])
            ).collect()
        }
        assert got[1].ratio_bp < got[2].ratio_bp
        assert got[1].ratio_bp < 1000  # "spam spam ..." is >10x compressible
        for r in got.values():
            assert r.n_bytes > 0 and 0 < r.n_compressed
            assert r.ratio_bp == r.n_compressed * 10000 // r.n_bytes

    def test_empty_and_null_text(self, spark):
        from clinical_api_etl_spark.operators.textstats import compression_ratios

        rows = [(1, ""), (2, None)]
        got = {
            r.doc_id: r
            for r in compression_ratios(
                spark.createDataFrame(rows, "doc_id long, text string")
            ).collect()
        }
        assert got[1].n_bytes == 0 and got[2].n_bytes == 0


class TestAssociationRules:
    def test_known_baskets(self, spark):
        from clinical_api_etl_spark.plans.mining import mine_association_rules  # noqa: F401
        # mini-replica of the rule math on known baskets:
        # {1:AB, 2:AB, 3:AC, 4:A} -> pair (A,B) support 2
        rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C"), (4, "A")]
        baskets = spark.createDataFrame(rows, ["oid", "item"]).distinct()
        a, b = baskets.alias("a"), baskets.alias("b")
        pair = (
            a.join(b, (F.col("a.oid") == F.col("b.oid")) & (F.col("a.item") < F.col("b.item")))
            .groupBy(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
            .agg(F.count("*").alias("cxy"))
            .filter(F.col("cxy") >= 2)
        )
        got = {(r.x, r.y): r.cxy for r in pair.collect()}
        assert got == {("A", "B"): 2}
        # confidence(B->A) = 2/2 = 1.0, lift = 2*4/(4*2) = 1.0
        # confidence(A->B) = 2/4 = 0.5, lift same
        n, ca, cb, cab = 4, 4, 2, 2
        assert cab / cb == 1.0 and cab * n / (ca * cb) == 1.0

    def test_registry_rules_sane(self, spark):
        from clinical_api_etl_spark.plans.mining import mine_association_rules

        rows = mine_association_rules(spark, "/root/testdata/sf0.001").collect()
        spark.catalog.clearCache()
        for r in rows:
            assert 0 < r.confidence <= 1.0
            assert r.lift > 0
            assert r.support_cnt >= 2


class TestCusum:
    def test_planted_mean_shift(self, spark):
        from datetime import datetime, timedelta

        from clinical_api_etl_spark.plans.mining import stat_cusum_changepoint  # noqa: F401

        # mini-replica: 20 points at 10.0 then 20 at 50.0 -> CUSUM peaks at
        # the boundary (rank 20)
        t0 = datetime(2024, 1, 1)
        rows = [
            (i, t0 + timedelta(minutes=i), "a", 10.0 if i < 20 else 50.0)
            for i in range(40)
        ]
        ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
        from pyspark.sql import Window as W

        t = ev.select(
            "event_type", "event_id", "ts",
            (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("x"),
        )
        g = t.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("sx")
        )
        w = W.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
        c = (
            t.join(g, "event_type")
            .select(
                "event_id",
                F.row_number().over(W.partitionBy("event_type").orderBy("ts", "event_id")).cast("long").alias("k"),
                ((F.col("n") * F.sum("x").over(w)) - F.row_number().over(W.partitionBy("event_type").orderBy("ts", "event_id")).cast("long") * F.col("sx")).alias("cs"),
            )
        )
        peak = c.orderBy(F.abs("cs").desc(), "k").first()
        assert peak.k == 20 and peak.event_id == 19


class TestEquiDepth:
    def test_bucket_sizes_differ_by_at_most_one(self, spark):
        from clinical_api_etl_spark.plans.mining import hist_equidepth_value

        rows = hist_equidepth_value(spark, "/root/testdata/sf0.001").collect()
        by_type: dict = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append(r)
        for et, bs in by_type.items():
            sizes = [b.n for b in bs]
            assert max(sizes) - min(sizes) <= 1, (et, sizes)
            ordered = sorted(bs, key=lambda b: b.bucket)
            for p, q in zip(ordered, ordered[1:]):
                assert p.hi_cents <= q.lo_cents


class TestKCore:
    def test_registry_kcore_converged(self, spark):
        """The round-bounded peel must reach its fixpoint on the test graph
        (so the output IS the true k-core): every surviving node has
        core_deg >= k."""
        from clinical_api_etl_spark.plans.mining import (
            _KCORE_K,
            graph_kcore_members,
        )

        rows = graph_kcore_members(spark, "/root/testdata/sf0.001").collect()
        spark.catalog.clearCache()
        assert all(r.core_deg >= _KCORE_K for r in rows)

    def test_hand_graph_peels_tail(self, spark):
        # K4 (3-core) + a pendant chain that must peel away entirely
        from clinical_api_etl_spark.plans.mining import _KCORE_K

        assert _KCORE_K == 3
        edges = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
        edges += [(4, 5), (5, 6)]
        df = spark.createDataFrame(edges, ["u", "v"]).localCheckpoint(eager=True)
        for _ in range(5):
            nodes = df.select(F.col("u").alias("node")).unionByName(
                df.select(F.col("v").alias("node"))
            )
            deg = nodes.groupBy("node").agg(F.count("*").alias("deg"))
            keep = deg.filter(F.col("deg") >= 3).select("node")
            df = (
                df.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
                .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
                .localCheckpoint(eager=True)
            )
        surv = {r.u for r in df.collect()} | {r.v for r in df.collect()}
        assert surv == {1, 2, 3, 4}


class TestLabelAffinity:
    def test_self_pairs_excluded_and_symmetric_coverage(self, spark):
        from clinical_api_etl_spark.plans.mining import emb_label_affinity

        rows = emb_label_affinity(spark, "/root/testdata/sf0.001").collect()
        pairs = {(r.label_a, r.label_b) for r in rows}
        assert all(a < b for a, b in pairs)
        labels = {a for a, _ in pairs} | {b for _, b in pairs}
        assert len(pairs) == len(labels) * (len(labels) - 1) // 2


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_words = st.lists(
    st.text(alphabet="abcx", min_size=1, max_size=6),
    min_size=2,
    max_size=12,
    unique=True,
)


class TestFuzzyProperty:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(words=_words, k=st.integers(min_value=1, max_value=2))
    def test_fuzzy_join_equals_brute_force(self, spark, words, k):
        df = spark.createDataFrame(list(enumerate(words)), ["id", "s"])
        fast = {
            (r.id_l, r.id_r, r.dist)
            for r in edit_distance_self_join(df, "id", "s", max_dist=k).collect()
        }
        a, b = df.alias("a"), df.alias("b")
        naive = {
            (r[0], r[1], r[2])
            for r in a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id"),
                F.col("b.id"),
                F.levenshtein(F.col("a.s"), F.col("b.s")).alias("d"),
            )
            .filter(F.col("d") <= k)
            .collect()
        }
        assert fast == naive


class TestMortonProperty:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        xs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=65535),
                st.integers(min_value=0, max_value=65535),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_interleave_matches_python(self, spark, xs):
        from clinical_api_etl_spark.sources.layout import morton_interleave

        df = spark.createDataFrame([(i, x, y) for i, (x, y) in enumerate(xs)], ["i", "x", "y"])
        got = {
            r.i: r.z
            for r in df.select(
                "i", morton_interleave([F.col("x"), F.col("y")], bits=16).alias("z")
            ).collect()
        }
        for i, (x, y) in enumerate(xs):
            want = sum(
                (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))
                for b in range(16)
            )
            assert got[i] == want


class TestTheilSen:
    def test_robust_to_planted_outliers(self, spark):
        from clinical_api_etl_spark.operators.trend import theil_sen_trend

        # y = 5x + 100 with 20% wild outliers: Theil-Sen recovers the slope
        rows = []
        for i in range(100):
            y = 5 * i + 100
            if i % 5 == 0:
                y += 100_000
            rows.append(("a", i, i, y))
        df = spark.createDataFrame(rows, "event_type string, event_id long, x long, y long")
        got = theil_sen_trend(df, cap=100).collect()[0]
        assert got.n_sampled == 100
        assert abs(got.slope_cents_per_day - 5.0) < 0.5
        assert abs(got.intercept_cents - 100.0) < 200

    def test_degenerate_single_x(self, spark):
        from clinical_api_etl_spark.operators.trend import theil_sen_trend

        df = spark.createDataFrame(
            [("a", 1, 7, 10), ("a", 2, 7, 20)],
            "event_type string, event_id long, x long, y long",
        )
        got = theil_sen_trend(df).collect()[0]
        # kernel NaN surfaces as NULL through Arrow — no defined slope
        assert got.slope_cents_per_day is None


class TestExpectations:
    def test_counts_and_split_agree(self, spark):
        from clinical_api_etl_spark.operators import expectations as X

        rows = [
            (1, "ok", 5.0),
            (2, "ok", None),       # not_null violation
            (3, "bad", 5.0),       # in_set violation
            (4, "ok", 99.0),       # in_range violation
            (5, None, 5.0),        # none (in_set ignores NULL)
        ]
        df = spark.createDataFrame(rows, "id long, kind string, v double")
        rules = [
            X.not_null("v"),
            X.in_set("kind", ["ok"]),
            X.in_range("v", 0.0, 10.0),
        ]
        counts = {r.rule: r.n_violations for r in X.violation_counts(df, rules).collect()}
        assert counts == {"v__not_null": 1, "kind__in_set": 1, "v__in_range": 1}
        clean, bad = X.quarantine_split(df, rules)
        assert {r.id for r in clean.collect()} == {1, 5}
        assert {r.id for r in bad.collect()} == {2, 3, 4}
        assert "__viol_v__not_null" not in clean.columns

    def test_no_rules_violated_keeps_everything(self, spark):
        from clinical_api_etl_spark.operators import expectations as X

        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
        rules = [X.non_blank("s")]
        clean, bad = X.quarantine_split(df, rules)
        assert clean.count() == 2 and bad.count() == 0


class TestTextCleaning:
    def test_stutter_removal_planted(self, spark):
        from clinical_api_etl_spark.plans.mining import text_dedup_consecutive_tokens  # noqa: F401

        df = spark.createDataFrame(
            [(1, "the the cat cat cat sat"), (2, "no repeats here")],
            ["doc_id", "text"],
        )
        t = df.select("doc_id", F.split("text", " ").alias("toks"))
        clean = F.filter(
            F.col("toks"),
            lambda tok, i: (i == 0) | (tok != F.element_at(F.col("toks"), i)),
        )
        got = {
            r.doc_id: (r.c, r.removed)
            for r in t.select(
                "doc_id",
                F.array_join(clean, " ").alias("c"),
                (F.size("toks") - F.size(clean)).alias("removed"),
            ).collect()
        }
        assert got[1] == ("the cat sat", 3)
        assert got[2] == ("no repeats here", 0)

    def test_canonicalization_idempotent(self, spark):
        from clinical_api_etl_spark.plans.mining import text_normalize_canonical

        out = text_normalize_canonical(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        assert all(r.canon_len >= 0 for r in rows)
        # canonical form of a canonical form is itself: md5 stable under re-run
        again = {r.doc_id: r.canon_md5 for r in text_normalize_canonical(
            spark, "/root/testdata/sf0.001").collect()}
        assert {r.doc_id: r.canon_md5 for r in rows} == again


class TestGlobalIndex:
    def test_gap_free_and_order_preserving(self, spark):
        from clinical_api_etl_spark.plans.mining import seq_global_event_index

        rows = seq_global_event_index(spark, "/root/testdata/sf0.001").collect()
        idxs = sorted(r.global_idx for r in rows)
        assert idxs == list(range(len(rows)))  # gap-free, collision-free


class TestRandomWalks:
    def test_walks_follow_edges_and_are_deterministic(self, spark):
        from clinical_api_etl_spark.plans.mining import (
            _WALK_STEPS,
            graph_random_walks,
        )

        rows1 = {r.walker: r.path for r in graph_random_walks(spark, "/root/testdata/sf0.001").collect()}
        spark.catalog.clearCache()
        rows2 = {r.walker: r.path for r in graph_random_walks(spark, "/root/testdata/sf0.001").collect()}
        spark.catalog.clearCache()
        assert rows1 == rows2  # RNG-free: identical across runs
        for walker, path in rows1.items():
            nodes = path.split(">")
            assert len(nodes) == _WALK_STEPS + 1
            assert int(nodes[0]) == walker


class TestSkipgrams:
    def test_symmetric_counts(self, spark):
        from clinical_api_etl_spark.plans.mining import graph_walk_skipgrams

        rows = graph_walk_skipgrams(spark, "/root/testdata/sf0.001").collect()
        spark.catalog.clearCache()
        got = {(r.center, r.context): r.cnt for r in rows}
        # the window relation is symmetric: (a,b) and (b,a) counts match
        for (c, x), n in got.items():
            assert got.get((x, c)) == n


class TestKTruss:
    def test_registry_ktruss_converged(self, spark):
        """The round-bounded peel must reach its fixpoint: every surviving
        edge participates in >= k-2 triangles among surviving edges (its
        reported support IS measured on the final edge set)."""
        from clinical_api_etl_spark.plans.mining import (
            _TRUSS_K,
            graph_ktruss_edges,
        )

        rows = graph_ktruss_edges(spark, "/root/testdata/sf0.001").collect()
        spark.catalog.clearCache()
        assert rows, "3-truss unexpectedly empty on testdata"
        assert all(r.support >= _TRUSS_K - 2 for r in rows)

    def test_hand_graph_peels_pendant_triangles(self, spark):
        """K4 survives at k=4 (every edge in 2 triangles); a triangle
        hanging off one K4 node peels away (its edges sit in 1)."""
        from clinical_api_etl_spark.plans.mining import _edge_support

        k4 = [(u, v) for u in range(1, 5) for v in range(u + 1, 5)]
        pendant = [(4, 8), (4, 9), (8, 9)]
        df = spark.createDataFrame(k4 + pendant, ["u", "v"]).localCheckpoint(
            eager=True
        )
        from pyspark.sql import functions as F

        for _ in range(3):
            sup = _edge_support(df)
            df = (
                sup.filter(F.col("support") >= 2)
                .select("u", "v")
                .localCheckpoint(eager=True)
            )
        surv = {(r.u, r.v) for r in df.collect()}
        assert surv == set(k4)

    def test_truss_subset_of_edges_with_triangles(self, spark):
        """Every 3-truss edge must carry support >= 1 in the ORIGINAL
        graph too (peeling only removes edges, never adds support)."""
        from clinical_api_etl_spark.plans.mining import (
            _TRI_SUPPORT,
            _edge_support,
            graph_ktruss_edges,
        )
        from clinical_api_etl_spark.sources.catalog import load
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
        a, b = li.alias("a"), li.alias("b")
        e0 = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
            .agg(F.count("*").alias("s"))
            .filter(F.col("s") >= _TRI_SUPPORT)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        orig = {
            (r.u, r.v): r.support for r in _edge_support(e0).collect()
        }
        truss = graph_ktruss_edges(spark, sf).collect()
        spark.catalog.clearCache()
        assert all(orig.get((r.u, r.v), 0) >= r.support for r in truss)
