"""Round-18 additions: session memo semantics, HNSW graph ANN, dHash
image dedup, Leiden refinement, AR(2) Yule-Walker python replay, and the
QuerySet builder-name guard.

Same discipline as test_round15.py: integer components replay bitwise
from the raw sf0.001 parquet; float finishes to IEEE equality (fixed
trees / pinned folds over exactly-converted ints)."""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
_DAY_MS = 86_400_000


@pytest.fixture(scope="module")
def events_pdf():
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf = pdf[pdf["value"].notna()].copy()
    pdf["cents"] = (pdf["value"] * 100).round().astype("int64")
    return pdf


class TestSessionMemo:
    def test_builds_once_and_reset_forgets(self, spark):
        from clinical_api_etl_spark.functions import memo

        memo.reset()
        calls = []

        def build():
            calls.append(1)
            return object()

        a = memo.session_memo(spark, ("t", 1), build)
        b = memo.session_memo(spark, ("t", 1), build)
        assert a is b and len(calls) == 1
        memo.reset()
        c = memo.session_memo(spark, ("t", 1), build)
        assert c is not a and len(calls) == 2
        memo.reset()

    def test_stale_application_entries_dropped(self, spark):
        from clinical_api_etl_spark.functions import memo

        memo.reset()
        memo._CACHE["app-dead-beef"] = {("x",): "stale"}
        memo.session_memo(spark, ("t", 2), lambda: "fresh")
        assert "app-dead-beef" not in memo._CACHE
        memo.reset()


class TestQuerySetNameGuard:
    def test_misnamed_builder_rejected(self):
        from clinical_api_etl_spark.plans.base import QuerySet

        qs = QuerySet()
        with pytest.raises(ValueError, match="helper def likely slipped"):

            @qs.add("some_query", None)
            def _not_the_query(spark, sf_dir):  # pragma: no cover
                return None

    def test_matching_builder_accepted(self):
        from clinical_api_etl_spark.plans.base import QuerySet

        qs = QuerySet()

        @qs.add("some_query", None)
        def some_query(spark, sf_dir):  # pragma: no cover
            return None

        assert "some_query" in qs.queries


class TestHnsw:
    def test_build_deterministic(self, spark):
        from clinical_api_etl_spark.operators.hnsw import hnsw_build
        from clinical_api_etl_spark.sources.catalog import load

        emb = load(spark, SF, "embeddings")
        a = hnsw_build(emb)
        b = hnsw_build(emb)
        assert len(a["layers"]) == len(b["layers"]) >= 2
        for (adj_a, r_a), (adj_b, r_b) in zip(a["layers"], b["layers"]):
            assert r_a == r_b
            ea = {(r["src"], r["dst"]) for r in adj_a.collect()}
            eb = {(r["src"], r["dst"]) for r in adj_b.collect()}
            assert ea == eb and len(ea) > 0
        assert (
            a["entry"].collect()[0][0] == b["entry"].collect()[0][0]
        )

    def test_recall_floor_and_shape(self, spark):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.hnsw import hnsw_topk
        from clinical_api_etl_spark.operators.similarity import cosine_topk
        from clinical_api_etl_spark.sources.catalog import load

        emb = load(spark, SF, "embeddings")
        q = emb.filter(F.col("vec_id") < 10)
        approx = hnsw_topk(q, emb, k=5).collect()
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(q, emb, k=5).collect()
        }
        got = {(r["query_id"], r["neighbor_id"]) for r in approx}
        assert len(got & exact) / len(exact) >= 0.8
        # per-query at most k rows, ranks contiguous from 1, no self hits
        by_q: dict = {}
        for r in approx:
            by_q.setdefault(r["query_id"], []).append(r)
            assert r["neighbor_id"] != r["query_id"]
        for rows in by_q.values():
            assert sorted(x["rank"] for x in rows) == list(
                range(1, len(rows) + 1)
            )
            assert len(rows) <= 5


class TestImageDhash:
    def test_planted_pair_found_exactly(self, spark):
        from clinical_api_etl_spark.operators.multimodal import (
            image_dhash_pairs,
        )

        # two near-identical images (pixel 0 differs by 8) + two random
        import hashlib

        def px_bytes(seed: str) -> bytes:
            return b"".join(
                hashlib.md5(f"{seed}:{c}".encode()).digest() for c in range(4)
            )

        base = px_bytes("dup")
        pert = bytes([(base[0] + 8) % 256]) + base[1:]
        rows = [
            (1, base),
            (2, pert),
            (3, px_bytes("other-a")),
            (4, px_bytes("other-b")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, pixels binary")
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in image_dhash_pairs(df).collect()
        }
        assert set(pairs) == {(1, 2)}
        assert pairs[(1, 2)] <= 1

    def test_banding_complete_vs_bruteforce(self, spark):
        # Hamming <= 4 pairs from the banded path must equal a brute
        # force over the same signatures (pigeonhole completeness).
        import hashlib
        import itertools

        from clinical_api_etl_spark.operators.multimodal import (
            image_dhash_pairs,
        )

        def px_bytes(seed: str) -> bytes:
            return b"".join(
                hashlib.md5(f"{seed}:{c}".encode()).digest() for c in range(4)
            )

        rows = []
        for i in range(24):
            b = bytearray(px_bytes(f"s{i % 6}"))  # 6 base images, 4 variants
            b[i % 3] = (b[i % 3] + (i // 6)) % 256  # tiny perturbations
            rows.append((i, bytes(b)))
        df = spark.createDataFrame(rows, "doc_id long, pixels binary")
        got = {
            (r["id_a"], r["id_b"]) for r in image_dhash_pairs(df).collect()
        }

        def sig(px: bytes) -> int:
            s = 0
            for r in range(8):
                for c in range(7):
                    if px[r * 8 + c] < px[r * 8 + c + 1]:
                        s |= 1 << (r * 7 + c)
            return s

        sigs = {i: sig(px) for i, px in rows}
        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(sigs), 2)
            if bin(sigs[a] ^ sigs[b]).count("1") <= 4
        }
        assert got == want and len(want) > 0


class TestLeidenRefine:
    def test_disconnected_community_splits_and_q_improves(self, spark):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.plans.ranking.communities import (
            refine_disconnected,
        )

        # two disjoint triangles forced into ONE community label
        edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
        e0 = spark.createDataFrame(edges, "u long, v long")
        labels = spark.createDataFrame(
            [(n, 1) for n in (1, 2, 3, 10, 11, 12)],
            "node long, community long",
        )
        ref = refine_disconnected(e0, labels)
        got = {r["node"]: r["refined_community"] for r in ref.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
        # exact-integer Q comparison: E_intra unchanged, stot drops
        m = len(edges)
        deg = {n: 3 for n in got}
        stot_before = sum(deg.values()) ** 2
        parts: dict = {}
        for n, g in got.items():
            parts.setdefault(g, []).append(n)
        stot_after = sum(sum(deg[n] for n in mem) ** 2 for mem in parts.values())
        assert 4 * m * m - stot_after > 4 * m * m - stot_before

    def test_connected_communities_untouched(self, spark):
        from clinical_api_etl_spark.plans.ranking.communities import (
            refine_disconnected,
        )

        edges = [(1, 2), (2, 3), (1, 3)]
        e0 = spark.createDataFrame(edges, "u long, v long")
        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "node long, community long"
        )
        got = {
            r["node"]: r["refined_community"]
            for r in refine_disconnected(e0, labels).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1}


class TestAr2YuleWalker:
    def test_bitwise_python_replay(self, spark, events_pdf):
        from clinical_api_etl_spark.plans.inference import ts_ar2_yule_walker

        rows = {r["event_type"]: r for r in ts_ar2_yule_walker(spark, SF).collect()}
        pdf = events_pdf.copy()
        pdf["d"] = (
            pdf["ts"].astype("datetime64[us]").astype("int64") // 10**3
        ) // _DAY_MS
        for et, sub in pdf.groupby("event_type"):
            daily = sub.groupby("d")["cents"].sum().sort_index()
            n = len(daily)
            tot = int(daily.sum())
            days = list(daily.index)
            c = {d: n * int(s) - tot for d, s in daily.items()}
            den = 0.0
            for d in days:
                den += float(c[d]) * float(c[d])
            num1 = num2 = 0.0
            for i, d in enumerate(days):
                if i + 1 < n and days[i + 1] - d == 1:
                    num1 += float(c[d]) * float(c[days[i + 1]])
                if i + 2 < n and days[i + 2] - d == 2:
                    num2 += float(c[d]) * float(c[days[i + 2]])
            r1, r2 = num1 / den, num2 / den
            phi1 = (r1 * (1.0 - r2)) / (1.0 - r1 * r1)
            phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
            se = sn = 0.0
            n_tr = 0
            for i, d in enumerate(days):
                if i + 2 < n and days[i + 1] - d == 1 and days[i + 2] - d == 2:
                    y1, y2 = float(c[days[i + 1]]), float(c[days[i + 2]])
                    se += abs(y2 - (phi1 * y1 + phi2 * float(c[d])))
                    sn += abs(y2 - y1)
                    n_tr += 1
            row = rows[et]
            assert row["n_days"] == n and row["n_triples"] == n_tr
            assert row["r1"] == r1 and row["r2"] == r2
            assert row["phi1"] == phi1 and row["phi2"] == phi2
            assert row["mase"] == se / sn


class TestBetweennessSampled:
    def test_shape_invariants(self, spark):
        from clinical_api_etl_spark.plans.modeling import (
            graph_betweenness_sampled,
        )

        rows = graph_betweenness_sampled(spark, SF).collect()
        assert len(rows) > 0
        for r in rows:
            assert 1 <= r["n_src"] <= 4
            assert r["btw"] >= 0.0


class TestHnswDriverParity:
    """The round-11 driver-side HNSW build+search must be BIT-IDENTICAL
    to the distributed path: norms/cosines are the dimension-ordered
    left fold, layer membership the md5-prefix rule, cell keys the
    identical int-typed xxhash64 sign planes, beam/top-k ordering
    (cos DESC bitwise, node ASC)."""

    @staticmethod
    def _rows(df):
        import struct

        return sorted(
            tuple(
                struct.pack("<d", x).hex() if isinstance(x, float) else x
                for x in r
            )
            for r in df.collect()
        )

    def test_brute_layers_bitwise(self, spark):
        import clinical_api_etl_spark.operators.hnsw as H
        from clinical_api_etl_spark.sources.catalog import load

        emb = load(spark, SF, "embeddings")
        fast = self._rows(H.hnsw_topk(emb, emb, k=5))
        om = H.HNSW_DRIVER_MAX
        H.HNSW_DRIVER_MAX = -1
        try:
            slow = self._rows(H.hnsw_topk(emb, emb, k=5))
        finally:
            H.HNSW_DRIVER_MAX = om
        assert fast == slow and len(fast) > 0
        spark.catalog.clearCache()

    def test_cell_layers_bitwise(self, spark):
        # force the LSH-cell adjacency branch on layer 0
        import clinical_api_etl_spark.operators.hnsw as H
        from clinical_api_etl_spark.sources.catalog import load

        emb = load(spark, SF, "embeddings")
        ob, om = H.BRUTE_MAX, H.HNSW_DRIVER_MAX
        H.BRUTE_MAX = 64
        try:
            fast = self._rows(H.hnsw_topk(emb, emb, k=5))
            H.HNSW_DRIVER_MAX = -1
            slow = self._rows(H.hnsw_topk(emb, emb, k=5))
        finally:
            H.BRUTE_MAX, H.HNSW_DRIVER_MAX = ob, om
        assert fast == slow and len(fast) > 0
        spark.catalog.clearCache()
