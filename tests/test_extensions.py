"""[EXT] operator property tests (SURVEY §5.2 item 4 applied to the
LLM-pipeline extensions): approximate methods are validated against their
exact counterparts — LSH may only *miss*, never invent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


class TestDedup:
    def test_exact_dedup_finds_planted_dups(self, spark):
        df = spark.createDataFrame(
            [(1, "aa bb cc"), (2, "aa bb cc"), (3, "zz yy"), (4, "aa bb cc")],
            "doc_id long, text string",
        )
        from clinical_api_etl_spark.operators.dedup import exact_duplicates

        groups = exact_duplicates(df, "doc_id", "text").collect()
        assert len(groups) == 1
        assert groups[0]["survivor_id"] == 1 and groups[0]["n_members"] == 3

    def test_minhash_lsh_subset_of_exact(self, docs):
        from clinical_api_etl_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        exact = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()
        }
        assert lsh <= exact  # no false positives (verified candidates)
        if exact:
            recall = len(lsh) / len(exact)
            assert recall >= 0.8, f"LSH recall {recall:.2f} below S-curve expectation"

    def test_simhash_deterministic_and_verified(self, docs):
        from clinical_api_etl_spark.operators.dedup import simhash_pairs

        p1 = sorted(map(tuple, simhash_pairs(docs, "doc_id", "text").collect()))
        p2 = sorted(map(tuple, simhash_pairs(docs, "doc_id", "text").collect()))
        assert p1 == p2  # hash family is deterministic
        assert all(h <= 3 and a < b for a, b, h in p1)


class TestSimilarity:
    def test_lsh_results_subset_with_true_cosines(self, emb):
        """Every LSH hit carries the exact cosine for that pair (re-rank is
        exact), and per-query hits are a subset of the brute-force ordering."""
        from clinical_api_etl_spark.operators.similarity import cosine_topk, lsh_topk

        queries = emb.filter(F.col("vec_id") < 5)
        exact = cosine_topk(queries, emb, k=500)  # full ranking
        truth = {
            (r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact.collect()
        }
        approx = lsh_topk(queries, emb, k=5).collect()
        assert approx, "LSH returned nothing"
        for r in approx:
            assert truth[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]

    def test_topk_rank_contract(self, emb):
        from clinical_api_etl_spark.operators.similarity import cosine_topk

        out = cosine_topk(emb.filter(F.col("vec_id") < 3), emb, k=4).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rows in by_q.items():
            rows.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rows] == [1, 2, 3, 4]
            sims = [r["cos_sim"] for r in rows]
            assert sims == sorted(sims, reverse=True)
            assert all(r["neighbor_id"] != q for r in rows)


class TestSemanticDedup:
    def test_identical_vectors_always_found(self, spark):
        """Planted exact duplicates share a cell by construction (same
        vector → same nearest centroid), so SemDeDup must report them."""
        import random

        from clinical_api_etl_spark.operators.similarity import (
            semantic_near_duplicates,
        )

        rng = random.Random(7)
        base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
        rows = [(i, v) for i, v in enumerate(base)]
        rows += [(100 + i, base[i]) for i in range(5)]  # 5 planted dups
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_duplicates(
                df, threshold=0.999, n_clusters=3
            ).collect()
        }
        for i in range(5):
            assert (i, 100 + i) in pairs

    def test_subset_of_exact(self, emb):
        from clinical_api_etl_spark.operators.similarity import (
            embedding_near_duplicates,
            semantic_near_duplicates,
        )

        exact = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_duplicates(emb, threshold=0.4).collect()
        }
        sem = {
            (r["id_a"], r["id_b"])
            for r in semantic_near_duplicates(
                emb, threshold=0.4, n_clusters=4
            ).collect()
        }
        assert sem, "semantic dedup found nothing at the calibrated threshold"
        assert sem <= exact


def _pil_missing() -> bool:
    from clinical_api_etl_spark.operators.multimodal import _pil_available

    return not _pil_available()


class TestMultimodal:
    def test_decode_requires_explicit_fake_without_codec(self, docs):
        from clinical_api_etl_spark.operators.multimodal import attach_media, decode_media

        if _pil_missing():
            with pytest.raises(NotImplementedError, match="codec"):
                decode_media(attach_media(docs), fake=False)
        else:  # Pillow present: real path builds without raising
            decode_media(attach_media(docs), fake=False)

    @pytest.mark.skipif(
        _pil_missing(), reason="Pillow not installed in this container"
    )
    def test_real_png_decode_with_pil(self, spark):
        """With Pillow present, an actual PNG decodes through the full
        mapInPandas path: a half-black/half-white 8×2 image yields a
        bimodal grayscale histogram (mass only in the darkest and
        brightest buckets)."""
        import io

        from PIL import Image

        from clinical_api_etl_spark.operators.multimodal import decode_media

        img = Image.new("L", (8, 2))
        img.putdata([0] * 8 + [255] * 8)
        buf = io.BytesIO()
        img.save(buf, "PNG")
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()), ("image", "image/png", 8, 2, None))],
            "doc_id long, payload binary, media struct<kind:string,mime:string,width:int,height:int,duration_ms:long>",
        )
        row = decode_media(df, dim=8, fake=False).collect()[0]
        assert row["feature"][0] == pytest.approx(0.5)
        assert row["feature"][7] == pytest.approx(0.5)
        assert sum(row["feature"][1:7]) == pytest.approx(0.0)

    def test_fake_decode_batch_shapes(self, docs):
        from clinical_api_etl_spark.operators.multimodal import attach_media, decode_media

        out = decode_media(attach_media(docs), dim=8, fake=True)
        rows = out.collect()
        assert len(rows) == docs.count()
        for r in rows[:10]:
            assert len(r["feature"]) == 8
            assert abs(sum(r["feature"]) - 1.0) < 1e-9  # normalized byte-fold
            assert r["n_bytes"] > 0
        assert {r["kind"] for r in rows} == {"image", "audio", "video"}

    def test_frame_sample_with_duration(self, spark):
        from clinical_api_etl_spark.operators.multimodal import frame_sample

        df = spark.createDataFrame(
            [(1, bytearray(b"x"), ("video", None, None, None, 2500)),
             (2, bytearray(b"y"), ("image", None, None, None, None))],
            "doc_id long, payload binary, media struct<kind:string,mime:string,width:int,height:int,duration_ms:long>",
        )
        frames = frame_sample(df, every_ms=1000).collect()
        assert [(r["doc_id"], r["frame_ts_ms"]) for r in frames] == [
            (1, 0), (1, 1000), (1, 2000)]


class TestConnectedComponents:
    def test_chain_and_clique(self, spark):
        from clinical_api_etl_spark.operators.graph import connected_components

        # chain 1-2-3-4, clique 10-11-12, pair 20-21
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
            "id_a long, id_b long",
        )
        got = {
            r["id"]: r["component"]
            for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_long_path_converges(self, spark):
        from clinical_api_etl_spark.operators.graph import connected_components
        from pyspark.sql import functions as F

        # path 0-1-2-...-19: worst-case diameter for min propagation
        edges = spark.range(19).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        out = connected_components(edges)
        assert out.filter(F.col("component") != 0).count() == 0
        assert out.count() == 20


class TestResize:
    def test_resize_requires_explicit_fake_without_codec(self, docs):
        from clinical_api_etl_spark.operators.multimodal import attach_media, resize_images

        if _pil_missing():
            with pytest.raises(NotImplementedError):
                resize_images(attach_media(docs), width=4, height=4)
        else:
            resize_images(attach_media(docs), width=4, height=4)

    @pytest.mark.skipif(
        _pil_missing(), reason="Pillow not installed in this container"
    )
    def test_real_png_resize_with_pil(self, spark):
        import io

        from PIL import Image

        from clinical_api_etl_spark.operators.multimodal import resize_images

        img = Image.new("L", (8, 8), color=128)
        buf = io.BytesIO()
        img.save(buf, "PNG")
        df = spark.createDataFrame(
            [(1, bytearray(buf.getvalue()), ("image", "image/png", 8, 8, None))],
            "doc_id long, payload binary, media struct<kind:string,mime:string,width:int,height:int,duration_ms:long>",
        )
        row = resize_images(df, width=4, height=4, fake=False).collect()[0]
        out = Image.open(io.BytesIO(bytes(row["payload"])))
        assert out.size == (4, 4)
        assert (row["media"]["width"], row["media"]["height"]) == (4, 4)

    def test_fake_resize_shapes_and_passthrough(self, docs):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.multimodal import attach_media, resize_images

        out = resize_images(attach_media(docs), width=4, height=4, fake=True)
        rows = out.collect()
        assert len(rows) == docs.count()
        for r in rows:
            if r["media"]["kind"] == "image":
                assert len(r["payload"]) == 16
                assert (r["media"]["width"], r["media"]["height"]) == (4, 4)
            else:  # non-images untouched
                assert r["media"]["width"] != 4 or r["media"]["kind"] != "image"
        # composes with the decode stage downstream
        from clinical_api_etl_spark.operators.multimodal import decode_media

        feats = decode_media(out, fake=True)
        assert feats.filter(F.col("kind") == "image").count() > 0


class TestKMeans:
    def test_matches_numpy_lloyd(self, spark):
        import numpy as np

        from clinical_api_etl_spark.operators.clustering import kmeans

        rng = np.random.RandomState(7)
        centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
        pts = np.vstack([c + rng.randn(20, 2) * 0.3 for c in centers])
        df = spark.createDataFrame(
            [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
            "vec_id long, embedding array<double>",
        )
        got = {r["id"]: r["cluster"] for r in kmeans(df, k=3, iterations=4).collect()}

        # numpy re-implementation with identical init/tie-break/iterations
        cents = pts[:3].copy()
        for _ in range(4):
            d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for c in range(3):
                if (a == c).any():
                    cents[c] = pts[a == c].mean(axis=0)
        d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        expect = d.argmin(axis=1)
        assert got == {i: int(expect[i]) for i in range(len(pts))}

    def test_deterministic_across_runs(self, spark):
        from clinical_api_etl_spark.operators.clustering import kmeans
        from clinical_api_etl_spark.sources.catalog import load

        emb = load(spark, "/root/testdata/sf0.001", "embeddings")
        a = sorted(map(tuple, kmeans(emb, k=4, iterations=3).collect()))
        b = sorted(map(tuple, kmeans(emb, k=4, iterations=3).collect()))
        assert a == b


class TestIvfTopk:
    def test_full_probe_equals_bruteforce(self, emb):
        """n_probe == n_clusters degrades to exact brute force — identical
        (query, neighbor, rank) triples and cosines as cosine_topk."""
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.similarity import cosine_topk, ivf_topk

        q = emb.filter(F.col("vec_id") < 5)
        exact = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
            for r in cosine_topk(q, emb, k=3).collect()
        }
        ivf = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
            for r in ivf_topk(
                q, emb, k=3, n_clusters=4, n_probe=4, kmeans_iterations=2
            ).collect()
        }
        assert ivf == exact

    def test_partial_probe_subset_and_ranked(self, emb):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.similarity import ivf_topk

        q = emb.filter(F.col("vec_id") < 5)
        rows = ivf_topk(q, emb, k=3, n_clusters=4, n_probe=1, kmeans_iterations=2).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, rs in by_q.items():
            ranks = sorted(r["rank"] for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rank"])]
            assert sims == sorted(sims, reverse=True)


class TestPackChunks:
    def test_greedy_packing_matches_python(self, spark):
        from clinical_api_etl_spark.operators.textstats import pack_chunks

        rows = [  # (doc, idx, n_tokens)
            (1, 0, 30), (1, 1, 30), (1, 2, 10), (1, 3, 64), (1, 4, 70),
            (2, 0, 64), (2, 1, 1),
        ]
        df = spark.createDataFrame(rows, "doc_id long, chunk_idx long, n_tokens int")
        got = {
            (r["doc_id"], r["chunk_idx"]): r["bin"]
            for r in pack_chunks(df, max_tokens=64).collect()
        }

        def pack(ns, cap=64):
            out, b, used = [], 0, 0
            for n in ns:
                if used + n <= cap or used == 0:
                    used += n
                else:
                    b += 1
                    used = n
                out.append(b)
            return out

        expect = {}
        for doc in (1, 2):
            ns = [n for d, i, n in rows if d == doc]
            for (d, i, n), b in zip([r for r in rows if r[0] == doc], pack(ns)):
                expect[(d, i)] = b
        assert got == expect
        # oversized chunk (70 > 64) got its own bin, never split
        assert got[(1, 4)] != got[(1, 3)]

    def test_bin_capacity_respected(self, spark):
        from clinical_api_etl_spark.operators.textstats import pack_chunks
        from pyspark.sql import functions as F

        df = spark.range(40).select(
            (F.col("id") % 4).alias("doc_id"),
            (F.col("id") / 4).cast("long").alias("chunk_idx"),
            ((F.col("id") % 7) * 3 + 5).cast("int").alias("n_tokens"),
        )
        packed = pack_chunks(df, max_tokens=20)
        over = (
            packed.groupBy("doc_id", "bin")
            .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("k"))
            .filter((F.col("tot") > 20) & (F.col("k") > 1))
        )
        assert over.count() == 0  # only single-chunk bins may exceed capacity


class TestSamplingAndSplits:
    def test_split_assign_deterministic_and_complete(self, docs, spark):
        from clinical_api_etl_spark.operators.sampling import split_assign

        a = {r["doc_id"]: r["split"] for r in split_assign(docs, "doc_id").collect()}
        b = {r["doc_id"]: r["split"] for r in split_assign(
            docs.repartition(7), "doc_id").collect()}
        assert a == b  # partitioning-independent
        n = len(a)
        frac_train = sum(1 for s in a.values() if s == "train") / n
        assert 0.7 < frac_train < 0.9  # hash-uniform around 0.8
        assert set(a.values()) <= {"train", "val", "test"}

    def test_stratified_sample_exact_counts(self, spark):
        from clinical_api_etl_spark.operators.sampling import stratified_sample
        from clinical_api_etl_spark.sources.catalog import load

        ev = load(spark, SF, "events").select("event_id", "event_type")
        got = stratified_sample(ev, ["event_type"], "event_id", fraction=0.1)
        import math

        want = {
            r["event_type"]: math.ceil(0.1 * r["n"])
            for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        per = {
            r["event_type"]: r["n"]
            for r in got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert per == want  # EXACT per-stratum sizes
        # sample is a subset of the input
        assert got.join(ev, ["event_id", "event_type"], "left_anti").count() == 0


class TestDecontamination:
    def test_planted_overlap_detected(self, spark):
        from clinical_api_etl_spark.operators.dedup import ngram_overlap

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        train = spark.createDataFrame(
            [
                (1, "prefix text the quick brown fox jumps over suffix"),  # leaked
                (2, "completely unrelated content about spark plans"),
                (3, "quick brown fox jumps over the lazy dog indeed"),  # leaked
            ],
            "doc_id long, text string",
        )
        got = {
            r["train_id"]: (r["n_shared"], r["n_bench_docs"])
            for r in ngram_overlap(train, bench, "doc_id", "text", n=5).collect()
        }
        assert set(got) == {1, 3}
        assert all(v[0] >= 1 and v[1] == 1 for v in got.values())


class TestPiiRedaction:
    def test_planted_pii_scrubbed(self, spark):
        from clinical_api_etl_spark.functions.text import pii_counts, redact_pii

        df = spark.createDataFrame(
            [
                (1, "mail alice.smith+x@corp.example.com now"),
                (2, "call +1-555-0199 or 12-345-678"),
                (3, "ssn 123-45-6789 leaked"),
                (4, "clean text, nothing to scrub"),
            ],
            "id long, text string",
        )
        out = {
            r["id"]: (r["red"], r["c"])
            for r in df.select(
                "id",
                redact_pii(F.col("text")).alias("red"),
                pii_counts(F.col("text")).alias("c"),
            ).collect()
        }
        assert out[1][0] == "mail [EMAIL] now"
        assert out[1][1]["email"] == 1
        assert "[PHONE]" in out[2][0] and "0199" not in out[2][0]
        assert out[3][0] == "ssn [SSN] leaked"
        assert out[4][0] == "clean text, nothing to scrub"
        assert tuple(out[4][1]) == (0, 0, 0)


class TestWinnowing:
    def test_shared_run_guarantees_shared_fingerprint(self, spark):
        """The winnowing guarantee (SIGMOD'03): two docs sharing a run of
        >= w+k-1 tokens (here 8) must share at least one fingerprint."""
        from clinical_api_etl_spark.functions.text import (
            winnow_fingerprints,
            winnow_select,
        )

        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        df = spark.createDataFrame(
            [(1, f"intro words {shared} tail one"),
             (2, f"totally different prefix {shared} other ending"),
             (3, "no overlap at all in this third document text")],
            "doc_id long, text string",
        )
        hashed = df.select("doc_id", winnow_fingerprints(F.col("text"), k=4).alias("h"))
        fps = {
            r["doc_id"]: set(r["fps"])
            for r in hashed.select(
                "doc_id", winnow_select(F.col("h"), w=5).alias("fps")
            ).collect()
        }
        assert fps[1] & fps[2], "shared 8-token run must share a fingerprint"
        assert not (fps[1] & fps[3])

    def test_density_below_full_shingling(self, docs):
        from clinical_api_etl_spark.functions.text import (
            winnow_fingerprints,
            winnow_select,
        )

        hashed = docs.select("doc_id", winnow_fingerprints(F.col("text"), k=4).alias("h"))
        out = hashed.select(
            F.size("h").alias("n_kgrams"),
            F.size(winnow_select(F.col("h"), w=5)).alias("n_sel"),
        ).agg(F.sum("n_kgrams").alias("k"), F.sum("n_sel").alias("s")).collect()[0]
        assert out["s"] < 0.6 * out["k"]  # ~2/(w+1)=1/3 expected density


class TestInt8Quantize:
    def test_roundtrip_error_bound(self, spark):
        """Dequantized values err by at most scale/2 per component, and
        quantized magnitudes never exceed 127."""
        from clinical_api_etl_spark.plans.extensions import emb_int8_quantize

        out = emb_int8_quantize(spark, SF).collect()
        assert all(r["q_max_abs"] <= 127 for r in out)
        import math

        emb = {r["vec_id"]: r["embedding"] for r in
               spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
        for r in out[:20]:
            v = [float(x) for x in emb[r["vec_id"]]]
            scale = r["scale"]
            q = [math.floor(x * scale + 0.5) for x in v]
            assert sum(q) == r["q_sum"]
            for x, qi in zip(v, q):
                assert abs(qi / scale - x) <= 0.5 / scale + 1e-12


class TestHashSample:
    def test_partitioning_invariant_and_near_fraction(self, spark):
        from clinical_api_etl_spark.operators.sampling import hash_sample
        from clinical_api_etl_spark.sources.catalog import load

        ev = load(spark, SF, "events").select("event_id")
        a = {r["event_id"] for r in hash_sample(ev, "event_id", fraction=0.1).collect()}
        b = {r["event_id"] for r in hash_sample(ev.repartition(5), "event_id", fraction=0.1).collect()}
        assert a == b
        n = ev.count()
        assert 0.05 * n < len(a) < 0.15 * n  # binomial around 10%
        # monotone: a larger fraction strictly contains a smaller one
        c = {r["event_id"] for r in hash_sample(ev, "event_id", fraction=0.2).collect()}
        assert a <= c


class TestProductQuantization:
    def test_matches_numpy_reference(self, spark):
        import numpy as np

        from clinical_api_etl_spark.operators.pq import pq_fit

        rng = np.random.RandomState(11)
        pts = rng.randn(60, 8) * 2.0
        df = spark.createDataFrame(
            [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
            "vec_id long, embedding array<double>",
        )
        out, books = pq_fit(df, m=2, k=4, iterations=3)
        got = {r["id"]: (list(r["codes"]), r["recon_err"]) for r in out.collect()}

        # numpy re-implementation: per-subspace Lloyd with identical
        # init (first k sample rows), low-index tie-break, fixed iters.
        def lloyd(sub):
            cents = sub[:4].copy()
            for _ in range(3):
                d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                a = d.argmin(axis=1)
                for c in range(4):
                    if (a == c).any():
                        cents[c] = sub[a == c].mean(axis=0)
            return cents

        cents = [lloyd(pts[:, s * 4 : (s + 1) * 4]) for s in range(2)]
        for s in range(2):
            assert np.allclose(cents[s], np.array(books[s]), atol=1e-9)
        for i, p in enumerate(pts):
            codes, err = got[i]
            expect_err = 0.0
            for s in range(2):
                sub = p[s * 4 : (s + 1) * 4]
                d = ((cents[s] - sub[None, :]) ** 2).sum(axis=1)
                assert codes[s] == int(d.argmin())
                expect_err += float(d.min())
            assert abs(err - expect_err) < 1e-6

    def test_deterministic_and_row_preserving(self, emb):
        from clinical_api_etl_spark.operators.pq import pq_fit

        a, _ = pq_fit(emb, m=8, k=16, iterations=2)
        b, _ = pq_fit(emb, m=8, k=16, iterations=2)
        ra = sorted((r["id"], tuple(r["codes"])) for r in a.collect())
        rb = sorted((r["id"], tuple(r["codes"])) for r in b.collect())
        assert ra == rb
        assert len(ra) == emb.count()


class TestIvfPq:
    def test_full_probe_full_refine_equals_exact(self, emb):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.pq import ivfpq_topk, l2_topk

        q = emb.filter(F.col("vec_id") < 5)
        exact = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["l2_sq"])
            for r in l2_topk(q, emb, k=3).collect()
        }
        got = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["l2_sq"])
            for r in ivfpq_topk(
                q, emb, k=3, n_clusters=4, n_probe=4, refine=10**6,
                kmeans_iterations=2,
            ).collect()
        }
        # identical (query, rank) -> neighbor; distances agree to fp noise
        # (l2_topk uses |q|²+|c|²-2⟨q,c⟩, refine folds Σ(a-b)² directly).
        assert set(got) == set(exact)
        for key, (nid, d) in got.items():
            enid, ed = exact[key]
            assert nid == enid
            assert abs(d - ed) < 1e-9

    def test_recall_floor_and_ranked(self, emb):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.pq import ivfpq_topk, l2_topk

        q = emb.filter(F.col("vec_id") < 10)
        exact = {
            (r["query_id"], r["neighbor_id"]) for r in l2_topk(q, emb, k=5).collect()
        }
        rows = ivfpq_topk(q, emb, k=5, n_clusters=8, n_probe=2, refine=10).collect()
        appr = {(r["query_id"], r["neighbor_id"]) for r in rows}
        assert len(exact & appr) / len(exact) >= 0.7
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for rs in by_q.values():
            assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
            d = [r["l2_sq"] for r in sorted(rs, key=lambda r: r["rank"])]
            assert d == sorted(d)


class TestMixtureUpsample:
    def test_exact_counts_and_python_replica(self, docs):
        """Per-domain output counts equal the integer targets and the
        chosen extra-epoch docs match an independent Python replica of the
        md5 ranking."""
        import hashlib

        from clinical_api_etl_spark.operators.sampling import mixture_upsample

        weights = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
        budget = 60
        rows = mixture_upsample(
            docs, "source", "doc_id", weights=weights, budget=budget
        ).collect()

        by_domain = {}
        for r in rows:
            by_domain.setdefault(r["source"], []).append(r)

        base = {
            r["source"]: r["ids"]
            for r in docs.groupBy("source")
            .agg(F.collect_list("doc_id").alias("ids"))
            .collect()
        }
        for d, w in weights.items():
            if d not in base:
                continue
            target = int(budget * w / sum(weights.values()))
            got = by_domain.get(d, [])
            assert len(got) == target  # exact budget share
            n = len(base[d])
            full, extra = divmod(target, n)
            ranked = sorted(
                base[d],
                key=lambda i: (hashlib.md5(str(i).encode()).hexdigest()[:4], i),
            )
            expect = {}
            for pos, i in enumerate(ranked):
                c = full + (1 if pos < extra else 0)
                if c:
                    expect[i] = c
            got_counts = {}
            for r in got:
                got_counts[r["doc_id"]] = got_counts.get(r["doc_id"], 0) + 1
                assert 1 <= r["epoch"] <= expect[r["doc_id"]]
            assert got_counts == expect

    def test_deterministic_rerun(self, docs):
        from clinical_api_etl_spark.operators.sampling import mixture_upsample

        kw = dict(weights={"src0": 1.0, "src1": 1.0}, budget=20)
        a = sorted(
            map(tuple, mixture_upsample(docs, "source", "doc_id", **kw).collect())
        )
        b = sorted(
            map(tuple, mixture_upsample(docs, "source", "doc_id", **kw).collect())
        )
        assert a == b and len(a) > 0


class TestCanonicalDocs:
    def test_one_canonical_per_group_with_max_score(self, spark):
        from clinical_api_etl_spark.operators.dedup import canonical_docs

        docs = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 20), (4, 5), (5, 50)],
            "doc_id long, n_chars long",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long"
        )  # {1,2,3} one group; 4, 5 singletons
        rows = {r["id"]: r for r in canonical_docs(docs, pairs).collect()}
        assert len(rows) == 5
        assert rows[1]["group"] == rows[2]["group"] == rows[3]["group"] == 1
        for i in (1, 2, 3):
            assert rows[i]["canonical_id"] == 2  # n_chars 30 wins
        assert rows[2]["is_canonical"] and not rows[1]["is_canonical"]
        for i in (4, 5):
            assert rows[i]["group"] == i and rows[i]["is_canonical"]
            assert rows[i]["canonical_id"] == i

    def test_tie_breaks_to_lowest_id(self, spark):
        from clinical_api_etl_spark.operators.dedup import canonical_docs

        docs = spark.createDataFrame(
            [(7, 10), (8, 10)], "doc_id long, n_chars long"
        )
        pairs = spark.createDataFrame([(7, 8)], "id_a long, id_b long")
        rows = {r["id"]: r for r in canonical_docs(docs, pairs).collect()}
        assert rows[7]["is_canonical"] and rows[7]["canonical_id"] == 7
        assert not rows[8]["is_canonical"] and rows[8]["canonical_id"] == 7


class TestVocabCoverage:
    def test_monotone_coverage_and_contiguous_ranks(self, spark):
        from clinical_api_etl_spark.plans.registry import all_queries

        df = all_queries()["text_vocab_coverage"].builder(spark, SF)
        rows = sorted(df.collect(), key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cov = [r["cum_coverage"] for r in rows]
        assert all(a <= b for a, b in zip(cov, cov[1:]))
        assert 0 < cov[-1] <= 1.0
        freqs = [r["freq"] for r in rows]
        assert freqs == sorted(freqs, reverse=True)


class TestComponentsFastPath:
    def test_driver_union_find_equals_distributed(self, spark):
        from clinical_api_etl_spark.operators.graph import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 1)],
            "id_a long, id_b long",
        )
        fast = {
            (r["id"], r["component"])
            for r in connected_components(edges).collect()
        }
        dist = {
            (r["id"], r["component"])
            for r in connected_components(edges, driver_max_edges=0).collect()
        }
        assert fast == dist
        assert fast == {
            (1, 1), (2, 1), (3, 1),
            (10, 10), (11, 10),
            (20, 20), (21, 20), (22, 20),
        }

    def test_empty_edges(self, spark):
        from clinical_api_etl_spark.operators.graph import connected_components

        edges = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(edges).count() == 0


class TestMatryoshkaRecall:
    def test_recall_bounds_and_exactness(self, spark):
        from clinical_api_etl_spark.plans.extensions import (
            _MRL_K,
            emb_matryoshka_recall,
        )

        rows = emb_matryoshka_recall(spark, SF).collect()
        assert len(rows) == 10  # one per query vector
        for r in rows:
            assert r["k"] == _MRL_K
            assert 0 <= r["n_hits"] <= _MRL_K
            assert r["recall"] == r["n_hits"] / _MRL_K
        # prefix dims carry signal: the truncated space must agree with
        # the full space on a nontrivial share of neighbors overall
        assert sum(r["n_hits"] for r in rows) > 0

    def test_full_width_truncation_is_identity(self, spark):
        """Truncating to all 64 dims must reproduce the exact top-k,
        i.e. recall 1.0 everywhere — pins the slice/cosine plumbing."""
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.similarity import cosine_topk
        from clinical_api_etl_spark.sources.catalog import load

        emb = load(spark, SF, "embeddings")
        trunc = emb.select("vec_id", F.slice("embedding", 1, 64).alias("embedding"))
        a = sorted(
            map(
                tuple,
                cosine_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)
                .select("query_id", "neighbor_id")
                .collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                cosine_topk(trunc.filter(F.col("vec_id") < 10), trunc, k=5)
                .select("query_id", "neighbor_id")
                .collect(),
            )
        )
        assert a == b


class TestLangidTrigram:
    def test_structural_invariants_and_synthetic_separability(self, spark):
        """The corpus has NO language signal (every lang shares one
        vocabulary — verified here), so accuracy is chance by
        construction; what must hold: every held-out doc with >=3 chars
        gets exactly one prediction, overlaps are within profile size,
        and a PLANTED separable language is classified perfectly."""
        import hashlib as _h

        from pyspark.sql import functions as F

        from clinical_api_etl_spark.plans.extensions import (
            _LID_PROFILE,
            text_langid_trigram_eval,
        )
        from clinical_api_etl_spark.sources.catalog import load

        rows = text_langid_trigram_eval(spark, SF).collect()
        docs = load(spark, SF, "documents").select("doc_id", "lang", "text").collect()
        test_docs = [
            r
            for r in docs
            if int(_h.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16) % 2 == 1
            and len(r["text"].strip()) >= 3
        ]
        assert sum(r["cnt"] for r in rows) == len(test_docs)
        for r in rows:
            assert 1 <= r["min_overlap"] <= r["max_overlap"] <= _LID_PROFILE

        # planted separable language: clone docs into a fake script
        base = load(spark, SF, "documents")
        fake = base.selectExpr(
            "doc_id + 1000000 AS doc_id",
            "translate(text, 'abcdefghijklmnopqrstuvwxyz', "
            "'αβγδεζηθικλμνξοπρστυφχψωςΩΔ') AS text",
            "'xx' AS lang",
            "source",
            "n_chars",
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            base.unionByName(fake).write.parquet(f"{d}/documents.parquet")
            planted = text_langid_trigram_eval(spark, d).collect()
        xx = [r for r in planted if r["lang"] == "xx"]
        assert xx and all(r["predicted"] == "xx" for r in xx)
        # and no real-language doc is pulled into the fake script
        assert not [r for r in planted if r["lang"] != "xx" and r["predicted"] == "xx"]


class TestVocabStatistics:
    """Chao1 / Good-Turing / RBO: python replays from first principles
    on sf0.001 (the oracle gates carry cross-engine bit-exactness)."""

    def _word_freqs(self, spark):
        from collections import Counter

        from clinical_api_etl_spark.sources.catalog import load

        docs = load(spark, "/root/testdata/sf0.001", "documents").collect()
        c: Counter = Counter()
        for r in docs:
            c.update(r["text"].strip().lower().split())
        return c

    def test_chao1_replay(self, spark):
        from clinical_api_etl_spark.plans.extensions import text_vocab_chao1

        row = text_vocab_chao1(spark, "/root/testdata/sf0.001").collect()[0]
        c = self._word_freqs(spark)
        f1 = sum(1 for v in c.values() if v == 1)
        f2 = sum(1 for v in c.values() if v == 2)
        n = sum(c.values())
        assert row["s_obs"] == len(c)
        assert row["n_tokens"] == n
        assert (row["f1"], row["f2"]) == (f1, f2)
        assert row["chao1"] == len(c) + (f1 * (f1 - 1)) / (2 * (f2 + 1))
        assert row["good_coverage"] == 1.0 - f1 / n
        assert row["chao1"] >= row["s_obs"]
        assert 0.0 <= row["good_coverage"] <= 1.0

    def test_good_turing_replay(self, spark):
        from clinical_api_etl_spark.plans.extensions import (
            _GT_MAX_R,
            text_good_turing_counts,
        )

        rows = {
            r["r"]: r
            for r in text_good_turing_counts(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert sorted(rows) == list(range(1, _GT_MAX_R + 1))
        c = self._word_freqs(spark)
        from collections import Counter

        h = Counter(c.values())
        for r in range(1, _GT_MAX_R + 1):
            nr, nr1 = h.get(r, 0), h.get(r + 1, 0)
            assert rows[r]["n_r"] == nr
            assert rows[r]["n_r1"] == nr1
            want = 0.0 if nr == 0 else ((r + 1) * nr1) / nr
            assert rows[r]["r_star"] == want

    def test_rbo_replay(self, spark):
        from clinical_api_etl_spark.plans.ranking import (
            _RBO_K,
            retrieval_rbo_rankings,
        )
        from clinical_api_etl_spark.sources.catalog import load

        row = retrieval_rbo_rankings(spark, "/root/testdata/sf0.001").collect()[0]
        li = load(spark, "/root/testdata/sf0.001", "lineitem").collect()
        from collections import defaultdict
        from decimal import Decimal

        rev: dict = defaultdict(int)
        cnt: dict = defaultdict(int)
        for r in li:
            p = int(Decimal(str(r["l_extendedprice"])).quantize(Decimal("0.01")) * 100)
            d = int(Decimal(str(r["l_discount"])).quantize(Decimal("0.01")) * 100)
            rev[r["l_partkey"]] += p * (100 - d)
            cnt[r["l_partkey"]] += 1
        ra = sorted(rev, key=lambda k: (-rev[k], k))[:_RBO_K]
        rb = sorted(cnt, key=lambda k: (-cnt[k], k))[:_RBO_K]
        pos_a = {k: i + 1 for i, k in enumerate(ra)}
        pos_b = {k: i + 1 for i, k in enumerate(rb)}
        mx = [max(pos_a[k], pos_b[k]) for k in pos_a if k in pos_b]
        pow_, s = 1.0, 0.0
        for d in range(1, _RBO_K + 1):
            a_d = sum(1 for m in mx if m <= d) / float(d)
            pow_, s = pow_ * 0.9, s + pow_ * a_d
        assert row["n_common"] == len(mx)
        assert row["rbo_min"] == (1.0 - 0.9) * s
        assert 0.0 <= row["rbo_min"] <= 1.0


class TestBurstiness:
    """text_burstiness_topk: python replay of the closed-integer VMR."""

    def test_python_replay(self, spark):
        from collections import Counter

        from clinical_api_etl_spark.plans.extensions import text_burstiness_topk
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = text_burstiness_topk(spark, sf).collect()
        assert len(rows) == 20
        docs = load(spark, sf, "documents").collect()
        n = len(docs)
        per_word: dict = {}
        for d in docs:
            for w, c in Counter(d["text"].strip().lower().split()).items():
                st = per_word.setdefault(w, [0, 0, 0])
                st[0] += 1; st[1] += c; st[2] += c * c
        vmr = {
            w: (n * ss - t * t) / (n * t)
            for w, (nd, t, ss) in per_word.items()
            if t >= 20
        }
        want = sorted(vmr, key=lambda w: (-vmr[w], w))[:20]
        assert [r["word"] for r in rows] == want
        for r in rows:
            nd, t, ss = per_word[r["word"]]
            assert (r["n_docs"], r["total"], r["sum_sq"]) == (nd, t, ss)
            assert r["vmr"] == vmr[r["word"]]  # bit-exact single division


class TestVocabGrowthCurve:
    """text_vocab_growth_curve: python replay + nested-subset
    monotonicity (the property the Heaps estimate rides on)."""

    def test_python_replay_and_monotone(self, spark):
        import hashlib

        from clinical_api_etl_spark.plans.extensions import (
            _VG_THRESH,
            text_vocab_growth_curve,
        )
        from clinical_api_etl_spark.sources.catalog import load

        sf = "/root/testdata/sf0.001"
        rows = {
            r["t"]: r for r in text_vocab_growth_curve(spark, sf).collect()
        }
        assert sorted(rows) == _VG_THRESH
        docs = load(spark, sf, "documents").collect()
        wmin: dict = {}
        buckets = []
        for d in docs:
            b = int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:2], 16)
            buckets.append(b)
            for w in set(d["text"].strip().lower().split()):
                wmin[w] = min(wmin.get(w, 256), b)
        prev_v = prev_d = 0
        for t in _VG_THRESH:
            nd = sum(1 for b in buckets if b <= t)
            v = sum(1 for b in wmin.values() if b <= t)
            row = rows[t]
            assert (row["n_docs"], row["vocab"]) == (nd, v)
            assert row["vocab_per_doc"] == v / nd
            assert nd >= prev_d and v >= prev_v  # nested subsets
            prev_d, prev_v = nd, v
        assert rows[255]["vocab"] == len(wmin)  # full corpus at the top
