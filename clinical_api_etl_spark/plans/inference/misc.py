"""SQL-surface parity, entity resolution, media kernels, journey/ops queries that grew up in the inference module.

Mechanical split of the former 4,878-line plans/inference.py (VERDICT r08 task 8); zero behavior change."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

from ._shared import _CENTS, _DAY_MS, _DAY_MS_I, _EDF_SRC, _HOUR_MS, _TOKS, _cents  # noqa: F401

QS = QuerySet()


_LATERAL_SQL = """
    SELECT n_name, c_custkey AS custkey, c_name, c_acctbal
    FROM {nation}, LATERAL (
      SELECT c_custkey, c_name, c_acctbal
      FROM {customer}
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    )
"""


@QS.add(
    "sql_lateral_topn",
    _LATERAL_SQL.format(nation="nation", customer="customer"),
    doc="[EXT] correlated LATERAL subquery with ORDER BY + LIMIT: the "
    "top-2 customers by account balance per nation, written as the "
    "for-each-row join the SQL surface owes power users — identical "
    "query text runs on DuckDB as the oracle. Catalyst decorrelates the "
    "lateral into a rank window over ONE customer shuffle (no per-nation "
    "re-scan), applies WindowGroupLimit so each map task keeps only its "
    "local top-2 per nation BEFORE the exchange, and broadcast-joins "
    "nation back — strictly better than the naive per-group window "
    "rewrite, and free at 100 TB. LIMIT ties broken by c_custkey for a "
    "deterministic boundary.",
    tags=("join", "sql", "window"),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql(_LATERAL_SQL.format(nation="lat_nation", customer="lat_customer"))


_GBALL_SQL = """
    SELECT event_type, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day_idx,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
    GROUP BY ALL
"""


@QS.add(
    "sql_group_by_all",
    _GBALL_SQL,
    doc="[EXT] GROUP BY ALL (the 2023 SQL-surface convenience both Spark 4 "
    "and DuckDB implement): grouping keys inferred as every non-aggregate "
    "select item. Near-identical query text runs on both engines (only "
    "the epoch-ms spelling differs); the Spark side proves the inference "
    "resolves to the same (event_type, day_idx) grouping by hash-matching "
    "the DuckDB result, exact cents discipline as everywhere.",
    tags=("agg", "sql"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("gball_events")
    return spark.sql(
        """
        SELECT event_type, CAST(unix_millis(ts) div 86400000 AS BIGINT) AS day_idx,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM gball_events WHERE value IS NOT NULL
        GROUP BY ALL
        """
    )


@QS.add(
    "er_resolve_customers",
    """
    WITH RECURSIVE pairs AS (
      SELECT l.c_custkey AS id_l, r.c_custkey AS id_r
      FROM customer l JOIN customer r ON l.c_custkey < r.c_custkey
      WHERE levenshtein(l.c_name, r.c_name) <= 1
    ),
    edges AS (
      SELECT id_l AS a, id_r AS b FROM pairs
      UNION ALL
      SELECT id_r, id_l FROM pairs
    ),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    walk(id, label) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.a, w.label FROM walk w JOIN edges e ON w.id = e.b
      WHERE w.label < e.a
    ),
    comp AS (SELECT id, MIN(label) AS component FROM walk GROUP BY id),
    resolved AS (
      SELECT c.c_custkey AS custkey,
             CAST(COALESCE(comp.component, c.c_custkey) AS BIGINT) AS canonical
      FROM customer c LEFT JOIN comp ON c.c_custkey = comp.id
    )
    SELECT custkey, canonical,
           CAST(COUNT(*) OVER (PARTITION BY canonical) AS BIGINT)
             AS cluster_size
    FROM resolved
    """,
    doc="[EXT] entity resolution end to end, hash-gated: SymSpell "
    "deletion-neighborhood blocking finds all name pairs within edit "
    "distance 1 (lossless on this shared-prefix corpus — the adversarial "
    "case for prefix filters), connected components merge transitive "
    "matches (A~B~C is one entity even when A≁C), and every customer "
    "resolves to the minimum custkey of its cluster (singletons to "
    "themselves) with the cluster size attached. The oracle rebuilds the "
    "whole pipeline from first principles — O(N²) levenshtein all-pairs "
    "+ a recursive-CTE transitive closure — so the hash check covers "
    "blocking losslessness AND closure correctness in one gate. Spark "
    "shape: bucketed candidate join, scale-adaptive components (driver "
    "union-find under 1M edges, min-label loop above), one window "
    "shuffle for sizes.",
    tags=("fuzzy", "graph", "dedup"),
    headline=True,
)
def er_resolve_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.fuzzy import edit_distance_self_join
    from clinical_api_etl_spark.operators.graph import connected_components

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    pairs = edit_distance_self_join(cust, "c_custkey", "c_name", max_dist=1)
    comps = connected_components(pairs, src="id_l", dst="id_r")
    resolved = cust.join(
        comps, cust.c_custkey == comps.id, "left"
    ).select(
        F.col("c_custkey").alias("custkey"),
        F.coalesce(F.col("component"), F.col("c_custkey"))
        .cast("long")
        .alias("canonical"),
    )
    w = Window.partitionBy("canonical")
    return resolved.select(
        "custkey",
        "canonical",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
    )


_SEQ_MIN_SUPPORT = 5


@QS.add(
    "seq_frequent_trigrams",
    f"""
    WITH seqs AS (
      SELECT user_id,
             list(event_type ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ),
    tri AS (
      SELECT g['e1'] AS e1, g['e2'] AS e2, g['e3'] AS e3
      FROM (
        SELECT unnest(list_transform(range(1, len(seq) - 1),
                 i -> {{'e1': seq[i], 'e2': seq[i + 1],
                        'e3': seq[i + 2]}})) AS g
        FROM seqs WHERE len(seq) >= 3
      )
    )
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM tri GROUP BY e1, e2, e3
    HAVING COUNT(*) >= {_SEQ_MIN_SUPPORT}
    """,
    doc="[EXT] sequential pattern mining at depth 3: every consecutive "
    "event-type trigram in each user's (ts, event_id)-ordered behavior "
    "stream, counted corpus-wide with a min-support floor — the "
    "clickstream/funnel-discovery primitive (SPADE/PrefixSpan's "
    "contiguous-trigram slice) next to the first-order Markov matrix "
    "(seq_transition_matrix). Shape: ONE groupBy builds the ordered "
    "per-user sequence (sort inside the aggregate, event_id tie-break — "
    "deterministic), trigrams expand via an index transform (no window, "
    "no self-join), and the count is a map-side-combinable aggregate "
    "over at most |event-types|³ groups.",
    tags=("sequence", "mining"),
)
def seq_frequent_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("seq")
    )
    grams = F.when(
        F.size("seq") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("seq") - 2),
            lambda i: F.struct(
                F.element_at("seq", i).alias("e1"),
                F.element_at("seq", i + 1).alias("e2"),
                F.element_at("seq", i + 2).alias("e3"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<e1:string,e2:string,e3:string>>"))
    return (
        seqs.select(F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy("g.e1", "g.e2", "g.e3")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= _SEQ_MIN_SUPPORT)
    )


@QS.add(
    "w16_cumulative_distinct_types",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(first_seen) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
    doc="[EXT] running COUNT(DISTINCT) per user — how many distinct event "
    "types each user has touched as of each event (the engagement-breadth "
    "feature). COUNT(DISTINCT) is not a window function in any engine; "
    "the standard rewrite flags each (user, type)'s FIRST occurrence "
    "(row_number = 1) and takes a running sum of the flags — two window "
    "passes over |events|, exact, deterministic via the event_id "
    "tie-break. Cost law: an explicit repartition on user_id up front "
    "satisfies BOTH windows' clustering requirements (HashPartitioning "
    "on a subset of the window keys), so the plan carries exactly ONE "
    "exchange — left to EnsureRequirements, each window would shuffle "
    "separately ((user, type) then (user)).",
    tags=("window",),
)
def w16_cumulative_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").repartition("user_id")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
    )


@QS.add(
    "mm_video_scene_cuts",
    """
    WITH docs2 AS (SELECT doc_id, 4 + doc_id % 3 AS nf FROM documents),
    fb AS (
      SELECT d.doc_id, f.f, k.k,
             CAST('0x' || substr(
                    md5('vf' || CAST(f.f AS VARCHAR) || ':'
                        || CAST(d.doc_id AS VARCHAR)),
                    CAST(k.k * 2 + 1 AS INT), 2) AS INTEGER) AS b
      FROM docs2 d
      JOIN (SELECT UNNEST(range(0, 16)) AS f) f ON f.f < d.nf
      CROSS JOIN (SELECT UNNEST(range(0, 16)) AS k) k
    ),
    pairs AS (
      SELECT a.doc_id, a.f AS frame_idx,
             CAST(SUM(abs(b2.b - a.b)) AS BIGINT) AS l1_dist
      FROM fb a JOIN fb b2
        ON a.doc_id = b2.doc_id AND b2.f = a.f + 1 AND a.k = b2.k
      GROUP BY a.doc_id, a.f
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, l1_dist,
           l1_dist > 2000 AS is_cut
    FROM pairs
    """,
    doc="[EXT] video shot segmentation: per consecutive frame pair, the "
    "exact integer L1 pixel distance and a scene-cut flag, computed by a "
    "zero-copy numpy Arrow kernel over a packed-frames binary column "
    "(operators/multimodal.py:video_scene_cuts). Frames are synthesized "
    "deterministically from md5 (no codecs in the container), so like "
    "mm_audio_features — and unlike codec-gated decode paths — this "
    "media kernel is FULLY value-hash-gated: DuckDB re-derives every "
    "frame byte from the same hex and must reproduce the kernel's "
    "distances and cut flags exactly, ragged per-doc frame counts "
    "included. Declared Arrow op (plan_audit ARROW_OK).",
    tags=("multimodal",),
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        synth_frames,
        video_scene_cuts,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return video_scene_cuts(synth_frames(docs)).select(
        "doc_id", "frame_idx", "l1_dist", "is_cut"
    )


@QS.add(
    "mm_image_tile_stats",
    """
    WITH px AS (
      SELECT d.doc_id, g.i,
             CAST('0x' || substr(
                    md5('im' || CAST(g.i // 16 AS VARCHAR) || ':'
                        || CAST(d.doc_id AS VARCHAR)),
                    CAST((g.i % 16) * 2 + 1 AS INT), 2) AS INTEGER) AS b
      FROM documents d, (SELECT UNNEST(range(0, 64)) AS i) g
    ),
    pos AS (
      SELECT doc_id, i, b, i % 8 AS c,
             (i // 8) // 4 * 2 + (i % 8) // 4 AS tile_idx
      FROM px
    ),
    edges AS (
      SELECT a.doc_id, a.tile_idx,
             CAST(SUM(CASE WHEN abs(b2.b - a.b) > 64 THEN 1 ELSE 0 END)
                  AS BIGINT) AS h_edges
      FROM pos a JOIN pos b2 ON a.doc_id = b2.doc_id AND b2.i = a.i + 1
      WHERE a.c % 4 < 3
      GROUP BY a.doc_id, a.tile_idx
    ),
    stats AS (
      SELECT doc_id, tile_idx, CAST(COUNT(*) AS BIGINT) AS n_px,
             CAST(SUM(b) AS BIGINT) AS sum_px,
             CAST(SUM(b * b) AS BIGINT) AS sum_sq
      FROM pos GROUP BY doc_id, tile_idx
    )
    SELECT s.doc_id, CAST(s.tile_idx AS BIGINT) AS tile_idx, s.n_px,
           s.sum_px, s.sum_sq, e.h_edges
    FROM stats s
    JOIN edges e ON s.doc_id = e.doc_id AND s.tile_idx = e.tile_idx
    """,
    doc="[EXT] image patch statistics — per 4x4 tile of an 8x8 grayscale "
    "binary column: pixel sum, sum of squares, and horizontal-edge count "
    "(|Δ| > 64), the patch-level screens (contrast, blur, flat-region) "
    "vision curation runs before embedding. Third media byte-kernel "
    "under a FULL value hash: images are md5-derived "
    "(operators/multimodal.py:synth_image), the numpy Arrow kernel "
    "computes exact integers, and DuckDB re-derives every pixel and "
    "every within-tile gradient pair from the same hex. Declared Arrow "
    "op (plan_audit ARROW_OK).",
    tags=("multimodal",),
)
def mm_image_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        image_tile_stats,
        synth_image,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return image_tile_stats(synth_image(docs)).select(
        "doc_id", "tile_idx", "n_px", "sum_px", "sum_sq", "h_edges"
    )


@QS.add(
    "asof_next_error_after_purchase",
    """
    WITH e AS (
      SELECT user_id, ts, MAX(event_id) AS error_id
      FROM events WHERE event_type = 'error'
      GROUP BY user_id, ts
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.ts,
           COALESCE(e.ts, TIMESTAMP '1970-01-01 00:00:00') AS ts_matched,
           COALESCE(e.error_id, -1) AS error_id_matched
    FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts <= e.ts
    """,
    doc="[EXT] FORWARD as-of join: each purchase matched to the user's "
    "next error at-or-after it — the time-to-failure / "
    "did-the-conversion-precede-a-problem attribution that the backward "
    "as-of (asof_purchase_attribution) cannot express. Same union + "
    "keyed sort + running last_value log-merge, scanning the merged log "
    "in reverse (`__t` DESC) — identical one-shuffle cost law, "
    "skew-robust, no nested loop. The DuckDB oracle uses native ASOF "
    "LEFT JOIN with the <= inequality, so two independent formulations "
    "of nearest-following must agree exactly; right side deduped per "
    "(user, ts), NULLs coalesced to sentinels.",
    tags=("join", "temporal", "window"),
)
def asof_next_error_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.temporal import asof_join

    ev = load(spark, sf_dir, "events")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("error_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    out = asof_join(
        purchases,
        errors,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["error_id"],
        direction="forward",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "ts",
        F.coalesce(
            F.col("ts_matched"), F.lit("1970-01-01 00:00:00").cast("timestamp")
        ).alias("ts_matched"),
        F.coalesce(F.col("error_id_matched"), F.lit(-1)).alias("error_id_matched"),
    )


@QS.add(
    "agg_mode_per_type",
    f"""
    WITH t AS (
      SELECT event_type AS g, {_CENTS} AS x
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT g, x, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY g, x
    ),
    ranked AS (
      SELECT g, x, n,
             row_number() OVER (PARTITION BY g ORDER BY n DESC, x) AS rk
      FROM c
    )
    SELECT g AS event_type, x AS mode_cents, n AS mode_count
    FROM ranked WHERE rk = 1
    """,
    doc="[EXT] grouped mode with DETERMINISTIC ties: the most frequent "
    "value-cents per event type, ties resolved to the smallest value — "
    "built-in mode() in both engines leaves tie order unspecified, so "
    "the portable form is counts + a rank window with an explicit total "
    "order. Cost: the window runs over the (group, value) histogram, "
    "never events (the same collapse every rank statistic here uses).",
    tags=("agg", "stats"),
)
def agg_mode_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(F.col("event_type").alias("g"), _cents().alias("x"))
    c = t.groupBy("g", "x").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("g").orderBy(F.col("n").desc(), "x")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("g").alias("event_type"),
            F.col("x").alias("mode_cents"),
            F.col("n").alias("mode_count"),
        )
    )


@QS.add(
    "mm_curation_scorecard",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    au AS (
      SELECT d.doc_id,
             CAST(SUM(CAST(CASE WHEN us >= 32768 THEN us - 65536 ELSE us END
                           AS BIGINT)
                      * CAST(CASE WHEN us >= 32768 THEN us - 65536 ELSE us END
                             AS BIGINT)) AS BIGINT) AS audio_energy
      FROM documents d,
           (SELECT UNNEST(range(0, 32)) AS i) g,
           LATERAL (
             SELECT CAST('0x' || substr(
                      md5('au' || CAST(g.i // 8 AS VARCHAR) || ':'
                          || CAST(d.doc_id AS VARCHAR)),
                      CAST((g.i % 8) * 4 + 1 AS INT), 2) AS INTEGER)
                    + 256 * CAST('0x' || substr(
                      md5('au' || CAST(g.i // 8 AS VARCHAR) || ':'
                          || CAST(d.doc_id AS VARCHAR)),
                      CAST((g.i % 8) * 4 + 3 AS INT), 2) AS INTEGER) AS us
           ) uu
      GROUP BY d.doc_id
    ),
    vfb AS (
      SELECT d.doc_id, f.f, k.k,
             CAST('0x' || substr(
                    md5('vf' || CAST(f.f AS VARCHAR) || ':'
                        || CAST(d.doc_id AS VARCHAR)),
                    CAST(k.k * 2 + 1 AS INT), 2) AS INTEGER) AS b
      FROM (SELECT doc_id, 4 + doc_id % 3 AS nf FROM documents) d
      JOIN (SELECT UNNEST(range(0, 16)) AS f) f ON f.f < d.nf
      CROSS JOIN (SELECT UNNEST(range(0, 16)) AS k) k
    ),
    vc AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN l1 > 2000 THEN 1 ELSE 0 END) AS BIGINT)
               AS video_cuts
      FROM (
        SELECT a.doc_id, a.f, CAST(SUM(abs(b2.b - a.b)) AS BIGINT) AS l1
        FROM vfb a JOIN vfb b2
          ON a.doc_id = b2.doc_id AND b2.f = a.f + 1 AND a.k = b2.k
        GROUP BY a.doc_id, a.f
      ) GROUP BY doc_id
    ),
    ie AS (
      SELECT d.doc_id,
             CAST(SUM(CASE WHEN abs(b2 - b1) > 64 THEN 1 ELSE 0 END)
                  AS BIGINT) AS img_edges
      FROM documents d,
           (SELECT UNNEST(range(0, 64)) AS i) g,
           LATERAL (
             SELECT CAST('0x' || substr(
                      md5('im' || CAST(g.i // 16 AS VARCHAR) || ':'
                          || CAST(d.doc_id AS VARCHAR)),
                      CAST((g.i % 16) * 2 + 1 AS INT), 2) AS INTEGER) AS b1,
                    CAST('0x' || substr(
                      md5('im' || CAST((g.i + 1) // 16 AS VARCHAR) || ':'
                          || CAST(d.doc_id AS VARCHAR)),
                      CAST(((g.i + 1) % 16) * 2 + 1 AS INT), 2) AS INTEGER)
                      AS b2
           ) bb
      WHERE (g.i % 8) % 4 < 3
      GROUP BY d.doc_id
    )
    SELECT toks.doc_id, toks.n_tokens, au.audio_energy, vc.video_cuts,
           ie.img_edges,
           toks.n_tokens >= 10 AND au.audio_energy >= 10000000000
             AND vc.video_cuts = 0 AND ie.img_edges >= 20 AS keep
    FROM toks
    JOIN au ON toks.doc_id = au.doc_id
    JOIN vc ON toks.doc_id = vc.doc_id
    JOIN ie ON toks.doc_id = ie.doc_id
    """,
    doc="[EXT] multimodal curation scorecard: per document, token count, "
    "total audio energy, video scene-cut count, and image edge total — "
    "all four modalities' Arrow kernels composed in ONE query — plus the "
    "integer-threshold keep/drop verdict a multimodal training-data "
    "filter applies. Everything is exact BIGINTs, so the DuckDB oracle "
    "(which re-derives every sample, frame byte, and pixel from the md5 "
    "hex) hash-matches the whole scorecard including the boolean. NOTE "
    "the image edge definition here is per-IMAGE horizontal pairs "
    "(g.i%8<7 — row-interior), which equals the sum of per-tile counts "
    "only when tile boundaries are respected: the oracle uses the "
    "row-interior form and the Spark side re-aggregates the TILE kernel, "
    "so the cross-tile column (c=3->4) pairs are excluded on BOTH sides "
    "via the tile kernel's definition... (see test: the two definitions "
    "are reconciled by construction).",
    tags=("multimodal",),
)
def mm_curation_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        audio_frame_features,
        image_tile_stats,
        synth_frames,
        synth_image,
        synth_pcm,
        video_scene_cuts,
    )
    from clinical_api_etl_spark.functions.text import token_count

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    ids = docs.select("doc_id")
    au = (
        audio_frame_features(synth_pcm(ids))
        .groupBy("doc_id")
        .agg(F.sum("sum_sq").cast("long").alias("audio_energy"))
    )
    vc = (
        video_scene_cuts(synth_frames(ids))
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("is_cut"), 1).otherwise(0))
            .cast("long")
            .alias("video_cuts")
        )
    )
    ie = (
        image_tile_stats(synth_image(ids))
        .groupBy("doc_id")
        .agg(F.sum("h_edges").cast("long").alias("img_edges"))
    )
    out = toks.join(au, "doc_id").join(vc, "doc_id").join(ie, "doc_id")
    keep = (
        (F.col("n_tokens") >= 10)
        & (F.col("audio_energy") >= 10000000000)
        & (F.col("video_cuts") == 0)
        & (F.col("img_edges") >= 20)
    )
    return out.select(
        "doc_id", "n_tokens", "audio_energy", "video_cuts", "img_edges",
        keep.alias("keep"),
    )


@QS.add(
    "session_entry_exit_paths",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 21600000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    ),
    paths AS (
      SELECT user_id, session_id,
             first_value(event_type) OVER ws AS entry_type,
             last_value(event_type) OVER
               (PARTITION BY user_id, session_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS exit_type,
             row_number() OVER ws AS rn
      FROM s
      WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
    )
    SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths WHERE rn = 1 GROUP BY entry_type, exit_type
    """,
    doc="[EXT] session journey analysis: how do sessions BEGIN and END? "
    "Reuses the 6h-gap sessionization (w5's lag + running-sum ids), then "
    "one aggregate picks each session's entry and exit event types via "
    "min_by/max_by over the (ts, event_id) total order (the oracle's "
    "window first/last twin — DuckDB arg_min lacks struct keys) and a "
    "k²-bounded count gives the entry→exit matrix (the landing/bounce "
    "analysis next to the step-transition Markov matrix). Both engines' "
    "argmin/argmax compare the same struct order, so the path matrix "
    "hash-matches.",
    tags=("window", "sequence"),
)
def session_entry_exit_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # w5's sessionize_batch returns per-session roll-ups; this needs
    # per-event session ids, so the id assignment (same gap, same
    # windows) is rebuilt inline.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
            > 21600000
        ),
        1,
    ).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum(new_session).over(run).alias("session_id"),
    )
    order = F.struct("ts", "event_id")
    paths = s.groupBy("user_id", "session_id").agg(
        F.min_by("event_type", order).alias("entry_type"),
        F.max_by("event_type", order).alias("exit_type"),
    )
    return paths.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )


@QS.add(
    "dq_freshness_lag",
    """
    WITH m AS (
      SELECT event_type, MAX(ts) AS last_ts,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    gmax AS (SELECT MAX(ts) AS global_last FROM events)
    SELECT m.event_type, m.n, m.last_ts,
           CAST(epoch_ms(gmax.global_last) - epoch_ms(m.last_ts) AS BIGINT)
             AS lag_ms
    FROM m CROSS JOIN gmax
    """,
    doc="[EXT] per-stream freshness: how far each event type's latest "
    "event trails the table's watermark (global max ts) — THE first "
    "operational data-quality pager for multi-source ingestion (a stuck "
    "upstream shows as a growing lag long before volumes look wrong). "
    "Exact millisecond integers relative to the in-data watermark, so "
    "the check is reproducible (no now() — wall-clock freshness is this "
    "minus one constant). Two map-side-combinable MAX aggregates and a "
    "1-row cross join.",
    tags=("quality",),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).cast("long").alias("n")
    )
    gmax = ev.agg(F.max("ts").alias("global_last"))
    return m.crossJoin(F.broadcast(gmax)).select(
        "event_type",
        "n",
        "last_ts",
        (
            F.unix_millis(F.col("global_last")) - F.unix_millis(F.col("last_ts"))
        )
        .cast("long")
        .alias("lag_ms"),
    )


@QS.add(
    "graph_assortativity",
    """
    WITH e0 AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= 2
    ),
    sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    deg AS (
      SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u
    ),
    xy AS (
      SELECT du.d AS x, dv.d AS y
      FROM sym
      JOIN deg du ON sym.u = du.node
      JOIN deg dv ON sym.v = dv.node
    ),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM xy
    )
    SELECT n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
           CAST(n * syy - sy * sy AS BIGINT) AS den_y,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
    FROM c
    """,
    doc="[EXT] degree assortativity of the part co-purchase graph "
    "(support ≥ 2, same edge definition as graph_triangle_count): the "
    "Pearson correlation of endpoint degrees over all directed edges — "
    "Newman's do-hubs-connect-to-hubs diagnostic that decides whether "
    "degree-based sampling or salting is needed before heavier graph "
    "algorithms. Degrees come from one aggregate over the symmetrized "
    "edge list, the (x, y) pairs from two broadcast-scale degree joins, "
    "and the statistic is the exact BIGINT Pearson component form with "
    "the fixed float finish — hash-matched end to end over a "
    "graph-valued input.",
    tags=("graph", "stats"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("u", "v")
    )
    sym = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    du = deg.select(F.col("u").alias("nu"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("nv"), F.col("d").alias("y"))
    xy = (
        sym.join(F.broadcast(du), F.col("u") == F.col("nu"))
        .join(F.broadcast(dv), F.col("v") == F.col("nv"))
        .select("x", "y")
    )
    c = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return c.select(
        "n",
        num.cast("long").alias("num"),
        den_x.cast("long").alias("den_x"),
        den_y.cast("long").alias("den_y"),
        (
            num.cast("double")
            / (F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double")))
        ).alias("r"),
    )


# ---------------------------------------------------------------------------
# Aggregate FILTER clause (SQL:2003 surface parity).
# ---------------------------------------------------------------------------


@QS.add(
    "sql_filter_clause_aggregates",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null,
           CAST(COUNT(*) FILTER (
             WHERE CAST(value AS DECIMAL(18,2)) >= 500) AS BIGINT) AS n_big,
           CAST(COALESCE(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  FILTER (WHERE CAST(value AS DECIMAL(18,2)) >= 500), 0)
                AS BIGINT) AS big_cents,
           CAST(COUNT(DISTINCT user_id) FILTER (
             WHERE event_type IS NOT NULL) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
    doc="[EXT] SQL:2003 aggregate FILTER clause parity (the declarative "
    "form of conditional aggregation — Spark 4 and DuckDB both parse "
    "it): per event type, total/null/above-threshold counts, a filtered "
    "SUM (coalesced — a never-matching filter returns NULL on both "
    "engines, and NULL vs 0 is a hash mismatch), and a filtered "
    "COUNT(DISTINCT). IDENTICAL query text on both engines; exact cents "
    "discipline. The unfiltered twin of every column exists across "
    "a3/a17 — this row pins that the FILTER spelling compiles to the "
    "same conditional-aggregate plan Spark's CASE WHEN form produces.",
    tags=("agg", "sql"),
)
def sql_filter_clause_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("fltr_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null,
               CAST(COUNT(*) FILTER (
                 WHERE CAST(value AS DECIMAL(18,2)) >= 500) AS BIGINT) AS n_big,
               CAST(COALESCE(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                      FILTER (WHERE CAST(value AS DECIMAL(18,2)) >= 500), 0)
                    AS BIGINT) AS big_cents,
               CAST(COUNT(DISTINCT user_id) FILTER (
                 WHERE event_type IS NOT NULL) AS BIGINT) AS n_users
        FROM fltr_events
        GROUP BY event_type
        """
    )
