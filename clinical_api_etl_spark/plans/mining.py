"""[EXT] Round-6 data-mining surfaces.

The reference has no analogue for any of these (its string handling is
exact normalization, ``etl.py:109-150``; no graph/sketch/stats surface) —
they are the [EXT] operations a large-scale training-data pipeline needs:

- fuzzy matching (symmetric-delete edit-distance join);
- graph analytics (frequent-pair triangles, k-core peeling, deterministic
  random walks + skip-gram pairs — three iterative algorithms under full
  value hashes via unrolled MATERIALIZED CTE oracles);
- mergeable sketches (count-min; theta set algebra);
- multi-dimensional layout (Morton/Z-order codes);
- sampling (weighted Bernoulli, group-holdout splits, negative sampling);
- embedding algebra (label centroids, inter-label affinity, Gram matrix);
- media kernels (hash-gated audio PCM features; zlib quality signal);
- exact-arithmetic statistics (Pearson, Spearman, CUSUM change-points,
  MAD, Gini, chi-square components, winsorization, equi-depth histograms,
  seasonal-naive forecast MAE, Theil-Sen grouped-map);
- association rules; cross-engine table digests; declarative expectations;
- sequence surfaces (ordered fingerprints, no-global-sort enumeration);
- text cleaning (stutter removal, canonical normalization).

Everything is DuckDB-hash-gated except ``text_compression_ratio`` (no SQL
deflate); the recurring portability tricks:

- numeric hash slots via ``conv(substr(md5(x),1,4),16,10)`` on the Spark
  side and ``CAST('0x' || substr(md5(x),1,4) AS INTEGER)`` on DuckDB —
  identical 16-bit integers from the same md5 hex;
- exact integer arithmetic everywhere a float boundary could diverge
  (counts, cents, micro-units, floor-div), with floats admitted to the
  hash only as single correctly-rounded IEEE ops over exact integers;
- deterministic ties everywhere ranks/argmax appear (unique-id tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

QS = QuerySet()


# ---------------------------------------------------------------------------
# Fuzzy (edit-distance) self-join on customer names — Ed-Join.
# ---------------------------------------------------------------------------


@QS.add(
    "fuzzy_name_matches",
    """
    SELECT l.c_custkey AS id_l, r.c_custkey AS id_r,
           CAST(levenshtein(l.c_name, r.c_name) AS INT) AS dist
    FROM customer l JOIN customer r ON l.c_custkey < r.c_custkey
    WHERE levenshtein(l.c_name, r.c_name) <= 1
    """,
    doc="[EXT] edit-distance similarity self-join (entity resolution): all "
    "customer-name pairs within levenshtein distance 1, found via Ed-Join "
    "prefix filtering (rarest-q-gram candidate join + exact verify) "
    "instead of the oracle's O(N^2) all-pairs scan. The prefix filter is "
    "LOSSLESS (count-filter bound), so the output hash-matches the naive "
    "oracle exactly. operators/fuzzy.py:edit_distance_self_join.",
    headline=True,
    tags=("fuzzy",),
)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.fuzzy import edit_distance_self_join

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return edit_distance_self_join(cust, "c_custkey", "c_name", max_dist=1).select(
        F.col("id_l"), F.col("id_r"), F.col("dist")
    )


# ---------------------------------------------------------------------------
# Triangle counting over the part co-purchase graph.
# ---------------------------------------------------------------------------

_TRI_SUPPORT = 2

_TRI_ORACLE = f"""
WITH e0 AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_TRI_SUPPORT}
),
sym AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM sym GROUP BY u),
o AS (
  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS x,
         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS y,
         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN dv.deg ELSE du.deg END AS ydeg
  FROM e0 e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
tri AS (
  SELECT COUNT(*) AS n
  FROM o e1
  JOIN o e2 ON e1.x = e2.x AND (e1.ydeg, e1.y) < (e2.ydeg, e2.y)
  JOIN o e3 ON e3.x = e1.y AND e3.y = e2.y
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg)      AS n_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e0)       AS n_edges,
       (SELECT CAST(n AS BIGINT) FROM tri)             AS n_triangles
"""


@QS.add(
    "graph_triangle_count",
    _TRI_ORACLE,
    doc="[EXT] exact triangle count over the part co-purchase graph (edge = "
    "two parts co-ordered in >= 2 distinct orders — the frequent-pair "
    "support threshold that keeps the graph sparse as the corpus grows; "
    "pair generation is a self-equi-join on l_orderkey feeding ONE "
    "map-side-combinable count). Degree-ordered edge orientation "
    "(Schank-Wagner node-iterator): every triangle is generated exactly "
    "once from its lowest-degree vertex, so wedge fan-out is bounded by "
    "the graph's degeneracy, not its max degree — the standard "
    "shuffle-optimal MapReduce formulation. Edges build from one "
    "self-equi-join on l_orderkey (never a cartesian); the degree table "
    "broadcasts. Exact BIGINT counts hash-match DuckDB's identical "
    "3-way-join twin.",
    headline=True,
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    # persist: five plan branches (deg, e1..e3, the edge count) would each
    # re-run the pair-generation join + count otherwise. coalesce(8): the
    # support filter bounds the edge list to a few k rows; 64 cached
    # partitions would pay 64 task launches in every downstream stage.
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _TRI_SUPPORT)
        .select("u", "v")
        .coalesce(8)
        .persist()
    )
    sym = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count("*").cast("long").alias("deg"))

    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    keyed = e0.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    u_first = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    o = keyed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ydeg"),
    ).persist()

    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    wedges = e1.join(
        e2,
        (F.col("e1.x") == F.col("e2.x"))
        & (
            F.struct(F.col("e1.ydeg"), F.col("e1.y"))
            < F.struct(F.col("e2.ydeg"), F.col("e2.y"))
        ),
    ).select(F.col("e1.y").alias("w1"), F.col("e2.y").alias("w2"))
    tri = wedges.join(
        e3, (F.col("w1") == F.col("e3.x")) & (F.col("w2") == F.col("e3.y"))
    ).agg(F.count("*").cast("long").alias("n"))

    return (
        deg.agg(F.count("*").cast("long").alias("n_vertices"))
        .crossJoin(e0.agg(F.count("*").cast("long").alias("n_edges")))
        .crossJoin(tri.select(F.col("n").alias("n_triangles")))
    )


# ---------------------------------------------------------------------------
# Morton (Z-order) codes — the multi-dimensional clustering key.
# ---------------------------------------------------------------------------


def _morton_oracle() -> str:
    from clinical_api_etl_spark.sources.layout import morton_interleave_sql

    u = "((CAST(user_id AS BIGINT) % 65536) + 65536) % 65536"
    c = (
        "((CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS BIGINT)"
        " % 65536) + 65536) % 65536"
    )
    z = morton_interleave_sql([f"({u})", f"({c})"], bits=16)
    return f"""
    SELECT event_id, CAST({z} AS BIGINT) AS z
    FROM events WHERE value IS NOT NULL
    """


@QS.add(
    "layout_morton_codes",
    _morton_oracle(),
    doc="[EXT] Morton / Z-order interleave of (user_id, exact cents) — the "
    "clustering key behind sources/layout.py:write_zordered (OPTIMIZE "
    "ZORDER analogue: range-cluster on the code and row-group min/max "
    "stats prune on BOTH dimensions). The interleave is a branch-free "
    "sum of 32 shift-mask BIGINT terms — whole-stage codegen, no UDF — "
    "and the byte-identical expression text runs as the DuckDB oracle.",
    tags=("layout",),
)
def layout_morton_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.sources.layout import morton_interleave

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    u16 = ((F.col("user_id").cast("long") % 65536) + 65536) % 65536
    c16 = ((cents % 65536) + 65536) % 65536
    return ev.select(
        "event_id",
        morton_interleave([u16, c16], bits=16).cast("long").alias("z"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimates with a one-sided guarantee.
# ---------------------------------------------------------------------------

_CM_D = 3
_CM_W = 512


def _cm_slot_sql(d: int) -> str:
    return (
        f"CAST('0x' || substr(md5('cm{d}:' || CAST(user_id AS VARCHAR)), 1, 4)"
        f" AS INTEGER) % {_CM_W}"
    )


_CM_ORACLE = f"""
WITH rows_d AS (
  SELECT d.d AS d,
         CASE d.d WHEN 0 THEN {_cm_slot_sql(0)}
                  WHEN 1 THEN {_cm_slot_sql(1)}
                  ELSE {_cm_slot_sql(2)} END AS slot
  FROM events, (SELECT UNNEST(range(0, {_CM_D})) AS d) d
),
sketch AS (
  SELECT d, slot, CAST(COUNT(*) AS BIGINT) AS c FROM rows_d GROUP BY d, slot
),
truth AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM events GROUP BY user_id
),
est AS (
  SELECT t.user_id, t.true_cnt,
         LEAST(s0.c, s1.c, s2.c) AS cm_est
  FROM truth t
  JOIN sketch s0 ON s0.d = 0 AND s0.slot = {_cm_slot_sql(0)}
  JOIN sketch s1 ON s1.d = 1 AND s1.slot = {_cm_slot_sql(1)}
  JOIN sketch s2 ON s2.d = 2 AND s2.slot = {_cm_slot_sql(2)}
)
SELECT user_id, true_cnt, cm_est,
       CAST(cm_est - true_cnt AS BIGINT) AS overcount,
       cm_est >= true_cnt AS never_under
FROM est
"""


@QS.add(
    "sketch_cm_user_counts",
    _CM_ORACLE,
    doc="[EXT] count-min sketch (Cormode-Muthukrishnan): depth 3 x width "
    f"{_CM_W} frequency sketch over event user_ids, slots derived from "
    "md5 so both engines replay the identical sketch. The sketch is the "
    "mergeable form of a frequency table — partial sketches from any "
    "partitioning SUM cell-wise (it is built here as a groupBy over "
    "(depth, slot), i.e. map-side combinable; ~1.5k rows of state "
    "regardless of corpus size). Estimate = min over depths; the "
    "one-sided guarantee (never an undercount) is exported as a column "
    "the hash gate pins to TRUE for every key.",
    tags=("sketch",),
)
def sketch_cm_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id")

    def slot(d: int, col: str = "user_id") -> F.Column:
        h = F.md5(F.concat(F.lit(f"cm{d}:"), F.col(col).cast("string")))
        return (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % _CM_W).alias(
            f"slot{d}"
        )

    rows_d = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), slot(d).alias("slot"))
                    for d in range(_CM_D)
                ]
            )
        ).alias("e")
    ).select("e.d", "e.slot")
    sketch = rows_d.groupBy("d", "slot").agg(F.count("*").cast("long").alias("c"))

    truth = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("true_cnt"))
    # One (d, slot) equi-join against the whole sketch (broadcast — its size
    # is fixed at depth x width), then min over the d matched cells: no
    # per-depth filtered branches, works for any depth.
    probes = truth.select(
        "user_id",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("d"), slot(d).alias("slot"))
                    for d in range(_CM_D)
                ]
            )
        ).alias("p"),
    ).select("user_id", "true_cnt", "p.d", "p.slot")
    est = (
        probes.join(F.broadcast(sketch), ["d", "slot"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("c").alias("cm_est"))
    )
    return est.select(
        "user_id",
        "true_cnt",
        "cm_est",
        (F.col("cm_est") - F.col("true_cnt")).cast("long").alias("overcount"),
        (F.col("cm_est") >= F.col("true_cnt")).alias("never_under"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling, leakage-safe splits, pooled embedding centroids.
# ---------------------------------------------------------------------------

_W_SCALE = 400  # docs are 48..~550 chars: short docs downsampled, long kept


@QS.add(
    "sample_weighted_bernoulli",
    f"""
    SELECT doc_id, n_chars
    FROM documents
    WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER)
               AS BIGINT) * {_W_SCALE}
          < CAST(n_chars AS BIGINT) * 65536
    """,
    doc="[EXT] deterministic length-weighted Bernoulli sample: each doc "
    f"kept with probability min(1, n_chars/{_W_SCALE}) via the integer "
    "compare bucket16·scale < weight·65536 — importance sampling with no "
    "RNG, identical keeps in any engine/partitioning, and a NARROW "
    "filter (zero shuffle — the 100 TB scan shape). "
    "operators/sampling.py:weighted_hash_sample.",
    tags=("sampling",),
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.sampling import weighted_hash_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_hash_sample(docs, "doc_id", "n_chars", scale=_W_SCALE)


@QS.add(
    "split_group_holdout",
    """
    WITH assigned AS (
      SELECT user_id, event_id,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 4) < 'cccc'
                  THEN 'train'
                  WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 4) < 'e666'
                  THEN 'val'
                  ELSE 'test' END AS split
      FROM events
    )
    SELECT split,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM assigned GROUP BY split
    """,
    doc="[EXT] leakage-safe (group-holdout) split: assignment hashes the "
    "USER, not the event, so a user's whole history lands in one split — "
    "the contamination guard for grouped/near-duplicate data. Narrow "
    "projection + one count agg; per-split user and event totals are "
    "hash-gated. operators/sampling.py:group_holdout_split.",
    tags=("sampling",),
)
def split_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.sampling import group_holdout_split

    ev = load(spark, sf_dir, "events").select("user_id", "event_id")
    return group_holdout_split(ev, "user_id").groupBy("split").agg(
        F.count_distinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )


_CENT_DIM = 64


def _centroid_oracle() -> str:
    sums = ",\n           ".join(
        f"CAST(SUM(CAST(floor(CAST(embedding[{j + 1}] AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT)) AS BIGINT) AS s{j}"
        for j in range(_CENT_DIM)
    )
    return f"""
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           {sums}
    FROM embeddings GROUP BY label
    """


@QS.add(
    "emb_label_centroids",
    _centroid_oracle(),
    doc="[EXT] grouped mean-pooling of embeddings (class centroids / "
    "prototype vectors): per label, exact-integer micro-unit sums of all "
    "64 dims in ONE map-side-combinable aggregate — the one-shuffle "
    "per-dimension pattern (64 scalar sums, never posexplode: exploding "
    "shuffles rows x dim). Downstream mean = s_j / (1e6 * n) to float at "
    "the edge; the BIGINT sums hash-match DuckDB exactly.",
    headline=True,
    tags=("embedding",),
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    sums = [
        F.sum(
            F.floor(
                F.element_at("embedding", j + 1).cast("double") * 1000000.0 + 0.5
            ).cast("long")
        )
        .cast("long")
        .alias(f"s{j}")
        for j in range(_CENT_DIM)
    ]
    return emb.groupBy("label").agg(F.count("*").cast("long").alias("n"), *sums)


# ---------------------------------------------------------------------------
# Audio PCM frame features — an Arrow byte-kernel under a full value hash.
# ---------------------------------------------------------------------------

_AU_ORACLE = """
WITH samp AS (
  SELECT d.doc_id, g.i,
         CAST(g.i // 16 AS INT) AS frame_idx,
         CASE WHEN us >= 32768 THEN us - 65536 ELSE us END AS s
  FROM documents d,
       (SELECT UNNEST(range(0, 32)) AS i) g,
       LATERAL (
         SELECT md5('au' || CAST(g.i // 8 AS VARCHAR) || ':'
                    || CAST(d.doc_id AS VARCHAR)) AS h
       ) hh,
       LATERAL (
         SELECT CAST('0x' || substr(hh.h, CAST((g.i % 8) * 4 + 1 AS INT), 2)
                     AS INTEGER)
                + 256 * CAST('0x' || substr(hh.h, CAST((g.i % 8) * 4 + 3 AS INT), 2)
                             AS INTEGER) AS us
       ) uu
),
nextd AS (
  SELECT doc_id, frame_idx, s,
         lead(s) OVER (PARTITION BY doc_id, frame_idx ORDER BY i) AS s_next
  FROM samp
)
SELECT doc_id, frame_idx,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(SUM(CAST(s AS BIGINT) * CAST(s AS BIGINT)) AS BIGINT) AS sum_sq,
       CAST(SUM(CASE WHEN CAST(s AS BIGINT) * CAST(s_next AS BIGINT) < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
FROM nextd GROUP BY doc_id, frame_idx
"""


@QS.add(
    "mm_audio_features",
    _AU_ORACLE,
    doc="[EXT] audio frame features (energy + zero-crossing rate — the VAD "
    "/ segmentation primitives) over a little-endian int16 PCM binary "
    "column, computed by a zero-copy numpy Arrow kernel "
    "(operators/multimodal.py:audio_frame_features). The PCM is "
    "synthesized deterministically from md5 (container ships no codecs), "
    "so unlike codec-gated decode paths this media kernel is FULLY "
    "value-hash-gated: DuckDB re-derives every int16 sample from the "
    "same hex and must match the kernel's exact integer features. "
    "Declared Arrow op (plan_audit ARROW_OK).",
    headline=True,
    tags=("multimodal",),
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        audio_frame_features,
        synth_pcm,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return audio_frame_features(synth_pcm(docs)).select(
        "doc_id", "frame_idx", "n_samples", "sum_sq", "zero_crossings"
    )


# ---------------------------------------------------------------------------
# Exact-arithmetic correlation statistics (Pearson + Spearman).
# ---------------------------------------------------------------------------

_DAY_MS = 86400000


@QS.add(
    "stat_pearson_value_time",
    f"""
    WITH t AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             epoch_ms(ts) // {_DAY_MS} AS y
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM t GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS num,
           CAST(n * sxx - sx * sx AS BIGINT) AS den_x,
           CAST(n * syy - sy * sy AS BIGINT) AS den_y,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
    FROM c
    """,
    doc="[EXT] per-type Pearson correlation between exact cents and "
    "day-index, in EXACT integer components (n·Σxy−ΣxΣy etc. — one "
    "map-side-combinable agg, BIGINT throughout, magnitudes bounded by "
    "the day-grain time axis); the final r is two correctly-rounded IEEE "
    "sqrts and one division applied in the same order by both engines, "
    "so even the float hash-matches. The integer num/den columns are the "
    "mergeable form (partial sums combine across partitions/files).",
    tags=("stats",),
)
def stat_pearson_value_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    y = F.expr(f"unix_millis(ts) div {_DAY_MS}")
    t = ev.select("event_type", x.alias("x"), y.alias("y"))
    c = t.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
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
        "event_type",
        "n",
        num.cast("long").alias("num"),
        den_x.cast("long").alias("den_x"),
        den_y.cast("long").alias("den_y"),
        (
            num.cast("double")
            / (F.sqrt(den_x.cast("double")) * F.sqrt(den_y.cast("double")))
        ).alias("r"),
    )


@QS.add(
    "stat_spearman_value_time",
    """
    WITH t AS (
      SELECT event_type, event_id, value, ts FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS BIGINT) AS rx,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS BIGINT) AS ry
      FROM t
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
           1.0 - CAST(6 * SUM((rx - ry) * (rx - ry)) AS DOUBLE)
                 / CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1) AS DOUBLE) AS rho
    FROM ranked GROUP BY event_type
    """,
    doc="[EXT] per-type Spearman rank correlation (value vs arrival time), "
    "ties broken deterministically by event_id so ranks are distinct "
    "integers and rho = 1 - 6·Σd²/(n(n²-1)) is EXACT BIGINT up to one "
    "final float division both engines perform identically. Two window "
    "sorts over the same per-type partition (one shuffle), then one agg.",
    tags=("stats",),
)
def stat_spearman_value_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wx = Window.partitionBy("event_type").orderBy("value", "event_id")
    wy = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ranked = ev.select(
        "event_type",
        F.row_number().over(wx).cast("long").alias("rx"),
        F.row_number().over(wy).cast("long").alias("ry"),
    )
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    n = F.count("*").cast("long")
    sum_d2 = F.sum(d2).cast("long")
    return ranked.groupBy("event_type").agg(
        n.alias("n"),
        sum_d2.alias("sum_d2"),
        (
            F.lit(1.0)
            - (F.lit(6) * sum_d2).cast("double")
            / (n * (n * n - F.lit(1))).cast("double")
        ).alias("rho"),
    )


# ---------------------------------------------------------------------------
# Cross-engine table digest — merkle-style reconciliation fingerprint.
# ---------------------------------------------------------------------------

_DIGEST_BUCKETS = 256


@QS.add(
    "audit_table_digest",
    f"""
    WITH h AS (
      SELECT md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
                 || '|' || CAST(l_partkey AS VARCHAR) || '|'
                 || CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                         AS VARCHAR)) AS hx
      FROM lineitem
    )
    SELECT CAST('0x' || substr(hx, 1, 2) AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST('0x' || substr(hx, 3, 8) AS BIGINT)) AS BIGINT) AS digest
    FROM h GROUP BY 1
    """,
    doc="[EXT] content-addressed table fingerprint for cross-system "
    "reconciliation (anti-entropy / merkle-bucket sync): md5 each row's "
    "canonical key string, bucket by the first hash byte, SUM a 32-bit "
    f"hash slice per bucket — {_DIGEST_BUCKETS} (bucket, count, digest) "
    "rows summarize the table in one map-side-combinable agg at ANY "
    "size. Two replicas compare digests and re-sync only differing "
    "buckets; the oracle run IS such a cross-engine comparison "
    "(DuckDB recomputes the digests from the same parquet and must "
    "match bit-for-bit). Addition-based digest = order/partitioning "
    "independent.",
    headline=True,
    tags=("audit",),
)
def audit_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    hx = F.md5(
        F.concat_ws(
            "|",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_partkey").cast("string"),
            cents.cast("string"),
        )
    )
    h = li.select(hx.alias("hx"))
    return h.groupBy(
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("int").alias("bucket")
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.conv(F.substring("hx", 3, 8), 16, 10).cast("long"))
        .cast("long")
        .alias("digest"),
    )


# ---------------------------------------------------------------------------
# Theta sketches: mergeable distinct SET ALGEBRA (intersection/difference).
# ---------------------------------------------------------------------------


@QS.add(
    "a16_theta_set_ops",
    f"""
    WITH a AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // {_DAY_MS} AS day
      FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT DISTINCT user_id, epoch_ms(ts) // {_DAY_MS} AS day
      FROM events WHERE event_type = 'purchase'
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS exact_a,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS exact_b,
           (SELECT CAST(COUNT(*) AS BIGINT)
              FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS exact_inter,
           (SELECT CAST(COUNT(*) AS BIGINT)
              FROM (SELECT * FROM a UNION SELECT * FROM b)) AS exact_union,
           TRUE AS inter_within_bound,
           TRUE AS union_within_bound
    """,
    doc="[EXT] Apache DataSketches THETA sketch surface (Spark 4 "
    "theta_sketch_agg / theta_union / theta_intersection): estimates of "
    "|A∩B| and |A∪B| over active (user, day) pairs for click vs "
    "purchase — the set-ALGEBRA capability HLL lacks (HLL unions only; "
    "theta sketches close under union/intersection/difference, so "
    "per-segment sketches in an MV answer arbitrary audience-overlap "
    "queries without rescanning facts). Gate: both estimates within 15% "
    "of exact (lgK=12 error ~2-3%; intersection error scales with "
    "Jaccard), hash-checked alongside the exact BIGINTs.",
    tags=("agg", "sketch"),
)
def a16_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    key = F.concat_ws(
        ":",
        F.col("user_id").cast("string"),
        F.expr(f"unix_millis(ts) div {_DAY_MS}").cast("string"),
    )
    pairs = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_type", key.alias("k")
    )
    sk = pairs.groupBy("event_type").agg(F.expr("theta_sketch_agg(k)").alias("sk"))
    both = (
        sk.groupBy()
        .pivot("event_type", ["click", "purchase"])
        .agg(F.first("sk"))
        .select(
            F.expr("theta_sketch_estimate(theta_intersection(click, purchase))").alias(
                "est_inter"
            ),
            F.expr("theta_sketch_estimate(theta_union(click, purchase))").alias(
                "est_union"
            ),
        )
    )
    a = pairs.filter(F.col("event_type") == "click").select("k").distinct()
    b = pairs.filter(F.col("event_type") == "purchase").select("k").distinct()
    exact = (
        a.agg(F.count("*").cast("long").alias("exact_a"))
        .crossJoin(b.agg(F.count("*").cast("long").alias("exact_b")))
        .crossJoin(a.intersect(b).agg(F.count("*").cast("long").alias("exact_inter")))
        .crossJoin(a.union(b).distinct().agg(F.count("*").cast("long").alias("exact_union")))
    )
    return exact.crossJoin(both).select(
        "exact_a",
        "exact_b",
        "exact_inter",
        "exact_union",
        (
            F.abs(F.col("est_inter") - F.col("exact_inter"))
            <= F.lit(0.15) * F.col("exact_inter")
        ).alias("inter_within_bound"),
        (
            F.abs(F.col("est_union") - F.col("exact_union"))
            <= F.lit(0.15) * F.col("exact_union")
        ).alias("union_within_bound"),
    )


@QS.add(
    "text_compression_ratio",
    None,  # no SQL engine exposes deflate; invariants pinned by tests
    doc="[EXT] zlib compression ratio per document (CCNet/Gopher "
    "low-information signal: repetitive/degenerate text compresses far "
    "below natural prose). Arrow zlib kernel, exact basis-point "
    "integers; one pass, zero shuffle. "
    "operators/textstats.py:compression_ratios. Rows-only by necessity; "
    "ordering + byte-accounting invariants are test-gated.",
    tags=("text",),
)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.textstats import compression_ratios

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return compression_ratios(docs)


# ---------------------------------------------------------------------------
# Association rules (support / confidence / lift) over co-purchase pairs.
# ---------------------------------------------------------------------------

_AR_MIN_SUPPORT = 2


@QS.add(
    "mine_association_rules",
    f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT oid) AS BIGINT) AS n_baskets FROM baskets),
    item_cnt AS (
      SELECT item, CAST(COUNT(*) AS BIGINT) AS c FROM baskets GROUP BY item
    ),
    pair_cnt AS (
      SELECT a.item AS x, b.item AS y, CAST(COUNT(*) AS BIGINT) AS cxy
      FROM baskets a JOIN baskets b ON a.oid = b.oid AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= {_AR_MIN_SUPPORT}
    ),
    rules AS (
      SELECT x AS antecedent, y AS consequent, cxy, cx.c AS cx, cy.c AS cy
      FROM pair_cnt JOIN item_cnt cx ON cx.item = x
                    JOIN item_cnt cy ON cy.item = y
      UNION ALL
      SELECT y AS antecedent, x AS consequent, cxy, cy.c AS cx, cx.c AS cy
      FROM pair_cnt JOIN item_cnt cx ON cx.item = x
                    JOIN item_cnt cy ON cy.item = y
    )
    SELECT antecedent, consequent, cxy AS support_cnt,
           CAST(cxy AS DOUBLE) / CAST(cx AS DOUBLE) AS confidence,
           CAST(cxy * n.n_baskets AS DOUBLE) / CAST(cx * cy AS DOUBLE) AS lift
    FROM rules, n
    """,
    doc="[EXT] association-rule mining (Apriori at pair depth): frequent "
    "co-purchased part pairs -> directed rules with support, confidence "
    "= c_xy/c_x and lift = c_xy·N/(c_x·c_y). All counting is exact "
    "BIGINT (two map-side-combinable aggs + the same self-equi-join "
    "pair generation as the triangle query); the two ratios are single "
    "IEEE divisions of exact integers — identical both engines, so even "
    "the floats hash-match. Min-support pruning bounds the rule set "
    "independent of corpus size.",
    headline=True,
    tags=("mining",),
)
def mine_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("item")
    )
    baskets = li.distinct().persist()
    n_baskets = baskets.select("oid").distinct().count()

    item_cnt = baskets.groupBy("item").agg(F.count("*").cast("long").alias("c"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pair_cnt = (
        a.join(
            b,
            (F.col("a.oid") == F.col("b.oid")) & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
        .agg(F.count("*").cast("long").alias("cxy"))
        .filter(F.col("cxy") >= _AR_MIN_SUPPORT)
    )
    cx = item_cnt.select(F.col("item").alias("x"), F.col("c").alias("cx"))
    cy = item_cnt.select(F.col("item").alias("y"), F.col("c").alias("cy"))
    joined = pair_cnt.join(F.broadcast(cx), "x").join(F.broadcast(cy), "y")
    fwd = joined.select(
        F.col("x").alias("antecedent"),
        F.col("y").alias("consequent"),
        F.col("cxy"),
        F.col("cx").alias("ca"),
        F.col("cy").alias("cc"),
    )
    rev = joined.select(
        F.col("y").alias("antecedent"),
        F.col("x").alias("consequent"),
        F.col("cxy"),
        F.col("cy").alias("ca"),
        F.col("cx").alias("cc"),
    )
    rules = fwd.unionByName(rev)
    return rules.select(
        "antecedent",
        "consequent",
        F.col("cxy").alias("support_cnt"),
        (F.col("cxy").cast("double") / F.col("ca").cast("double")).alias("confidence"),
        (
            (F.col("cxy") * F.lit(n_baskets).cast("long")).cast("double")
            / (F.col("ca") * F.col("cc")).cast("double")
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection in exact integer arithmetic.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_cusum_changepoint",
    """
    WITH t AS (
      SELECT event_type, event_id, ts,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
      FROM t GROUP BY event_type
    ),
    c AS (
      SELECT t.event_type, t.event_id,
             CAST(row_number() OVER w AS BIGINT) AS k,
             CAST(g.n * SUM(t.x) OVER w - CAST(row_number() OVER w AS BIGINT) * g.sx
                  AS BIGINT) AS cusum_scaled
      FROM t JOIN g USING (event_type)
      WINDOW w AS (PARTITION BY t.event_type ORDER BY t.ts, t.event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           (max({'a': abs(cusum_scaled), 'k': k, 'e': event_id})).e AS change_event,
           (max({'a': abs(cusum_scaled), 'k': k, 'e': event_id})).k AS change_rank,
           MAX(abs(cusum_scaled)) AS peak_dev_scaled
    FROM c GROUP BY event_type
    """,
    doc="[EXT] CUSUM change-point detection per event type, EXACT: the "
    "classic cumulative-deviation statistic C_k = Σ_{i<=k}(x_i - μ) "
    "scaled by n (n·Σ_{i<=k}x_i − k·Σx — the anomaly_zscore integer "
    "trick applied to a running sum) so every value is BIGINT and the "
    "argmax event hash-matches across engines (max_by over "
    "(|cusum|, k, event_id) — deterministic ties). One window cumsum "
    "shuffle + one agg; the global (n, Σx) broadcast-joins.",
    tags=("stats",),
)
def stat_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "event_type",
        "event_id",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("x"),
    )
    g = t.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"), F.sum("x").cast("long").alias("sx")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.join(F.broadcast(g), "event_type").select(
        "event_type",
        "event_id",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .cast("long")
        .alias("k"),
        (F.col("n") * F.sum("x").over(w)).alias("nsum"),
        F.col("sx"),
    )
    c = c.withColumn("cusum_scaled", (F.col("nsum") - F.col("k") * F.col("sx")).cast("long"))
    key = F.struct(F.abs("cusum_scaled").alias("a"), F.col("k"), F.col("event_id"))
    return c.groupBy("event_type").agg(
        F.max_by("event_id", key).alias("change_event"),
        F.max_by("k", key).alias("change_rank"),
        F.max(F.abs("cusum_scaled")).alias("peak_dev_scaled"),
    )


# ---------------------------------------------------------------------------
# Equi-depth (quantile-bucketed) histogram via exact ranks.
# ---------------------------------------------------------------------------

_EQD_BUCKETS = 10


@QS.add(
    "hist_equidepth_value",
    f"""
    WITH t AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             event_id
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, cents,
             ntile({_EQD_BUCKETS}) OVER (PARTITION BY event_type
                                         ORDER BY cents, event_id) AS bucket
      FROM t
    )
    SELECT event_type, CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM r GROUP BY event_type, bucket
    """,
    doc="[EXT] equi-DEPTH histogram (quantile buckets — the CBO statistics "
    f"form): ntile({_EQD_BUCKETS}) over exact cents with deterministic "
    "event_id tie-break, then per-bucket count + boundary values. "
    "Complements the equi-WIDTH hist_event_value; one window shuffle + "
    "one agg, everything BIGINT.",
    tags=("stats",),
)
def hist_equidepth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    r = t.select("event_type", "cents", F.ntile(_EQD_BUCKETS).over(w).alias("bucket"))
    return r.groupBy("event_type", F.col("bucket").cast("int").alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.min("cents").cast("long").alias("lo_cents"),
        F.max("cents").cast("long").alias("hi_cents"),
    )


# ---------------------------------------------------------------------------
# Robust statistics: median absolute deviation outliers.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_mad_robust",
    """
    WITH t AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 200 AS BIGINT) AS c2
      FROM events WHERE value IS NOT NULL
    ),
    med AS (
      SELECT event_type, quantile_cont(c2, 0.5) AS med2 FROM t GROUP BY event_type
    ),
    dev AS (
      SELECT t.event_type, abs(CAST(t.c2 AS DOUBLE) - m.med2) AS d, t.c2, m.med2
      FROM t JOIN med m USING (event_type)
    )
    SELECT event_type,
           CAST(ANY_VALUE(med2) AS DOUBLE) AS median_2cents,
           CAST(quantile_cont(d, 0.5) AS DOUBLE) AS mad_2cents,
           CAST(COUNT(*) FILTER (WHERE d > 3.0 * 1.4826
                                       * (SELECT quantile_cont(d2.d, 0.5)
                                          FROM dev d2
                                          WHERE d2.event_type = dev.event_type))
                AS BIGINT) AS n_outliers
    FROM dev GROUP BY event_type
    """,
    doc="[EXT] robust outlier statistics: median + MAD (median absolute "
    "deviation) per type over DOUBLED exact cents — doubling makes every "
    "interpolated median exactly representable (average of two even "
    "integers), so the medians, deviations and the 3-sigma-equivalent "
    "MAD fence (x1.4826) are bit-identical IEEE in both engines. Two "
    "exact-percentile aggs + one broadcast join; the robust alternative "
    "to anomaly_zscore_outliers (immune to the outliers it hunts).",
    tags=("stats",),
)
def stat_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 200).cast("long").alias("c2"),
    )
    med = t.groupBy("event_type").agg(F.expr("percentile(c2, 0.5)").alias("med2"))
    dev = t.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med2",
        F.abs(F.col("c2").cast("double") - F.col("med2")).alias("d"),
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(d, 0.5)").alias("mad2"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med2").cast("double").alias("median_2cents"),
            F.any_value("mad2").cast("double").alias("mad_2cents"),
            F.sum(
                F.when(F.col("d") > F.lit(3.0) * F.lit(1.4826) * F.col("mad2"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Gini diversity, winsorized aggregates, deterministic negative sampling.
# ---------------------------------------------------------------------------


@QS.add(
    "stat_gini_user_diversity",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type
    ),
    u AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * c) AS BIGINT) AS ssq
      FROM c GROUP BY user_id
    )
    SELECT user_id, n, ssq,
           CAST(n * n - ssq AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini
    FROM u
    """,
    doc="[EXT] behavioral diversity via Gini impurity: per user, 1 − "
    "Σ(c_i/n)² over the event-type distribution, computed as "
    "(n²−Σc²)/n² — exact BIGINTs up to ONE shared IEEE division, so the "
    "float hash-matches (the log-free alternative to Shannon entropy, "
    "which is NOT portable: ln is not correctly rounded across libms). "
    "Two cascaded map-side-combinable aggs.",
    tags=("stats",),
)
def stat_gini_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").cast("long").alias("c"))
    u = c.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ssq"),
    )
    return u.select(
        "user_id",
        "n",
        "ssq",
        (
            (F.col("n") * F.col("n") - F.col("ssq")).cast("double")
            / (F.col("n") * F.col("n")).cast("double")
        ).alias("gini"),
    )


@QS.add(
    "clean_winsorized_totals",
    """
    WITH t AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 200 AS BIGINT) AS c2
      FROM events WHERE value IS NOT NULL
    ),
    fence AS (
      SELECT event_type,
             quantile_cont(c2, 0.05) AS lo, quantile_cont(c2, 0.95) AS hi
      FROM t GROUP BY event_type
    )
    SELECT t.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(LEAST(GREATEST(CAST(t.c2 AS DOUBLE), f.lo), f.hi))
                         AS BIGINT)) AS BIGINT) AS winsorized_sum_2cents,
           CAST(SUM(CASE WHEN CAST(t.c2 AS DOUBLE) < f.lo
                           OR CAST(t.c2 AS DOUBLE) > f.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM t JOIN fence f USING (event_type)
    GROUP BY t.event_type
    """,
    doc="[EXT] winsorization (robust data cleaning): clip each value to its "
    "type's [p5, p95] fence and report clipped totals. DOUBLED cents make "
    "the interpolated fences exactly representable halves, so the clip "
    "boundary — and the BIGINT cast of the clipped value — is identical "
    "in both engines. One exact-percentile agg broadcast back onto the "
    "stream; everything else integer.",
    tags=("stats",),
)
def clean_winsorized_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 200).cast("long").alias("c2"),
    )
    fence = t.groupBy("event_type").agg(
        F.expr("percentile(c2, 0.05)").alias("lo"),
        F.expr("percentile(c2, 0.95)").alias("hi"),
    )
    j = t.join(F.broadcast(fence), "event_type")
    clipped = F.least(F.greatest(F.col("c2").cast("double"), F.col("lo")), F.col("hi"))
    out_of = (F.col("c2").cast("double") < F.col("lo")) | (
        F.col("c2").cast("double") > F.col("hi")
    )
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.floor(clipped).cast("long")).cast("long").alias("winsorized_sum_2cents"),
        F.sum(F.when(out_of, 1).otherwise(0)).cast("long").alias("n_clipped"),
    )


_NEG_K = 3


@QS.add(
    "sample_negative_pairs",
    f"""
    WITH pos AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    n_items AS (SELECT CAST(MAX(p_partkey) + 1 AS BIGINT) AS m FROM part),
    users AS (SELECT DISTINCT user_id FROM pos),
    cand AS (
      SELECT u.user_id, g.i AS neg_idx,
             CAST('0x' || substr(md5('neg' || CAST(g.i AS VARCHAR) || ':'
                                  || CAST(u.user_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % n_items.m AS item
      FROM users u, (SELECT UNNEST(range(0, {_NEG_K})) AS i) g, n_items
    )
    SELECT c.user_id, c.neg_idx, c.item
    FROM cand c
    LEFT JOIN pos p ON p.user_id = c.user_id AND p.item = c.item
    WHERE p.item IS NULL
    """,
    doc="[EXT] deterministic negative sampling (contrastive / recsys "
    f"training prep): per user, {_NEG_K} pseudo-random candidate items "
    "derived from md5 (no RNG — same negatives in any engine, "
    "partitioning or rerun), anti-joined against the user's true "
    "interaction set so a drawn positive is dropped rather than "
    "mislabeled. One distinct-pair build + one anti-join, both plain "
    "shuffles; candidate count is k·|users|, independent of item-catalog "
    "size.",
    tags=("sampling",),
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    m = load(spark, sf_dir, "part").agg(
        (F.max("p_partkey") + 1).cast("long")
    ).collect()[0][0]
    users = pos.select("user_id").distinct()
    cand = users.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("neg_idx"),
    ).select(
        "user_id",
        "neg_idx",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("neg"),
                            F.col("neg_idx").cast("string"),
                            F.lit(":"),
                            F.col("user_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(m)
        ).alias("item"),
    )
    return cand.join(pos, ["user_id", "item"], "left_anti").select(
        "user_id", "neg_idx", "item"
    )


# ---------------------------------------------------------------------------
# k-core decomposition (bounded peeling) + inter-label centroid affinity.
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 5


def _kcore_oracle() -> str:
    rounds = []
    prev = "e0"
    for r in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f"""
    d{r} AS MATERIALIZED (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev}
      ) t GROUP BY node
    ),
    keep{r} AS (SELECT node FROM d{r} WHERE deg >= {_KCORE_K}),
    e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM {prev} e
      JOIN keep{r} ku ON ku.node = e.u
      JOIN keep{r} kv ON kv.node = e.v
    )""")
        prev = f"e{r}"
    its = ",".join(rounds)
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {_TRI_SUPPORT}
    ),{its}
    SELECT node, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
      SELECT u AS node FROM {prev} UNION ALL SELECT v AS node FROM {prev}
    ) t GROUP BY node
    """


@QS.add(
    "graph_kcore_members",
    _kcore_oracle(),
    doc=f"[EXT] k-core decomposition (k={_KCORE_K}) of the co-purchase "
    f"graph via {_KCORE_ROUNDS} bounded peel rounds — the dense-cohesion "
    "community primitive (a node survives iff it keeps >= k surviving "
    "neighbors). Iterative-algorithm-under-full-value-hash pattern "
    "(cf. graph_pagerank): the Spark loop and the oracle's unrolled CTE "
    "chain compute the identical round-bounded fixpoint; a test pins "
    "that the rounds suffice to CONVERGE on this graph, so the output "
    "IS the true k-core. Per round: one degree agg + one broadcast "
    "semi-join (the kept-node set only shrinks).",
    tags=("graph",),
)
def graph_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") >= _TRI_SUPPORT)
        .select("u", "v")
        .coalesce(8)
        .persist()
    )
    # Iterative peeling truncates lineage EVERY round (eager
    # localCheckpoint, cf. operators/graph.py CC): without it each round's
    # two broadcast builds re-derive the whole unmaterialized chain and
    # the 5-round plan took 320s at sf0.01; checkpointed it is ~1s/round.
    edges = edges.localCheckpoint(eager=True)
    for _ in range(_KCORE_ROUNDS):
        nodes = edges.select(F.col("u").alias("node")).unionByName(
            edges.select(F.col("v").alias("node"))
        )
        deg = nodes.groupBy("node").agg(F.count("*").cast("long").alias("deg"))
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("node")
        # keep is O(|V|) — no broadcast hint: AQE picks broadcast while it
        # is small and degrades to a shuffled semi-join at scale.
        edges = (
            edges.join(keep.select(F.col("node").alias("u")), "u", "left_semi")
            .join(keep.select(F.col("node").alias("v")), "v", "left_semi")
            .select("u", "v")
            .coalesce(8)
            .localCheckpoint(eager=True)
        )
    nodes = edges.select(F.col("u").alias("node")).unionByName(
        edges.select(F.col("v").alias("node"))
    )
    return nodes.groupBy("node").agg(F.count("*").cast("long").alias("core_deg"))


# ---------------------------------------------------------------------------
# k-truss decomposition: the EDGE-level cohesion analogue of k-core.
# ---------------------------------------------------------------------------

# k=3 (edges in >= 1 triangle at fixpoint): the co-purchase graph's edge
# supports top out at 3 even at sf0.1-scale regenerations, so k=4 peels
# to EMPTY — the 3-truss is the non-degenerate cohesion level here.
_TRUSS_K = 3
_TRUSS_ROUNDS = 3


def _truss_oracle() -> str:
    """Unrolled MATERIALIZED peel rounds (the kcore-oracle discipline);
    each round = one oriented triangle enumeration + per-edge support
    counts + the support filter."""
    rounds = []
    prev = "e0"
    for r in range(1, _TRUSS_ROUNDS + 1):
        rounds.append(f"""
    tri{r} AS MATERIALIZED (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM {prev} e1
      JOIN {prev} e2 ON e2.u = e1.v
      JOIN {prev} e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    sup{r} AS MATERIALIZED (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM (
        SELECT a AS u, b AS v FROM tri{r}
        UNION ALL SELECT b AS u, c AS v FROM tri{r}
        UNION ALL SELECT a AS u, c AS v FROM tri{r}
      ) t GROUP BY u, v
    ),
    e{r} AS MATERIALIZED (
      SELECT u, v FROM sup{r} WHERE support >= {_TRUSS_K - 2}
    )""")
        prev = f"e{r}"
    its = ",".join(rounds)
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {_TRI_SUPPORT}
    ),{its},
    trif AS MATERIALIZED (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM {prev} e1
      JOIN {prev} e2 ON e2.u = e1.v
      JOIN {prev} e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    supf AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM (
        SELECT a AS u, b AS v FROM trif
        UNION ALL SELECT b AS u, c AS v FROM trif
        UNION ALL SELECT a AS u, c AS v FROM trif
      ) t GROUP BY u, v
    )
    SELECT e.u, e.v, CAST(COALESCE(s.support, 0) AS BIGINT) AS support
    FROM {prev} e LEFT JOIN supf s ON e.u = s.u AND e.v = s.v
    """


def _edge_support(e: DataFrame) -> DataFrame:
    """(u, v, support) per canonical u<v edge: each oriented triangle
    (a<b<c) credits its three edges — the standard oriented wedge join,
    never neighborhood intersection per edge pair."""
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    ac = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    edges3 = (
        tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
        .unionByName(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
    )
    return edges3.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )


@QS.add(
    "graph_ktruss_edges",
    _truss_oracle(),
    doc=f"[EXT] k-truss decomposition (k={_TRUSS_K}) of the co-purchase "
    "graph: keep edges participating in >= k-2 triangles among "
    "surviving edges, to fixpoint — the EDGE-level cohesion analogue "
    "of k-core (strictly stronger: the k-truss is a subgraph of the "
    f"(k-1)-core), via {_TRUSS_ROUNDS} bounded peel rounds. Same "
    "iterative-under-full-value-hash pattern as graph_kcore_members "
    "(unrolled MATERIALIZED oracle; convergence pinned by test). Per "
    "round: ONE oriented triangle enumeration (the triangle-count "
    "wedge join — cost sum of deg^2 over the oriented adjacency, "
    "never per-edge neighborhood intersection) + one per-edge support "
    "aggregate; output = surviving edges with their fixpoint support. "
    "25th hash-gated iterative.",
    tags=("graph", "iterative"),
)
def graph_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") >= _TRI_SUPPORT)
        .select("u", "v")
        .coalesce(8)
        .localCheckpoint(eager=True)
    )
    # peel rounds: edges feed the wedge join THREE times per round —
    # multiplicative lineage, eager checkpoint every round (k-core rule)
    for _ in range(_TRUSS_ROUNDS):
        sup = _edge_support(edges)
        edges = (
            sup.filter(F.col("support") >= _TRUSS_K - 2)
            .select("u", "v")
            .coalesce(8)
            .localCheckpoint(eager=True)
        )
    final_sup = _edge_support(edges)
    return edges.join(final_sup, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def _affinity_oracle() -> str:
    dot = " + ".join(
        f"a.s{j} * b.s{j}" for j in range(_CENT_DIM)
    )
    sums = ", ".join(
        f"CAST(SUM(CAST(floor(CAST(embedding[{j + 1}] AS DOUBLE) * 1000000.0 + 0.5)"
        f" AS BIGINT)) AS BIGINT) AS s{j}"
        for j in range(_CENT_DIM)
    )
    return f"""
    WITH c AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n, {sums}
      FROM embeddings GROUP BY label
    )
    SELECT a.label AS label_a, b.label AS label_b,
           a.n AS n_a, b.n AS n_b,
           CAST({dot} AS BIGINT) AS dot_units
    FROM c a JOIN c b ON a.label < b.label
    """


@QS.add(
    "emb_label_affinity",
    _affinity_oracle(),
    doc="[EXT] inter-class affinity matrix: exact BIGINT dot products "
    "between per-label centroid SUM vectors (micro-units; cosine follows "
    "driver-side as dot/(|a||b|·n_a·n_b) when needed). The pairwise join "
    "runs over k aggregated rows — k², never N² — the standard "
    "aggregate-then-pair shape for class-similarity audits "
    "(label-collision detection, coarse cluster merging).",
    tags=("embedding",),
)
def emb_label_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = emb_label_centroids(spark, sf_dir)
    a, b = c.alias("a"), c.alias("b")
    dot = None
    for j in range(_CENT_DIM):
        term = F.col(f"a.s{j}") * F.col(f"b.s{j}")
        dot = term if dot is None else dot + term
    return a.join(b, F.col("a.label") < F.col("b.label")).select(
        F.col("a.label").alias("label_a"),
        F.col("b.label").alias("label_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        dot.cast("long").alias("dot_units"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast evaluation (exact integer error metrics).
# ---------------------------------------------------------------------------


@QS.add(
    "ts_seasonal_naive_eval",
    f"""
    WITH h AS (
      SELECT event_type,
             epoch_ms(ts) // 3600000 AS hour_idx,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, epoch_ms(ts) // 3600000
    ),
    j AS (
      SELECT cur.event_type,
             abs(cur.cents - prev.cents) AS abs_err
      FROM h cur JOIN h prev
        ON prev.event_type = cur.event_type
       AND prev.hour_idx = cur.hour_idx - 24
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_forecasts,
           CAST(SUM(abs_err) AS BIGINT) AS total_abs_err_cents,
           CAST(SUM(abs_err) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mae_cents
    FROM j GROUP BY event_type
    """,
    doc="[EXT] forecast-evaluation primitive: seasonal-naive baseline "
    "(predict this hour's per-type revenue = same hour yesterday) scored "
    "by MAE over exact integer cents — the benchmark every real "
    "forecasting model must beat, and the standard backtest join shape "
    "(self-join on the lagged seasonal key; one hourly pre-aggregate "
    "keeps the join on |hours|, not |events|). MAE = one shared IEEE "
    "division of exact BIGINTs.",
    tags=("timeseries",),
)
def ts_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    h = ev.groupBy(
        "event_type", F.expr("unix_millis(ts) div 3600000").alias("hour_idx")
    ).agg(F.sum(cents).cast("long").alias("cents"))
    cur, prev = h.alias("cur"), h.alias("prev")
    j = cur.join(
        prev,
        (F.col("prev.event_type") == F.col("cur.event_type"))
        & (F.col("prev.hour_idx") == F.col("cur.hour_idx") - 24),
    ).select(
        F.col("cur.event_type").alias("event_type"),
        F.abs(F.col("cur.cents") - F.col("prev.cents")).alias("abs_err"),
    )
    return j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_forecasts"),
        F.sum("abs_err").cast("long").alias("total_abs_err_cents"),
        (F.sum("abs_err").cast("double") / F.count("*").cast("double")).alias(
            "mae_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Sequence fingerprints, chi-square contingency, Gram matrix.
# ---------------------------------------------------------------------------


@QS.add(
    "seq_user_fingerprint",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           md5(string_agg(event_type, '>' ORDER BY ts, event_id)) AS seq_md5
    FROM events
    GROUP BY user_id
    """,
    doc="[EXT] per-user event-sequence fingerprint: md5 of the event-type "
    "sequence in deterministic (ts, event_id) order — the training-"
    "sequence materialization primitive (behavior cloning / session "
    "models) reduced to a hashable scalar so ORDERED collection is "
    "value-gated cross-engine (array outputs do not hash portably; the "
    "digest does). Spark: sort_array over (ts, event_id, type) structs "
    "inside one agg — no window shuffle, map-side partials.",
    tags=("sequence",),
)
def seq_user_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    seq = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
        ),
        lambda s: s["event_type"],
    )
    return ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.md5(F.array_join(seq, ">")).alias("seq_md5"),
    )


@QS.add(
    "stat_chisq_contingency",
    """
    WITH t AS (
      SELECT event_type, (epoch_ms(ts) // 86400000) % 7 AS dow FROM events
    ),
    o AS (
      SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS obs
      FROM t GROUP BY event_type, dow
    ),
    r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS r_total FROM o GROUP BY event_type),
    c AS (SELECT dow, CAST(SUM(obs) AS BIGINT) AS c_total FROM o GROUP BY dow),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM o)
    SELECT o.event_type, o.dow, o.obs, r.r_total, c.c_total,
           CAST((n.n * o.obs - r.r_total * c.c_total)
                * (n.n * o.obs - r.r_total * c.c_total) AS BIGINT) AS num,
           CAST(n.n * r.r_total * c.c_total AS BIGINT) AS den,
           CAST((n.n * o.obs - r.r_total * c.c_total)
                * (n.n * o.obs - r.r_total * c.c_total) AS DOUBLE)
             / CAST(n.n * r.r_total * c.c_total AS DOUBLE) AS cell_term
    FROM o JOIN r USING (event_type) JOIN c USING (dow), n
    """,
    doc="[EXT] chi-square contingency components for event_type x "
    "day-of-week independence: per cell the EXACT integers "
    "(N·O−r·c)² and N·r·c (cell_term = their single IEEE division; "
    "chi²·N = Σ terms is left to the consumer so no cross-cell float "
    "fold enters the hash). Day-of-week as epoch-day mod 7 — pure "
    "integer, no calendar/locale divergence. One count agg + two "
    "broadcast margins.",
    tags=("stats",),
)
def stat_chisq_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    t = ev.select(
        "event_type", (F.expr("unix_millis(ts) div 86400000") % 7).alias("dow")
    )
    o = t.groupBy("event_type", "dow").agg(F.count("*").cast("long").alias("obs"))
    o = o.persist()
    r = o.groupBy("event_type").agg(F.sum("obs").cast("long").alias("r_total"))
    c = o.groupBy("dow").agg(F.sum("obs").cast("long").alias("c_total"))
    n = o.agg(F.sum("obs").cast("long").alias("n"))
    j = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(n))
    )
    diff = F.col("n") * F.col("obs") - F.col("r_total") * F.col("c_total")
    den = F.col("n") * F.col("r_total") * F.col("c_total")
    return j.select(
        "event_type",
        "dow",
        "obs",
        "r_total",
        "c_total",
        (diff * diff).cast("long").alias("num"),
        den.cast("long").alias("den"),
        ((diff * diff).cast("double") / den.cast("double")).alias("cell_term"),
    )


@QS.add(
    "emb_gram_matrix",
    """
    WITH u AS (
      SELECT vec_id, g.i AS i,
             CAST(floor(CAST(embedding[g.i + 1] AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS x
      FROM embeddings, (SELECT UNNEST(range(0, 64)) AS i) g
    )
    SELECT a.i AS dim_i, b.i AS dim_j,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(a.x * b.x) AS BIGINT) AS sum_units
    FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
    doc="[EXT] Gram / scatter matrix of the embedding corpus (X^T X upper "
    "triangle, 2080 cells) in exact micro-unit BIGINTs — the covariance/"
    "PCA-prep primitive. Shape: ONE posexplode to (row, dim, x) then a "
    "self-equi-join on row bounded to i<=j — shuffles rows×dim, never "
    "rows×dim² — and one map-side-combinable agg; the 64-wide explode is "
    "the distributed outer-product accumulation pattern (each partition "
    "contributes partial sums; cells merge associatively at any scale).",
    tags=("embedding",),
)
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    u = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1000000.0 + 0.5).cast("long"),
            )
        ).alias("i", "x"),
    )
    a, b = u.alias("a"), u.alias("b")
    return (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.i") <= F.col("b.i")),
        )
        .groupBy(F.col("a.i").alias("dim_i"), F.col("b.i").alias("dim_j"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("a.x") * F.col("b.x")).cast("long").alias("sum_units"),
        )
    )


_TS_CAP = 1500


@QS.add(
    "trend_theil_sen",
    f"""
    WITH s0 AS (
      SELECT event_type, event_id,
             epoch_ms(ts) // 86400000 AS x,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
               AS rn
      FROM events WHERE value IS NOT NULL
    ),
    samp AS MATERIALIZED (SELECT * FROM s0 WHERE rn <= {_TS_CAP}),
    sl AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM samp a
      JOIN samp b ON a.event_type = b.event_type AND a.rn < b.rn AND a.x != b.x
    ),
    m AS (
      SELECT event_type, quantile_cont(slope, 0.5) AS slope
      FROM sl GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           ANY_VALUE(m.slope) AS slope_cents_per_day,
           quantile_cont(CAST(s.y AS DOUBLE) - m.slope * CAST(s.x AS DOUBLE), 0.5)
             AS intercept_cents
    FROM samp s JOIN m USING (event_type)
    GROUP BY s.event_type
    """,
    doc="[EXT] Theil-Sen robust trend per event type — the repo's plain "
    "grouped-map applyInPandas surface (operators/trend.py): median of "
    "O(cap²) pairwise slopes on a deterministic md5-capped sample, an "
    "imperative per-group kernel that still FULL value-hash-matches a "
    "DuckDB pairwise-join twin (float64 slope divisions + interpolated "
    "medians are correctly-rounded IEEE in both engines). Declared "
    "Arrow op (plan_audit ARROW_OK).",
    tags=("stats", "arrow"),
)
def trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.trend import theil_sen_trend

    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = ev.select(
        "event_type",
        "event_id",
        F.expr("unix_millis(ts) div 86400000").alias("x"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("y"),
    )
    return theil_sen_trend(t, cap=_TS_CAP)


# ---------------------------------------------------------------------------
# Declarative expectations over events — whole vocabulary, one scan.
# ---------------------------------------------------------------------------


@QS.add(
    "dq_expectations_events",
    """
    SELECT rule, n_violations, n_rows FROM (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS v_notnull,
             CAST(SUM(CASE WHEN event_type IS NOT NULL
                            AND event_type NOT IN
                                ('click','view','purchase','signup','error')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_inset,
             CAST(SUM(CASE WHEN value IS NOT NULL
                            AND (value < -1000.0 OR value > 1000.0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
             CAST(SUM(CASE WHEN props IS NOT NULL
                            AND NOT regexp_matches(props, '^\\{.*\\}$')
                           THEN 1 ELSE 0 END) AS BIGINT) AS v_json
      FROM events
    ) w,
    LATERAL (VALUES ('value__not_null', w.v_notnull),
                    ('event_type__in_set', w.v_inset),
                    ('value__in_range', w.v_range),
                    ('props__matches', w.v_json)) AS t(rule, n_violations)
    """,
    doc="[EXT] declarative data-quality expectations "
    "(operators/expectations.py — the reference's hardcoded rules "
    "etl.py:163-194 generalized to a rule vocabulary): not_null / "
    "in_set / in_range / regex-matches compiled to flag columns and "
    "counted in ONE scan + ONE aggregate (sum-when partials), unpivoted "
    "to (rule, n_violations, n_rows). Pure column expressions — the "
    "whole vocabulary is oracle-expressible and hash-gated.",
    tags=("quality",),
)
def dq_expectations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators import expectations as X

    ev = load(spark, sf_dir, "events")
    rules = [
        X.not_null("value"),
        X.in_set("event_type", ["click", "view", "purchase", "signup", "error"]),
        X.in_range("value", -1000.0, 1000.0),
        X.matches("props", r"^\{.*\}$"),
    ]
    out = X.violation_counts(ev, rules)
    # stable rule order for both engines
    return out.select(
        F.col("rule"), F.col("n_violations"), F.col("n_rows")
    )


# ---------------------------------------------------------------------------
# Window value-function family: first/last/nth/lag-default in one pass.
# ---------------------------------------------------------------------------


@QS.add(
    "w13_value_function_family",
    """
    SELECT event_id, event_type,
           first_value(event_id) OVER w AS first_id,
           last_value(event_id) OVER w_full AS last_id,
           nth_value(event_id, 3) OVER w_full AS third_id,
           lag(event_id, 1, -1) OVER w AS prev_id,
           lead(event_id, 2, -1) OVER w AS next2_id
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id),
           w_full AS (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="[EXT] the window VALUE-function family in one pass: first_value, "
    "whole-partition last_value / nth_value (explicit unbounded frame — "
    "the default running frame silently yields CURRENT ROW for "
    "last_value, the classic trap), and lag/lead with non-NULL defaults. "
    "Deterministic (ts, event_id) ordering; one shuffle, both frames "
    "share the sort.",
    tags=("window",),
)
def w13_value_function_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "event_type",
        F.first("event_id").over(w).alias("first_id"),
        F.last("event_id").over(w_full).alias("last_id"),
        F.nth_value("event_id", 3).over(w_full).alias("third_id"),
        F.lag("event_id", 1, -1).over(w).alias("prev_id"),
        F.lead("event_id", 2, -1).over(w).alias("next2_id"),
    )


# ---------------------------------------------------------------------------
# Text cleaning: consecutive-token stutter removal + canonical normalization.
# ---------------------------------------------------------------------------


@QS.add(
    "text_dedup_consecutive_tokens",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    kept AS (
      SELECT doc_id, toks,
             [toks[i] FOR i IN range(1, len(toks) + 1)
              IF i = 1 OR toks[i] != toks[i - 1]] AS clean
      FROM t
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(clean) AS BIGINT) AS n_removed,
           md5(array_to_string(clean, ' ')) AS clean_md5
    FROM kept
    """,
    doc="[EXT] within-document stutter removal (the cleaning pass for "
    "token/line repeats: 'the the', duplicated boilerplate lines): keep "
    "token i iff it differs from token i-1 — an index-aware filter "
    "expressed entirely in array expressions (no UDF, no explode), "
    "rebuilt text pinned byte-exact via md5. DuckDB twin is a list "
    "comprehension over the same split.",
    tags=("text",),
)
def text_dedup_consecutive_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    clean = F.filter(
        F.col("toks"),
        lambda tok, i: (i == 0) | (tok != F.element_at(F.col("toks"), i)),
    )
    out = t.withColumn("clean", clean)
    return out.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size("clean")).cast("long").alias("n_removed"),
        F.md5(F.array_join("clean", " ")).alias("clean_md5"),
    )


@QS.add(
    "text_normalize_canonical",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                 ' +', ' ', 'g'))) AS canon_md5,
           CAST(length(trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                 ' +', ' ', 'g'))) AS BIGINT) AS canon_len
    FROM documents
    """,
    doc="[EXT] canonical text normalization (the pre-dedup/pre-fingerprint "
    "pass: lowercase, strip non-alphanumerics, collapse whitespace) with "
    "the output pinned byte-exact via md5. Regex kept inside the "
    "Java-regex ∩ RE2 common subset (simple character classes — the "
    "text.redact_pii discipline) so both engines transform identically.",
    tags=("text",),
)
def text_normalize_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.md5(canon).alias("canon_md5"),
        F.length(canon).cast("long").alias("canon_len"),
    )


# ---------------------------------------------------------------------------
# Deterministic global enumeration without a global single-task sort.
# ---------------------------------------------------------------------------


@QS.add(
    "seq_global_event_index",
    """
    WITH d AS (
      SELECT *, epoch_ms(ts) // 86400000 AS day FROM events
    ),
    counts AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY day
    ),
    offs AS (
      SELECT day,
             CAST(COALESCE(SUM(c) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS off
      FROM counts
    )
    SELECT d.event_id,
           CAST(o.off + row_number() OVER (PARTITION BY d.day
                                           ORDER BY d.ts, d.event_id) - 1
                AS BIGINT) AS global_idx
    FROM d JOIN offs o USING (day)
    """,
    doc="[EXT] deterministic GLOBAL row enumeration (training-order "
    "assignment, exact global ranks) without the single-task global "
    "window: per-day counts (one agg over a tiny key set) -> cumulative "
    "offsets (window over |days| rows, driver-scale) -> within-day "
    "row_number + offset. Every step is keyed on the natural time "
    "partition, so at 100 TB the heavy window runs per day-partition in "
    "parallel while the offset table stays metadata-sized. Gap-free and "
    "collision-free by construction; hash-gated against DuckDB's "
    "straight global row_number (same (ts, event_id) total order).",
    tags=("sequence",),
)
def seq_global_event_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    d = ev.withColumn("day", F.expr("unix_millis(ts) div 86400000"))
    counts = d.groupBy("day").agg(F.count("*").cast("long").alias("c"))
    w_off = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "day", F.coalesce(F.sum("c").over(w_off), F.lit(0)).cast("long").alias("off")
    )
    w_day = Window.partitionBy("day").orderBy("ts", "event_id")
    return d.join(F.broadcast(offs), "day").select(
        "event_id",
        (F.col("off") + F.row_number().over(w_day) - 1).cast("long").alias("global_idx"),
    )


# ---------------------------------------------------------------------------
# Deterministic random walks over the co-purchase graph (node2vec prep).
# ---------------------------------------------------------------------------

_WALK_STEPS = 4
_WALK_STARTS = 50


def _walks_oracle() -> str:
    steps = []
    prev = "w0"
    for t in range(1, _WALK_STEPS + 1):
        steps.append(f"""
    w{t} AS MATERIALIZED (
      SELECT w.walker, a.dst AS node,
             w.path || '>' || CAST(a.dst AS VARCHAR) AS path
      FROM {prev} w
      JOIN deg d ON d.src = w.node
      JOIN adj a ON a.src = w.node
       AND a.idx = CAST('0x' || substr(md5('w{t}:' || CAST(w.walker AS VARCHAR)), 1, 4)
                        AS INTEGER) % d.deg + 1
    )""")
        prev = f"w{t}"
    its = ",".join(steps)
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {_TRI_SUPPORT}
    ),
    sym AS (SELECT u AS src, v AS dst FROM e0
            UNION ALL SELECT v AS src, u AS dst FROM e0),
    adj AS MATERIALIZED (
      SELECT src, dst,
             CAST(row_number() OVER (PARTITION BY src ORDER BY dst) AS INTEGER)
               AS idx
      FROM sym
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS INTEGER) AS deg FROM sym GROUP BY src),
    starts AS (
      SELECT src AS walker FROM deg ORDER BY src LIMIT {_WALK_STARTS}
    ),
    w0 AS (SELECT walker, walker AS node, CAST(walker AS VARCHAR) AS path
           FROM starts)
    ,{its}
    SELECT walker, path, node AS end_node FROM {prev}
    """


@QS.add(
    "graph_random_walks",
    _walks_oracle(),
    doc=f"[EXT] deterministic random-walk generation ({_WALK_STARTS} "
    f"walkers x {_WALK_STEPS} steps) over the co-purchase graph — the "
    "node2vec/DeepWalk training-corpus prep, RNG-free: each step picks "
    "neighbor index md5(step:walker) mod degree over a row_number-"
    "indexed adjacency, so walks are identical in any engine/run/"
    "partitioning. Third iterative algorithm under a full value hash "
    "(unrolled MATERIALIZED CTE twin); per step ONE broadcast join of "
    "the walker frontier onto the indexed adjacency. Walker state stays "
    "|walkers| rows; the adjacency builds once.",
    tags=("graph",),
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
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
    )
    sym = e0.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        e0.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    adj = sym.select(
        "src",
        "dst",
        F.row_number()
        .over(Window.partitionBy("src").orderBy("dst"))
        .cast("int")
        .alias("idx"),
    ).localCheckpoint(eager=True)
    deg = adj.groupBy("src").agg(F.max("idx").cast("int").alias("deg"))
    # deg is O(|V|) — unhinted equi-join; AQE broadcasts while small.
    adj_deg = adj.join(deg, "src").localCheckpoint(eager=True)

    starts = (
        deg.select(F.col("src").alias("walker"))
        .orderBy("walker")
        .limit(_WALK_STARTS)
    )
    w = starts.select(
        "walker",
        F.col("walker").alias("node"),
        F.col("walker").cast("string").alias("path"),
    ).localCheckpoint(eager=True)
    for t in range(1, _WALK_STEPS + 1):
        pick = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"w{t}:"), F.col("walker").cast("string"))),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("int")
            % F.col("deg")
            + 1
        )
        # Broadcast the BOUNDED walker frontier (<= _WALK_STARTS rows) onto
        # the O(|E|) indexed adjacency — never the reverse: the adjacency
        # grows with the corpus and would OOM a broadcast at scale.
        w = (
            adj_deg.join(F.broadcast(w), w["node"] == adj_deg["src"])
            .filter(F.col("idx") == pick)
            .select(
                "walker",
                F.col("dst").alias("node"),
                F.concat(F.col("path"), F.lit(">"), F.col("dst").cast("string")).alias(
                    "path"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return w.select("walker", "path", F.col("node").alias("end_node"))


_SG_WINDOW = 2


@QS.add(
    "graph_walk_skipgrams",
    f"""
    WITH walks AS MATERIALIZED ({_walks_oracle()}),
    toks AS (
      SELECT walker, string_split(path, '>') AS l FROM walks
    ),
    pos AS (
      SELECT walker, g.i AS i, CAST(l[g.i] AS BIGINT) AS node
      FROM toks, (SELECT UNNEST(range(1, {_WALK_STEPS + 2})) AS i) g
    )
    SELECT a.node AS center, b.node AS context,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pos a JOIN pos b
      ON a.walker = b.walker AND a.i != b.i
     AND abs(a.i - b.i) <= {_SG_WINDOW}
    GROUP BY a.node, b.node
    """,
    doc="[EXT] skip-gram co-occurrence pairs from the deterministic walks "
    f"(window {_SG_WINDOW}) — the (center, context, count) table word2vec/"
    "node2vec trains on. Walk corpus -> posexplode -> windowed self-join "
    "per walker -> one count agg; composes the walk generator, so the "
    "whole graph-embedding data path (graph -> walks -> training pairs) "
    "is value-hash-gated end to end.",
    tags=("graph",),
)
def graph_walk_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    walks = graph_random_walks(spark, sf_dir)
    toks = walks.select("walker", F.split("path", ">").alias("l"))
    pos = toks.select(
        "walker", F.posexplode("l").alias("i", "node_s")
    ).select("walker", (F.col("i") + 1).alias("i"), F.col("node_s").cast("long").alias("node"))
    a, b = pos.alias("a"), pos.alias("b")
    return (
        a.join(
            b,
            (F.col("a.walker") == F.col("b.walker"))
            & (F.col("a.i") != F.col("b.i"))
            & (F.abs(F.col("a.i") - F.col("b.i")) <= _SG_WINDOW),
        )
        .groupBy(F.col("a.node").alias("center"), F.col("b.node").alias("context"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Share-of-total window + boolean/conditional aggregate family.
# ---------------------------------------------------------------------------


@QS.add(
    "w14_share_of_total",
    """
    WITH t AS (
      SELECT event_type, user_id,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, user_id
    )
    SELECT event_type, user_id, cents,
           CAST((cents * 1000000) // SUM(cents) OVER (PARTITION BY event_type)
                AS BIGINT) AS share_ppm
    FROM t
    """,
    doc="[EXT] ratio-to-report: each user's share of their event type's "
    "total as exact parts-per-million (BIGINT scale-then-floor-div — no "
    "float division in the hash). One pre-aggregate + one unordered "
    "partition window (no sort: the frame is the whole partition).",
    tags=("window",),
)
def w14_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    t = ev.groupBy("event_type", "user_id").agg(F.sum(cents).cast("long").alias("cents"))
    w = Window.partitionBy("event_type")
    return t.select(
        "event_type",
        "user_id",
        "cents",
        F.expr("cents * 1000000").cast("long").alias("_scaled"),
    ).select(
        "event_type",
        "user_id",
        "cents",
        F.expr("_scaled div sum(cents) over (partition by event_type)")
        .cast("long")
        .alias("share_ppm"),
    )


@QS.add(
    "a17_boolean_agg_family",
    """
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE value > 50.0) AS BIGINT) AS n_big,
           bool_and(value IS NOT NULL) AS all_valued,
           bool_or(value > 99.0) AS any_near_max,
           CAST(MAX(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS INT)
             AS has_nulls
    FROM events GROUP BY event_type
    """,
    doc="[EXT] the boolean/conditional aggregate family: count_if, "
    "every/bool_and, some/bool_or, and a null-presence flag — one "
    "map-side-combinable agg. Completes the aggregate-function surface "
    "alongside argmax (agg_argmax_per_type), bitmap/HLL distinct and the "
    "numeric families.",
    tags=("agg",),
)
def a17_boolean_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50.0).cast("long").alias("n_big"),
        F.bool_and(F.col("value").isNotNull()).alias("all_valued"),
        F.bool_or(F.col("value") > 99.0).alias("any_near_max"),
        F.max(F.when(F.col("value").isNull(), 1).otherwise(0)).cast("int").alias(
            "has_nulls"
        ),
    )


# ---------------------------------------------------------------------------
# Voice-activity segmentation over the PCM frame energies.
# ---------------------------------------------------------------------------

#: Frame-energy threshold for "voiced": uniform random int16 samples have
#: E[s^2] = 32768^2/3 = 3.58e8 per sample, i.e. ~5.7e9 per 16-sample
#: frame; 6e9 cuts slightly above the mean so both classes are populated.
_VAD_T = 6_000_000_000


@QS.add(
    "mm_audio_vad_segments",
    f"""
    WITH frames AS ({_AU_ORACLE}),
    v AS (
      SELECT doc_id, frame_idx,
             CASE WHEN sum_sq >= {_VAD_T} THEN 1 ELSE 0 END AS voiced
      FROM frames
    ),
    marked AS (
      SELECT doc_id, frame_idx, voiced,
             CASE WHEN voiced = 1 AND COALESCE(lag(voiced) OVER (
                    PARTITION BY doc_id ORDER BY frame_idx), 0) = 0
                  THEN 1 ELSE 0 END AS seg_start
      FROM v
    ),
    runs AS (
      SELECT doc_id, frame_idx, voiced,
             SUM(seg_start) OVER (
               PARTITION BY doc_id ORDER BY frame_idx) AS run_id
      FROM marked
    ),
    runlen AS (
      SELECT doc_id, run_id, CAST(COUNT(*) AS BIGINT) AS len
      FROM runs WHERE voiced = 1 GROUP BY doc_id, run_id
    )
    SELECT v.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(voiced) AS BIGINT) AS n_voiced,
           CAST(COALESCE(rl.n_segments, 0) AS BIGINT) AS n_segments,
           CAST(COALESCE(rl.longest, 0) AS BIGINT) AS longest_run
    FROM v
    LEFT JOIN (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
             CAST(MAX(len) AS BIGINT) AS longest
      FROM runlen GROUP BY doc_id
    ) rl ON v.doc_id = rl.doc_id
    GROUP BY v.doc_id, rl.n_segments, rl.longest
    """,
    doc="[EXT] voice-activity segmentation — the speech-curation step "
    "after mm_audio_features: threshold each frame's exact energy, then "
    "contiguous voiced runs become segments via the classic "
    "start-flag + running-sum run-id windows (per doc, 32 frames — the "
    "window never sees raw samples). Per doc: frame/voiced counts, "
    "segment count, longest run — the keep/chop features an audio "
    "training pipeline filters on. Frames come from the same Arrow "
    "numpy kernel as mm_audio_features over deterministic md5 PCM, so "
    "the END-TO-END path (bytes -> int16 -> energies -> runs) is "
    "value-hash-gated; DuckDB re-derives every sample and every run "
    "boundary.",
    tags=("multimodal",),
)
def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.multimodal import (
        audio_frame_features,
        synth_pcm,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    frames = audio_frame_features(synth_pcm(docs))
    v = frames.select(
        "doc_id",
        "frame_idx",
        F.when(F.col("sum_sq") >= _VAD_T, 1).otherwise(0).alias("voiced"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    marked = v.withColumn(
        "seg_start",
        F.when(
            (F.col("voiced") == 1)
            & (F.coalesce(F.lag("voiced").over(w), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    )
    runs = marked.withColumn("run_id", F.sum("seg_start").over(w))
    runlen = (
        runs.filter(F.col("voiced") == 1)
        .groupBy("doc_id", "run_id")
        .agg(F.count(F.lit(1)).cast("long").alias("len"))
    )
    rl = runlen.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.max("len").cast("long").alias("longest"),
    )
    return (
        v.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum("voiced").cast("long").alias("n_voiced"),
        )
        .join(rl, "doc_id", "left")
        .select(
            "doc_id",
            "n_frames",
            "n_voiced",
            F.coalesce("n_segments", F.lit(0)).cast("long").alias("n_segments"),
            F.coalesce("longest", F.lit(0)).cast("long").alias("longest_run"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5: multi-source BFS hop distances over the interaction graph.
# ---------------------------------------------------------------------------

_BFS_ITERS = 4

#: Shared edge derivation with graph_pagerank_interactions: the symmetrized
#: customer<->supplier interaction graph.
_INTERACTION_EDGES_SQL = """
    e0 AS MATERIALIZED (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
    )"""


def _bfs_oracle() -> str:
    """Unrolled-iteration DuckDB twin of operators/graph.py:bfs_hops.
    Every it{k} is referenced twice (union + join) — multiplicative CTE
    reuse, so each MUST be MATERIALIZED (the k-core oracle lesson)."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM it{p}
        UNION ALL
        SELECT e.dst AS node, r.dist + 1 AS dist
        FROM edges e JOIN it{p} r ON e.src = r.node
      ) u GROUP BY node
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _BFS_ITERS + 1))
    return f"""
    WITH {_INTERACTION_EDGES_SQL},
    it0 AS MATERIALIZED (
      SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node, CAST(0 AS BIGINT) AS dist
      FROM supplier WHERE s_suppkey % 5 = 0
    ),
    {its}
    SELECT node, dist FROM it{_BFS_ITERS}
    """


@QS.add(
    "graph_bfs_hops",
    _bfs_oracle(),
    doc="[EXT] multi-source BFS hop distances over the symmetrized "
    "customer<->supplier interaction graph, sources = every 5th supplier "
    "(non-empty at all SFs), "
    f"{_BFS_ITERS} relaxation rounds (operators/graph.py:bfs_hops). Each "
    "round is one equi-join on src + one min-aggregate (Pregel step as "
    "two declarative ops); distances are exact BIGINTs so the 8th "
    "iterative algorithm joins the full value-hash-gated set. Rounds are "
    "eagerly checkpointed (distance table referenced twice per round — "
    "multiplicative lineage, the k-core rule).",
    tags=("graph", "iterative"),
    headline=True,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import bfs_hops

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    from clinical_api_etl_spark.operators.graph import symmetrize

    edges = symmetrize(e0)
    sources = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 5 == 0)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    return bfs_hops(edges, sources, iters=_BFS_ITERS)


# ---------------------------------------------------------------------------
# Round-5: weighted PageRank over the interaction graph.
# ---------------------------------------------------------------------------

_WPR_ITERS = 3


def _wpr_oracle() -> str:
    """Unrolled DuckDB twin of operators/graph.py:pagerank_weighted_int —
    weights = lineitem counts per (customer, supplier) pair."""
    it = """
    it{k} AS MATERIALIZED (
      SELECT e.dst AS node,
             CAST(150000000000 // n.n + (85 * SUM(r.r * e.w // e.sw)) // 100
                  AS BIGINT) AS r
      FROM esw e JOIN it{p} r ON e.src = r.node, n
      GROUP BY e.dst, n.n
    )"""
    its = ",".join(it.format(k=k, p=k - 1) for k in range(1, _WPR_ITERS + 1))
    return f"""
    WITH e0 AS MATERIALIZED (
      SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
             's' || CAST(l_suppkey AS VARCHAR) AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey, l_suppkey
    ),
    edges AS MATERIALIZED (
      SELECT src, dst, w FROM e0
      UNION ALL SELECT dst AS src, src AS dst, w FROM e0
    ),
    sw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS sw FROM edges GROUP BY src),
    esw AS MATERIALIZED (
      SELECT e.src, e.dst, e.w, s.sw FROM edges e JOIN sw s USING (src)
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    it0 AS MATERIALIZED (
      SELECT node, CAST(1000000000000 // n.n AS BIGINT) AS r FROM nodes, n
    ),
    {its}
    SELECT node, r AS rank_units FROM it{_WPR_ITERS}
    """


@QS.add(
    "graph_wpagerank_interactions",
    _wpr_oracle(),
    doc="[EXT] WEIGHTED PageRank over the customer<->supplier graph, edge "
    "weight = lineitem count between the pair: each neighbor receives "
    "rank*w div sum(w) — interaction intensity steers the walk "
    f"(operators/graph.py:pagerank_weighted_int, {_WPR_ITERS} iterations, "
    "exact BIGINT floor-div; 10th hash-gated iterative). Same plan shape "
    "as the unweighted twin: rank equi-join (AQE strategy), one dst "
    "shuffle with map-side partials per iteration.",
    tags=("graph", "iterative"),
)
def graph_wpagerank_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import pagerank_weighted_int

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            "w",
        )
    )
    edges = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    return pagerank_weighted_int(edges, iters=_WPR_ITERS)


# ---------------------------------------------------------------------------
# Round-8: strongly connected components of the DIRECTED interaction graph.
# ---------------------------------------------------------------------------

#: Direction rule for the directed interaction graph: a customer-supplier
#: contact via an ODD order flows customer->supplier (purchase), via an
#: EVEN order supplier->customer (fulfilment/return flow). Deterministic,
#: derived from real keys, and it produces the Broder bowtie shape real
#: interaction graphs have: one giant SCC (~98.6% of the 1,600 nodes at
#: sf0.01) plus one-directional periphery (22 singletons).
_DIRECTED_EDGES_SQL = """
    d_edges AS MATERIALIZED (
      SELECT DISTINCT
        CASE WHEN o_orderkey % 2 = 1
             THEN 'c' || CAST(o_custkey AS VARCHAR)
             ELSE 's' || CAST(l_suppkey AS VARCHAR) END AS src,
        CASE WHEN o_orderkey % 2 = 1
             THEN 's' || CAST(l_suppkey AS VARCHAR)
             ELSE 'c' || CAST(o_custkey AS VARCHAR) END AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )"""

# The oracle leans on a DuckDB capability Spark 4 lacks: UNION-distinct
# recursion, which terminates on CYCLIC graphs (Spark is UNION ALL only —
# tests/test_recursive.py pins that limitation; a UNION ALL closure over a
# cyclic graph never terminates). The closure is V*E work and O(V^2)
# pairs — fine at the gate's sf0.01 (1,600 nodes, 2.5M closure pairs,
# ~12s), and never the Spark path: the operator runs FW-BW + trimming.
# cl wraps the recursion MATERIALIZED because mutual references it twice
# (the k-core multiplicative-reuse rule). The label CTE chain is shared
# with graph_scc_condensation.
_SCC_LABEL_CTES = """
    r(a, b) AS (
      SELECT src, dst FROM d_edges
      UNION
      SELECT r.a, e.dst FROM r JOIN d_edges e ON e.src = r.b
    ),
    cl AS MATERIALIZED (SELECT a, b FROM r),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM d_edges UNION SELECT dst FROM d_edges
    ),
    mutual AS (
      SELECT c1.a AS u, c1.b AS v
      FROM cl c1 JOIN cl c2 ON c2.a = c1.b AND c2.b = c1.a
    ),
    scc AS MATERIALIZED (
      SELECT n.node, LEAST(n.node, COALESCE(MIN(m.v), n.node)) AS scc_id
      FROM nodes n LEFT JOIN mutual m ON m.u = n.node
      GROUP BY n.node
    )"""

_SCC_ORACLE = f"""
    WITH RECURSIVE {_DIRECTED_EDGES_SQL},
    {_SCC_LABEL_CTES}
    SELECT node, scc_id FROM scc
"""


@QS.add(
    "graph_scc_components",
    _SCC_ORACLE,
    doc="[EXT] strongly connected components of the DIRECTED interaction "
    "graph (customer->supplier on odd orders, supplier->customer on "
    "even — the parity rule plants real cycle structure and yields the "
    "Broder bowtie: one giant SCC + DAG periphery). Spark side = FW-BW "
    "decomposition with recursive trimming "
    "(operators/graph.py:scc_components): trim peels in/out-degree-0 "
    "nodes to fixpoint (singleton SCCs), then forward∩backward salted-"
    "frontier BFS from the deterministic min-id pivot extracts its "
    "whole SCC; repeat. The label is CANONICAL (min node id per "
    "component), so the 20th hash-gated iterative compares against a "
    "DuckDB UNION-distinct recursive transitive closure computing the "
    "identical labeling — an algorithm-independent oracle (Spark "
    "cannot declare that closure: UNION ALL recursion never terminates "
    "on cycles). Scale: node-set state, equi-joins + distincts only, "
    "1-row pivot collects; closure never runs on the Spark side.",
    tags=("graph", "iterative"),
    headline=True,
)
def graph_scc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import scc_components

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    odd = F.col("o_orderkey") % 2 == 1
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.when(odd, c).otherwise(s).alias("src"),
            F.when(odd, s).otherwise(c).alias("dst"),
        )
        .distinct()
    )
    return scc_components(e0)


@QS.add(
    "graph_scc_condensation",
    f"""
    WITH RECURSIVE {_DIRECTED_EDGES_SQL},
    {_SCC_LABEL_CTES},
    cond AS MATERIALIZED (
      SELECT DISTINCT sa.scc_id AS a, sb.scc_id AS b
      FROM d_edges e
      JOIN scc sa ON sa.node = e.src
      JOIN scc sb ON sb.node = e.dst
      WHERE sa.scc_id <> sb.scc_id
    ),
    sizes AS (
      SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM scc GROUP BY scc_id
    )
    SELECT s.scc_id, s.n_nodes,
           CAST(COALESCE(od.d, 0) AS BIGINT) AS out_deg,
           CAST(COALESCE(id_.d, 0) AS BIGINT) AS in_deg
    FROM sizes s
    LEFT JOIN (SELECT a, COUNT(*) AS d FROM cond GROUP BY a) od
      ON od.a = s.scc_id
    LEFT JOIN (SELECT b, COUNT(*) AS d FROM cond GROUP BY b) id_
      ON id_.b = s.scc_id
    """,
    doc="[EXT] condensation DAG of the directed interaction graph: one "
    "row per strongly connected component with its size and its in/out "
    "degree among CONDENSED edges (distinct SCC->SCC pairs; intra-SCC "
    "edges collapse away). The Broder-bowtie summary a web/interaction "
    "crawl publishes — which components feed the giant SCC (IN), which "
    "it feeds (OUT). Spark side reuses operators/graph.py:scc_components "
    "(FW-BW + trimming) and two equi-joins of the label table onto the "
    "edge list; the oracle derives the identical canonical labels from "
    "the UNION-distinct recursive closure and condenses in SQL.",
    tags=("graph", "iterative"),
)
def graph_scc_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import scc_components

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    odd = F.col("o_orderkey") % 2 == 1
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.when(odd, c).otherwise(s).alias("src"),
            F.when(odd, s).otherwise(c).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = scc_components(e0).localCheckpoint(eager=True)
    la = labels.select(F.col("node").alias("src"), F.col("scc_id").alias("a"))
    lb = labels.select(F.col("node").alias("dst"), F.col("scc_id").alias("b"))
    cond = (
        e0.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = labels.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    od = cond.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    ind = cond.groupBy("b").agg(F.count(F.lit(1)).alias("d"))
    return (
        sizes.join(od, sizes["scc_id"] == od["a"], "left")
        .select("scc_id", "n_nodes", F.coalesce("d", F.lit(0)).cast("long").alias("out_deg"))
        .join(ind, F.col("scc_id") == ind["b"], "left")
        .select(
            "scc_id",
            "n_nodes",
            "out_deg",
            F.coalesce("d", F.lit(0)).cast("long").alias("in_deg"),
        )
    )


@QS.add(
    "graph_diameter_2sweep",
    f"""
    WITH RECURSIVE {_DIRECTED_EDGES_SQL},
    edges AS MATERIALIZED (
      SELECT src, dst FROM d_edges
      UNION ALL SELECT dst AS src, src AS dst FROM d_edges
    ),
    p0 AS (SELECT MIN(src) AS node FROM edges),
    r1(node, dist) AS (
      SELECT node, CAST(0 AS BIGINT) FROM p0
      UNION
      SELECT e.dst, r1.dist + 1
      FROM r1 JOIN edges e ON e.src = r1.node WHERE r1.dist < 32
    ),
    d1 AS MATERIALIZED (
      SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM r1 GROUP BY node
    ),
    p1 AS MATERIALIZED (
      SELECT node FROM d1 ORDER BY dist DESC, node LIMIT 1
    ),
    r2(node, dist) AS (
      SELECT node, CAST(0 AS BIGINT) FROM p1
      UNION
      SELECT e.dst, r2.dist + 1
      FROM r2 JOIN edges e ON e.src = r2.node WHERE r2.dist < 32
    ),
    d2 AS MATERIALIZED (
      SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM r2 GROUP BY node
    )
    SELECT (SELECT node FROM p0) AS pivot_a,
           (SELECT MAX(dist) FROM d1) AS ecc_a,
           (SELECT node FROM p1) AS pivot_b,
           (SELECT MAX(dist) FROM d2) AS diameter_lb,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d2) AS n_reached
    """,
    doc="[EXT] double-sweep diameter bound (Magnien et al. 2009 — the "
    "standard cheap estimator crawl analyses publish): BFS to saturation "
    "from the deterministic min-id node, re-BFS from the farthest node "
    "found (ties by id), whose eccentricity lower-bounds the diameter "
    "(exact on trees; within 1-2 in practice on real graphs). Runs on "
    "the symmetrized interaction graph with the salted frontier "
    "machinery — the settled-|V| check stops each sweep at "
    "saturation+1 rounds, so cost is 2 BFS, never all-pairs. Oracle: "
    "two chained UNION-distinct recursive CTEs (hop-guarded at 32; "
    "cycles bounded by the distinct (node, dist) working set), the "
    "second seeded from the first's argmax. All outputs exact "
    "BIGINT/string.",
    tags=("graph", "iterative"),
)
def graph_diameter_2sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import (
        bfs_hops_per_source,
        symmetrize,
    )

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    odd = F.col("o_orderkey") % 2 == 1
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.when(odd, c).otherwise(s).alias("src"),
            F.when(odd, s).otherwise(c).alias("dst"),
        )
        .distinct()
    )
    edges = symmetrize(e0).localCheckpoint(eager=True)
    spark_sess = edges.sparkSession
    pivot_a = edges.agg(F.min("src")).collect()[0][0]
    d1 = bfs_hops_per_source(
        edges, spark_sess.createDataFrame([(pivot_a,)], "node string"), iters=32
    )
    far = d1.orderBy(F.desc("dist"), "node").limit(1).collect()[0]
    pivot_b, ecc_a = far["node"], far["dist"]
    d2 = bfs_hops_per_source(
        edges, spark_sess.createDataFrame([(pivot_b,)], "node string"), iters=32
    )
    row = d2.agg(
        F.max("dist").cast("long").alias("diameter_lb"),
        F.count(F.lit(1)).cast("long").alias("n_reached"),
    ).collect()[0]
    return spark_sess.createDataFrame(
        [
            (
                pivot_a,
                int(ecc_a),
                pivot_b,
                int(row["diameter_lb"]),
                int(row["n_reached"]),
            )
        ],
        "pivot_a string, ecc_a long, pivot_b string, diameter_lb long,"
        " n_reached long",
    )


def _silhouette_oracle() -> str:
    q = (
        "list_transform(range(1, 65), d -> CAST(floor(CAST(embedding[d]"
        " AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE))"
    )
    sums = ", ".join(
        f"CAST(SUM(CAST(floor(CAST(embedding[{j + 1}] AS DOUBLE)"
        f" * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) AS s{j}"
        for j in range(_CENT_DIM)
    )
    s_arr = "list_value(" + ", ".join(f"s{j}" for j in range(_CENT_DIM)) + ")"
    return f"""
    WITH cent AS MATERIALIZED (
      SELECT label AS c_label, CAST(COUNT(*) AS BIGINT) AS n_c, {sums}
      FROM embeddings GROUP BY label
    ),
    pts AS (SELECT vec_id, label, {q} AS q FROM embeddings),
    d AS (
      SELECT p.vec_id, p.label, c.c_label,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, 65),
                 d -> (p.q[d] * CAST(c.n_c AS DOUBLE) - {s_arr}[d])
                      * (p.q[d] * CAST(c.n_c AS DOUBLE) - {s_arr}[d]))),
               (x, y) -> x + y))
             / (1000000.0e0 * CAST(c.n_c AS DOUBLE)) AS dist
      FROM pts p CROSS JOIN cent c
    ),
    ab AS (
      SELECT vec_id, label,
             MIN(CASE WHEN c_label = label THEN dist END) AS a,
             MIN(CASE WHEN c_label <> label THEN dist END) AS b
      FROM d GROUP BY vec_id, label
    ),
    s AS (
      SELECT vec_id, label, (b - a) / GREATEST(a, b) AS s
      FROM ab WHERE GREATEST(a, b) > 0
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(s ORDER BY vec_id)), (x, y) -> x + y)
           / CAST(COUNT(*) AS DOUBLE) AS mean_silhouette
    FROM s GROUP BY label
    """


@QS.add(
    "ml_silhouette_labels",
    _silhouette_oracle(),
    doc="[EXT] simplified silhouette of the LABELED clustering (Hruschka "
    "et al.: distance to class centroids instead of all-pairs — the "
    "O(N·k) form that scales where the classic O(N²) silhouette "
    "cannot): a = distance to own-label centroid, b = nearest other "
    "centroid, s = (b−a)/max(a,b), averaged per label. Fully "
    "hash-gated via the micro-unit discipline: vectors quantize to "
    "exact 1e-6 integers, centroids stay as exact (sum, n) pairs, and "
    "each distance is sqrt(Σ_d (q_d·n − s_d)²)/(1e6·n) — every term a "
    "single IEEE multiply of exactly-representable doubles folded in "
    "PINNED dim order, sqrt and the division correctly rounded, so a/b "
    "comparisons and the final pinned vec-order mean are bit-identical "
    "across engines. The cluster-quality audit for the label taxonomy "
    "(low mean silhouette = labels not separable in embedding space — "
    "re-label or re-embed before training on them).",
    tags=("ml", "embedding"),
)
def ml_silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    sums = [
        F.sum(
            F.floor(
                F.element_at("embedding", j + 1).cast("double") * 1000000.0 + 0.5
            ).cast("long")
        )
        .cast("double")
        .alias(f"s{j}")
        for j in range(_CENT_DIM)
    ]
    cent = emb.groupBy(F.col("label").alias("c_label")).agg(
        F.count("*").cast("long").alias("n_c"), *sums
    )
    cent = cent.select(
        "c_label", "n_c", F.array(*[f"s{j}" for j in range(_CENT_DIM)]).alias("s")
    )
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000000.0 + 0.5).cast("double"),
    )
    pts = emb.select("vec_id", "label", q.alias("q"))
    dist = (
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("q"),
                    F.col("s"),
                    lambda x, y: (x * F.col("n_c").cast("double") - y)
                    * (x * F.col("n_c").cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
        )
        / (F.lit(1000000.0) * F.col("n_c").cast("double"))
    )
    d = pts.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "c_label", dist.alias("dist")
    )
    ab = d.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("c_label") == F.col("label"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("c_label") != F.col("label"), F.col("dist"))).alias("b"),
    )
    s = ab.filter(F.greatest("a", "b") > 0).select(
        "vec_id",
        "label",
        ((F.col("b") - F.col("a")) / F.greatest("a", "b")).alias("s"),
    )
    return s.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("vec_id", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            )
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_silhouette"),
    )


# ---------------------------------------------------------------------------
# Topological layering of the SCC condensation DAG (Kahn longest-path).
# ---------------------------------------------------------------------------


@QS.add(
    "graph_condensation_layers",
    f"""
    WITH RECURSIVE {_DIRECTED_EDGES_SQL},
    {_SCC_LABEL_CTES},
    cond AS MATERIALIZED (
      SELECT DISTINCT sa.scc_id AS a, sb.scc_id AS b
      FROM d_edges e
      JOIN scc sa ON sa.node = e.src
      JOIN scc sb ON sb.node = e.dst
      WHERE sa.scc_id <> sb.scc_id
    ),
    comps AS MATERIALIZED (SELECT DISTINCT scc_id FROM scc),
    rl(n, d) AS (
      SELECT scc_id, CAST(0 AS BIGINT) FROM comps
      WHERE scc_id NOT IN (SELECT b FROM cond)
      UNION
      SELECT e.b, rl.d + 1 FROM rl JOIN cond e ON e.a = rl.n
      WHERE rl.d < 64
    ),
    lay AS (
      SELECT n AS scc_id, CAST(MAX(d) AS BIGINT) AS layer FROM rl GROUP BY n
    ),
    sizes AS (
      SELECT scc_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM scc GROUP BY scc_id
    )
    SELECT s.scc_id, s.n_nodes, l.layer
    FROM sizes s JOIN lay l ON l.scc_id = s.scc_id
    """,
    doc="[EXT] topological layering of the SCC condensation DAG: each "
    "component's layer = its longest path length from any source "
    "component (Kahn peel round: in-degree-0 components are layer 0, "
    "remove and repeat) — the stage schedule a pipeline scheduler or "
    "cycle-collapsed dependency analysis derives from a directed "
    "graph. Spark side reuses scc_components (FW-BW + trimming) and "
    "peels the TINY condensation iteratively (left-anti frontier per "
    "round, bounded by DAG depth, each round's state checkpointed); "
    "the oracle recomputes the identical canonical labels from the "
    "UNION-distinct closure and layers them with a recursive CTE "
    "(UNION-distinct on (node, depth) pairs — terminates because the "
    "condensation is acyclic BY CONSTRUCTION; depth guard 64). "
    "Layer values are algorithm-independent, so the 23rd hash-gated "
    "iterative composes two iterative algorithms under one hash.",
    tags=("graph", "iterative"),
)
def graph_condensation_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import dag_layers, scc_components

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    odd = F.col("o_orderkey") % 2 == 1
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.when(odd, c).otherwise(s).alias("src"),
            F.when(odd, s).otherwise(c).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = scc_components(e0).localCheckpoint(eager=True)
    la = labels.select(F.col("node").alias("src"), F.col("scc_id").alias("a"))
    lb = labels.select(F.col("node").alias("dst"), F.col("scc_id").alias("b"))
    rem_edges = (
        e0.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = labels.groupBy("scc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    out = dag_layers(labels.select("scc_id"), rem_edges)
    return sizes.join(out, "scc_id").select("scc_id", "n_nodes", "layer")


# ---------------------------------------------------------------------------
# Broder bow-tie classification of the directed interaction graph.
# ---------------------------------------------------------------------------


@QS.add(
    "graph_bowtie_regions",
    f"""
    WITH RECURSIVE {_DIRECTED_EDGES_SQL},
    {_SCC_LABEL_CTES},
    giant AS MATERIALIZED (
      SELECT scc_id FROM (
        SELECT scc_id, COUNT(*) AS c FROM scc GROUP BY scc_id
        ORDER BY c DESC, scc_id LIMIT 1
      )
    ),
    fwd AS MATERIALIZED (
      SELECT DISTINCT cl.b AS node
      FROM cl JOIN scc s ON s.node = cl.a
      WHERE s.scc_id = (SELECT scc_id FROM giant)
    ),
    bwd AS MATERIALIZED (
      SELECT DISTINCT cl.a AS node
      FROM cl JOIN scc s ON s.node = cl.b
      WHERE s.scc_id = (SELECT scc_id FROM giant)
    )
    SELECT s.node,
           CASE WHEN s.scc_id = (SELECT scc_id FROM giant) THEN 'core'
                WHEN s.node IN (SELECT node FROM fwd) THEN 'out'
                WHEN s.node IN (SELECT node FROM bwd) THEN 'in'
                ELSE 'other' END AS region
    FROM scc s
    """,
    doc="[EXT] Broder bow-tie classification of the directed interaction "
    "graph: every node labeled core (the giant SCC, largest by size with "
    "min-scc_id tiebreak), out (reachable FROM the core), in (reaches "
    "the core), or other (tendrils/tubes/disconnected) — the region "
    "census a web/interaction crawl publishes (Broder et al. 2000). "
    "Spark side: scc_components picks the giant, then TWO plain "
    "frontier-BFS reachability passes (operators/graph.py:reachable_set "
    "— set-state only, no per-source explosion) over the edges and "
    "their reversal; labels are canonical so the 24th hash-gated "
    "iterative composes SCC + reachability under one hash. Oracle "
    "derives the identical regions from the UNION-distinct closure.",
    tags=("graph", "iterative"),
)
def graph_bowtie_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.graph import (
        reachable_set,
        scc_components,
    )

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    odd = F.col("o_orderkey") % 2 == 1
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.when(odd, c).otherwise(s).alias("src"),
            F.when(odd, s).otherwise(c).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = scc_components(e0).localCheckpoint(eager=True)
    giant = (
        labels.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("scc_id"))
        .limit(1)
        .select("scc_id")
    )
    giant_nodes = labels.join(F.broadcast(giant), "scc_id").select("node")
    fwd = reachable_set(e0, giant_nodes).select(
        F.col("node"), F.lit(True).alias("in_fwd")
    )
    rev = e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    bwd = reachable_set(rev, giant_nodes).select(
        F.col("node"), F.lit(True).alias("in_bwd")
    )
    gid = giant.withColumnRenamed("scc_id", "giant_id")
    # fwd/bwd are O(|V|) reachable regions (a constant fraction of all
    # nodes on a real bow-tie) — equi-joins on node need no hint; only
    # the single-row giant id stays broadcast.
    return (
        labels.crossJoin(F.broadcast(gid))
        .join(fwd, "node", "left")
        .join(bwd, "node", "left")
        .select(
            "node",
            F.when(F.col("scc_id") == F.col("giant_id"), F.lit("core"))
            .when(F.col("in_fwd"), F.lit("out"))
            .when(F.col("in_bwd"), F.lit("in"))
            .otherwise(F.lit("other"))
            .alias("region"),
        )
    )
