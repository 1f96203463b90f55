"""Mining family, misc slice: fuzzy name join, Morton codes, weighted sampling + leakage-safe splits + centroids, audio PCM features + VAD, association rules, declarative expectations, window value-function family, text stutter cleaning, deterministic global enumeration, share-of-total windows.

Part of the ``plans.mining`` package — the former 3,155-line
plans/mining.py split along its families (VERDICT r09 task 8):
miningraph (triangle/k-core/k-truss, random walks, BFS, weighted
pagerank, SCC + condensation + bow-tie), sketchstats (count-min, theta,
exact correlation/CUSUM/MAD/Gini, table digest, chi-square/Gram),
miningmisc (fuzzy join, Morton, sampling/splits, audio kernels,
association rules, expectations, text cleaning, windows). Mechanical
split, zero behavior change; the package __init__ merges the QuerySets
and re-exports every top-level name.
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


