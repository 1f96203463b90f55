"""Tokenizers and n-gram language models: trigram LM + Kneser-Ney + LM familiarity, BPE learn/apply/vocab/round-trip/fertility, WordPiece, feature hashing, language rebalance.

Mechanical split of the former 4,878-line plans/inference.py (VERDICT r08 task 8); zero behavior change."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import tokens
from clinical_api_etl_spark.plans.base import QuerySet
from clinical_api_etl_spark.sources.catalog import load

from ._shared import _CENTS, _DAY_MS, _DAY_MS_I, _EDF_SRC, _HOUR_MS, _TOKS, _cents  # noqa: F401

QS = QuerySet()


_TRI_MIN_COUNT = 2


@QS.add(
    "text_trigram_lm",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    tri AS (
      SELECT g['w1'] AS w1, g['w2'] AS w2, g['w3'] AS w3,
             CAST(COUNT(*) AS BIGINT) AS c3
      FROM (
        SELECT unnest(list_transform(range(1, len(toks) - 1),
                 i -> {{'w1': toks[i], 'w2': toks[i + 1],
                        'w3': toks[i + 2]}})) AS g
        FROM t WHERE len(toks) >= 3
      )
      GROUP BY w1, w2, w3
    ),
    ctx AS (
      SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2
      FROM tri GROUP BY w1, w2
    )
    SELECT tri.w1, tri.w2, tri.w3, tri.c3, ctx.c2,
           tri.c3 * 1000000 // ctx.c2 AS cond_ppm
    FROM tri JOIN ctx ON tri.w1 = ctx.w1 AND tri.w2 = ctx.w2
    WHERE tri.c3 >= {_TRI_MIN_COUNT}
    """,
    doc="[EXT] trigram language-model count table (the KenLM/Kneser-Ney "
    "ingestion precursor and the classic perplexity-filter backbone): "
    "per trigram with count ≥ 2, its count, its context-bigram count, "
    "and the MLE conditional p(w3|w1,w2) in exact parts-per-million "
    "(scale-then-floor-div — Spark `div` == DuckDB `//` on "
    "non-negatives, zero fp risk). Context counts derive from the "
    "trigram aggregate itself (Σ_w3 c3 — an aggregate OF the aggregate), "
    "so the corpus is tokenized and exploded exactly ONCE; the "
    "ctx re-join is an equi-join on the reduced table. The min-count "
    "filter applies after context counting, so cond_ppm denominators "
    "are the true totals.",
    tags=("text",),
)
def text_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks_df = docs.select(tokens(F.col("text")).alias("toks"))
    grams = F.when(
        F.size("toks") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2"),
                F.element_at("toks", i + 2).alias("w3"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string,w3:string>>"))
    tri = (
        toks_df.select(F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .select("g.w1", "g.w2", "g.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c3"))
    )
    ctx = tri.groupBy("w1", "w2").agg(F.sum("c3").cast("long").alias("c2"))
    return (
        tri.filter(F.col("c3") >= _TRI_MIN_COUNT)
        .join(ctx, ["w1", "w2"])
        .select(
            "w1",
            "w2",
            "w3",
            "c3",
            "c2",
            F.expr("c3 * 1000000 div c2").alias("cond_ppm"),
        )
    )


def _doc_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w1, w2, w3) — one row per trigram occurrence."""
    docs = load(spark, sf_dir, "documents")
    toks_df = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    grams = F.when(
        F.size("toks") >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2"),
                F.element_at("toks", i + 2).alias("w3"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string,w3:string>>"))
    return (
        toks_df.select("doc_id", F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .select("doc_id", "g.w1", "g.w2", "g.w3")
    )


@QS.add(
    "text_lm_familiarity",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    occ AS (
      SELECT doc_id, g['w1'] AS w1, g['w2'] AS w2, g['w3'] AS w3
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                 i -> {{'w1': toks[i], 'w2': toks[i + 1],
                        'w3': toks[i + 2]}})) AS g
        FROM t WHERE len(toks) >= 3
      )
    ),
    tri AS (
      SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3
      FROM occ GROUP BY w1, w2, w3
    ),
    ctx AS (
      SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2 FROM tri GROUP BY w1, w2
    ),
    scored AS (
      SELECT occ.doc_id, tri.c3 * 1000000 // ctx.c2 AS ppm
      FROM occ
      JOIN tri ON occ.w1 = tri.w1 AND occ.w2 = tri.w2 AND occ.w3 = tri.w3
      JOIN ctx ON occ.w1 = ctx.w1 AND occ.w2 = ctx.w2
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(ppm) AS BIGINT) AS sum_ppm,
           SUM(ppm) // COUNT(*) AS mean_ppm
    FROM scored GROUP BY doc_id
    """,
    doc="[EXT] per-document language-model familiarity — the "
    "perplexity-filter proxy (CCNet/Gopher keep-well-modeled-text "
    "signal) with zero logarithms: every trigram occurrence is scored "
    "by its corpus MLE conditional probability in exact ppm "
    "(text_trigram_lm's table, self-trained on the same corpus), and "
    "each doc reports the exact integer mean. Low mean_ppm = the "
    "doc's word sequences are rare given their contexts = surprising "
    "text. Shape: ONE tokenize/explode pass feeds both the count "
    "tables and the per-doc re-join; the equi-joins run on hashed "
    "trigram keys. Arithmetic-mean-of-ppm replaces "
    "geometric-mean-perplexity so the score stays engine-portable "
    "(floor-div, no floats at all).",
    tags=("text",),
)
def text_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    occ = _doc_trigrams(spark, sf_dir)
    # Two aggregates + a re-join read `occ` three times; materialize the
    # narrow occurrence table once (it is the tokenization's only output).
    occ = occ.persist()
    tri = occ.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c3")
    )
    ctx = tri.groupBy("w1", "w2").agg(F.sum("c3").cast("long").alias("c2"))
    scored = (
        occ.join(tri, ["w1", "w2", "w3"])
        .join(ctx, ["w1", "w2"])
        .select("doc_id", F.expr("c3 * 1000000 div c2").alias("ppm"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum("ppm").cast("long").alias("sum_ppm"),
        F.expr("sum(ppm) div count(*)").alias("mean_ppm"),
    )


_BPE_MERGES = 6


def _bpe_oracle(n: int) -> str:
    """Unrolled DuckDB twin of operators/bpe.py:learn_bpe — every chained
    CTE MATERIALIZED (DuckDB inlines multiply-referenced CTEs otherwise
    and the iteration chain re-expands exponentially; see the k-core
    oracle)."""
    ctes = [
        f"toks AS (SELECT {_TOKS} AS t FROM documents)",
        "w AS MATERIALIZED (SELECT tok AS word, CAST(COUNT(*) AS BIGINT)"
        " AS freq FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)",
        "s0 AS MATERIALIZED (SELECT freq,"
        " regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym FROM w)",
    ]
    for i in range(1, n + 1):
        ctes.append(
            f"p{i} AS ("
            " SELECT p['lhs'] AS lhs, p['rhs'] AS rhs,"
            " CAST(SUM(freq) AS BIGINT) AS pair_count"
            " FROM (SELECT freq, unnest(list_transform(range(1, len(tk)),"
            " j -> {'lhs': tk[j], 'rhs': tk[j + 1]})) AS p"
            f" FROM (SELECT freq, string_split(sym, ' ') AS tk FROM s{i - 1}))"
            " GROUP BY lhs, rhs)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT lhs, rhs, pair_count FROM p{i}"
            " ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT freq,"
            " trim(replace(replace(' ' || replace(sym, ' ', '  ') || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || '  ' || (SELECT rhs FROM m{i}) || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || (SELECT rhs FROM m{i}) || ' '),"
            f" '  ', ' ')) AS sym FROM s{i - 1})"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS it, lhs, rhs, lhs || rhs AS merged,"
        f" pair_count FROM m{i}"
        for i in range(1, n + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


@QS.add(
    "bpe_learn_merges",
    _bpe_oracle(_BPE_MERGES),
    doc="[EXT] BPE tokenizer training (Sennrich'16; the GPT-2/LLaMA "
    "tokenizer family): learn the first 6 merge rules from the corpus "
    "word-frequency table. Iterative model training under a FULL "
    "cross-engine value hash — pair counting is a map-side-combinable "
    "explode/groupBy over the (word, freq) aggregate (millions of rows "
    "at 100 TB, never the corpus), the per-iteration argmax collects "
    "ONE row (freq DESC then lexicographic — deterministic ties), and "
    "merge application is a regex-free space-doubling replace chain "
    "with identical left-to-right non-overlapping semantics in the JVM, "
    "DuckDB, and python str.replace (operators/bpe.py). Oracle = "
    "unrolled MATERIALIZED CTE chain, one (pairs, argmax, rewrite) "
    "triple per iteration.",
    tags=("text", "iterative"),
    headline=True,
)
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import learn_bpe_distributed

    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode_outer(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    rows = learn_bpe_distributed(words, _BPE_MERGES)
    return spark.createDataFrame(
        rows, schema="it BIGINT, lhs STRING, rhs STRING, merged STRING, pair_count BIGINT"
    )


@QS.add(
    "text_trigram_kn",
    f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    tri AS (
      SELECT g['w1'] AS w1, g['w2'] AS w2, g['w3'] AS w3,
             CAST(COUNT(*) AS BIGINT) AS c3
      FROM (
        SELECT unnest(list_transform(range(1, len(toks) - 1),
                 i -> {{'w1': toks[i], 'w2': toks[i + 1],
                        'w3': toks[i + 2]}})) AS g
        FROM t WHERE len(toks) >= 3
      )
      GROUP BY w1, w2, w3
    ),
    ctx AS (
      SELECT w1, w2, CAST(SUM(c3) AS BIGINT) AS c2,
             CAST(COUNT(*) AS BIGINT) AS n1plus
      FROM tri GROUP BY w1, w2
    ),
    cont AS (
      SELECT w3, CAST(COUNT(*) AS BIGINT) AS cont_w3 FROM tri GROUP BY w3
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM tri)
    SELECT tri.w1, tri.w2, tri.w3, tri.c3, ctx.c2, ctx.n1plus, cont.cont_w3,
           (4 * tri.c3 - 3) * 1000000 // (4 * ctx.c2)
             + 3 * ctx.n1plus * (cont.cont_w3 * 1000000 // tot.n_types)
               // (4 * ctx.c2) AS p_kn_ppm
    FROM tri
    JOIN ctx ON tri.w1 = ctx.w1 AND tri.w2 = ctx.w2
    JOIN cont ON tri.w3 = cont.w3
    CROSS JOIN tot
    WHERE tri.c3 >= 2
    """,
    doc="[EXT] Kneser-Ney absolute discounting over the trigram table — "
    "the smoothing real n-gram LMs (KenLM) ship, in EXACT integers: "
    "discount D = 3/4 lives in quarter-scaled numerators ((4c3−3)/4c2), "
    "the back-off weight λ = D·n1plus/c2 multiplies the CONTINUATION "
    "probability cont(w3)/|trigram types| (how many contexts a word "
    "completes — KN's insight — not its raw frequency), and the two "
    "terms compose by documented floor-divs, so p_kn_ppm is a BIGINT "
    "both engines replay bit-for-bit. Every input (c3, c2, successor "
    "types n1plus, continuation counts, type total) is an aggregate of "
    "the ONE trigram table — four map-side-combinable aggs, equi-joins "
    "back, corpus tokenized once.",
    tags=("text",),
)
def text_trigram_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    occ = _doc_trigrams(spark, sf_dir)
    tri = occ.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c3")
    ).persist()
    ctx = tri.groupBy("w1", "w2").agg(
        F.sum("c3").cast("long").alias("c2"),
        F.count(F.lit(1)).cast("long").alias("n1plus"),
    )
    cont = tri.groupBy("w3").agg(F.count(F.lit(1)).cast("long").alias("cont_w3"))
    tot = tri.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    return (
        tri.filter(F.col("c3") >= 2)
        .join(ctx, ["w1", "w2"])
        .join(cont, ["w3"])
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "w3",
            "c3",
            "c2",
            "n1plus",
            "cont_w3",
            F.expr(
                "(4 * c3 - 3) * 1000000 div (4 * c2)"
                " + 3 * n1plus * (cont_w3 * 1000000 div n_types)"
                " div (4 * c2)"
            ).alias("p_kn_ppm"),
        )
    )


_FH_BUCKETS = 256


@QS.add(
    "text_hashed_features",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    )
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(tok), 1, 4) AS INTEGER)
                % {_FH_BUCKETS} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM tok
    GROUP BY doc_id, bucket
    """,
    doc="[EXT] the hashing trick (HashingVectorizer / Vowpal Wabbit "
    "feature hashing): sparse bag-of-words features with a FIXED "
    "{_FH_BUCKETS}-dim space and no vocabulary pass — the stateless "
    "featurizer streaming/online pipelines need (new tokens never "
    "resize anything, buckets merge across shards). Bucket = first 16 "
    "md5 bits mod buckets via the portable hex-to-int bridge "
    "(conv == CAST('0x'||hex)), so the sparse feature table hash-matches "
    "across engines. One explode + one map-side-combinable aggregate.",
    tags=("text", "mlprep"),
)
def text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
        % _FH_BUCKETS
    )
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _bpe_apply_oracle(n: int) -> str:
    """Unrolled learn-then-apply twin: the same MATERIALIZED merge chain
    as ``_bpe_oracle`` but with the word carried through every rewrite, so
    the final symbol table segments the vocabulary and a join against the
    per-doc word counts tokenizes the corpus."""
    ctes = [
        f"toks AS MATERIALIZED (SELECT doc_id, {_TOKS} AS t FROM documents)",
        "w AS MATERIALIZED (SELECT tok AS word, CAST(COUNT(*) AS BIGINT)"
        " AS freq FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)",
        "s0 AS MATERIALIZED (SELECT word, freq,"
        " regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym FROM w)",
    ]
    for i in range(1, n + 1):
        ctes.append(
            f"p{i} AS ("
            " SELECT p['lhs'] AS lhs, p['rhs'] AS rhs,"
            " CAST(SUM(freq) AS BIGINT) AS pair_count"
            " FROM (SELECT freq, unnest(list_transform(range(1, len(tk)),"
            " j -> {'lhs': tk[j], 'rhs': tk[j + 1]})) AS p"
            f" FROM (SELECT freq, string_split(sym, ' ') AS tk FROM s{i - 1}))"
            " GROUP BY lhs, rhs)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT lhs, rhs FROM p{i}"
            " ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT word, freq,"
            " trim(replace(replace(' ' || replace(sym, ' ', '  ') || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || '  ' || (SELECT rhs FROM m{i}) || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || (SELECT rhs FROM m{i}) || ' '),"
            f" '  ', ' ')) AS sym FROM s{i - 1})"
        )
    tail = f"""
    seg AS (SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sub
            FROM s{n}),
    docw AS (SELECT doc_id, tok AS word, CAST(COUNT(*) AS BIGINT) AS c
             FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
             GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_words,
           CAST(SUM(c * n_sub) AS BIGINT) AS n_bpe_tokens
    FROM docw JOIN seg USING (word)
    GROUP BY doc_id
    """
    return "WITH " + ",\n".join(ctes) + ",\n" + tail


@QS.add(
    "bpe_apply_corpus",
    _bpe_apply_oracle(_BPE_MERGES),
    doc="[EXT] corpus tokenization under the learned BPE table — the "
    "apply half of bpe_learn_merges (train -> tokenize is THE "
    "pretraining-corpus sizing pass: per-document token counts decide "
    "packing, cost, and mixture budgets). The merge chain is applied "
    "ONCE per distinct word via the same space-doubling replace "
    "expressions (JVM-side, zero Python), so tokenization cost scales "
    "with the VOCABULARY, not the corpus; documents tokenize through a "
    "broadcast join of the (word, n_subtokens) segment table against "
    "per-doc word counts. Exact BIGINT counts per doc hash-match "
    "DuckDB's unrolled learn-then-apply twin end to end — the oracle "
    "re-learns every merge before re-applying it.",
    tags=("text", "iterative"),
    headline=True,
)
def bpe_apply_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import (
        _apply_merge,
        initial_symbols,
        learn_bpe_distributed,
    )

    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
        .coalesce(8)
        .persist()
    )
    words = tok.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    merges = learn_bpe_distributed(words, _BPE_MERGES)
    sym = initial_symbols(F.col("word"))
    for m in merges:
        sym = _apply_merge(sym, F.lit(m.lhs), F.lit(m.rhs))
    seg = words.select(
        "word", F.size(F.split(sym, " ")).cast("long").alias("n_sub")
    )
    docw = tok.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        docw.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sub")).cast("long").alias("n_bpe_tokens"),
        )
    )


@QS.add(
    "corpus_lang_rebalance",
    """
    WITH ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ),
    m AS (SELECT MIN(cnt) AS m FROM
            (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang)),
    kept AS (
      SELECT lang, doc_id FROM ranked CROSS JOIN m WHERE rk <= m.m
    )
    SELECT r.lang,
           CAST(COUNT(*) AS BIGINT) AS n_available,
           CAST(COUNT(*) FILTER (k.doc_id IS NOT NULL) AS BIGINT) AS n_kept,
           md5(string_agg(CAST(k.doc_id AS VARCHAR), ','
                          ORDER BY k.doc_id)) AS kept_fp
    FROM ranked r LEFT JOIN kept k
      ON r.lang = k.lang AND r.doc_id = k.doc_id
    GROUP BY r.lang
    """,
    doc="[EXT] deterministic multilingual rebalance — downsample every "
    "language to the size of the smallest one (the balanced-mixture "
    "step of multilingual pretraining-corpus assembly). Selection is by "
    "HASH RANK: docs sort within each language by md5 of their id and "
    "the lowest m survive — reproducible across engines and runs, "
    "uniformly random w.r.t. content, and incrementally stable (a doc's "
    "rank only moves if earlier-hashed docs arrive). One window over "
    "(lang, doc) and one broadcast-scale min; the kept set is "
    "fingerprinted (md5 of the ordered id list) so the GATE covers the "
    "exact sample, not just its size.",
    tags=("text", "sampling"),
)
def corpus_lang_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("lang", "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.withColumn("rk", F.row_number().over(w)).coalesce(8).persist()
    m = ranked.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).agg(
        F.min("cnt").alias("m")
    )
    kept = ranked.crossJoin(F.broadcast(m)).filter(F.col("rk") <= F.col("m"))
    return (
        ranked.alias("r")
        .join(
            kept.select(
                F.col("lang").alias("kl"), F.col("doc_id").alias("kd")
            ),
            (F.col("r.lang") == F.col("kl")) & (F.col("r.doc_id") == F.col("kd")),
            "left",
        )
        .groupBy(F.col("r.lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_available"),
            F.count("kd").cast("long").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list("kd")
                        ),
                        lambda d: d.cast("string"),
                    ),
                    ",",
                )
            ).alias("kept_fp"),
        )
    )


def _bpe_artifact_ctes(n: int) -> str:
    """Word-carried merge chain (same as ``_bpe_apply_oracle``) extended
    with the vocab tables: base symbols = the s0 character inventory
    (incl. the </w> marker) id'd 0..B-1 in lexicographic order, merges
    id'd B+rank-1 in learned order — the GPT-2 vocab-file convention."""
    ctes = [
        f"toks AS MATERIALIZED (SELECT doc_id, {_TOKS} AS t FROM documents)",
        "w AS MATERIALIZED (SELECT tok AS word, CAST(COUNT(*) AS BIGINT)"
        " AS freq FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)",
        "s0 AS MATERIALIZED (SELECT word, freq,"
        " regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym FROM w)",
    ]
    for i in range(1, n + 1):
        ctes.append(
            f"p{i} AS ("
            " SELECT p['lhs'] AS lhs, p['rhs'] AS rhs,"
            " CAST(SUM(freq) AS BIGINT) AS pair_count"
            " FROM (SELECT freq, unnest(list_transform(range(1, len(tk)),"
            " j -> {'lhs': tk[j], 'rhs': tk[j + 1]})) AS p"
            f" FROM (SELECT freq, string_split(sym, ' ') AS tk FROM s{i - 1}))"
            " GROUP BY lhs, rhs)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT lhs, rhs FROM p{i}"
            " ORDER BY pair_count DESC, lhs, rhs LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT word, freq,"
            " trim(replace(replace(' ' || replace(sym, ' ', '  ') || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || '  ' || (SELECT rhs FROM m{i}) || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || (SELECT rhs FROM m{i}) || ' '),"
            f" '  ', ' ')) AS sym FROM s{i - 1})"
        )
    ctes.append(
        "base AS MATERIALIZED (SELECT DISTINCT unnest(string_split(sym, ' '))"
        " AS token FROM s0)"
    )
    ctes.append(
        "base_ids AS MATERIALIZED (SELECT token,"
        " CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id"
        " FROM base)"
    )
    ctes.append("nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base)")
    merge_union = " UNION ALL ".join(
        f"SELECT (SELECT n FROM nb) + {i} - 1 AS token_id,"
        f" lhs || rhs AS token, 'merge' AS kind,"
        f" CAST({i} AS BIGINT) AS merge_rank FROM m{i}"
        for i in range(1, n + 1)
    )
    ctes.append(
        "vocab AS MATERIALIZED (SELECT token_id, token, 'base' AS kind,"
        " CAST(-1 AS BIGINT) AS merge_rank FROM base_ids"
        f" UNION ALL {merge_union})"
    )
    return ",\n".join(ctes)


def _bpe_vocab_df(spark, words, merges):
    """Spark twin of the vocab CTEs: (token_id, token, kind, merge_rank).

    The base-id row_number runs over the CHARACTER INVENTORY of the
    corpus (alphabet-bounded — dozens of rows), so the global window and
    the driver-side count are both bounded collects, never data-scaled.
    """
    from pyspark.sql.window import Window as W

    from clinical_api_etl_spark.operators.bpe import initial_symbols

    base = (
        words.select(
            F.explode(F.split(initial_symbols(F.col("word")), " ")).alias("token")
        )
        .distinct()
    )
    base_ids = base.select(
        (F.row_number().over(W.orderBy("token")) - 1).cast("long").alias("token_id"),
        "token",
        F.lit("base").alias("kind"),
        F.lit(-1).cast("long").alias("merge_rank"),
    )
    n_base = base.count()
    merge_rows = [
        (n_base + r.it - 1, r.merged, "merge", r.it) for r in merges
    ]
    merges_df = spark.createDataFrame(
        merge_rows, "token_id long, token string, kind string, merge_rank long"
    )
    return base_ids.unionByName(merges_df)


@QS.add(
    "bpe_vocab_table",
    "WITH "
    + _bpe_artifact_ctes(_BPE_MERGES)
    + "\nSELECT token_id, token, kind, merge_rank FROM vocab",
    doc="[EXT] the trained BPE tokenizer as a publishable ARTIFACT: "
    "token -> id table in the GPT-2 vocab-file convention (base symbols "
    "= the corpus character inventory + </w>, id'd lexicographically; "
    "merged tokens id'd base_count + rank - 1 in learned order). "
    "Hash-gated against the unrolled DuckDB merge chain — the id "
    "mapping itself is what the gate pins. Vocab size is alphabet + "
    "n_merges: every step after the learn loop is bounded by the "
    "MODEL, not the corpus.",
    tags=("text", "iterative"),
)
def bpe_vocab_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import learn_bpe_distributed

    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    merges = learn_bpe_distributed(words, _BPE_MERGES)
    return _bpe_vocab_df(spark, words, merges)


@QS.add(
    "bpe_roundtrip_identity",
    "WITH "
    + _bpe_artifact_ctes(_BPE_MERGES)
    + f""",
    venc AS (SELECT token, MIN(token_id) AS token_id FROM vocab GROUP BY token),
    symtab AS (
      SELECT z.word, u.s AS spos, z.tk[u.s] AS symtok
      FROM (SELECT word, string_split(sym, ' ') AS tk FROM s{_BPE_MERGES}) z,
           unnest(range(1, len(z.tk) + 1)) AS u(s)
    ),
    enc AS (SELECT st.word, st.spos, venc.token_id
            FROM symtab st JOIN venc ON st.symtok = venc.token),
    dec AS (SELECT e.word, e.spos, v2.token AS dtok
            FROM enc e JOIN vocab v2 ON e.token_id = v2.token_id),
    dw AS (SELECT word,
                  regexp_replace(string_agg(dtok, '' ORDER BY spos),
                                 '</w>$', '') AS decoded
           FROM dec GROUP BY word),
    tp AS (SELECT doc_id, u.q AS pos, t[u.q] AS word
           FROM toks, unnest(range(1, len(t) + 1)) AS u(q))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           md5(string_agg(tp.word, ' ' ORDER BY pos)) AS orig_md5,
           md5(string_agg(dw.decoded, ' ' ORDER BY pos)) AS decoded_md5,
           CAST(SUM(CASE WHEN tp.word = dw.decoded THEN 1 ELSE 0 END)
                AS BIGINT) AS n_roundtrip_ok
    FROM tp JOIN dw USING (word)
    GROUP BY doc_id
    """,
    doc="[EXT] tokenizer round-trip gate THROUGH THE ID MAPPING: every "
    "word is segmented by the learned merges, encoded to vocab ids "
    "(ties to the smallest id), decoded BACK to token strings via the "
    "id join, re-assembled in pinned position order, and compared to "
    "the original — per doc, md5 of the re-decoded text must equal md5 "
    "of the input (normalized) text and n_roundtrip_ok == n_words. A "
    "misassigned or colliding id would break the equality. Encode/"
    "decode are broadcast-sized joins against the vocab artifact; the "
    "per-doc rebuild shuffles (doc_id, position) pairs only.",
    tags=("text", "iterative"),
)
def bpe_roundtrip_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import (
        _apply_merge,
        initial_symbols,
        learn_bpe_distributed,
    )

    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "word"))
        .coalesce(8)
        .persist()
    )
    words = tok.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    merges = learn_bpe_distributed(words, _BPE_MERGES)
    vocab = _bpe_vocab_df(spark, words, merges).persist()
    vocab.count()  # force-materialize before joins (AQE stats; CLAUDE.md r4)

    sym = initial_symbols(F.col("word"))
    for m in merges:
        sym = _apply_merge(sym, F.lit(m.lhs), F.lit(m.rhs))
    symtab = words.select(
        "word", F.posexplode(F.split(sym, " ")).alias("spos", "symtok")
    )
    venc = vocab.groupBy("token").agg(F.min("token_id").alias("token_id"))
    enc = symtab.join(
        F.broadcast(venc), symtab["symtok"] == venc["token"]
    ).select("word", "spos", "token_id")
    dec = enc.join(
        F.broadcast(vocab.select("token_id", F.col("token").alias("dtok"))),
        "token_id",
    )
    dw = dec.groupBy("word").agg(
        F.regexp_replace(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("spos", "dtok"))),
                    lambda s: s["dtok"],
                ),
            ),
            "</w>$",
            "",
        ).alias("decoded")
    )
    out = (
        tok.join(dw, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "word"))),
                        lambda s: s["word"],
                    ),
                )
            ).alias("orig_md5"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "decoded"))),
                        lambda s: s["decoded"],
                    ),
                )
            ).alias("decoded_md5"),
            F.sum(
                F.when(F.col("word") == F.col("decoded"), 1).otherwise(0)
            ).cast("long").alias("n_roundtrip_ok"),
        )
    )
    return out


@QS.add(
    "bpe_fertility_by_lang",
    "WITH "
    + _bpe_artifact_ctes(_BPE_MERGES)
    + f""",
    seg AS (SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT) AS n_sub
            FROM s{_BPE_MERGES}),
    docw AS (
      SELECT d.lang, x.tok AS word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks) x
      JOIN documents d USING (doc_id)
      GROUP BY d.lang, x.tok
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_words,
           CAST(SUM(c * n_sub) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(c * n_sub) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
             AS fertility
    FROM docw JOIN seg USING (word)
    GROUP BY lang
    """,
    doc="[EXT] tokenizer FERTILITY by language (BPE tokens per word) — "
    "the standard multilingual-tokenizer equity metric: a vocab trained "
    "on an en-heavy corpus over-segments the other languages, and this "
    "is the query that shows it before a training run locks the vocab "
    "in. Reuses the learned merge chain over the distinct-word table "
    "(vocabulary-scaled); per-language counts are exact BIGINTs and "
    "fertility is one division — hash-gated end to end against the "
    "unrolled DuckDB learn-then-apply twin.",
    tags=("text", "iterative"),
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import (
        _apply_merge,
        initial_symbols,
        learn_bpe_distributed,
    )

    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "lang", F.explode(tokens(F.col("text"))).alias("word")
        )
        .coalesce(8)
        .persist()
    )
    words = tok.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    merges = learn_bpe_distributed(words, _BPE_MERGES)
    sym = initial_symbols(F.col("word"))
    for m in merges:
        sym = _apply_merge(sym, F.lit(m.lhs), F.lit(m.rhs))
    seg = words.select(
        "word", F.size(F.split(sym, " ")).cast("long").alias("n_sub")
    )
    docw = tok.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        docw.join(F.broadcast(seg), "word")
        .groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            F.sum(F.col("c") * F.col("n_sub")).cast("long").alias("n_bpe_tokens"),
            (
                F.sum(F.col("c") * F.col("n_sub")).cast("double")
                / F.sum("c").cast("double")
            ).alias("fertility"),
        )
    )


_WP_MERGES = 6


def _wordpiece_oracle(n: int) -> str:
    """Unrolled DuckDB twin of operators/bpe.py:learn_wordpiece_distributed
    — the BPE chain with a symbol-count CTE per iteration and the argmax
    re-keyed to the likelihood score (one IEEE division of exact BIGINTs;
    bit-identical across engines, ties lexicographic)."""
    ctes = [
        f"toks AS (SELECT {_TOKS} AS t FROM documents)",
        "w AS MATERIALIZED (SELECT tok AS word, CAST(COUNT(*) AS BIGINT)"
        " AS freq FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)",
        "s0 AS MATERIALIZED (SELECT freq,"
        " regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS sym FROM w)",
    ]
    for i in range(1, n + 1):
        ctes.append(
            f"u{i} AS MATERIALIZED (SELECT tok, CAST(SUM(freq) AS BIGINT) AS c"
            " FROM (SELECT freq, unnest(string_split(sym, ' ')) AS tok"
            f" FROM s{i - 1}) GROUP BY tok)"
        )
        ctes.append(
            f"p{i} AS ("
            " SELECT p['lhs'] AS lhs, p['rhs'] AS rhs,"
            " CAST(SUM(freq) AS BIGINT) AS pair_count"
            " FROM (SELECT freq, unnest(list_transform(range(1, len(tk)),"
            " j -> {'lhs': tk[j], 'rhs': tk[j + 1]})) AS p"
            f" FROM (SELECT freq, string_split(sym, ' ') AS tk FROM s{i - 1}))"
            " GROUP BY lhs, rhs)"
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT p.lhs, p.rhs, p.pair_count,"
            " ul.c AS lhs_count, ur.c AS rhs_count,"
            " CAST(p.pair_count AS DOUBLE) / CAST(ul.c * ur.c AS DOUBLE)"
            " AS score"
            f" FROM p{i} p JOIN u{i} ul ON ul.tok = p.lhs"
            f" JOIN u{i} ur ON ur.tok = p.rhs"
            " ORDER BY score DESC, p.lhs, p.rhs LIMIT 1)"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT freq,"
            " trim(replace(replace(' ' || replace(sym, ' ', '  ') || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || '  ' || (SELECT rhs FROM m{i}) || ' ',"
            f" ' ' || (SELECT lhs FROM m{i}) || (SELECT rhs FROM m{i}) || ' '),"
            f" '  ', ' ')) AS sym FROM s{i - 1})"
        )
    union = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS it, lhs, rhs, lhs || rhs AS merged,"
        f" pair_count, lhs_count, rhs_count, score FROM m{i}"
        for i in range(1, n + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


@QS.add(
    "wordpiece_learn_merges",
    _wordpiece_oracle(_WP_MERGES),
    doc="[EXT] WordPiece tokenizer training (Schuster & Nakajima 2012; "
    "the BERT family), completing the THREE production tokenizer "
    "families next to bpe_learn_merges (count objective) and "
    "unigram_learn_vocab (EM): identical pair-count/merge-apply "
    "machinery, but the argmax maximizes the likelihood ratio "
    "count(l,r)/(count(l)·count(r)) — frequent-but-independent pairs "
    "lose to genuinely associated ones, so the learned merges DIVERGE "
    "from BPE's on the same corpus (tested). The score is one "
    "correctly-rounded division of exact BIGINTs (bit-identical both "
    "engines; ties lexicographic on bit-identical doubles), so the "
    "21st iterative algorithm carries a full value hash including the "
    "float scores. Oracle = the BPE unrolled MATERIALIZED chain plus a "
    "per-iteration symbol-count CTE.",
    tags=("text", "iterative"),
    headline=True,
)
def wordpiece_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clinical_api_etl_spark.operators.bpe import learn_wordpiece_distributed

    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode_outer(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    rows = learn_wordpiece_distributed(words, _WP_MERGES)
    return spark.createDataFrame(
        rows,
        schema="it BIGINT, lhs STRING, rhs STRING, merged STRING,"
        " pair_count BIGINT, lhs_count BIGINT, rhs_count BIGINT,"
        " score DOUBLE",
    )
