"""Text-analysis operators over a documents table. [EXT]

Language-ID, quality scoring, token statistics, canonical fingerprinting —
thin DataFrame wrappers over the expression library in
``functions/text.py``. One projection + one aggregate each; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clinical_api_etl_spark.functions.text import (
    distinct_token_count,
    fingerprint,
    predict_lang,
    quality_score,
    stopword_ratio,
    token_count,
)


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document predicted language + stopword density."""
    return df.withColumn("predicted_lang", predict_lang(F.col(text_col))).withColumn(
        "stop_ratio", stopword_ratio(F.col(text_col))
    )


def score_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("quality", quality_score(F.col(text_col)))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "*",
        token_count(F.col(text_col)).alias("n_tokens"),
        distinct_token_count(F.col(text_col)).alias("n_distinct_tokens"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))


def pack_chunks(
    chunks: DataFrame,
    *,
    doc_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    len_col: str = "n_tokens",
    max_tokens: int = 64,
) -> DataFrame:
    """Greedy sequence packing: assign each document's chunks (in chunk
    order) to consecutive bins of at most ``max_tokens`` tokens — the
    pack-to-context-window step between chunking and batch assembly.

    Deterministic and parallel-by-document: packing is a left fold over the
    per-doc chunk list (``aggregate`` with a struct accumulator — JVM-side,
    no UDF), so one shuffle on doc_id, then narrow. A chunk longer than
    ``max_tokens`` gets a bin of its own (never split).

    Output: (doc, chunk_idx, n_tokens, bin) with bin numbering 0.. per doc.
    """
    from pyspark.sql import functions as F

    sorted_chunks = F.array_sort(
        F.collect_list(F.struct(F.col(idx_col).alias("i"), F.col(len_col).alias("n")))
    )
    grouped = chunks.groupBy(F.col(doc_col).alias("doc")).agg(
        sorted_chunks.alias("cs")
    )
    packed = F.aggregate(
        F.col("cs"),
        F.struct(
            F.lit(0).alias("bin"),
            F.lit(0).alias("used"),
            F.array().cast("array<struct<i:long,n:int,bin:int>>").alias("out"),
        ),
        lambda acc, c: F.when(
            (acc["used"] + c["n"] <= max_tokens) | (acc["used"] == 0),
            F.struct(
                acc["bin"].alias("bin"),
                (acc["used"] + c["n"]).alias("used"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            c["i"].cast("long").alias("i"),
                            c["n"].cast("int").alias("n"),
                            acc["bin"].cast("int").alias("bin"),
                        )
                    ),
                ).alias("out"),
            ),
        ).otherwise(
            F.struct(
                (acc["bin"] + 1).alias("bin"),
                c["n"].cast("int").alias("used"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            c["i"].cast("long").alias("i"),
                            c["n"].cast("int").alias("n"),
                            (acc["bin"] + 1).cast("int").alias("bin"),
                        )
                    ),
                ).alias("out"),
            )
        ),
        lambda acc: acc["out"],
    )
    return grouped.select("doc", F.explode(packed).alias("c")).select(
        F.col("doc").alias(doc_col),
        F.col("c.i").alias(idx_col),
        F.col("c.n").alias(len_col),
        F.col("c.bin").cast("long").alias("bin"),
    )


def compression_ratios(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document zlib compression ratio — the classic low-information /
    degenerate-text quality signal (CCNet / Gopher family: near-constant or
    highly repetitive text compresses far below natural prose).

    Arrow-batched ``mapInPandas`` with stdlib ``zlib`` (level pinned for
    determinism) — a declared-Arrow op like the media kernels: compression
    is inherently byte-imperative, and the batch form costs one pass with
    zero shuffle. ``ratio_bp`` = compressed/raw in basis points (exact
    integers; no float boundary). Rows-only in the oracle gate (no SQL
    engine exposes deflate), invariants pinned by tests instead.
    """
    import zlib
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("n_compressed", T.LongType(), False),
            T.StructField("ratio_bp", T.LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "n_bytes": [], "n_compressed": [], "ratio_bp": []}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                comp = zlib.compress(raw, 6)
                out["doc_id"].append(int(doc_id))
                out["n_bytes"].append(len(raw))
                out["n_compressed"].append(len(comp))
                out["ratio_bp"].append(len(comp) * 10000 // max(1, len(raw)))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(batches, schema=schema)
