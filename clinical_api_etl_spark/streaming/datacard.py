"""Streaming corpus data card — incremental twin of ``corpus_data_card``.

``corpus_data_card`` (plans/mlprep.py) publishes the per-language release
artifact in one batch pass. A production pipeline wants that artifact to
STAY CURRENT as documents land (VERDICT r06 task 5) — without re-scanning
the corpus per refresh. The incremental decomposition:

* The EXPENSIVE work (tokenize, 8-gram windows, hashing) happens exactly
  once per arriving document, inside ``foreachBatch``, producing three
  compact append-only STATE tables in a :class:`SnapshotWarehouse`:

  - ``dc_doc_hashes``  (doc_id, lang, h)        — one row per doc
  - ``dc_win_hashes``  (doc_id, lang, h)        — one row per 8-gram window
  - ``dc_doc_words``   (doc_id, lang, w, c)     — per-doc word counts

* The data-card SNAPSHOT is then a cheap aggregation over those states —
  duplicate groups, window novelty, corpus word frequencies, and the
  curriculum split are all expressible from the states with the exact
  arithmetic of the batch query, so ``snapshot()`` equals
  ``corpus_data_card`` on the same documents BIT FOR BIT (the test gate).
  State size is O(tokens) in the worst case (the word-count table), but
  each refresh aggregates stored state instead of re-tokenizing the
  corpus — the IncrementalMV posture, applied to a multi-component
  artifact.

Exactly-once: the arriving batch anti-joins the stored doc set (cross-run
durable dedup) and every state append rides ``append_once`` keyed by
(checkpoint, batch) — the streaming/corpus.py discipline, so replayed
batches and out-of-order file arrivals converge to the same state.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse

#: Mirror plans/mlprep.py exactly (the hash gate depends on it).
NOV_K = 8

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

T_DOCS = "dc_doc_hashes"
T_WINS = "dc_win_hashes"
T_WORDS = "dc_doc_words"


def _states_for(batch: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three per-doc state projections (same expressions as the batch
    query's tok/win/u stages).

    Null text coalesces to '' BEFORE tokenizing (ADVICE r07): split('')
    yields the single-empty-token array on both engines, so a null-text
    doc contributes one word row — keeping the snapshot's words-derived
    n_docs/n_tokens bit-identical to the batch card, which counts every
    doc. Without the coalesce, explode(NULL) dropped the doc here while
    the batch side counted it with size(NULL) = -1 tokens.
    """
    toks = F.split(F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+")
    tok = batch.select("doc_id", "lang", toks.alias("t"), F.col("text"))
    doc_hashes = tok.select("doc_id", "lang", F.md5("text").alias("h"))
    wins = tok.filter(F.size("t") >= NOV_K).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {NOV_K} + 1), "
                f"i -> md5(concat_ws(' ', slice(t, i, {NOV_K}))))"
            )
        ).alias("h"),
    )
    words = (
        tok.select("doc_id", "lang", F.explode("t").alias("w"))
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return doc_hashes, wins, words


class StreamingDataCard:
    """Maintains the data-card state tables from a document drop folder."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.wh = SnapshotWarehouse(spark, str(Path(root) / "warehouse"))
        self.checkpoint = str(Path(root) / "checkpoint")

    def run_stream(self, drop_dir: str) -> None:
        """One availableNow pass over unseen files in ``drop_dir``."""
        stream_id = Path(self.checkpoint).name

        def sink(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                batch_df.count()
                fresh = batch_df.dropDuplicates(["doc_id"])
                existing = self.wh.read(T_DOCS)
                if existing is not None:
                    fresh = fresh.join(
                        existing.select("doc_id"), "doc_id", "left_anti"
                    )
                fresh = fresh.localCheckpoint(eager=True)
                dh, wins, words = _states_for(fresh)
                self.wh.append_once(T_DOCS, dh, txn=f"dcd-{stream_id}-{batch_id}")
                self.wh.append_once(T_WINS, wins, txn=f"dcw-{stream_id}-{batch_id}")
                self.wh.append_once(
                    T_WORDS, words, txn=f"dcu-{stream_id}-{batch_id}"
                )
            finally:
                batch_df.unpersist()

        q = (
            self.spark.readStream.schema(DOC_SCHEMA)
            .json(drop_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def snapshot(self) -> DataFrame:
        """The current data card — same schema, same arithmetic, and (on
        the same documents) the same values as ``corpus_data_card``."""
        dh = self.wh.read(T_DOCS)
        wins = self.wh.read(T_WINS)
        words = self.wh.read(T_WORDS)
        if dh is None or words is None:
            raise ValueError("no documents ingested yet")
        if wins is None:
            # no doc has reached NOV_K tokens yet — empty window state
            wins = self.spark.createDataFrame(
                [], "doc_id long, lang string, h string"
            )
        base = words.groupBy("lang").agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
        g = (
            dh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2)
            .select("h")
        )
        dup = (
            dh.join(g, "h")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_dup_docs"))
        )
        rep = (
            wins.groupBy("h")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("h")
            .withColumn("rep_hit", F.lit(1))
        )
        novel = (
            wins.join(rep, "h", "left")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_windows"),
                F.sum(F.when(F.col("rep_hit").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_shared"),
            )
        )
        freq = words.groupBy("w").agg(F.sum("c").cast("long").alias("c"))
        scal = freq.agg(
            F.sum("c").cast("long").alias("total"),
            F.count(F.lit(1)).cast("long").alias("nv"),
        )
        per_doc = (
            words.join(freq.select("w", F.col("c").alias("cg")), "w")
            .crossJoin(F.broadcast(scal))
            .groupBy("doc_id", "lang")
            .agg(
                F.sum("c").cast("long").alias("n_tok"),
                F.sum(
                    F.when(
                        F.col("cg") * F.col("nv") < F.col("total"), F.col("c")
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_rare"),
            )
        )
        dm = F.expr("(1000 * n_rare) div n_tok")
        phases = per_doc.groupBy("lang").agg(
            F.sum(F.when(dm < 500, 1).otherwise(0)).cast("long").alias("n_easy"),
            F.sum(F.when(dm >= 500, 1).otherwise(0)).cast("long").alias("n_hard"),
        )
        return (
            base.join(dup, "lang", "left")
            .join(novel, "lang")
            .join(phases, "lang")
            .select(
                "lang",
                "n_docs",
                "n_tokens",
                F.coalesce("n_dup_docs", F.lit(0)).cast("long").alias("n_dup_docs"),
                "n_windows",
                "n_shared",
                (
                    (F.col("n_windows") - F.col("n_shared")).cast("double")
                    / F.col("n_windows").cast("double")
                ).alias("novelty"),
                "n_easy",
                "n_hard",
            )
        )
