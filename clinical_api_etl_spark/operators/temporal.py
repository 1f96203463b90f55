"""Temporal joins Spark lacks as primitives: as-of and range joins. [EXT]

Neither exists in the reference (its only time logic is ``ORDER BY
timestamp DESC`` and a 30-day view — SURVEY §2.6); both are table-stakes
for event/feature pipelines, and both are built here as *compositions of
existing DataFrame ops* — no UDF, no iterative driver logic — per the
SURVEY §4.2 conclusion that no custom Catalyst rules are needed.

``asof_join`` — for each left row, the single latest right row with
``right.ts <= left.ts`` per key. Implemented as union + keyed sort +
``last_value(ignorenulls)`` running window: one shuffle on the key, O(n)
state, no join blow-up — the classic log-merge formulation, robust to any
key skew AQE can't fix (a per-key sort is linear in that key's rows,
whereas an inequality self-join on a hot key is quadratic).

``range_join_bucketed`` — pairs (l, r) with ``r.ts ∈ [l.ts − window,
l.ts)``. A pure inequality join would plan as a nested-loop cross product;
bucketing time to the window length and equi-joining on (bucket, bucket+1)
turns it into a hash join whose per-bucket fan-out is bounded by the event
rate — the standard interval-bucketing rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_matched",
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time as-of join.

    ``direction='backward'`` (default): every ``left`` row + the payload
    of the LATEST ``right`` row with ``right_ts <= left_ts`` on the same
    key. ``direction='forward'``: the EARLIEST ``right`` row with
    ``right_ts >= left_ts`` (time-to-next-event attribution). NULLs when
    no qualifying right row exists — left-join semantics. Both directions
    are the same union + keyed sort + running last_value log-merge; the
    forward form just scans the merged log in reverse (``__t`` DESC), so
    the cost law is identical. Ties on equal timestamps resolve to the
    right row (inclusive semantics); callers needing full determinism
    de-duplicate ``right`` per (key, ts) first.

    ``direction='nearest'`` (timestamp keys only): the right row
    minimizing ``|right_ts - left_ts|``; equidistant ties resolve to the
    BACKWARD (earlier) match, and an equal-timestamp right row wins
    outright (dt = 0 on the backward side). Still ONE shuffle and ONE
    sort: both candidate matches come from two window frames over the
    same ascending merged log (running last before current row, running
    first after it), so Spark reuses a single Exchange + Sort for both
    WindowExecs — never two joins.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        *on, F.col(right_ts).alias("__t"), F.lit(0).alias("__side"), payload.alias("__p")
    )
    l = left.select(
        "*", F.col(left_ts).alias("__t"), F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    merged = l.select(
        *on, *[c for c in left.columns if c not in on], "__t", "__side", "__p"
    ).unionByName(
        r.select(
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
            *on,
            "__t",
            "__side",
            "__p",
        ).select(
            *on, *[c for c in left.columns if c not in on], "__t", "__side", "__p"
        )
    )
    if direction == "nearest":
        # ascending log; backward frame is <=-inclusive (right sorts
        # before left at equal __t), forward frame is strictly > — an
        # equal-ts right row still wins via dt=0 on the backward side.
        base = W.partitionBy(*on).orderBy(F.col("__t").asc(), F.col("__side").asc())
        back = F.last("__p", ignorenulls=True).over(
            base.rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        fwd = F.first("__p", ignorenulls=True).over(
            base.rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        with_both = (
            merged.withColumn("__mb", back)
            .withColumn("__mf", fwd)
            .filter(F.col("__side") == 1)
        )
        dtb = F.unix_millis(F.col("__t")) - F.unix_millis(F.col("__mb.__ts"))
        dtf = F.unix_millis(F.col("__mf.__ts")) - F.unix_millis(F.col("__t"))
        matched = with_both.withColumn(
            "__m",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(dtb <= dtf, F.col("__mb"))
            .otherwise(F.col("__mf")),
        )
    else:
        order = (
            [F.col("__t").asc(), F.col("__side").asc()]
            if direction == "backward"
            else [F.col("__t").desc(), F.col("__side").asc()]
        )
        w = (
            W.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        matched = merged.withColumn(
            "__m", F.last("__p", ignorenulls=True).over(w)
        ).filter(F.col("__side") == 1)
    out_cols = [*left.columns]
    sel = [F.col(c) for c in out_cols]
    sel.append(F.col("__m.__ts").alias(f"{left_ts}{suffix}"))
    sel.extend(F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_payload)
    return matched.select(*sel)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    on: list[str] | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``right_ts ∈ [left_ts − window, left_ts)``.

    With ``on`` keys the range condition simply rides on the equi-join.
    Without keys, both sides are bucketed to ``window_seconds`` and the
    right side fans out to (bucket, bucket+1) so every qualifying pair
    shares a bucket — an equi hash join instead of a nested-loop scan.
    Output: all left columns + the right columns suffixed ``_r``.
    """
    rsel = [F.col(c).alias(f"{c}_r") for c in right.columns]
    lo = F.col(left_ts) - F.expr(f"INTERVAL {window_seconds} SECONDS")
    in_range = (F.col(f"{right_ts}_r") >= lo) & (F.col(f"{right_ts}_r") < F.col(left_ts))
    if on:
        cond = in_range
        for k in on:
            cond = (F.col(k) == F.col(f"{k}_r")) & cond
        return left.join(right.select(*rsel), cond, "inner")

    bucket = (F.unix_timestamp(F.col(left_ts)) / window_seconds).cast("long")
    rbucket = (F.unix_timestamp(F.col(f"{right_ts}_r")) / window_seconds).cast("long")
    l = left.withColumn("__b", bucket)
    r = (
        right.select(*rsel)
        .withColumn("__b0", rbucket)
        .withColumn("__b", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)))
        .drop("__b0")
    )
    return l.join(r, ["__b"], "inner").filter(in_range).drop("__b")
