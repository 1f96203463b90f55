"""Event-time windowing + stateful sessionization. [EXT]

``hourly_rollup`` is the single transform behind both the batch query
``stream_window_hourly_counts`` and the streaming path below — the
batch/stream unification Structured Streaming is designed for: the same
DataFrame expression runs under ``readStream`` with a watermark.

``sessionize`` assigns gap-based sessions. Two implementations with
identical semantics:

* batch: lag + cumulative-sum windows (exactly SQL-expressible — this is
  the form the DuckDB oracle checks),
* streaming: ``applyInPandasWithState`` with per-user GroupState —
  the custom-stateful-operator escape hatch for semantics watermarked
  window functions can't express incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from clinical_api_etl_spark.functions.numeric import dsum


def hourly_rollup(events: DataFrame, *, watermark: str | None = None) -> DataFrame:
    """Tumbling 1-hour event-time roll-up (batch and streaming)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value"
        )
    )


def sessionize_batch(events: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user, batch form.

    session boundary: ts - lag(ts) > gap. session_id = running count of
    boundaries; output one row per session with span + event count.
    Deterministic ordering via (ts, event_id).
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lit(gap_minutes * 60_000)  # ms precision == DuckDB epoch_ms
    new_session = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)) > gap),
            1,
        ).otherwise(0)
    )
    with_ids = events.withColumn("new_session", new_session).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        with_ids.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("session_id", F.col("session_id").cast("long"))
    )


_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("start_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


_FUNNEL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.LongType()),
    ]
)

_FUNNEL_STATE = T.StructType(
    [
        T.StructField("vt_us", T.LongType()),
        T.StructField("ct_us", T.LongType()),
        T.StructField("pt_us", T.LongType()),
    ]
)


def funnel_stream(
    events: DataFrame,
    *,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming ordered-funnel stage per user (``applyInPandasWithState``).

    The incremental twin of ``plans/analytics.funnel_view_click_purchase``:
    per-user GroupState carries (earliest stage-1 ts, earliest stage-2 ts
    strictly after it, earliest stage-3 ts strictly after that); each
    micro-batch advances the machine and emits the user's current stage
    (0..3). Equals the batch funnel when each user's events arrive in
    event-time order across batches (the file-stream / kafka-per-key
    ordering contract); out-of-order arrivals inside ONE batch are handled
    by the per-batch sort.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s1, s2, s3 = stages

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        vt, ct, pt = state.get if state.exists else (None, None, None)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for ts, et in zip(rows["ts"], rows["event_type"]):
            t = ts.value // 1_000
            if et == s1 and vt is None:
                vt = t
            elif et == s2 and vt is not None and ct is None and t > vt:
                ct = t
            elif et == s3 and ct is not None and pt is None and t > ct:
                pt = t
        state.update((vt, ct, pt))
        stage = 3 if pt is not None else 2 if ct is not None else 1 if vt is not None else 0
        yield pd.DataFrame({"user_id": [user_id], "stage": [stage]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_FUNNEL_OUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stream_tws(
    events: DataFrame,
    *,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """The funnel stage machine on Spark 4's ``transformWithStateInPandas``.

    Same semantics as :func:`funnel_stream`, expressed in the new
    arbitrary-state API: a ``StatefulProcessor`` with one ``ValueState``
    per user instead of the legacy ``GroupState`` tuple. The two coexist
    deliberately — transformWithState is where Structured Streaming's
    custom-state surface is headed (typed state cells, timers, TTL,
    initial state), while applyInPandasWithState remains the stable
    workhorse; parity between both implementations is tested.
    Requires the RocksDB state store provider (set in the test harness)
    and the ``protobuf`` package (transformWithState's state-server
    protocol) — absent from this container, so the parity test is
    environment-gated exactly like the Pillow-gated multimodal decodes.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    s1, s2, s3 = stages

    class FunnelProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "funnel", "vt_us long, ct_us long, pt_us long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            got = self._state.get() if self._state.exists() else None
            vt, ct, pt = got if got is not None else (None, None, None)
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                t = ts.value // 1_000
                if et == s1 and vt is None:
                    vt = t
                elif et == s2 and vt is not None and ct is None and t > vt:
                    ct = t
                elif et == s3 and ct is not None and pt is None and t > ct:
                    pt = t
            self._state.update((vt, ct, pt))
            stage = (
                3 if pt is not None else 2 if ct is not None
                else 1 if vt is not None else 0
            )
            yield pd.DataFrame({"user_id": [user_id], "stage": [stage]})

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        FunnelProcessor(),
        outputStructType=_FUNNEL_OUT,
        outputMode="Update",
        timeMode="None",
    )


def sessionize_stream(events: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``.

    Per-user GroupState carries (open session id, last/first event time,
    count); a batch's events extend or roll the open session. Emits every
    session observed in the batch with its *current* extent — downstream
    consumers upsert on (user_id, session_id), which matches the
    incremental nature of session growth across micro-batches.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60_000_000  # integer µs — no float precision loss

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            session_id, last_us, start_us, n_events = state.get
        else:
            session_id, last_us, start_us, n_events = 0, None, None, 0

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out: list[tuple] = []
        for ts in rows["ts"]:
            t = ts.value // 1_000  # ns → µs, exact
            if last_us is None or t - last_us > gap_us:
                if last_us is not None:
                    out.append((user_id, session_id, start_us, last_us, n_events))
                session_id += 1
                start_us, n_events = t, 0
            n_events += 1
            last_us = t
        out.append((user_id, session_id, start_us, last_us, n_events))
        state.update((session_id, last_us, start_us, n_events))
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_id": [r[1] for r in out],
                "session_start": [pd.Timestamp(r[2], unit="us") for r in out],
                "session_end": [pd.Timestamp(r[3], unit="us") for r in out],
                "n_events": [r[4] for r in out],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def daily_ohlc(events: DataFrame, *, watermark: str | None = None) -> DataFrame:
    """Daily OHLC bars as ONE streaming-legal aggregate (batch == stream).

    Open/close are ``min_by``/``max_by`` over a (ts, event_id) struct —
    deterministic under timestamp ties AND incrementally mergeable, so
    the identical expression runs under ``readStream`` (the windowed
    twin of plans/analytics.py:ts_ohlc_daily, whose row_number form is
    not a streaming aggregate)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    key = F.struct("ts", "event_id")
    return (
        src.filter(F.col("value").isNotNull())
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).cast("long").alias("volume"),
            dsum("value", "total"),
        )
        .select(
            F.col("w.start").alias("day"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "total",
        )
    )


_RL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("admitted", T.LongType()),
        T.StructField("rejected", T.LongType()),
        T.StructField("tokens_left_micro", T.LongType()),
    ]
)

_RL_STATE = T.StructType(
    [
        T.StructField("tokens", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("admitted", T.LongType()),
        T.StructField("rejected", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_RL_CAP = 5_000_000
_RL_COST = 1_000_000


def rate_limit_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of ``plans/analytics.ops_rate_limit_simulation``:
    the token bucket (capacity 5, refill 1 token/10 s, micro-token
    integers) replayed incrementally with per-user ``GroupState``.

    Each micro-batch sorts its rows per user by (ts, event_id), folds the
    EXACT same BIGINT recurrence as the batch query, and emits the user's
    cumulative (admitted, rejected, tokens). Equals the batch fold when
    each user's events arrive in event-time order across batches (the
    funnel_stream ordering contract); the micro-units make stream and
    batch agree to the last integer — no float drift between the two
    planes.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            tokens, last_us, adm, rej, n = state.get
        else:
            tokens = last_us = None
            adm = rej = n = 0
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for ts in rows["ts"]:
            us = ts.value // 1_000
            n += 1
            if last_us is None:
                tokens, last_us, adm = _RL_CAP - _RL_COST, us, adm + 1
                continue
            tokens = min(tokens + (us - last_us) // 10, _RL_CAP)
            if tokens >= _RL_COST:
                tokens -= _RL_COST
                adm += 1
            else:
                rej += 1
            last_us = us
        state.update((tokens, last_us, adm, rej, n))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "admitted": [adm],
                "rejected": [rej],
                "tokens_left_micro": [tokens],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_RL_OUT,
        stateStructType=_RL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
