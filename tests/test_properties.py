"""Property-based invariants over the input grammar (SURVEY §5.2 item 4).

Hypothesis generates CSV batches over the grammar the reference's
``etl.py`` implies — decimal values, S/D blood-pressure strings (valid,
out-of-range, malformed, slash-less numeric), blank/sentinel units and
quality scores, garbage text — and each batch is pushed through the full
pipeline, asserting the declared invariants against an independent pure-
Python re-derivation of the reference semantics:

* row conservation: silver rows = input rows + valid-BP rows (R1),
* bronze lineage: row_num is exactly 1..n in file order (R3, §2.9.6),
* null discipline: exactly one of value_num/value_text per silver row (R2),
* quality counters equal the rule definitions recomputed row-by-row
  (A3-A5 on bronze input — §2.9.5),
* gold equals a per-key recompute over numeric silver rows (A1),
* re-running the same job is a no-op (S5/S6 idempotency).

Examples are few but each covers a whole generated batch — the per-example
cost is a full Spark pipeline run.
"""

from __future__ import annotations

from decimal import Decimal, InvalidOperation

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clinical_api_etl_spark.jobs.runner import (
    BRONZE_TABLE,
    GOLD_TABLE,
    QUALITY_TABLE,
    SILVER_TABLE,
    process_job,
)
from clinical_api_etl_spark.sources.sinks import ParquetWarehouse

HEADER = "study_id,participant_id,measurement_type,value,unit,timestamp,site_id,quality_score"

# -- reference semantics, re-derived independently in pure Python ----------

REQ_UNIT = {"glucose", "cholesterol", "weight", "height", "blood_pressure"}
RANGES = {
    "glucose": (40.0, 400.0),
    "cholesterol": (50.0, 400.0),
    "weight": (1.0, 400.0),
    "height": (30.0, 300.0),
    "heart_rate": (20.0, 240.0),
    "blood_pressure_1": (50.0, 250.0),
    "blood_pressure_2": (30.0, 200.0),
}


def py_to_decimal(s: str) -> Decimal | None:
    s = s.strip()
    if not s:
        return None
    try:
        d = Decimal(s)
    except InvalidOperation:
        return None
    return None if not d.is_finite() else d


def py_parse_bp(s: str):
    parts = s.split("/")
    if len(parts) != 2:
        return None
    try:
        sys_v, dia_v = int(parts[0].strip()), int(parts[1].strip())
    except ValueError:
        return None
    if 50 <= sys_v <= 250 and 30 <= dia_v <= 200:
        return sys_v, dia_v
    return None


# -- input grammar ----------------------------------------------------------

_types = st.sampled_from(
    ["glucose", "cholesterol", "weight", "height", "blood_pressure", "heart_rate"]
)
_numbers = st.decimals(
    min_value=Decimal("-9999"),
    max_value=Decimal("9999"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
).map(str)
_bp_like = st.tuples(
    st.integers(min_value=0, max_value=400), st.integers(min_value=0, max_value=300)
).map(lambda t: f"{t[0]}/{t[1]}")
_values = st.one_of(
    _numbers,
    _bp_like,
    st.sampled_from(["", "  ", "not_a_number", "120-80", "1/2/3", "95.5 ", "12/"]),
)
_units = st.sampled_from(["mg/dL", "kg", "mmHg", "", " ", "bpm"])
_scores = st.sampled_from(["0.98", "0.5", "", "null", "1.00"])
_ts = st.integers(min_value=0, max_value=19).map(
    lambda h: f"2024-05-0{1 + h % 9}T{h:02d}:30:00Z"
)

_row = st.tuples(
    st.sampled_from(["S1", "S2"]),
    st.sampled_from(["P1", "P2", "P3"]),
    _types,
    _values,
    _units,
    _ts,
    st.sampled_from(["SITE_A", "SITE_B"]),
    _scores,
)
_batches = st.lists(_row, min_size=1, max_size=20)


def _csv_field(v: str) -> str:
    return f'"{v}"' if ("," in v or '"' in v) else v


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_batches)
def test_pipeline_invariants(spark, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("prop")
    wh = ParquetWarehouse(spark, str(tmp / "wh"))
    csv = tmp / "batch.csv"
    csv.write_text(
        "\n".join([HEADER, *(",".join(_csv_field(f) for f in r) for r in rows)]) + "\n"
    )

    jid = process_job(spark, wh, str(csv))

    # -- bronze lineage (R3): one row per input, row_num 1..n in order ------
    bronze = sorted(
        wh.read(BRONZE_TABLE).filter(f"job_id = '{jid}'").collect(),
        key=lambda r: r["row_num"],
    )
    assert [r["row_num"] for r in bronze] == list(range(1, len(rows) + 1))
    assert [r["value"] for r in bronze] == [r[3] for r in rows]

    # -- row conservation (R1), modulo the reference's unique key ----------
    # The reference's processed table enforces UNIQUE (study, participant,
    # measurement_type, measured_at, site) — `uq_pm_obs`,
    # 05_processed_measurements.sql:19 — with ON CONFLICT DO NOTHING
    # semantics the engine mirrors via append_if_absent(SILVER_KEY). So
    # the expected silver count is the number of DISTINCT observation
    # keys, not the raw observation count (hypothesis found a batch with
    # two rows sharing a logical key).
    obs_keys = set()
    for r in rows:
        study, pid, mtype, value, _unit, ts, site, _q = r
        if mtype == "blood_pressure" and py_parse_bp(value) is not None:
            obs_keys.add((study, pid, "blood_pressure_systolic", ts, site))
            obs_keys.add((study, pid, "blood_pressure_diastolic", ts, site))
        else:
            obs_keys.add((study, pid, mtype, ts, site))
    silver = wh.read(SILVER_TABLE).filter(f"job_id = '{jid}'").collect()
    assert len(silver) == len(obs_keys)

    # -- null discipline (R2): exactly one of value_num/value_text ---------
    for r in silver:
        assert (r["value_num"] is None) != (r["value_text"] is None), r

    # -- quality counters (A3-A5 on raw input, §2.9.5) ----------------------
    expect = {"missing_unit_required": 0, "malformed_blood_pressure": 0, "numeric_out_of_range": 0}
    for r in rows:
        mtype, value, unit = r[2], r[3], r[4]
        if mtype in REQ_UNIT and unit.strip() == "":
            expect["missing_unit_required"] += 1
        if mtype == "blood_pressure" and py_parse_bp(value) is None:
            expect["malformed_blood_pressure"] += 1
        num = py_to_decimal(value)
        if mtype in RANGES and num is not None:
            lo, hi = RANGES[mtype]
            if num < Decimal(str(lo)) or num > Decimal(str(hi)):
                expect["numeric_out_of_range"] += 1
    got = {
        r["rule_name"]: r["affected_rows"]
        for r in wh.read(QUALITY_TABLE).filter(f"job_id = '{jid}'").collect()
    }
    assert got == {k: v for k, v in expect.items() if v > 0}

    # -- gold recompute (A1): per-key stats over numeric silver rows --------
    by_key: dict[tuple, list[Decimal]] = {}
    for r in silver:
        if r["value_num"] is not None:
            key = (r["study_id"], r["participant_id"], r["site_id"], r["measurement_type"])
            by_key.setdefault(key, []).append(r["value_num"])
    gold = {
        (r["study_id"], r["participant_id"], r["site_id"], r["measurement_type"]): r
        for r in wh.read(GOLD_TABLE).collect()
    }
    assert set(gold) == set(by_key)
    for key, vals in by_key.items():
        g = gold[key]
        assert g["cnt"] == len(vals)
        assert g["min_num"] == float(min(vals))
        assert g["max_num"] == float(max(vals))
        assert g["avg_num"] == pytest.approx(
            sum(float(v) for v in vals) / len(vals), rel=1e-9
        )

    # -- idempotency (S5/S6): same job re-run is a no-op --------------------
    counts_before = {
        t: wh.read(t).count() for t in (BRONZE_TABLE, SILVER_TABLE, GOLD_TABLE)
    }
    process_job(spark, wh, str(csv), job_id=jid)
    for t, n in counts_before.items():
        assert wh.read(t).count() == n, t


# -- dedup: prefix+PPJoin filtering must be lossless vs brute force ---------

_words = st.sampled_from([f"w{i}" for i in range(12)])
_docs = st.lists(
    st.lists(_words, min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=12,
)


def _py_shingles(text: str, n: int = 3) -> set:
    toks = text.strip().lower().split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_docs, threshold=st.sampled_from([0.25, 0.5, 0.8]))
def test_ngram_jaccard_equals_bruteforce(spark, texts, threshold):
    """The prefix-filter + PPJoin length/position pruning must emit exactly
    the brute-force pair set at any threshold — pruning may only discard
    non-candidates, never true pairs."""
    from clinical_api_etl_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=threshold
        ).collect()
    }
    expect = {}
    sh = [_py_shingles(t) for t in texts]
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            j = inter / union
            if j >= threshold:
                expect[(a, b)] = j
    assert set(got) == set(expect), (sorted(got), sorted(expect))
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-12)


# -- asof_join vs brute force ------------------------------------------------

_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),           # key
        st.integers(min_value=0, max_value=50),          # minute offset
    ),
    min_size=1,
    max_size=15,
)


@pytest.mark.slow
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_events_strategy, right=_events_strategy)
def test_asof_join_equals_bruteforce(spark, left, right):
    from datetime import datetime, timedelta

    from clinical_api_etl_spark.operators.temporal import asof_join

    base = datetime(2024, 1, 1)
    t = lambda m: base + timedelta(minutes=m)  # noqa: E731
    # dedupe right per (key, ts) with max val for tie determinism
    rmap = {}
    for i, (k, m) in enumerate(right):
        rmap[(k, m)] = max(rmap.get((k, m), -1), i)
    ldf = spark.createDataFrame(
        [(k, t(m), i) for i, (k, m) in enumerate(left)],
        "key long, ts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, t(m), v) for (k, m), v in rmap.items()],
        "key long, ts timestamp, val long",
    )
    got = {
        r["lid"]: (r["ts_matched"], r["val_matched"])
        for r in asof_join(
            ldf, rdf, on=["key"], left_ts="ts", right_ts="ts", right_payload=["val"]
        ).collect()
    }
    assert set(got) == set(range(len(left)))
    for i, (k, m) in enumerate(left):
        prior = [(rm, v) for (rk, rm), v in rmap.items() if rk == k and rm <= m]
        if prior:
            bm, bv = max(prior)
            assert got[i] == (t(bm), bv), (i, k, m)
        else:
            assert got[i] == (None, None), (i, k, m)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ns_vals=st.lists(
        st.one_of(
            st.integers(min_value=-(2**62), max_value=2**62),
            # cluster around the truncate-vs-floor hazard: sub-microsecond
            # negatives and exact-millenium boundaries
            st.integers(min_value=-2_000, max_value=2_000),
            st.sampled_from([-1, 1, -999, 999, -1000, 1000, -1_000_000_001]),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_events_ns_to_us_conversion_matches_duckdb(spark, tmp_path_factory, ns_vals):
    """catalog.load's TIMESTAMP(NANOS) → microsecond conversion
    (`ts div 1000`, sources/catalog.py) must agree with DuckDB's
    TIMESTAMP_NS → TIMESTAMP narrowing for every int64 — including
    pre-epoch values, where truncation toward zero and flooring diverge
    (−1500 ns → −1 µs under both engines: BOTH truncate; this test pins
    that parity so neither side silently switches to flooring)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from clinical_api_etl_spark.sources.catalog import load

    d = tmp_path_factory.mktemp("nsus")
    path = str(d / "events.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(ns_vals, type=pa.timestamp("ns"))}),
        path,
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )
    got = [
        r["us"]
        for r in load(spark, str(d), "events")
        .select(F.unix_micros("ts").alias("us"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"SELECT epoch_us(CAST(ts AS TIMESTAMP)) FROM read_parquet('{path}')"
        ).fetchall()
    ]
    assert sorted(got) == sorted(want)
    # and both equal int64 truncation-toward-zero
    # integer division only: int(v / 1000) goes through a float and loses
    # precision above 2^53 ns (hypothesis found 1_152_921_504_606_846_875)
    assert sorted(got) == sorted(
        v // 1000 if v >= 0 else -((-v) // 1000) for v in ns_vals
    )


# ---------------------------------------------------------------------------
# SCD2 merge invariants: random batch sequences must always yield a valid
# type-2 history (exactly one current row per key, intervals chain without
# overlap, and the current row reflects each key's latest update).
# ---------------------------------------------------------------------------

_scd_key = st.sampled_from(["k1", "k2", "k3"])
_scd_batch = st.lists(
    st.tuples(_scd_key, st.sampled_from(["a", "b", "c", "d"])),
    min_size=1,
    max_size=4,
)
_scd_batches = st.lists(_scd_batch, min_size=1, max_size=4)


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_scd_batches)
def test_scd2_invariants(spark, tmp_path_factory, batches):
    from datetime import datetime, timedelta

    tmp = tmp_path_factory.mktemp("scd2")
    wh = ParquetWarehouse(spark, str(tmp / "wh"))
    t0 = datetime(2024, 1, 1)
    latest: dict[str, str] = {}
    tick = 0
    for batch in batches:
        rows = []
        for key, val in batch:
            rows.append((key, val, t0 + timedelta(hours=tick)))
            tick += 1
        for key, val, _ in sorted(rows, key=lambda r: r[2]):
            latest[key] = val
        df = spark.createDataFrame(rows, "k string, v string, ts timestamp")
        wh.scd2_merge("dim", df, ["k"], ts_col="ts")

    hist = wh.read("dim").collect()
    by_key: dict[str, list] = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    assert set(by_key) == set(latest)
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r["valid_from"])
        currents = [r for r in rows if r["is_current"]]
        assert len(currents) == 1, f"{key}: {len(currents)} current rows"
        assert currents[0] is rows[-1]
        assert currents[0]["valid_to"] is None
        assert currents[0]["v"] == latest[key]
        # intervals chain: each version closes exactly at its successor
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"], (key, a, b)


class TestPinnedOrderFoldProperty:
    """The round-8 exactness workhorse: Spark `aggregate` over
    `sort_array(collect_list(struct(key, term)))` must equal a sequential
    python fold over the same key order BITWISE — for sums and products,
    over adversarial doubles (subnormal-adjacent magnitudes, mixed signs,
    heavy cancellation). If this ever breaks (e.g. a Spark upgrade starts
    fusing multiply-adds), every fold-gated oracle breaks with it — this
    gate localizes the diagnosis."""

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(
            st.floats(
                min_value=-1e12,
                max_value=1e12,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_fold_sum_matches_python_bitwise(self, spark, vals):
        import struct as _s

        from pyspark.sql import functions as F

        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k int, x double")
        got = (
            df.agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("k", "x"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["x"],
                ).alias("s")
            ).collect()[0].s
        )
        want = 0.0
        for _, v in sorted(rows):
            want = want + v
        assert _s.pack("<d", got) == _s.pack("<d", want)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(
            st.floats(
                min_value=1e-6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_fold_product_matches_python_bitwise(self, spark, vals):
        import struct as _s

        from pyspark.sql import functions as F

        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k int, x double")
        got = (
            df.agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("k", "x"))),
                    F.lit(1.0),
                    lambda acc, s: acc * s["x"],
                ).alias("p")
            ).collect()[0].p
        )
        want = 1.0
        for _, v in sorted(rows):
            want = want * v
        assert _s.pack("<d", got) == _s.pack("<d", want)


# ---------------------------------------------------------------------------
# Sequential-recurrence fold template: engine-parity property gate
# (VERDICT r06 task 6). The round-10 finding pinned the DuckDB
# LIST-vs-STRUCT accumulator hazard with example-based tests only; this
# gate generates arbitrary series and asserts Spark, DuckDB, and python
# run the SAME left fold bit-for-bit — Holt (multi-state float), Kalman
# (per-step divisions), and the token bucket (BIGINT states with
# floor-div), i.e. one representative per fold family. If an engine
# upgrade changes lambda-accumulator evaluation semantics, this fails
# before any oracle does.
# ---------------------------------------------------------------------------

import struct as _struct


def _bits(v):
    return _struct.pack("<d", v)


_HOLT_SPARK = """aggregate(
  slice(ys, 2, size(ys) - 1),
  named_struct('l', element_at(ys, 1), 'b', element_at(ys, 2) - element_at(ys, 1),
               'sse', CAST(0.0 AS DOUBLE)),
  (acc, y) -> named_struct(
    'l', 0.5D * y + 0.5D * (acc.l + acc.b),
    'b', 0.25D * ((0.5D * y + 0.5D * (acc.l + acc.b)) - acc.l) + 0.75D * acc.b,
    'sse', acc.sse + (y - (acc.l + acc.b)) * (y - (acc.l + acc.b)))) AS st"""

_HOLT_DUCK = """list_reduce(
  list_concat(
    [[ys[1], ys[2] - ys[1], CAST(0 AS DOUBLE)]],
    list_transform(ys[2:], y -> [y, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
  (acc, e) -> [
    0.5e0 * e[1] + 0.5e0 * (acc[1] + acc[2]),
    0.25e0 * ((0.5e0 * e[1] + 0.5e0 * (acc[1] + acc[2])) - acc[1])
      + 0.75e0 * acc[2],
    acc[3] + (e[1] - (acc[1] + acc[2])) * (e[1] - (acc[1] + acc[2]))]) AS st"""


def _holt_py(ys):
    l, b, sse = ys[0], ys[1] - ys[0], 0.0
    for y in ys[1:]:
        nl = 0.5 * y + 0.5 * (l + b)
        nb = 0.25 * ((0.5 * y + 0.5 * (l + b)) - l) + 0.75 * b
        sse = sse + (y - (l + b)) * (y - (l + b))
        l, b = nl, nb
    return [l, b, sse]


_KALMAN_SPARK = """aggregate(
  slice(ys, 2, size(ys) - 1),
  named_struct('x', element_at(ys, 1), 'p', CAST(100.0 AS DOUBLE),
               'll2', CAST(0.0 AS DOUBLE)),
  (acc, y) -> named_struct(
    'x', acc.x + ((acc.p + 4.0D) / (acc.p + 4.0D + 25.0D)) * (y - acc.x),
    'p', (1.0D - (acc.p + 4.0D) / (acc.p + 4.0D + 25.0D)) * (acc.p + 4.0D),
    'll2', acc.ll2 + (y - acc.x) * (y - acc.x) / (acc.p + 4.0D + 25.0D))) AS st"""

_KALMAN_DUCK = """list_reduce(
  list_concat(
    [[ys[1], 100.0e0, CAST(0 AS DOUBLE)]],
    list_transform(ys[2:], y -> [y, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
  (acc, e) -> [
    acc[1] + ((acc[2] + 4.0e0) / (acc[2] + 4.0e0 + 25.0e0)) * (e[1] - acc[1]),
    (1.0e0 - (acc[2] + 4.0e0) / (acc[2] + 4.0e0 + 25.0e0)) * (acc[2] + 4.0e0),
    acc[3] + (e[1] - acc[1]) * (e[1] - acc[1]) / (acc[2] + 4.0e0 + 25.0e0)]) AS st"""


_PH_SPARK = """aggregate(
  ys,
  named_struct('n', CAST(0.0 AS DOUBLE), 's', CAST(0.0 AS DOUBLE),
               'm', CAST(0.0 AS DOUBLE), 'mm', CAST(0.0 AS DOUBLE)),
  (acc, x) -> named_struct(
    'n', acc.n + 1,
    's', acc.s + x,
    'm', acc.m + (x - (acc.s + x) / (acc.n + 1) - 5.0D),
    'mm', least(acc.mm, acc.m + (x - (acc.s + x) / (acc.n + 1) - 5.0D)))) AS st"""

_PH_DUCK = """list_reduce(
  list_prepend(
    [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
    list_transform(ys, x ->
      [x, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
  (acc, e) -> [
    acc[1] + 1,
    acc[2] + e[1],
    acc[3] + (e[1] - (acc[2] + e[1]) / (acc[1] + 1) - 5.0e0),
    least(acc[4],
      acc[3] + (e[1] - (acc[2] + e[1]) / (acc[1] + 1) - 5.0e0))]) AS st"""


def _ph_py(ys):
    n = s = m = mm = 0.0
    for x in ys:
        nm = m + (x - (s + x) / (n + 1) - 5.0)
        n, s, m, mm = n + 1, s + x, nm, min(mm, nm)
    return [n, s, m, mm]


def _kalman_py(ys):
    x, p, ll2 = ys[0], 100.0, 0.0
    for y in ys[1:]:
        k = (p + 4.0) / (p + 4.0 + 25.0)
        nx = x + k * (y - x)
        npp = (1.0 - k) * (p + 4.0)
        ll2 = ll2 + (y - x) * (y - x) / (p + 4.0 + 25.0)
        x, p = nx, npp
    return [x, p, ll2]


_BUCKET_SPARK = """aggregate(
  slice(xs, 2, size(xs) - 1),
  named_struct('t', CAST(4000000 AS BIGINT), 'u', element_at(xs, 1),
               'a', CAST(1 AS BIGINT), 'r', CAST(0 AS BIGINT)),
  (acc, x) -> CASE
    WHEN least(acc.t + (x - acc.u) div 10, 5000000L) >= 1000000L
    THEN named_struct('t', least(acc.t + (x - acc.u) div 10, 5000000L) - 1000000L,
                      'u', x, 'a', acc.a + 1L, 'r', acc.r)
    ELSE named_struct('t', least(acc.t + (x - acc.u) div 10, 5000000L),
                      'u', x, 'a', acc.a, 'r', acc.r + 1L) END) AS st"""

_BUCKET_DUCK = """list_reduce(
  list_concat(
    [[CAST(4000000 AS BIGINT), xs[1], CAST(1 AS BIGINT), CAST(0 AS BIGINT)]],
    list_transform(xs[2:], x -> [x, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                                 CAST(0 AS BIGINT)])),
  (acc, e) -> CASE
    WHEN least(acc[1] + (e[1] - acc[2]) // 10, 5000000) >= 1000000
    THEN [least(acc[1] + (e[1] - acc[2]) // 10, 5000000) - 1000000,
          e[1], acc[3] + 1, acc[4]]
    ELSE [least(acc[1] + (e[1] - acc[2]) // 10, 5000000),
          e[1], acc[3], acc[4] + 1] END) AS st"""


def _bucket_py(xs):
    t, u, a, r = 4_000_000, xs[0], 1, 0
    for x in xs[1:]:
        nt = min(t + (x - u) // 10, 5_000_000)
        if nt >= 1_000_000:
            t, u, a = nt - 1_000_000, x, a + 1
        else:
            t, u, r = nt, x, r + 1
    return [t, u, a, r]


class TestSequentialFoldEngineParity:
    def _spark_fold(self, spark, col, typ, vals, sql):
        df = spark.createDataFrame([(vals,)], f"{col} array<{typ}>")
        row = df.selectExpr(sql).collect()[0]["st"]
        return list(row)

    def _duck_fold(self, col, typ, vals, sql):
        import duckdb

        return duckdb.execute(
            f"SELECT {sql} FROM (SELECT $1::{typ}[] AS {col})", [vals]
        ).fetchone()[0]

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        ys=st.lists(
            st.integers(min_value=0, max_value=1_000_000).map(float),
            min_size=2,
            max_size=40,
        )
    )
    def test_float_folds_bit_identical(self, spark, ys):
        for s_sql, d_sql, py in (
            (_HOLT_SPARK, _HOLT_DUCK, _holt_py),
            (_KALMAN_SPARK, _KALMAN_DUCK, _kalman_py),
            (_PH_SPARK, _PH_DUCK, _ph_py),
        ):
            got_s = self._spark_fold(spark, "ys", "double", ys, s_sql)
            got_d = self._duck_fold("ys", "DOUBLE", ys, d_sql)
            got_p = py(ys)
            for a, b, c in zip(got_s, got_d, got_p):
                assert _bits(a) == _bits(b) == _bits(c), (ys, got_s, got_d, got_p)

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        gaps=st.lists(
            st.integers(min_value=0, max_value=120_000_000),
            min_size=1,
            max_size=40,
        )
    )
    def test_integer_bucket_fold_identical(self, spark, gaps):
        xs, t = [], 0
        for g in gaps:
            t += g
            xs.append(t)
        got_s = self._spark_fold(spark, "xs", "long", xs, _BUCKET_SPARK)
        got_d = self._duck_fold("xs", "BIGINT", xs, _BUCKET_DUCK)
        got_p = _bucket_py(xs)
        assert list(got_s) == list(got_d) == got_p, (xs, got_s, got_d, got_p)


class TestHashExpressionReproducibility:
    """Regression pin for the arity-2 HOF-lambda trap: every hash-derived
    signature expression must produce IDENTICAL values across two
    independent expression BUILDS (pyspark auto-names lambda variables
    with a global counter — a leaked str(Column) in a seed makes values
    build-dependent, which silently breaks any persisted state keyed on
    them, as streaming/neardup.py's band state was)."""

    def _texts(self, spark, seed: int):
        rows = [
            (i, " ".join(f"w{(i * 7 + j * 3 + seed) % 23}" for j in range(12)))
            for i in range(30)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_minhash_signature_build_independent(self, spark):
        from pyspark.sql import functions as F

        from clinical_api_etl_spark.operators.dedup import (
            _hashed_shingles,
            minhash_signature,
        )

        df = self._texts(spark, 1)
        def build():
            sh = df.select(
                "doc_id", _hashed_shingles(F.col("text"), 3).alias("s")
            )
            return {
                r["doc_id"]: tuple(r["sig"])
                for r in sh.select(
                    "doc_id", minhash_signature(F.col("s"), 16).alias("sig")
                ).collect()
            }

        a, b = build(), build()  # two independent expression builds
        assert a == b
        # and the 16 hash functions are genuinely distinct per slot
        any_doc = next(iter(a.values()))
        assert len(set(any_doc)) > 1

    def test_lsh_bands_build_independent(self, spark):
        from clinical_api_etl_spark.operators.dedup import lsh_bands

        df = self._texts(spark, 2)
        def build():
            return {
                (r["doc_id"], r["band"]): r["bucket"]
                for r in lsh_bands(df, "doc_id", "text").collect()
            }

        assert build() == build()

    def test_hyperplane_signature_planes_distinct(self, spark):
        from clinical_api_etl_spark.operators.similarity import _signature

        df = spark.createDataFrame(
            [([float((i * 13 + d * 7) % 11 - 5) for d in range(16)],)
             for i in range(8)],
            "v array<double>",
        )
        rows = df.select(*_signature("v", 8, 16)).collect()
        # across 8 vectors, the 8 planes must NOT all emit identical
        # bit-columns (the collapsed-plane regression gave rank 1)
        cols = list(zip(*[[r[f"b{p}"] for p in range(8)] for r in rows]))
        assert len(set(cols)) > 1
        # and two builds agree
        rows2 = df.select(*_signature("v", 8, 16)).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


class TestEdfStatisticEngineParity:
    """VERDICT r07 task 7: KS / CvM / AD all ride ONE merged (group,
    value) histogram walk, and energy distance shares the histogram
    prefix-sum machinery. Hypothesis generates arbitrary (group, value)
    multisets; the registry's OWN Spark code paths (``*_from_samples``),
    the registry's OWN DuckDB oracle bodies (``_*_oracle`` over a sample
    table), and a pure-python replay of the declared IEEE op sequence
    must agree BIT FOR BIT on every statistic — the skeleton-level gate
    the fold-parity class provides for the recurrence family."""

    @staticmethod
    def _py_expected(samples):
        from collections import Counter

        groups = sorted({g for g, _ in samples})
        ks, cvm, ad, energy = {}, {}, {}, {}

        def pair_s(h):
            cw = cxw = s = 0
            for x in sorted(h):
                c = h[x]
                s += x * c * cw - c * cxw
                cw += c
                cxw += x * c
            return s

        for i, ga in enumerate(groups):
            for gb in groups[i + 1 :]:
                ha = Counter(x for g, x in samples if g == ga)
                hb = Counter(x for g, x in samples if g == gb)
                xs = sorted(set(ha) | set(hb))
                n_a, n_b = sum(ha.values()), sum(hb.values())
                nn = n_a + n_b
                cum_a = cum_b = d_num = 0
                cvm_acc, ad_acc = 0.0, 0.0
                for x in xs:
                    ca, cb = ha.get(x, 0), hb.get(x, 0)
                    cum_a += ca
                    cum_b += cb
                    d = cum_a * n_b - cum_b * n_a
                    d_num = max(d_num, abs(d))
                    w = ca + cb
                    cvm_acc += float(w) * (float(d) * float(d))
                    cumn = cum_a + cum_b
                    if cumn < nn:
                        num = nn * cum_a - n_a * cumn
                        ad_acc += (
                            float(w)
                            * (float(num) * float(num))
                            / float(cumn * (nn - cumn))
                        )
                ks[(ga, gb)] = (n_a, n_b, d_num, float(d_num) / float(n_a * n_b))
                cvm[(ga, gb)] = cvm_acc / (float(n_a * n_b) * float(nn * nn))
                if len(xs) >= 2:  # all-mass-at-one-value pairs emit no AD row
                    ad[(ga, gb)] = ad_acc / float(n_a * n_b)
                sa, sb, sm = pair_s(ha), pair_s(hb), pair_s(ha + hb)
                cross = sm - sa - sb
                energy[(ga, gb)] = (
                    sa,
                    sb,
                    cross,
                    float(2 * cross) / float(n_a * n_b)
                    - float(2 * sa) / float(n_a * n_a)
                    - float(2 * sb) / float(n_b * n_b),
                )
        return ks, cvm, ad, energy

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        samples=st.lists(
            st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 12)),
            min_size=4,
            max_size=30,
        ).filter(lambda s: len({g for g, _ in s}) >= 2)
    )
    def test_trio_plus_energy_bit_identical(self, spark, samples):
        import duckdb
        import pandas as pd

        from clinical_api_etl_spark.plans.inference import (
            _ad_oracle,
            _cvm_oracle,
            _energy_oracle,
            _ks_oracle,
            ad_from_samples,
            cvm_from_samples,
            energy_from_samples,
            ks_from_samples,
        )

        exp_ks, exp_cvm, exp_ad, exp_energy = self._py_expected(samples)
        t = spark.createDataFrame(samples, "g string, x long")
        con = duckdb.connect()
        con.register("samples", pd.DataFrame(samples, columns=["g", "x"]))
        src = "SELECT g, CAST(x AS BIGINT) AS x FROM samples"

        def duck(sql):
            return {
                (r[0], r[1]): r for r in con.execute(sql).fetchall()
            }

        # KS: exact d_num BIGINT + one-division d
        s_ks = {(r.ga, r.gb): r for r in ks_from_samples(t).collect()}
        d_ks = duck(_ks_oracle(src))
        assert set(s_ks) == set(d_ks) == set(exp_ks)
        for k, (n_a, n_b, d_num, d) in exp_ks.items():
            assert (s_ks[k].n_a, s_ks[k].n_b, s_ks[k].d_num) == (n_a, n_b, d_num)
            assert (d_ks[k][2], d_ks[k][3], d_ks[k][4]) == (n_a, n_b, d_num)
            assert _bits(s_ks[k].d) == _bits(d_ks[k][5]) == _bits(d)

        # CvM: pinned value-order fold + one normalizing division
        s_cvm = {(r.ga, r.gb): r for r in cvm_from_samples(t).collect()}
        d_cvm = duck(_cvm_oracle(src))
        assert set(s_cvm) == set(d_cvm) == set(exp_cvm)
        for k, v in exp_cvm.items():
            assert _bits(s_cvm[k].t_cvm) == _bits(d_cvm[k][4]) == _bits(v)

        # AD: per-term division, Scholz-Stephens ties form, top excluded
        s_ad = {(r.ga, r.gb): r for r in ad_from_samples(t).collect()}
        d_ad = duck(_ad_oracle(src))
        assert set(s_ad) == set(d_ad) == set(exp_ad)
        for k, v in exp_ad.items():
            assert _bits(s_ad[k].a2) == _bits(d_ad[k][4]) == _bits(v)

        # Energy: exact BIGINT pairwise-|diff| prefix sums + 3 divisions
        s_en = {(r.ga, r.gb): r for r in energy_from_samples(t).collect()}
        d_en = duck(_energy_oracle(src))
        assert set(s_en) == set(d_en) == set(exp_energy)
        for k, (sa, sb, cross, e) in exp_energy.items():
            r = s_en[k]
            assert (r.within_a, r.within_b, r.cross_sum) == (sa, sb, cross)
            assert (d_en[k][5], d_en[k][6], d_en[k][4]) == (sa, sb, cross)
            assert _bits(r.energy_cents) == _bits(d_en[k][7]) == _bits(e)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        samples=st.lists(
            st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 12)),
            min_size=4,
            max_size=30,
        ).filter(lambda s: len({g for g, _ in s}) >= 2)
    )
    def test_kruskal_wallis_bit_identical(self, spark, samples):
        """Kruskal-Wallis rides the same histogram walk (pooled midranks
        instead of pairwise merges) — same three-engine bit gate."""
        import duckdb
        import pandas as pd
        from collections import Counter

        from clinical_api_etl_spark.plans.inference import (
            _kw_oracle,
            kruskal_from_samples,
        )

        # python replay of the declared op sequence
        pooled = Counter(x for _, x in samples)
        groups = sorted({g for g, _ in samples})
        n = len(samples)
        cum = 0
        walked = {}
        for x in sorted(pooled):
            walked[x] = (pooled[x], cum)
            cum += pooled[x]
        s_acc = 0.0
        for g in groups:  # pinned group-order fold
            h_g = Counter(x for gg, x in samples if gg == g)
            n_g = sum(h_g.values())
            r2 = sum(c * (2 * walked[x][1] + walked[x][0] + 1) for x, c in h_g.items())
            s_acc += float(r2) * float(r2) / float(n_g)
        tie_cubes = sum(c * c * c - c for c in pooled.values())
        h = 3.0 * s_acc / float(n * (n + 1)) - 3.0 * float(n + 1)
        # all values identical -> correction undefined (NULL, never NaN)
        h_adj = (
            None
            if tie_cubes == n * n * n - n
            else h / (1.0 - float(tie_cubes) / float(n * n * n - n))
        )

        t = spark.createDataFrame(samples, "g string, x long")
        row = kruskal_from_samples(t).collect()[0]
        con = duckdb.connect()
        con.register("samples", pd.DataFrame(samples, columns=["g", "x"]))
        d = con.execute(
            _kw_oracle("SELECT g, CAST(x AS BIGINT) AS x FROM samples")
        ).fetchone()
        assert (row.n_groups, row.n_total, row.tie_cubes) == (
            len(groups), n, tie_cubes
        ) == (d[0], d[1], d[2])
        assert _bits(row.h) == _bits(d[3]) == _bits(h)
        if h_adj is None:
            assert row.h_tie_adj is None and d[4] is None
        else:
            assert _bits(row.h_tie_adj) == _bits(d[4]) == _bits(h_adj)
