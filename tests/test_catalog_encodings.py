"""Matrix-test catalog.load against every events.ts physical encoding.

The driver REGENERATES testdata between rounds and has already shipped
``events.ts`` three different ways (BENCH_r03 crashed on the flip):

1. ``TIMESTAMP(NANOS)`` — Spark's vectorized reader rejects it; with
   ``nanosAsLong`` it surfaces as BIGINT nanoseconds.
2. naive µs (``isAdjustedToUTC=false``) — the NTZ-inferring reader
   surfaces TIMESTAMP_NTZ, breaking ``unix_millis`` and watermarks.
3. UTC-adjusted µs — plain TIMESTAMP, the easy case.

``catalog.load`` must normalize all three to the session TIMESTAMP type
with identical VALUES, under both the repo session and a VANILLA
SparkSession shape (the driver does not use session.py confs). These
fixtures are synthesized with pyarrow, so a future regen can introduce
no encoding this suite hasn't already pinned.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clinical_api_etl_spark.sources.catalog import load

#: One row per epoch-µs instant; values chosen to exercise sub-second
#: precision and a DST-shoulder date.
_INSTANTS_US = [
    1_700_000_000_000_000,
    1_700_000_000_123_456,
    1_720_000_001_000_789,
    1_580_000_000_000_000,
]


def _write(tmp_path, name: str, arrow_type, values):
    d = tmp_path / name
    d.mkdir()
    table = pa.table(
        {
            "event_id": pa.array(range(len(values)), pa.int64()),
            "ts": pa.array(values, arrow_type),
            "user_id": pa.array([f"u{i}" for i in range(len(values))]),
            "event_type": pa.array(["click"] * len(values)),
            "value": pa.array([1.5] * len(values)),
        }
    )
    pq.write_table(table, d / "events.parquet")
    return str(d)


@pytest.fixture()
def encoding_dirs(tmp_path):
    naive = [dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=u) for u in _INSTANTS_US]
    return {
        "nanos": _write(tmp_path, "nanos", pa.timestamp("ns"), [u * 1000 for u in _INSTANTS_US]),
        "naive_us": _write(tmp_path, "naive_us", pa.timestamp("us"), naive),
        "utc_us": _write(tmp_path, "utc_us", pa.timestamp("us", tz="UTC"), naive),
    }


class TestEncodingMatrix:
    @pytest.mark.parametrize("enc", ["nanos", "naive_us", "utc_us"])
    def test_load_normalizes_to_timestamp(self, spark, encoding_dirs, enc):
        df = load(spark, encoding_dirs[enc], "events")
        assert dict(df.dtypes)["ts"] == "timestamp", enc
        got = sorted(
            r[0] for r in df.selectExpr("unix_micros(ts)").collect()
        )
        assert got == sorted(_INSTANTS_US), enc

    @pytest.mark.parametrize("enc", ["nanos", "naive_us", "utc_us"])
    def test_ts_predicate_works(self, spark, encoding_dirs, enc):
        """The r03 crash class: a ts filter + unix_millis must run (and be
        correct) on every encoding."""
        df = load(spark, encoding_dirs[enc], "events")
        cutoff = dt.datetime(2023, 12, 1)
        n = df.filter(df.ts >= cutoff).count()
        expect = sum(
            1 for u in _INSTANTS_US
            if u >= int(cutoff.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        )
        assert n == expect, enc
        ms = sorted(r[0] for r in df.selectExpr("unix_millis(ts)").collect())
        assert ms == sorted(u // 1000 for u in _INSTANTS_US), enc


class TestVanillaSession:
    def test_all_encodings_under_vanilla_confs(self, spark, encoding_dirs):
        """Emulate the driver's session shape: reset the two confs
        catalog.load depends on to their defaults before each load — the
        loader must set them itself (it cannot assume session.py ran)."""
        for enc, d in encoding_dirs.items():
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
            try:
                df = load(spark, d, "events")
                assert dict(df.dtypes)["ts"] == "timestamp", enc
                got = sorted(r[0] for r in df.selectExpr("unix_micros(ts)").collect())
                assert got == sorted(_INSTANTS_US), enc
            finally:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                spark.conf.set(
                    "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
                )
