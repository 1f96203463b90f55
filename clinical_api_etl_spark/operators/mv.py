"""Incremental materialized-view maintenance from the change data feed. [EXT]

The lakehouse pattern the reference's gold layer gestures at
(``etl.py:206-263`` recomputes aggregates per job): keep an additive
aggregate (COUNT + SUMs grouped by keys) continuously consistent with a
``SnapshotWarehouse`` table by applying only the CHANGES between the last
refresh and the current snapshot — never rescanning the base table.

Additive aggregates form an abelian group, so delta maintenance is exact:
an insert contributes (+1, +x), a pre-image delete (-1, -x); the merged
state equals the full recompute at the target snapshot (test-pinned).
Groups whose count reaches zero leave the view. This is the same algebra
that makes partial aggregation / map-side combine work inside one Spark
job, applied ACROSS snapshots — and why the CDF's ``pre_image=True`` mode
exists: without removed-row VALUES a sum cannot be decremented.

Refresh cost: O(changed files) to read the feed + O(|delta groups| +
|view|) for the merge. A 'rewrite'/compact in the window raises in
``read_changes``; callers resync with ``rebuild()`` — the standard CDF
contract. State lives as plain parquet + a version sidecar, swapped
atomically (temp + rename), so readers never see a half-applied refresh.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinical_api_etl_spark.sources.snapshots import SnapshotWarehouse


class IncrementalMV:
    """COUNT + SUM materialized view over a SnapshotWarehouse table."""

    def __init__(
        self,
        warehouse: SnapshotWarehouse,
        table: str,
        path: str,
        *,
        group_cols: list[str],
        sum_cols: list[str] | None = None,
    ) -> None:
        self.wh = warehouse
        self.table = table
        self.path = Path(path)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols or [])
        self.spark: SparkSession = warehouse.spark

    # -- state ------------------------------------------------------------

    @property
    def _meta_path(self) -> Path:
        # Meta lives INSIDE data/ (underscore-prefixed: invisible to the
        # parquet reader, like _SUCCESS) so aggregates and their applied
        # version publish in ONE directory rename — a crash can never
        # leave new aggregates paired with old versions, which would make
        # the next refresh re-apply (double-count) the same delta.
        return self.path / "data" / "_mv_meta.json"

    def applied_version(self) -> int | None:
        if not self._meta_path.exists():
            return None
        return json.loads(self._meta_path.read_text())["version"]

    def read(self) -> DataFrame | None:
        if not (self.path / "data").exists():
            return None
        return self.spark.read.parquet(str(self.path / "data"))

    def _write_state(self, df: DataFrame, version: int) -> None:
        tmp = self.path / f"_tmp_{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(str(tmp))
        (tmp / "_mv_meta.json").write_text(json.dumps({"version": version}))
        dest = self.path / "data"
        old = self.path / f"_old_{uuid.uuid4().hex}"
        self.path.mkdir(parents=True, exist_ok=True)
        if dest.exists():
            os.rename(dest, old)
        os.rename(tmp, dest)  # atomic publish of data + applied version
        if old.exists():
            shutil.rmtree(old)

    # -- aggregation algebra ----------------------------------------------

    def _aggregate(self, df: DataFrame, sign: F.Column) -> DataFrame:
        aggs = [F.sum(sign).cast("long").alias("n_rows")]
        for c in self.sum_cols:
            aggs.append(F.sum(sign * F.col(c)).alias(f"sum_{c}"))
        return df.groupBy(*self.group_cols).agg(*aggs)

    def rebuild(self) -> None:
        """Full recompute at the current snapshot (initial build / resync
        after a rewrite)."""
        version = self.wh.versions(self.table)[-1]
        base = self.wh.read(self.table, version)
        self._write_state(self._aggregate(base, F.lit(1)), version)

    def refresh(self) -> int:
        """Apply the change feed since the last refresh; returns the number
        of snapshot versions advanced (0 if already current)."""
        last = self.applied_version()
        if last is None:
            self.rebuild()
            return self.wh.versions(self.table)[-1]
        current = self.wh.versions(self.table)[-1]
        if current == last:
            return 0
        ch = self.wh.read_changes(self.table, last, current, pre_image=True)
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = self._aggregate(ch, sign)

        state = self.read()
        s = state.alias("s")
        d = delta.alias("d")
        # USING-join on the group cols: Spark already coalesces the key
        # columns of a full outer into single unqualified outputs.
        merged = s.join(d, self.group_cols, "full_outer")
        cols = [F.col(k) for k in self.group_cols]
        vals = [
            (
                F.coalesce(F.col("s.n_rows"), F.lit(0))
                + F.coalesce(F.col("d.n_rows"), F.lit(0))
            )
            .cast("long")
            .alias("n_rows")
        ]
        for c in self.sum_cols:
            vals.append(
                (
                    F.coalesce(F.col(f"s.sum_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"d.sum_{c}"), F.lit(0))
                ).alias(f"sum_{c}")
            )
        new_state = merged.select(*cols, *vals).filter(F.col("n_rows") > 0)
        self._write_state(new_state, current)
        return current - last


class IncrementalJoinMV:
    """COUNT + SUM materialized view over an equi-JOIN of two
    ``SnapshotWarehouse`` tables, delta-maintained from both change feeds.

    Join views are the classically hard half of IVM; the Z-relation
    (signed multiset) identity makes them additive again::

        A_new ⋈ B_new − A_old ⋈ B_old  =  ΔA ⋈ B_new  +  A_old ⋈ ΔB

    (expand ``A_new = A_old + ΔA``; the ΔA⋈ΔB cross term belongs to the
    first summand because it joins against B_NEW). Each side's delta rows
    carry a ±1 sign (insert/pre-image delete); the sign multiplies
    through the join into the additive aggregate, so one full-outer merge
    against the stored state — identical to :class:`IncrementalMV` —
    completes the refresh. Cost: O(changed files) on each feed plus two
    joins whose LEFT inputs are delta-sized; the base tables are only
    ever touched through the (file-pruned) snapshot reads they join
    against, never rescanned into the aggregate.
    """

    def __init__(
        self,
        warehouse: SnapshotWarehouse,
        left: str,
        right: str,
        path: str,
        *,
        on: list[str],
        group_cols: list[str],
        sum_cols: list[str] | None = None,
    ) -> None:
        self.wh = warehouse
        self.left = left
        self.right = right
        self.path = Path(path)
        self.on = list(on)
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols or [])
        self.spark: SparkSession = warehouse.spark

    # -- state (same contract as IncrementalMV) ---------------------------

    @property
    def _meta_path(self) -> Path:
        # Inside data/ — atomic data+versions publish (see IncrementalMV).
        return self.path / "data" / "_mv_meta.json"

    def applied_versions(self) -> tuple[int, int] | None:
        if not self._meta_path.exists():
            return None
        m = json.loads(self._meta_path.read_text())
        return m["left_version"], m["right_version"]

    def read(self) -> DataFrame | None:
        if not (self.path / "data").exists():
            return None
        return self.spark.read.parquet(str(self.path / "data"))

    def _write_state(self, df: DataFrame, lv: int, rv: int) -> None:
        tmp = self.path / f"_tmp_{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(str(tmp))
        (tmp / "_mv_meta.json").write_text(
            json.dumps({"left_version": lv, "right_version": rv})
        )
        dest = self.path / "data"
        old = self.path / f"_old_{uuid.uuid4().hex}"
        self.path.mkdir(parents=True, exist_ok=True)
        if dest.exists():
            os.rename(dest, old)
        os.rename(tmp, dest)  # atomic publish of data + applied versions
        if old.exists():
            shutil.rmtree(old)

    # -- algebra ----------------------------------------------------------

    def _aggregate(self, joined: DataFrame, sign: F.Column) -> DataFrame:
        aggs = [F.sum(sign).cast("long").alias("n_rows")]
        for c in self.sum_cols:
            aggs.append(F.sum(sign * F.col(c)).alias(f"sum_{c}"))
        return joined.groupBy(*self.group_cols).agg(*aggs)

    def _signed(self, ch: DataFrame) -> DataFrame:
        return ch.withColumn(
            "_sign",
            F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
                F.lit(-1)
            ),
        ).drop("_change_type")

    def rebuild(self) -> None:
        lv = self.wh.versions(self.left)[-1]
        rv = self.wh.versions(self.right)[-1]
        joined = self.wh.read(self.left, lv).join(
            self.wh.read(self.right, rv), self.on
        )
        self._write_state(self._aggregate(joined, F.lit(1)), lv, rv)

    def refresh(self) -> int:
        """Apply both change feeds; returns total versions advanced."""
        applied = self.applied_versions()
        if applied is None:
            self.rebuild()
            lv, rv = self.applied_versions()
            return lv + rv
        last_l, last_r = applied
        cur_l = self.wh.versions(self.left)[-1]
        cur_r = self.wh.versions(self.right)[-1]
        if (cur_l, cur_r) == (last_l, last_r):
            return 0

        deltas: list[DataFrame] = []
        if cur_l != last_l:
            dl = self._signed(
                self.wh.read_changes(self.left, last_l, cur_l, pre_image=True)
            )
            # ΔA ⋈ B_new
            j = dl.join(self.wh.read(self.right, cur_r), self.on)
            deltas.append(self._aggregate(j, F.col("_sign")))
        if cur_r != last_r:
            dr = self._signed(
                self.wh.read_changes(self.right, last_r, cur_r, pre_image=True)
            )
            # A_old ⋈ ΔB
            j = self.wh.read(self.left, last_l).join(dr, self.on)
            deltas.append(self._aggregate(j, F.col("_sign")))

        delta = deltas[0]
        for d in deltas[1:]:
            delta = delta.unionByName(d)
            delta = delta.groupBy(*self.group_cols).agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                *[
                    F.sum(f"sum_{c}").alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )

        state = self.read()
        s = state.alias("s")
        d = delta.alias("d")
        merged = s.join(d, self.group_cols, "full_outer")
        cols = [F.col(k) for k in self.group_cols]
        vals = [
            (
                F.coalesce(F.col("s.n_rows"), F.lit(0))
                + F.coalesce(F.col("d.n_rows"), F.lit(0))
            )
            .cast("long")
            .alias("n_rows")
        ]
        for c in self.sum_cols:
            vals.append(
                (
                    F.coalesce(F.col(f"s.sum_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"d.sum_{c}"), F.lit(0))
                ).alias(f"sum_{c}")
            )
        new_state = merged.select(*cols, *vals).filter(F.col("n_rows") > 0)
        self._write_state(new_state, cur_l, cur_r)
        return (cur_l - last_l) + (cur_r - last_r)
