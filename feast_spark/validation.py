"""Training-set validation: declarative expectations evaluated in one
distributed aggregation pass.

Reference hook: ``RetrievalJob.to_df(validation_reference)`` runs a
profile against retrieval output (offline_store.py:76-184 validation
path, dqm module). Here a ``ValidationProfile`` is a list of
expectations compiled into a single ``agg`` (one job, no collects of
data rows), returning per-expectation pass/fail + measured values.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expect:
    """One expectation. kinds: row_count_min, row_count_max,
    null_ratio_max, min_at_least, max_at_most, distinct_at_least,
    unique_key."""

    kind: str
    column: str | None = None
    value: float | None = None
    columns: Sequence[str] = ()


@dataclass
class ValidationProfile:
    expectations: Sequence[Expect] = field(default_factory=list)

    def validate(self, df: DataFrame) -> dict:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, e in enumerate(self.expectations):
            if e.kind == "null_ratio_max":
                aggs.append(
                    F.avg(F.when(F.col(e.column).isNull(), 1.0).otherwise(0.0)).alias(f"__m{i}")
                )
            elif e.kind == "min_at_least":
                aggs.append(F.min(e.column).cast("double").alias(f"__m{i}"))
            elif e.kind == "max_at_most":
                aggs.append(F.max(e.column).cast("double").alias(f"__m{i}"))
            elif e.kind == "distinct_at_least":
                aggs.append(F.countDistinct(e.column).cast("double").alias(f"__m{i}"))
            elif e.kind == "unique_key":
                # struct-wrap so rows with NULL key components still count
                # (bare countDistinct drops any row with a null column and
                # falsely reports duplicates on unique data)
                aggs.append(
                    F.countDistinct(F.struct(*[F.col(c) for c in e.columns]))
                    .cast("double")
                    .alias(f"__m{i}")
                )
            elif e.kind not in ("row_count_min", "row_count_max"):
                # fail fast BEFORE the distributed aggregation runs
                raise ValueError(f"unknown expectation kind {e.kind!r}")
        row = df.agg(*aggs).first()
        n = row["__n"]
        results = []
        ok_all = True
        for i, e in enumerate(self.expectations):
            if e.kind == "row_count_min":
                measured, ok = float(n), n >= e.value
            elif e.kind == "row_count_max":
                measured, ok = float(n), n <= e.value
            elif e.kind == "null_ratio_max":
                measured = float(row[f"__m{i}"] or 0.0)
                ok = measured <= e.value
            elif e.kind == "min_at_least":
                measured = row[f"__m{i}"]
                ok = measured is not None and measured >= e.value
            elif e.kind == "max_at_most":
                measured = row[f"__m{i}"]
                ok = measured is not None and measured <= e.value
            elif e.kind == "distinct_at_least":
                measured = float(row[f"__m{i}"])
                ok = measured >= e.value
            elif e.kind == "unique_key":
                measured = float(row[f"__m{i}"])
                ok = measured == n
            else:
                raise ValueError(f"unknown expectation kind {e.kind!r}")
            ok_all &= bool(ok)
            results.append(
                {"kind": e.kind, "column": e.column or list(e.columns), "measured": measured, "ok": bool(ok)}
            )
        return {"passed": ok_all, "rows": int(n), "expectations": results}


class ValidationError(RuntimeError):
    pass


def validate_or_raise(df: DataFrame, profile: ValidationProfile) -> dict:
    report = profile.validate(df)
    if not report["passed"]:
        failing = [r for r in report["expectations"] if not r["ok"]]
        raise ValidationError(f"validation failed: {failing}")
    return report
