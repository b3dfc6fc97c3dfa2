"""Gold-layer validation: the post-build checks a lake operator runs
before pointing analysts at a refresh.

The reference has no analog (its CI is lint-only — BASELINE.md); these
are the standard warehouse invariants over the AMT star schema:

- referential integrity: every fact/bridge foreign key resolves to its
  dimension (anti join — the violating side is counted, never collected),
- key uniqueness: dimension primary keys appear exactly once,
- key completeness: no null/empty primary or foreign keys.

Every check is one distributed aggregate; the driver only collects one
scalar per check, so the report costs a handful of broadcast-sized anti
joins regardless of lake size. Views absent from the gold folder (empty
source collections) are reported as SKIPPED rather than failed — an
empty optional collection is a legal lake state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.sources.parquet_io import register_gold_views

# (child view, child FK column, parent view, parent key column)
RI_CHECKS: list[tuple[str, str, str, str]] = [
    ("studentSchoolDim", "SchoolKey", "schoolDim", "SchoolKey"),
    ("studentSectionDim", "StudentSchoolKey",
     "studentSchoolDim", "StudentSchoolKey"),
    ("ews_studentSectionGradeFact", "StudentSectionKey",
     "studentSectionDim", "StudentSectionKey"),
    ("ews_studentSectionGradeFact", "SchoolKey", "schoolDim", "SchoolKey"),
    ("chrab_chronicAbsenteeismAttendanceFact", "StudentSchoolKey",
     "studentSchoolDim", "StudentSchoolKey"),
    ("chrab_chronicAbsenteeismAttendanceFact", "SchoolKey",
     "schoolDim", "SchoolKey"),
    ("ews_studentEarlyWarningFact", "StudentKey",
     "studentSchoolDim", "StudentKey"),
    ("studentSchoolDemographicsBridge", "StudentSchoolKey",
     "studentSchoolDim", "StudentSchoolKey"),
    ("staffSectionDim", "SchoolKey", "schoolDim", "SchoolKey"),
]

# (view, primary key columns) — must be unique AND non-null/non-empty
UNIQUE_KEYS: list[tuple[str, tuple[str, ...]]] = [
    ("schoolDim", ("SchoolKey",)),
    ("studentSchoolDim", ("StudentSchoolKey",)),
    ("studentSectionDim", ("StudentSectionKey",)),
    ("sectionDim", ("SectionKey",)),
    ("dateDim", ("DateKey",)),
    ("gradingPeriodDim", ("GradingPeriodKey",)),
    ("localEducationAgencyDim", ("LocalEducationAgencyKey",)),
]

REPORT_SCHEMA = ("check string, kind string, status string, "
                 "violations long")


def validate_gold(spark: SparkSession, gold_root: str,
                  school_year: str | int,
                  ri_checks=None, unique_keys=None) -> DataFrame:
    """One report row per check: (check, kind, status, violations) with
    status PASS / FAIL / SKIPPED (view not written). The per-check work
    is a distributed anti join or groupBy; only the violation COUNT
    reaches the driver."""
    present = set(register_gold_views(spark, gold_root, school_year))
    rows: list[tuple[str, str, str, int]] = []

    def blank(col: str):
        return F.col(col).isNull() | (F.trim(F.col(col).cast("string")) == "")

    for child, fk, parent, pk in (ri_checks or RI_CHECKS):
        name = f"{child}.{fk} -> {parent}.{pk}"
        if child not in present or parent not in present:
            rows.append((name, "referential", "SKIPPED", 0))
            continue
        orphans = (
            spark.table(child)
            .filter(~blank(fk))
            .join(spark.table(parent)
                  .select(F.col(pk).alias(fk)).distinct(),
                  fk, "left_anti")
            .count()
        )
        rows.append((name, "referential",
                     "PASS" if orphans == 0 else "FAIL", orphans))

    for view, keys in (unique_keys or UNIQUE_KEYS):
        kname = ",".join(keys)
        if view not in present:
            rows.append((f"{view}({kname}) unique", "uniqueness",
                         "SKIPPED", 0))
            rows.append((f"{view}({kname}) non-null", "completeness",
                         "SKIPPED", 0))
            continue
        df = spark.table(view)
        dupes = (
            df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1).count()
        )
        rows.append((f"{view}({kname}) unique", "uniqueness",
                     "PASS" if dupes == 0 else "FAIL", dupes))
        import functools
        nulls = df.filter(functools.reduce(
            lambda a, c: a | c, [blank(k) for k in keys])).count()
        rows.append((f"{view}({kname}) non-null", "completeness",
                     "PASS" if nulls == 0 else "FAIL", nulls))

    return spark.createDataFrame(rows, REPORT_SCHEMA)
