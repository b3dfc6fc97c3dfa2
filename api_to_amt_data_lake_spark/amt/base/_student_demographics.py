"""Shared demographics extraction for the two demographics bridges.

Parity target: `get_student_demographic` in
`parquet/amt/base/student_school_demographics_bridge/main.py:191-383` and
its near-identical twin in
`student_local_education_agency_demographics_bridge/main.py` — six
demographic families exploded out of `studentEducationOrganizationAssociations`
(`main.py:48-85`), each contributing `{Prefix}:{codeValue}` rows
(CohortYear additionally embeds the school year,
`main.py:366-376`), with two families deriving a second row set from a
nested array (languages→uses, disabilities→designations,
`main.py:319-354`).

Reference quirks deliberately reproduced / documented:

- Rows whose descriptor code value is null/'' are dropped
  (`main.py:263-267,285-290`).
- The `periods.endDate` filter (`main.py:292-315`) is a structural no-op in
  the reference: `descriptor_periods.endDate` never materializes under a
  recordPath normalize, so `endDate` is always defaulted to `'21003112'`,
  which is `>=` any real date key. We therefore do not filter on periods.
- The derived (uses/designations) rows keep only `id`, code, prefix —
  the parent element's descriptor is replaced wholesale
  (`main.py:333-343`).

Scale note: the explode fans one association row into a handful of rows
(bounded by array sizes, typically <10) — no shuffle is introduced here;
everything stays in the scan stage until the bridge's join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
    ref_from_href,
)
from api_to_amt_data_lake_spark.sources.json_source import array_col, col_or_null

# (prefix, array path, element descriptor, derived prefix, derived array,
#  derived element descriptor) — `main.py:48-85`.
FAMILIES = (
    ("CohortYear", "cohortYears", "cohortYearTypeDescriptor", None, None, None),
    ("Language", "languages", "languageDescriptor",
     "LanguageUse", "uses", "languageUseDescriptor"),
    ("Disability", "disabilities", "disabilityDescriptor",
     "DisabilityDesignation", "designations", "disabilityDesignationDescriptor"),
    ("Race", "races", "raceDescriptor", None, None, None),
    ("TribalAffiliation", "tribalAffiliations", "tribalAffiliationDescriptor",
     None, None, None),
    ("StudentCharacteristic", "studentCharacteristics",
     "studentCharacteristicDescriptor", None, None, None),
)

_KEY_COLS = ("StudentKey", "EducationOrganizationId", "_ed_org_rel",
             "_ed_org_ref_id", "_student_ref_id")


def _element_field(df: DataFrame, path: str, cast: str = "string"):
    """`_el.<member>` when the inferred element struct carries it, else a
    typed null (optional members vanish from inferred schemas entirely)."""
    try:
        df.select(path)
        return F.col(path)
    except Exception:
        return F.lit(None).cast(cast)


def demographic_rows(seoa: DataFrame) -> DataFrame:
    """One row per (student, ed-org, DemographicKey) across all families.

    Columns: StudentKey, EducationOrganizationId, _ed_org_rel,
    _ed_org_ref_id, _student_ref_id, DemographicKey.
    """
    base = [
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        F.col("educationOrganizationReference.educationOrganizationId")
        .cast("string").alias("EducationOrganizationId"),
        col_or_null(seoa, "educationOrganizationReference.link.rel")
        .alias("_ed_org_rel"),
        ref_from_href(col_or_null(seoa, "educationOrganizationReference.link.href"))
        .alias("_ed_org_ref_id"),
        ref_from_href(col_or_null(seoa, "studentReference.link.href"))
        .alias("_student_ref_id"),
    ]
    parts: list[DataFrame] = []
    for prefix, path, desc, d_prefix, d_path, d_desc in FAMILIES:
        el_type = f"struct<{desc}:string>"
        exploded = seoa.select(
            *base, F.explode(array_col(seoa, path, el_type)).alias("_el"))
        code = descriptor_code_value(_element_field(exploded, f"_el.{desc}"))
        if prefix == "CohortYear":
            year = _element_field(
                exploded, "_el.schoolYearTypeReference.schoolYear", "bigint"
            ).cast("string")
            key = F.concat(F.lit("CohortYear:"), F.coalesce(year, F.lit("")),
                           F.lit("-"), code)
        else:
            key = F.concat(F.lit(prefix + ":"), code)
        parts.append(
            exploded.filter(code.isNotNull() & (code != ""))
            .select(*_KEY_COLS, key.alias("DemographicKey"))
        )
        if d_path is not None:
            derived = exploded.select(
                *_KEY_COLS,
                F.explode(_element_field(
                    exploded, f"_el.{d_path}",
                    f"array<struct<{d_desc}:string>>")).alias("_d"),
            )
            d_code = descriptor_code_value(
                _element_field(derived, f"_d.{d_desc}"))
            parts.append(
                derived.filter(d_code.isNotNull() & (d_code != ""))
                .select(*_KEY_COLS,
                        F.concat(F.lit(d_prefix + ":"), d_code)
                        .alias("DemographicKey"))
            )
    return reduce(DataFrame.unionByName, parts)
