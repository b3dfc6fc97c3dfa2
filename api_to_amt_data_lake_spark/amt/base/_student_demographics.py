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

Scale note: the naive shape here is an 8-branch UNION ALL, one explode per
family — which re-scans (and re-parses, for multiline JSON) the source
eight times. Instead each family array is filtered/transformed into a
per-row array of DemographicKeys with higher-order functions (JVM-side,
codegen-friendly), the arrays are concatenated, and a SINGLE explode emits
the rows: one scan, zero shuffles, fan-out bounded by array sizes
(typically <10 per association).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
    ref_from_href,
)
from api_to_amt_data_lake_spark.sources.json_source import col_or_null

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

def _struct_field(df: DataFrame, array_path: str, member: str) -> bool:
    """True when the inferred element struct of `array_path` carries
    `member` (optional members vanish from inferred schemas entirely)."""
    try:
        df.select(f"{array_path}.{member}")
        return True
    except Exception:
        return False


def _family_keys(seoa: DataFrame, prefix: str, path: str, desc: str) -> Column:
    """Array of `{prefix}:{codeValue}` keys for one demographic family —
    elements with null/'' code values dropped (`main.py:263-267,285-290`)."""
    if not _struct_field(seoa, path, desc):
        return F.lit(None).cast("array<string>")
    kept = F.filter(
        F.col(path),
        lambda el: descriptor_code_value(el[desc]).isNotNull()
        & (descriptor_code_value(el[desc]) != ""),
    )
    if prefix == "CohortYear":
        has_year = _struct_field(
            seoa, path, "schoolYearTypeReference.schoolYear")

        def key(el):
            year = (el["schoolYearTypeReference"]["schoolYear"].cast("string")
                    if has_year else F.lit(None).cast("string"))
            return F.concat(F.lit("CohortYear:"),
                            F.coalesce(year, F.lit("")), F.lit("-"),
                            descriptor_code_value(el[desc]))
    else:
        def key(el):
            return F.concat(F.lit(prefix + ":"),
                            descriptor_code_value(el[desc]))
    return F.transform(kept, key)


def _derived_keys(seoa: DataFrame, path: str, d_prefix: str, d_path: str,
                  d_desc: str) -> Column:
    """Keys from a nested second-level array (languages→uses,
    disabilities→designations; `main.py:319-354`): flatten the per-element
    arrays into one per-row key array."""
    if not _struct_field(seoa, path, d_path):
        return F.lit(None).cast("array<string>")
    return F.flatten(F.transform(
        F.col(path),
        # A parent element with a null nested array must contribute an
        # empty array (not null — flatten(null element) nulls the row).
        lambda el: F.coalesce(
            F.transform(
                F.filter(
                    el[d_path],
                    lambda d: descriptor_code_value(d[d_desc]).isNotNull()
                    & (descriptor_code_value(d[d_desc]) != ""),
                ),
                lambda d: F.concat(F.lit(d_prefix + ":"),
                                   descriptor_code_value(d[d_desc])),
            ),
            F.array().cast("array<string>"),
        ),
    ))


def demographic_rows(seoa: DataFrame) -> DataFrame:
    """One row per (student, ed-org, DemographicKey) across all families.

    Columns: StudentKey, EducationOrganizationId, _ed_org_rel,
    _ed_org_ref_id, _student_ref_id, DemographicKey.

    Single-scan plan: per-family key arrays built with
    `filter`/`transform`/`flatten`, concatenated, exploded once.
    """
    key_arrays: list[Column] = []
    for prefix, path, desc, d_prefix, d_path, d_desc in FAMILIES:
        if path not in seoa.columns:
            continue
        key_arrays.append(_family_keys(seoa, prefix, path, desc))
        if d_path is not None:
            key_arrays.append(
                _derived_keys(seoa, path, d_prefix, d_path, d_desc))
    if not key_arrays:
        all_keys = F.lit(None).cast("array<string>")
    else:
        all_keys = F.concat(*[
            F.coalesce(a, F.array().cast("array<string>"))
            for a in key_arrays
        ])
    return seoa.select(
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        F.col("educationOrganizationReference.educationOrganizationId")
        .cast("string").alias("EducationOrganizationId"),
        col_or_null(seoa, "educationOrganizationReference.link.rel")
        .alias("_ed_org_rel"),
        ref_from_href(col_or_null(seoa,
                                  "educationOrganizationReference.link.href"))
        .alias("_ed_org_ref_id"),
        ref_from_href(col_or_null(seoa, "studentReference.link.href"))
        .alias("_student_ref_id"),
        F.explode(all_keys).alias("DemographicKey"),
    )
