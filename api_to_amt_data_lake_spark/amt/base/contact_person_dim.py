"""contact_person_dim — one row per (parent, student) with typed address /
phone / email columns.

Parity target: `parquet/amt/base/contact_person_dim/main.py`
(RESULT_COLUMNS `main.py:29-53`). The reference's filtered-fanout joins —
5 address types + 3 phone types + 2 email types, each a separate
pre-filtered left merge (J8, `main.py:161-218,281-368,372-449`) — are
each ONE pivot here (per SURVEY.md §2.3 J8): 10 shuffling joins → 3
pivots + 3 joins.

Reproduced quirks:
- Address concat: street + (', ' + apartment when non-empty) + ', ' +
  city + ' ' + state + ' ' + postal (F13, `main.py:171-186`).
- Address periods with endDate < today drop out (run_date injected).
- PostalCode is the HOME address's postal code (`main.py:372,536`).
- 'personal' email also matches a lowercase substring of the raw
  descriptor, not just the crosswalk constant (`main.py:358-362`).
- PrimaryEmailAddress: the reference assigns a work-based value then
  unconditionally overwrites it with the personal-based one
  (`main.py:452-461`) — net semantics: 'Personal' when the personal
  email's primaryEmailAddressIndicator is true, else 'Not specified'.
"""

from __future__ import annotations

from datetime import date as _date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import descriptor_code_value
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.operators.pivots import pivot_first
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    col_or_null,
    read_collection,
)
from api_to_amt_data_lake_spark.sources.lookup import with_descriptor_constant

CONTRACT = ViewContract(
    name="contactPersonDim",
    columns=(
        "UniqueKey", "ContactPersonKey", "StudentKey", "ContactFirstName",
        "ContactLastName", "RelationshipToStudent", "ContactHomeAddress",
        "ContactPhysicalAddress", "ContactMailingAddress", "ContactWorkAddress",
        "ContactTemporaryAddress", "HomePhoneNumber", "MobilePhoneNumber",
        "WorkPhoneNumber", "PrimaryEmailAddress", "PersonalEmailAddress",
        "WorkEmailAddress", "IsPrimaryContact", "StudentLivesWith",
        "IsEmergencyContact", "ContactPriority", "ContactRestrictions",
        "PostalCode",
    ),
    types={"IsPrimaryContact": "int", "StudentLivesWith": "int",
           "IsEmergencyContact": "int", "ContactPriority": "int"},
)

_ADDR_TYPES = ["Address.Home", "Address.Physical", "Address.Mailing",
               "Address.Work", "Address.Temporary"]
_PHONE_TYPES = ["Telephone.Home", "Telephone.Mobile", "Telephone.Work"]


def _addresses(parents: DataFrame, today_key: str) -> DataFrame | None:
    if "addresses" not in parents.columns:
        return None
    addr = parents.select(
        F.col("id").alias("_pid"), F.explode("addresses").alias("a")
    ).select(
        "_pid",
        F.col("a.addressTypeDescriptor").alias("addressTypeDescriptor"),
        null_to_empty(F.col("a.city")).alias("_city"),
        null_to_empty(F.col("a.postalCode")).alias("_postal"),
        null_to_empty(descriptor_code_value(F.col("a.stateAbbreviationDescriptor")))
        .alias("_state"),
        null_to_empty(F.col("a.streetNumberName")).alias("_street"),
        (null_to_empty(F.col("a.apartmentRoomSuiteNumber"))
         if "apartmentRoomSuiteNumber" in
         [f.name for f in parents.schema["addresses"].dataType.elementType.fields]
         else F.lit("")).alias("_apt"),
        (F.col("a.periods") if "periods" in
         [f.name for f in parents.schema["addresses"].dataType.elementType.fields]
         else F.lit(None)).alias("_periods"),
    )
    # Active-period filter: reference drops rows whose period endDate passed.
    if dict(addr.dtypes).get("_periods", "void") != "void":
        period_fields = []
        try:
            period_fields = [
                f.name for f in addr.schema["_periods"].dataType.elementType.fields]
        except Exception:
            period_fields = []
        if "endDate" in period_fields:
            end = F.element_at(F.col("_periods.endDate"), 1)
            addr = addr.filter(
                end.isNull() | (date_key(end) >= today_key))
    addr = with_descriptor_constant(addr, "addressTypeDescriptor")
    street_apt = F.when(F.col("_apt") != "",
                        F.concat(F.col("_street"), F.lit(", "), F.col("_apt"))
                        ).otherwise(F.col("_street"))
    full = F.concat(street_apt, F.lit(", "), F.col("_city"), F.lit(" "),
                    F.col("_state"), F.lit(" "), F.col("_postal"))
    flat = addr.select(
        "_pid",
        F.col("addressTypeDescriptor_constantName").alias("_type"),
        full.alias("_addr"),
        F.col("_postal"),
    )
    piv = pivot_first(
        flat, ["_pid"], "_type", _ADDR_TYPES, "_addr",
        rename={"Address.Home": "ContactHomeAddress",
                "Address.Physical": "ContactPhysicalAddress",
                "Address.Mailing": "ContactMailingAddress",
                "Address.Work": "ContactWorkAddress",
                "Address.Temporary": "ContactTemporaryAddress"},
    )
    home_postal = pivot_first(
        flat, ["_pid"], "_type", ["Address.Home"], "_postal",
        rename={"Address.Home": "PostalCode"},
    )
    return piv.join(home_postal, "_pid", "left")


def _phones(parents: DataFrame) -> DataFrame | None:
    if "telephones" not in parents.columns:
        return None
    tel = with_descriptor_constant(
        parents.select(
            F.col("id").alias("_pid"), F.explode("telephones").alias("t")
        ).select(
            "_pid",
            F.col("t.telephoneNumberTypeDescriptor")
            .alias("telephoneNumberTypeDescriptor"),
            F.col("t.telephoneNumber").alias("_phone"),
        ),
        "telephoneNumberTypeDescriptor",
    )
    return pivot_first(
        tel.select("_pid",
                   F.col("telephoneNumberTypeDescriptor_constantName")
                   .alias("_type"), "_phone"),
        ["_pid"], "_type", _PHONE_TYPES, "_phone",
        rename={"Telephone.Home": "HomePhoneNumber",
                "Telephone.Mobile": "MobilePhoneNumber",
                "Telephone.Work": "WorkPhoneNumber"},
    )


def _emails(parents: DataFrame) -> DataFrame | None:
    if "electronicMails" not in parents.columns:
        return None
    mail_fields = [
        f.name for f in parents.schema["electronicMails"].dataType.elementType.fields]
    em = with_descriptor_constant(
        parents.select(
            F.col("id").alias("_pid"), F.explode("electronicMails").alias("m")
        ).select(
            "_pid",
            F.col("m.electronicMailTypeDescriptor")
            .alias("electronicMailTypeDescriptor"),
            F.col("m.electronicMailAddress").alias("_email"),
            (F.col("m.primaryEmailAddressIndicator")
             if "primaryEmailAddressIndicator" in mail_fields
             else F.lit(None).cast("boolean")).alias("_primary"),
        ),
        "electronicMailTypeDescriptor",
    )
    is_personal = (
        F.coalesce(F.col("electronicMailTypeDescriptor_constantName"), F.lit(""))
        .contains("Email.Personal")
        | F.lower(F.col("electronicMailTypeDescriptor")).contains("personal")
    )
    is_work = F.coalesce(
        F.col("electronicMailTypeDescriptor_constantName"), F.lit("")
    ).contains("Email.Work")
    typed = em.select(
        "_pid",
        F.when(is_personal, "personal").when(is_work, "work").alias("_type"),
        "_email", "_primary",
    ).filter(F.col("_type").isNotNull())
    addr = pivot_first(typed, ["_pid"], "_type", ["personal", "work"], "_email",
                       rename={"personal": "PersonalEmailAddress",
                               "work": "WorkEmailAddress"})
    personal_primary = (
        typed.filter(F.col("_type") == "personal")
        .groupBy("_pid").agg(F.max("_primary").alias("_personal_primary"))
    )
    return addr.join(personal_primary, "_pid", "left")


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    spa = read_collection(spark, silver_root, school_year,
                          "studentParentAssociations")
    parents = read_collection(spark, silver_root, school_year, "parents")
    if spa is None or parents is None:
        return CONTRACT.empty(spark)

    today_key = (run_date or _date.today().isoformat()).replace("-", "")[:8]

    assoc = spa.select(
        F.col("parentReference.parentUniqueId").cast("string").alias("_parent"),
        F.col("studentReference.studentUniqueId").cast("string")
        .alias("StudentKey"),
        col_or_null(spa, "primaryContactStatus", "boolean").alias("_primary"),
        col_or_null(spa, "livesWith", "boolean").alias("_lives"),
        col_or_null(spa, "emergencyContactStatus", "boolean").alias("_emergency"),
        col_or_null(spa, "contactPriority", "int").alias("_priority"),
        col_or_null(spa, "contactRestrictions").alias("_restrictions"),
        descriptor_code_value(col_or_null(spa, "relationDescriptor"))
        .alias("RelationshipToStudent"),
    )
    base_parents = parents.select(
        F.col("id").alias("_pid"),
        F.col("parentUniqueId").cast("string").alias("ContactPersonKey"),
        F.col("firstName").alias("ContactFirstName"),
        F.col("lastSurname").alias("ContactLastName"),
    )
    result = assoc.join(
        base_parents, assoc._parent == base_parents.ContactPersonKey, "inner")

    for extra in (_addresses(parents, today_key), _phones(parents),
                  _emails(parents)):
        if extra is not None:
            result = result.join(extra, "_pid", "left")

    for c in ("ContactHomeAddress", "ContactPhysicalAddress",
              "ContactMailingAddress", "ContactWorkAddress",
              "ContactTemporaryAddress", "HomePhoneNumber", "MobilePhoneNumber",
              "WorkPhoneNumber", "PersonalEmailAddress", "WorkEmailAddress",
              "PostalCode", "_personal_primary"):
        if c not in result.columns:
            result = result.withColumn(c, F.lit(None).cast(
                "boolean" if c == "_personal_primary" else "string"))

    return CONTRACT.conform(
        result.select(
            F.concat_ws("-", "ContactPersonKey", "StudentKey").alias("UniqueKey"),
            "ContactPersonKey", "StudentKey", "ContactFirstName",
            "ContactLastName", "RelationshipToStudent",
            null_to_empty("ContactHomeAddress").alias("ContactHomeAddress"),
            null_to_empty("ContactPhysicalAddress").alias("ContactPhysicalAddress"),
            null_to_empty("ContactMailingAddress").alias("ContactMailingAddress"),
            null_to_empty("ContactWorkAddress").alias("ContactWorkAddress"),
            null_to_empty("ContactTemporaryAddress")
            .alias("ContactTemporaryAddress"),
            null_to_empty("HomePhoneNumber").alias("HomePhoneNumber"),
            null_to_empty("MobilePhoneNumber").alias("MobilePhoneNumber"),
            null_to_empty("WorkPhoneNumber").alias("WorkPhoneNumber"),
            F.when(F.col("_personal_primary"), "Personal")
            .otherwise("Not specified").alias("PrimaryEmailAddress"),
            null_to_empty("PersonalEmailAddress").alias("PersonalEmailAddress"),
            null_to_empty("WorkEmailAddress").alias("WorkEmailAddress"),
            F.coalesce(F.col("_primary").cast("int"), F.lit(0))
            .alias("IsPrimaryContact"),
            F.coalesce(F.col("_lives").cast("int"), F.lit(0))
            .alias("StudentLivesWith"),
            F.coalesce(F.col("_emergency").cast("int"), F.lit(0))
            .alias("IsEmergencyContact"),
            F.coalesce(F.col("_priority"), F.lit(0)).alias("ContactPriority"),
            null_to_empty("_restrictions").alias("ContactRestrictions"),
            null_to_empty("PostalCode").alias("PostalCode"),
        ),
        spark,
    )
