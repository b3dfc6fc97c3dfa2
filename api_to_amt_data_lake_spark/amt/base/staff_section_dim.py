"""staff_section_dim — active staff-section assignments with staff detail.

Parity target: `parquet/amt/base/staff_section_dim/main.py`
(RESULT_COLUMNS `main.py:27-46`). Notable semantics reproduced:
- active filter endDate > today on yyyymmdd keys (`main.py:88-91`);
  a *null* endDate stringifies to 'nan' in the reference, which sorts
  after any digit key → open-ended assignments pass. Here: null passes.
- Multiracial: staff with >1 race collapse to 'Multiracial', else first
  race in document order; no races → 'Unknown' (J9, `main.py:153-169`).
  In Spark the nested races array makes this a size()/element_at
  projection — no groupBy+join-back shuffle at all.
- emails left-join un-deduplicated (fanout preserved, `main.py:128-138`).
- HQT / hispanic flags: null→0, bool→int (`main.py:233-237`).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.dates import date_key
from api_to_amt_data_lake_spark.functions.descriptors import descriptor_code_value
from api_to_amt_data_lake_spark.functions.keys import sk_concat_strict
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import read_collection

CONTRACT = ViewContract(
    name="staffSectionDim",
    columns=(
        "StaffSectionKey", "UserKey", "SchoolKey", "SectionKey",
        "PersonalTitlePrefix", "StaffFirstName", "StaffMiddleName",
        "StaffLastName", "ElectronicMailAddress", "Sex", "BirthDate", "Race",
        "HispanicLatinoEthnicity", "HighestCompletedLevelOfEducation",
        "YearsOfPriorProfessionalExperience", "YearsOfPriorTeachingExperience",
        "HighlyQualifiedTeacher", "LoginId",
    ),
    types={
        "HispanicLatinoEthnicity": "int", "HighlyQualifiedTeacher": "int",
        "YearsOfPriorProfessionalExperience": "double",
        "YearsOfPriorTeachingExperience": "double",
    },
)


def _opt(df: DataFrame, name: str, cast: str = "string"):
    return (F.col(name) if name in df.columns
            else F.lit(None)).cast(cast).alias(name)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    assoc = read_collection(spark, silver_root, school_year,
                            "staffSectionAssociations")
    staffs = read_collection(spark, silver_root, school_year, "staffs")
    if assoc is None or staffs is None:
        return CONTRACT.empty(spark)

    today_key = (run_date or date.today().isoformat()).replace("-", "")[:8]
    end_key = (date_key("endDate") if "endDate" in assoc.columns
               else F.lit(None).cast("string"))
    active = assoc.select(
        F.col("staffReference.staffUniqueId").alias("UserKey"),
        F.col("sectionReference.schoolId").cast("string").alias("SchoolKey"),
        F.col("sectionReference.localCourseCode").alias("_lcc"),
        F.col("sectionReference.schoolYear").cast("string").alias("_sy"),
        F.col("sectionReference.sectionIdentifier").alias("_sid"),
        F.col("sectionReference.sessionName").alias("_sess"),
        end_key.alias("_end"),
    ).filter(F.col("_end").isNull() | (F.col("_end") > today_key)).drop("_end")

    races = (F.col("races") if "races" in staffs.columns
             else F.lit(None).cast("array<struct<raceDescriptor:string>>"))
    race = (
        F.when(F.size(races) > 1, F.lit("Multiracial"))
        .when(F.size(races) == 1,
              descriptor_code_value(races[0]["raceDescriptor"]))
        .otherwise(F.lit("Unknown"))
    )
    staff = staffs.select(
        F.col("staffUniqueId").alias("_staff_id"),
        _opt(staffs, "personalTitlePrefix"),
        F.col("firstName").alias("firstName"),
        _opt(staffs, "middleName"),
        F.col("lastSurname").alias("lastSurname"),
        _opt(staffs, "birthDate"),
        descriptor_code_value(_opt(staffs, "sexDescriptor")).alias("_sex"),
        _opt(staffs, "hispanicLatinoEthnicity", "boolean"),
        descriptor_code_value(
            _opt(staffs, "highestCompletedLevelOfEducationDescriptor")
        ).alias("_educ"),
        _opt(staffs, "yearsOfPriorProfessionalExperience", "double"),
        _opt(staffs, "yearsOfPriorTeachingExperience", "double"),
        _opt(staffs, "highlyQualifiedTeacher", "boolean"),
        _opt(staffs, "loginId"),
        race.alias("_race"),
        (F.explode_outer("electronicMails.electronicMailAddress")
         if "electronicMails" in staffs.columns
         else F.lit(None).cast("string")).alias("_email"),
    )

    joined = active.join(staff, active.UserKey == staff._staff_id, "inner")
    return CONTRACT.conform(
        joined.select(
            sk_concat_strict("UserKey", "SchoolKey", "_lcc", "_sy", "_sid",
                             "_sess").alias("StaffSectionKey"),
            "UserKey", "SchoolKey",
            sk_concat_strict("SchoolKey", "_lcc", "_sy", "_sid", "_sess")
            .alias("SectionKey"),
            F.col("personalTitlePrefix").alias("PersonalTitlePrefix"),
            F.col("firstName").alias("StaffFirstName"),
            F.col("middleName").alias("StaffMiddleName"),
            F.col("lastSurname").alias("StaffLastName"),
            null_to_empty("_email").alias("ElectronicMailAddress"),
            F.col("_sex").alias("Sex"),
            F.col("birthDate").alias("BirthDate"),
            F.col("_race").alias("Race"),
            F.coalesce(F.col("hispanicLatinoEthnicity").cast("int"), F.lit(0))
            .alias("HispanicLatinoEthnicity"),
            F.col("_educ").alias("HighestCompletedLevelOfEducation"),
            F.col("yearsOfPriorProfessionalExperience")
            .alias("YearsOfPriorProfessionalExperience"),
            F.col("yearsOfPriorTeachingExperience")
            .alias("YearsOfPriorTeachingExperience"),
            F.coalesce(F.col("highlyQualifiedTeacher").cast("int"), F.lit(0))
            .alias("HighlyQualifiedTeacher"),
            null_to_empty("loginId").alias("LoginId"),
        ),
        spark,
    )
