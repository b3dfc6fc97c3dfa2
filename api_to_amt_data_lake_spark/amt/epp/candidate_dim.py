"""candidate_dim — educator-preparation candidates with program, cohort,
demographics, and earliest credential issuance.

Parity target: `parquet/amt/epp/candidate_dim/main.py`. Chain
(`main.py:233-303`): candidates ⋈ candidateEducatorPreparationProgram-
Associations (inner on candidateIdentifier) ⟕ cohortYears explode (on
candidate+program) ⟕ candidate races explode ⟕ (students ⋈ people)
on personId ⟕ credentials filtered to rows carrying the TPDM person
extension (`main.py:183-187`) ⟕ race/sex descriptor tables on
`namespace#codeValue` (`main.py:285-303`). Flags: EconomicDisadvantaged /
HispanicLatinoEthnicity as 0/1 with missing→0 (`main.py:332-335`),
ProgramComplete = reasonExited code == 'Completed' (F14, `main.py:336`).

The closing `groupby(RESULT_COLUMNS)['IssuanceDate'].min()`
(`main.py:362-365`) is the A3 dedup-with-min idiom — the min issuance
date itself is NOT a contract column, so the groupBy is exactly a
dropDuplicates over the output grain; we keep the agg for parity with
the reference's grouping semantics then project the contract.

Type note: pandas `astype(str)` artifacts ('nan' for missed joins,
'2023.0' for float-widened years) are normalized to ''/clean integers —
the string dialect the reference itself intends via its `fillna('')`.

Scale: candidates/descriptors/people are dim-sized (broadcast); the only
data-scale shuffle is the final dedup on the output grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_to_amt_data_lake_spark.functions.descriptors import (
    descriptor_code_value,
)
from api_to_amt_data_lake_spark.functions.nulls import null_to_empty
from api_to_amt_data_lake_spark.plans.contracts import ViewContract
from api_to_amt_data_lake_spark.sources.json_source import (
    array_col,
    col_or_null,
    read_collection,
)

CONTRACT = ViewContract(
    name="epp_CandidateDim",
    columns=("CandidateKey", "FirstName", "LastSurname", "SexDescriptorKey",
             "SexDescriptor", "RaceDescriptorKey", "RaceDescriptor",
             "HispanicLatinoEthnicity", "EconomicDisadvantaged", "Cohort",
             "ProgramComplete", "StudentKey", "ProgramName", "BeginDate",
             "EducationOrganizationId", "PersonId",
             "CohortYearTermDescription", "EducationOrganizationKey"),
    types={"HispanicLatinoEthnicity": "int", "EconomicDisadvantaged": "int",
           "ProgramComplete": "int"},
)


def build(spark: SparkSession, silver_root: str, school_year: str | int,
          run_date: str | None = None) -> DataFrame:
    candidates = read_collection(spark, silver_root, school_year, "candidates")
    cepp = read_collection(
        spark, silver_root, school_year,
        "candidateEducatorPreparationProgramAssociations")
    if candidates is None or cepp is None:
        return CONTRACT.empty(spark)
    students = read_collection(spark, silver_root, school_year, "students")
    people = read_collection(spark, silver_root, school_year, "people")
    credentials = read_collection(spark, silver_root, school_year,
                                  "credentials")
    races = read_collection(spark, silver_root, school_year,
                            "raceDescriptors")
    sexes = read_collection(spark, silver_root, school_year, "sexDescriptors")

    cand = candidates.select(
        F.col("candidateIdentifier").cast("string").alias("CandidateKey"),
        F.col("firstName").alias("FirstName"),
        F.col("lastSurname").alias("LastSurname"),
        col_or_null(candidates, "sexDescriptor").alias("_sex_uri"),
        col_or_null(candidates, "hispanicLatinoEthnicity", "boolean")
        .alias("_hispanic"),
        col_or_null(candidates, "economicDisadvantaged", "boolean")
        .alias("_econ"),
        F.col("personReference.personId").cast("string").alias("PersonId"),
    )
    cand_races = candidates.select(
        F.col("candidateIdentifier").cast("string").alias("CandidateKey"),
        F.explode(array_col(candidates, "races",
                            "struct<raceDescriptor:string>"))
        .alias("_race"),
    ).select("CandidateKey", F.col("_race.raceDescriptor").alias("_race_uri"))

    programs = cepp.select(
        F.col("candidateReference.candidateIdentifier").cast("string")
        .alias("CandidateKey"),
        F.col("educatorPreparationProgramReference.programName")
        .alias("ProgramName"),
        F.col("educatorPreparationProgramReference.educationOrganizationId")
        .cast("string").alias("EducationOrganizationId"),
        col_or_null(cepp, "beginDate").alias("BeginDate"),
        descriptor_code_value(
            F.coalesce(col_or_null(cepp, "reasonExitedDescriptor"),
                       F.lit(""))).alias("_exit_code"),
    )
    cohorts = cepp.select(
        F.col("candidateReference.candidateIdentifier").cast("string")
        .alias("CandidateKey"),
        F.col("educatorPreparationProgramReference.programName")
        .alias("ProgramName"),
        F.explode(array_col(
            cepp, "cohortYears",
            "struct<termDescriptor:string,"
            "schoolYearTypeReference:struct<schoolYear:bigint>>"))
        .alias("_cy"),
    ).select(
        "CandidateKey", "ProgramName",
        F.col("_cy.schoolYearTypeReference.schoolYear").cast("string")
        .alias("Cohort"),
        descriptor_code_value(F.col("_cy.termDescriptor"))
        .alias("CohortYearTermDescription"),
    )

    result = (
        cand.join(programs, "CandidateKey", "inner")
        .join(cohorts, ["CandidateKey", "ProgramName"], "left")
        .join(cand_races, "CandidateKey", "left")
    )

    if students is not None and people is not None:
        student_person = students.select(
            F.col("studentUniqueId").cast("string").alias("StudentKey"),
            F.col("personReference.personId").cast("string").alias("PersonId"),
        ).join(
            F.broadcast(people.select(
                F.col("personId").cast("string").alias("PersonId"))),
            "PersonId", "inner",
        )
        result = result.join(student_person, "PersonId", "left")
    else:
        result = result.withColumn("StudentKey", F.lit(None).cast("string"))

    if credentials is not None:
        creds = credentials.select(
            col_or_null(credentials, "_ext.tpdm.personReference.personId")
            .alias("PersonId"),
            col_or_null(credentials, "issuanceDate").alias("_issuance"),
        ).filter(F.col("PersonId").isNotNull() & (F.col("PersonId") != ""))
        result = result.join(creds, "PersonId", "left")
    else:
        result = result.withColumn("_issuance", F.lit(None).cast("string"))

    if races is not None:
        race_map = F.broadcast(races.select(
            F.concat_ws("#", "namespace", "codeValue").alias("_race_uri"),
            F.col("raceDescriptorId").cast("string").alias("RaceDescriptorKey"),
            F.col("codeValue").alias("RaceDescriptor"),
        ))
        result = result.join(race_map, "_race_uri", "left")
    else:
        result = result.withColumn("RaceDescriptorKey",
                                   F.lit(None).cast("string")) \
                       .withColumn("RaceDescriptor", F.lit(None).cast("string"))

    if sexes is not None:
        sex_map = F.broadcast(sexes.select(
            F.concat_ws("#", "namespace", "codeValue").alias("_sex_uri"),
            F.col("sexDescriptorId").cast("string").alias("SexDescriptorKey"),
            F.col("codeValue").alias("SexDescriptor"),
        ))
        result = result.join(sex_map, "_sex_uri", "left")
    else:
        result = result.withColumn("SexDescriptorKey",
                                   F.lit(None).cast("string")) \
                       .withColumn("SexDescriptor", F.lit(None).cast("string"))

    projected = result.select(
        "CandidateKey",
        null_to_empty("FirstName").alias("FirstName"),
        null_to_empty("LastSurname").alias("LastSurname"),
        null_to_empty("SexDescriptorKey").alias("SexDescriptorKey"),
        null_to_empty("SexDescriptor").alias("SexDescriptor"),
        null_to_empty("RaceDescriptorKey").alias("RaceDescriptorKey"),
        null_to_empty("RaceDescriptor").alias("RaceDescriptor"),
        F.coalesce(F.col("_hispanic").cast("int"), F.lit(0))
        .alias("HispanicLatinoEthnicity"),
        F.coalesce(F.col("_econ").cast("int"), F.lit(0))
        .alias("EconomicDisadvantaged"),
        null_to_empty("Cohort").alias("Cohort"),
        F.when(F.col("_exit_code") == "Completed", 1).otherwise(0)
        .alias("ProgramComplete"),
        null_to_empty("StudentKey").alias("StudentKey"),
        null_to_empty("ProgramName").alias("ProgramName"),
        null_to_empty("BeginDate").alias("BeginDate"),
        null_to_empty("EducationOrganizationId")
        .alias("EducationOrganizationId"),
        null_to_empty("PersonId").alias("PersonId"),
        null_to_empty("CohortYearTermDescription")
        .alias("CohortYearTermDescription"),
        null_to_empty("EducationOrganizationId")
        .alias("EducationOrganizationKey"),
        F.col("_issuance"),
    )
    # A3: groupby-all-output-columns + min(IssuanceDate) == dedup on the
    # contract grain (`main.py:362-365`); the min column is dropped by the
    # contract projection, matching RESULT_COLUMNS.
    deduped = projected.groupBy(*CONTRACT.columns).agg(
        F.min("_issuance").alias("_min_issuance"))
    return CONTRACT.conform(deduped, spark)
