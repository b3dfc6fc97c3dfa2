"""View-level golden tests on Ed-Fi-shaped silver fixtures (FIXTURES.md,
SURVEY.md §5 strategy item 2) — including the empty-input contract path."""

from __future__ import annotations

import json

import pytest

from api_to_amt_data_lake_spark.amt.base import (
    date_dim,
    grading_period_dim,
    local_education_agency_dim,
    school_dim,
)

SY = 2023


@pytest.fixture(scope="module")
def silver(tmp_path_factory):
    root = tmp_path_factory.mktemp("silver")

    def dump(endpoint: str, docs: list[dict]) -> None:
        d = root / str(SY) / endpoint
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{endpoint}_1.json").write_text(json.dumps(docs))

    dump("calendarDates", [
        {"id": "cd1", "date": "2023-08-15",
         "calendarReference": {"schoolYear": 2023, "schoolId": 100},
         "calendarEvents": [
             {"calendarEventDescriptor":
              "uri://ed-fi.org/CalendarEventDescriptor#Instructional day"}]},
        {"id": "cd2", "date": "2023-08-15",   # duplicate date → dedup
         "calendarReference": {"schoolYear": 2023, "schoolId": 101},
         "calendarEvents": []},
        {"id": "cd3", "date": "2024-01-02",
         "calendarReference": {"schoolYear": 2023, "schoolId": 100},
         "calendarEvents": []},
    ])
    dump("gradingPeriods", [
        {"gradingPeriodDescriptor":
            "uri://ed-fi.org/GradingPeriodDescriptor#First Six Weeks",
         "schoolReference": {"schoolId": 100},
         "schoolYearTypeReference": {"schoolYear": 2023},
         "beginDate": "2023-08-15", "endDate": "2023-09-30",
         "totalInstructionalDays": 29, "periodSequence": 1},
        {"gradingPeriodDescriptor":
            "uri://ed-fi.org/GradingPeriodDescriptor#Unknown Period",
         "schoolReference": {"schoolId": 100},
         "schoolYearTypeReference": {"schoolYear": 2023},
         "beginDate": "2023-10-01", "endDate": "2023-11-15",
         "totalInstructionalDays": 30, "periodSequence": 2},
    ])
    dump("gradingPeriodDescriptors", [
        {"gradingPeriodDescriptorId": 7, "codeValue": "First Six Weeks",
         "description": "First Six Weeks"},
    ])
    dump("schools", [
        {"id": "s1", "schoolId": 100, "nameOfInstitution": "Alpha High",
         "schoolTypeDescriptor": "uri://ed-fi.org/SchoolTypeDescriptor#Regular",
         "localEducationAgencyReference": {
             "localEducationAgencyId": 5,
             "link": {"href": "/ed-fi/localEducationAgencies/lea-5"}},
         "addresses": [
             {"addressTypeDescriptor":
                 "uri://ed-fi.org/AddressTypeDescriptor#Physical",
              "stateAbbreviationDescriptor":
                 "uri://ed-fi.org/StateAbbreviationDescriptor#TX",
              "streetNumberName": "1 Main St", "city": "Austin",
              "nameOfCounty": "Travis"},
             {"addressTypeDescriptor":
                 "uri://ed-fi.org/AddressTypeDescriptor#Mailing",
              "stateAbbreviationDescriptor":
                 "uri://ed-fi.org/StateAbbreviationDescriptor#TX",
              "streetNumberName": "PO Box 9", "city": "Austin",
              "nameOfCounty": "Travis"}]},
    ])
    dump("localEducationAgencies", [
        {"id": "lea-5", "localEducationAgencyId": 5,
         "nameOfInstitution": "Alpha ISD",
         "localEducationAgencyCategoryDescriptor":
             "uri://ed-fi.org/LocalEducationAgencyCategoryDescriptor#Independent",
         "educationServiceCenterReference": {
             "educationServiceCenterId": 9,
             "link": {"href": "/ed-fi/educationServiceCenters/esc-9"}},
         "stateEducationAgencyReference": {
             "stateEducationAgencyId": 1,
             "link": {"href": "/ed-fi/stateEducationAgencies/sea-1"}}},
    ])
    dump("educationServiceCenters", [
        {"id": "esc-9", "educationServiceCenterId": 9,
         "nameOfInstitution": "Region 9"},
    ])
    dump("stateEducationAgencies", [
        {"id": "sea-1", "stateEducationAgencyId": 1,
         "nameOfInstitution": "Texas Education Agency"},
    ])
    return str(root)


def test_date_dim_golden(spark, silver):
    rows = {r["DateKey"]: r for r in date_dim.build(spark, silver, SY).collect()}
    assert set(rows) == {"20230815", "20240102"}  # dedup across calendars
    r = rows["20230815"]
    assert (r["Day"], r["Month"], r["Year"]) == ("15", "08", "2023")
    assert r["MonthName"] == "August"
    assert r["CalendarQuarter"] == "3" and r["CalendarQuarterName"] == "Third"
    assert r["SchoolYear"] == "2023"
    assert rows["20240102"]["CalendarQuarterName"] == "First"


def test_date_dim_empty_contract(spark, tmp_path):
    df = date_dim.build(spark, str(tmp_path), SY)
    assert df.count() == 0
    assert list(df.columns) == list(date_dim.CONTRACT.columns)


def test_grading_period_dim_golden(spark, silver):
    rows = grading_period_dim.build(spark, silver, SY).collect()
    # Inner join with descriptors drops the unmatched 'Unknown Period'.
    assert len(rows) == 1
    r = rows[0]
    assert r["GradingPeriodKey"] == "7-100-20230815"
    assert r["GradingPeriodBeginDateKey"] == "20230815"
    assert r["GradingPeriodEndDateKey"] == "20230930"
    assert r["GradingPeriodDescription"] == "First Six Weeks"
    assert r["TotalInstructionalDays"] == 29 and r["PeriodSequence"] == 1
    assert r["SchoolKey"] == "100" and r["SchoolYear"] == "2023"


def test_school_dim_golden(spark, silver):
    rows = school_dim.build(spark, silver, SY).collect()
    assert len(rows) == 1  # physical address only — mailing row filtered
    r = rows[0]
    assert r["SchoolKey"] == "100" and r["SchoolName"] == "Alpha High"
    assert r["SchoolType"] == "Regular"
    assert r["SchoolAddress"] == "1 Main St, Austin TX Travis"
    assert r["SchoolState"] == "TX" and r["SchoolCounty"] == "Travis"
    assert r["LocalEducationAgencyName"] == "Alpha ISD"
    assert r["LocalEducationAgencyKey"] == "5"
    assert r["EducationServiceCenterName"] == "Region 9"
    assert r["StateEducationAgencyName"] == "Texas Education Agency"


def test_local_education_agency_dim_golden(spark, silver):
    rows = local_education_agency_dim.build(spark, silver, SY).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["LocalEducationAgencyKey"] == "5"
    assert r["LocalEducationAgencyName"] == "Alpha ISD"
    assert r["LocalEducationAgencyType"] == "Independent"
    assert r["LocalEducationAgencyStateEducationAgencyName"] == \
        "Texas Education Agency"
    assert r["LocalEducationAgencyStateEducationAgencyKey"] == "1"
    assert r["LocalEducationAgencyServiceCenterName"] == "Region 9"
    assert r["LocalEducationAgencyServiceCenterKey"] == "9"
    assert r["LocalEducationAgencyParentLocalEducationAgencyKey"] == ""
    assert r["LocalEducationAgencyCharterStatus"] == ""
