"""The default ODS endpoint catalog (SURVEY.md §2.1 EP1).

The reference drives its full extraction from a packaged catalog of 80
endpoint entries — `helper/endpoint/endpoint.json`, consumed by
`api/api.py:120-137` (`get_endpoint()` at `helper/helper.py:28-31`) —
each mapping an API route to the silver/gold table family it lands
into. This module is that catalog as package data: `land_all` and
`run_full_pipeline` default to it, so a full-extraction run needs zero
caller-supplied configuration (the reference's `api_async` behavior).

Catalog shape: (route, table_name). The route keeps its data-model
prefix ("ed-fi/..." or "tpdm/..." — the reference's `get_url`,
`helper/helper.py:52-55`, joins `API_URL/PREX_DATA_V/{endpoint}`);
`collection_name()` is the route's last segment, which is both the
silver landing directory and the name every AMT view reads back
(`sources/json_source.py::read_collection`), matching the reference's
`JSONFile(url.split("/")[-1])` naming (`api/api.py:126`).

The 23 `tpdm/` routes back the EPP collection; `default_endpoints`
can exclude them for ODS instances that don't advertise the TPDM
extension model (the reference gates those with `is_tpdm_supported`,
`api/api.py:80-83`).
"""

from __future__ import annotations

# (route, table_name) — 80 entries, 60 distinct table names, matching
# the reference's endpoint.json entry-for-entry.
ENDPOINT_CATALOG: tuple[tuple[str, str], ...] = (
    ("ed-fi/academicSubjectDescriptors", "base_edfi_descriptors"),
    ("ed-fi/addressTypeDescriptors", "base_edfi_descriptors"),
    ("tpdm/aidTypeDescriptors", "base_edfi_descriptors"),
    ("ed-fi/assessments", "base_edfi_assessments"),
    ("ed-fi/assessmentCategoryDescriptors", "base_edfi_descriptors"),
    ("ed-fi/assessmentReportingMethodDescriptors", "base_edfi_descriptors"),
    ("ed-fi/calendarDates", "base_edfi_calendar_dates"),
    ("ed-fi/calendars", "base_edfi_calendars"),
    ("ed-fi/cohorts", "base_edfi_cohorts"),
    ("ed-fi/cohortTypeDescriptors", "base_edfi_descriptors"),
    ("ed-fi/cohortYearTypeDescriptors", "base_edfi_descriptors"),
    ("ed-fi/courseOfferings", "base_edfi_course_offerings"),
    ("ed-fi/courses", "base_edfi_courses"),
    ("ed-fi/credentials", "base_edfi_credentials"),
    ("ed-fi/disabilityDescriptors", "base_edfi_descriptors"),
    ("ed-fi/disabilityDesignationDescriptors", "base_edfi_descriptors"),
    ("ed-fi/disciplineActions", "base_edfi_discipline_actions"),
    ("ed-fi/disciplineDescriptors", "base_edfi_discipline_descriptors"),
    ("ed-fi/disciplineIncidents", "base_edfi_discipline_incidents"),
    ("ed-fi/educationalEnvironmentDescriptors", "base_edfi_descriptors"),
    ("ed-fi/educationServiceCenters", "base_edfi_education_service_centers"),
    ("ed-fi/feederSchoolAssociations", "base_edfi_feeder_school_associations"),
    ("ed-fi/grades", "base_edfi_grades"),
    ("ed-fi/gradeLevelDescriptors", "base_edfi_grade_level_descriptor"),
    ("ed-fi/gradingPeriodDescriptors", "base_edfi_grading_period_descriptors"),
    ("ed-fi/gradingPeriods", "base_edfi_grading_periods"),
    ("ed-fi/languageDescriptors", "base_edfi_descriptors"),
    ("ed-fi/languageUseDescriptors", "base_edfi_descriptors"),
    ("ed-fi/localEducationAgencies", "base_edfi_local_education_agencies"),
    ("ed-fi/objectiveAssessments", "base_edfi_objective_assessments"),
    ("ed-fi/parents", "base_edfi_parents"),
    ("ed-fi/people", "base_edfi_people"),
    ("ed-fi/performanceLevelDescriptors", "base_edfi_descriptors"),
    ("ed-fi/programs", "base_edfi_programs"),
    ("ed-fi/programTypeDescriptors", "edfi_descriptors_programType"),
    ("ed-fi/raceDescriptors", "base_edfi_descriptors"),
    ("ed-fi/resultDatatypeTypeDescriptors", "base_edfi_descriptors"),
    ("ed-fi/schools", "base_edfi_schools"),
    ("ed-fi/schoolFoodServiceProgramServiceDescriptors",
     "edfi_descriptors_school_food_service_program_service"),
    ("ed-fi/schoolTypeDescriptors", "base_edfi_descriptors"),
    ("ed-fi/schoolYearTypes", "base_edfi_school_year_types"),
    ("ed-fi/sections", "base_edfi_sections"),
    ("ed-fi/sessions", "base_edfi_sessions"),
    ("ed-fi/sexDescriptors", "base_edfi_descriptors"),
    ("ed-fi/staffDisciplineIncidentAssociations",
     "base_edfi_staff_discipline_incident_associations"),
    ("ed-fi/staffEducationOrganizationAssignmentAssociations",
     "base_edfi_staff_education_organization_assignment_associations"),
    ("ed-fi/staffs", "base_edfi_staffs"),
    ("ed-fi/staffSchoolAssociations", "base_edfi_staff_school_associations"),
    ("ed-fi/staffSectionAssociations", "base_edfi_staff_section_associations"),
    ("ed-fi/stateAbbreviationDescriptors", "base_edfi_descriptors"),
    ("ed-fi/stateEducationAgencies", "base_edfi_state_education_agencies"),
    ("ed-fi/studentAssessments", "base_edfi_student_assessments"),
    ("ed-fi/studentCharacteristicDescriptors", "base_edfi_descriptors"),
    ("ed-fi/studentCohortAssociations",
     "base_edfi_student_cohort_associations"),
    ("ed-fi/studentDisciplineIncidentBehaviorAssociations",
     "base_edfi_student_discipline_behavior_associations"),
    ("ed-fi/studentEducationOrganizationAssociations",
     "base_edfi_student_education_organization_associations"),
    ("ed-fi/studentLanguageInstructionProgramAssociations",
     "base_edfi_student_language_instruction_program_associations"),
    ("ed-fi/studentParentAssociations",
     "base_edfi_student_parent_associations"),
    ("ed-fi/studentProgramAssociations",
     "base_edfi_student_program_associations"),
    ("ed-fi/students", "base_edfi_students"),
    ("ed-fi/studentSchoolAssociations",
     "base_edfi_student_school_associations"),
    ("ed-fi/studentSchoolAttendanceEvents",
     "base_edfi_student_school_attendance_events"),
    ("ed-fi/studentSchoolFoodServiceProgramAssociations",
     "base_edfi_student_school_food_service_program_associations"),
    ("ed-fi/studentSectionAssociations",
     "base_edfi_student_section_associations"),
    ("ed-fi/studentSectionAttendanceEvents",
     "base_edfi_student_section_attendance_events"),
    ("ed-fi/studentSpecialEducationProgramAssociations",
     "base_edfi_student_special_education_program_associations"),
    ("ed-fi/surveyQuestionResponses", "base_edfi_survey_question_responses"),
    ("ed-fi/surveyQuestions", "base_edfi_survey_questions"),
    ("ed-fi/surveyResponses", "base_edfi_survey_responses"),
    ("ed-fi/surveys", "base_edfi_surveys"),
    ("ed-fi/termDescriptors", "base_edfi_descriptors"),
    ("ed-fi/tribalAffiliationDescriptors", "base_edfi_descriptors"),
    ("tpdm/candidates", "base_tpdm_candidates"),
    ("tpdm/candidateEducatorPreparationProgramAssociations",
     "base_tpdm_candidate_educator_preparation_program_associations"),
    ("tpdm/evaluationElements", "base_tpdm_evaluation_elements"),
    ("tpdm/evaluationElementRatings", "base_tpdm_evaluation_element_ratings"),
    ("tpdm/evaluationObjectives", "base_tpdm_evaluation_objectives"),
    ("tpdm/evaluationRatings", "base_tpdm_evaluation_ratings"),
    ("tpdm/financialAids", "base_tpdm_financial_aids"),
    ("tpdm/surveyResponsePersonTargetAssociations",
     "base_tpdm_survey_response_person_target_associations"),
)


def default_catalog() -> list[dict[str, str]]:
    """The catalog as records: {endpoint, table_name, collection} — one
    per entry, reference order preserved."""
    return [
        {"endpoint": route, "table_name": table,
         "collection": collection_name(route)}
        for route, table in ENDPOINT_CATALOG
    ]


def default_endpoints(include_tpdm: bool = True) -> list[str]:
    """The 80 routes `land_all` pages by default (57 `ed-fi/` only when
    the ODS doesn't advertise the TPDM extension)."""
    return [route for route, _ in ENDPOINT_CATALOG
            if include_tpdm or not route.startswith("tpdm/")]


def collection_name(route: str) -> str:
    """Landing directory / silver collection name: the route's last
    path segment (ref `api/api.py:126` — `url.split("/")[-1]`)."""
    return route.rstrip("/").rsplit("/", 1)[-1]


def table_name(route: str) -> str | None:
    """The reference's gold table family for a route, or None for
    routes outside the catalog."""
    want = collection_name(route)
    for r, table in ENDPOINT_CATALOG:
        if r == route or collection_name(r) == want:
            return table
    return None
