"""Shared Ed-Fi-shaped silver fixture documents (FIXTURES.md).

One dict: endpoint collection name -> list of API documents, exactly the
documents `tests/test_amt_views.py`'s golden tests are pinned against.
Shared so the EP1 end-to-end test can serve the SAME documents from a
fake ODS, land them through `sources.rest.land_all` with the default
80-endpoint catalog, and build all 41 gold views from the landed silver.
"""

from __future__ import annotations

SILVER_DOCS: dict[str, list[dict]] = {}


def dump(endpoint: str, docs: list[dict]) -> None:
    SILVER_DOCS.setdefault(endpoint, []).extend(docs)


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
     "calendarEvents": [
         {"calendarEventDescriptor":
          "uri://ed-fi.org/CalendarEventDescriptor#Instructional day"}]},
])
dump("gradingPeriods", [
    {"id": "gp1",
     "gradingPeriodDescriptor":
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
    {"id": "s9", "schoolId": 900, "nameOfInstitution": "Alpha College of Ed",
     "schoolTypeDescriptor": "uri://ed-fi.org/SchoolTypeDescriptor#Regular",
     "localEducationAgencyReference": {
         "localEducationAgencyId": 5,
         "link": {"href": "/ed-fi/localEducationAgencies/lea-5"}},
     "educationOrganizationCategories": [
         {"educationOrganizationCategoryDescriptor":
              "uri://ed-fi.org/EducationOrganizationCategoryDescriptor"
              "#Educator Preparation Provider"}],
     "addresses": []},
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
dump("sections", [
    {"id": "sec1", "sectionIdentifier": "S-01", "sectionName": "Alg I-1",
     "educationalEnvironmentDescriptor":
         "uri://ed-fi.org/EducationalEnvironmentDescriptor#Classroom",
     "courseOfferingReference": {
         "localCourseCode": "ALG1", "schoolId": 100, "schoolYear": 2023,
         "sessionName": "Fall", "link": {"href": "/ed-fi/courseOfferings/co1"}},
     "classPeriods": [
         {"classPeriodReference": {"classPeriodName": "P1", "schoolId": 100}},
         {"classPeriodReference": {"classPeriodName": "P2", "schoolId": 100}}]},
    {"id": "sec2", "sectionIdentifier": "S-02", "sectionName": "Alg I-2",
     "courseOfferingReference": {
         "localCourseCode": "ALG1", "schoolId": 100, "schoolYear": 2023,
         "sessionName": "Fall", "link": {"href": "/ed-fi/courseOfferings/co1"}},
     "classPeriods": []},
])
dump("courseOfferings", [
    {"id": "co1", "localCourseCode": "ALG1",
     "schoolReference": {"schoolId": 100,
                         "link": {"href": "/ed-fi/schools/s1"}},
     "sessionReference": {"schoolYear": 2023, "sessionName": "Fall",
                          "link": {"href": "/ed-fi/sessions/ses1"}},
     "courseReference": {"courseCode": "ALG-1",
                         "link": {"href": "/ed-fi/courses/c1"}}},
])
dump("courses", [
    {"id": "c1", "courseCode": "ALG-1", "courseTitle": "Algebra I",
     "academicSubjectDescriptor":
         "uri://ed-fi.org/AcademicSubjectDescriptor#Mathematics",
     "educationOrganizationReference": {"educationOrganizationId": 5}},
])
dump("sessions", [
    {"id": "ses1", "sessionName": "Fall", "beginDate": "2023-08-15",
     "endDate": "2023-12-20",
     "termDescriptor": "uri://ed-fi.org/TermDescriptor#Fall Semester",
     "gradingPeriods": [
         {"gradingPeriodReference": {
             "schoolId": 100, "schoolYear": 2023,
             "gradingPeriodDescriptor":
                 "uri://ed-fi.org/GradingPeriodDescriptor#First Six Weeks",
             "periodSequence": 1,
             "link": {"href": "/ed-fi/gradingPeriods/gp1"}}}]},
])
dump("academicSubjectDescriptors", [
    {"academicSubjectDescriptorId": 3, "codeValue": "Mathematics",
     "description": "Math",
     "namespace": "uri://ed-fi.org/AcademicSubjectDescriptor"},
])
dump("termDescriptors", [
    {"termDescriptorId": 4, "codeValue": "Fall Semester",
     "description": "Fall",
     "namespace": "uri://ed-fi.org/TermDescriptor"},
])
dump("educationalEnvironmentDescriptors", [
    {"educationalEnvironmentDescriptorId": 5, "codeValue": "Classroom",
     "description": "In person",
     "namespace": "uri://ed-fi.org/EducationalEnvironmentDescriptor"},
])
dump("students", [
    {"id": "stu1", "studentUniqueId": "STU1", "firstName": "Maria",
     "middleName": "J", "lastSurname": "Garcia", "birthDate": "2009-05-01",
     "personReference": {"personId": "PER1",
                         "link": {"href": "/ed-fi/people/per1"}}},
    {"id": "stu2", "studentUniqueId": "STU2", "firstName": "Liu",
     "middleName": None, "lastSurname": "Wei", "birthDate": "2009-07-04"},
])
dump("studentEducationOrganizationAssociations", [
    # school-level association for STU1 (edOrg id == schoolId 100)
    {"id": "eo1",
     "educationOrganizationReference": {
         "educationOrganizationId": 100,
         "link": {"rel": "School", "href": "/ed-fi/schools/s1"}},
     "studentReference": {"studentUniqueId": "STU1",
                          "link": {"href": "/ed-fi/students/stu1"}},
     "hispanicLatinoEthnicity": True,
     "sexDescriptor": "uri://ed-fi.org/SexDescriptor#Female",
     "races": [
         {"raceDescriptor": "uri://ed-fi.org/RaceDescriptor#White"}],
     "languages": [
         {"languageDescriptor": "uri://ed-fi.org/LanguageDescriptor#Spanish",
          "uses": [{"languageUseDescriptor":
                    "uri://ed-fi.org/LanguageUseDescriptor#Home language"}]}],
     "cohortYears": [
         {"cohortYearTypeDescriptor":
              "uri://ed-fi.org/CohortYearTypeDescriptor#Ninth grade",
          "schoolYearTypeReference": {"schoolYear": 2023}}],
     "studentCharacteristics": [
         {"studentCharacteristicDescriptor":
              "uri://ed-fi.org/StudentCharacteristicDescriptor"
              "#Economic Disadvantaged"}],
     "studentIndicators": [
         {"indicatorName": "Internet Access In Residence",
          "indicator": "Yes", "indicatorGroup": "Connectivity"}]},
    # district-level association for STU1 (edOrg id == LEA id 5)
    {"id": "eo2",
     "educationOrganizationReference": {
         "educationOrganizationId": 5,
         "link": {"rel": "LocalEducationAgency",
                  "href": "/ed-fi/localEducationAgencies/lea-5"}},
     "studentReference": {"studentUniqueId": "STU1",
                          "link": {"href": "/ed-fi/students/stu1"}},
     "hispanicLatinoEthnicity": True,
     "sexDescriptor": "uri://ed-fi.org/SexDescriptor#Female",
     "races": [
         {"raceDescriptor": "uri://ed-fi.org/RaceDescriptor#White"}],
     "disabilities": [
         {"disabilityDescriptor":
              "uri://ed-fi.org/DisabilityDescriptor#Dyslexia",
          "designations": [
              {"disabilityDesignationDescriptor":
                   "uri://ed-fi.org/DisabilityDesignationDescriptor"
                   "#Section 504"}]}],
     "studentIndicators": [
         {"indicatorName": "Internet Performance In Residence",
          "indicator": "Good", "indicatorGroup": "Connectivity"}]},
])
dump("staffs", [
    {"id": "st1", "staffUniqueId": "T100", "firstName": "Ada",
     "lastSurname": "Lovelace", "birthDate": "1980-01-01",
     "sexDescriptor": "uri://ed-fi.org/SexDescriptor#Female",
     "hispanicLatinoEthnicity": False, "highlyQualifiedTeacher": True,
     "loginId": "ada",
     "electronicMails": [
         {"electronicMailAddress": "ada@example.edu",
          "electronicMailTypeDescriptor":
              "uri://ed-fi.org/ElectronicMailTypeDescriptor#Work"}],
     "races": [
         {"raceDescriptor": "uri://ed-fi.org/RaceDescriptor#White"},
         {"raceDescriptor": "uri://ed-fi.org/RaceDescriptor#Asian"}]},
    {"id": "st2", "staffUniqueId": "T200", "firstName": "Alan",
     "lastSurname": "Turing",
     "races": [
         {"raceDescriptor": "uri://ed-fi.org/RaceDescriptor#White"}]},
])
dump("staffSectionAssociations", [
    {"staffReference": {"staffUniqueId": "T100",
                        "link": {"href": "/ed-fi/staffs/st1"}},
     "sectionReference": {"schoolId": 100, "localCourseCode": "ALG1",
                          "schoolYear": 2023, "sectionIdentifier": "S-01",
                          "sessionName": "Fall",
                          "link": {"href": "/ed-fi/sections/sec1"}},
     "beginDate": "2023-08-15", "endDate": "2199-12-31"},
    {"staffReference": {"staffUniqueId": "T200",
                        "link": {"href": "/ed-fi/staffs/st2"}},
     "sectionReference": {"schoolId": 100, "localCourseCode": "ALG1",
                          "schoolYear": 2023, "sectionIdentifier": "S-01",
                          "sessionName": "Fall",
                          "link": {"href": "/ed-fi/sections/sec1"}},
     "beginDate": "2023-08-15", "endDate": "2023-08-20"},  # expired
])
dump("studentSectionAssociations", [
    {"id": "ssa1", "homeroomIndicator": True,
     "studentReference": {"studentUniqueId": "STU1",
                          "link": {"href": "/ed-fi/students/stu1"}},
     "sectionReference": {"schoolId": 100, "localCourseCode": "ALG1",
                          "schoolYear": 2023, "sectionIdentifier": "S-01",
                          "sessionName": "Fall",
                          "link": {"href": "/ed-fi/sections/sec1"}},
     "beginDate": "2023-08-15", "endDate": "2023-12-20"},
])
dump("studentSchoolAssociations", [
    {"id": "ssch1", "entryDate": "2023-08-15",
     "entryGradeLevelDescriptor":
         "uri://ed-fi.org/GradeLevelDescriptor#Ninth grade",
     "exitWithdrawDate": None,
     "schoolReference": {"schoolId": 100,
                         "link": {"href": "/ed-fi/schools/s1"}},
     "studentReference": {"studentUniqueId": "STU1",
                          "link": {"href": "/ed-fi/students/stu1"}},
     "schoolYearTypeReference": {"schoolYear": 2023},
     "calendarReference": {"calendarCode": "C1"}},
    {"id": "ssch2", "entryDate": "2023-08-15",
     "exitWithdrawDate": "2023-08-20",   # exits before the January day
     "schoolReference": {"schoolId": 100,
                         "link": {"href": "/ed-fi/schools/s1"}},
     "studentReference": {"studentUniqueId": "STU2",
                          "link": {"href": "/ed-fi/students/stu2"}},
     "schoolYearTypeReference": {"schoolYear": 2023},
     "calendarReference": {"calendarCode": "C1"}},
])
dump("people", [
    {"id": "per1", "personId": "PER1"},
])
dump("candidates", [
    {"id": "cand1", "candidateIdentifier": "C1", "firstName": "Maria",
     "lastSurname": "Garcia",
     "sexDescriptor": "uri://ed-fi.org/SexDescriptor#Female",
     "hispanicLatinoEthnicity": True, "economicDisadvantaged": True,
     "personReference": {"personId": "PER1",
                         "link": {"href": "/ed-fi/people/per1"}},
     "races": [
         {"raceDescriptor": "uri://ed-fi.org/RaceDescriptor#White"}]},
])
dump("candidateEducatorPreparationProgramAssociations", [
    {"id": "cepp1",
     "candidateReference": {"candidateIdentifier": "C1"},
     "educatorPreparationProgramReference": {
         "programName": "Sec Math", "educationOrganizationId": 900},
     "beginDate": "2022-08-01",
     "reasonExitedDescriptor":
         "uri://ed-fi.org/ReasonExitedDescriptor#Completed",
     "cohortYears": [
         {"termDescriptor": "uri://ed-fi.org/TermDescriptor#Fall Semester",
          "schoolYearTypeReference": {"schoolYear": 2023}}]},
])
dump("credentials", [
    {"id": "cred1", "credentialIdentifier": "CR1",
     "issuanceDate": "2023-05-01",
     "_ext": {"tpdm": {"personReference": {
         "personId": "PER1", "link": {"href": "/ed-fi/people/per1"}}}}},
    {"id": "cred2", "credentialIdentifier": "CR2",
     "issuanceDate": "2022-12-15",
     "_ext": {"tpdm": {"personReference": {
         "personId": "PER1", "link": {"href": "/ed-fi/people/per1"}}}}},
    {"id": "cred3", "credentialIdentifier": "CR3",
     "issuanceDate": "2023-04-01"},  # no person ext → filtered out
])
dump("financialAids", [
    {"id": "fa1",
     "studentReference": {"studentUniqueId": "STU1",
                          "link": {"href": "/ed-fi/students/stu1"}},
     "beginDate": "2023-01-10", "aidConditionDescription": "Need-based",
     "aidTypeDescriptor": "uri://ed-fi.org/AidTypeDescriptor#Grant",
     "aidAmount": 1500.0, "pellGrantRecipient": True},
])
dump("aidTypeDescriptors", [
    {"aidTypeDescriptorId": 61, "codeValue": "Grant",
     "description": "Grant", "namespace": "uri://ed-fi.org/AidTypeDescriptor"},
])
dump("evaluationElementRatings", [
    {"id": "eer1",
     "evaluationObjectiveRatingReference": {
         "personId": "PER1", "evaluationDate": "2023-04-15T00:00:00Z",
         "evaluationObjectiveTitle": "Instruction"},
     "evaluationElementReference": {
         "performanceEvaluationTitle": "Clinical Eval",
         "evaluationElementTitle": "Lesson Planning",
         "termDescriptor": "uri://ed-fi.org/TermDescriptor#Fall Semester",
         "schoolYear": 2023, "evaluationTitle": "Midterm"},
     "results": [{"ratingResultTitle": "Pedagogy", "rating": 3.5}]},
])
dump("evaluationObjectives", [
    {"id": "evobj1", "evaluationObjectiveTitle": "Instruction"},
])
dump("surveys", [
    {"id": "svy1", "surveyIdentifier": "SV1", "surveyTitle": "Exit Survey"},
])
dump("surveyQuestions", [
    {"id": "sq1", "questionCode": "Q1",
     "questionText": "How prepared are you?",
     "surveyReference": {"surveyIdentifier": "SV1",
                         "link": {"href": "/ed-fi/surveys/svy1"}},
     "surveySectionReference": {"surveyIdentifier": "SV1",
                                "surveySectionTitle": "Preparation"}},
])
dump("surveyResponses", [
    {"id": "sr1", "surveyResponseIdentifier": "R1",
     "responseDate": "2023-05-20",
     "surveyReference": {"surveyIdentifier": "SV1",
                         "link": {"href": "/ed-fi/surveys/svy1"}}},
])
dump("surveyQuestionResponses", [
    {"id": "sqr1",
     "surveyQuestionReference": {
         "questionCode": "Q1", "surveyIdentifier": "SV1",
         "link": {"href": "/ed-fi/surveyQuestions/sq1"}},
     "surveyResponseReference": {
         "surveyResponseIdentifier": "R1",
         "link": {"href": "/ed-fi/surveyResponses/sr1"}},
     "surveyQuestionMatrixElementResponses": [
         {"numericResponse": 4, "textResponse": "Well prepared"}]},
])
dump("surveyResponsePersonTargetAssociations", [
    {"surveyResponseReference": {
        "surveyResponseIdentifier": "R1",
        "link": {"href": "/ed-fi/surveyResponses/sr1"}},
     "personReference": {"personId": "PER1",
                         "link": {"href": "/ed-fi/people/per1"}}},
])
dump("assessments", [
    {"id": "asm1", "assessmentIdentifier": "ACT-MATH",
     "namespace": "uri://act.org",
     "assessmentCategoryDescriptor":
         "uri://ed-fi.org/AssessmentCategoryDescriptor"
         "#College entrance exam",
     "assessmentTitle": "ACT Math", "assessmentVersion": 2023,
     "assessedGradeLevels": [
         {"gradeLevelDescriptor":
              "uri://ed-fi.org/GradeLevelDescriptor#Ninth grade"}],
     "scores": [
         {"assessmentReportingMethodDescriptor":
              "uri://ed-fi.org/AssessmentReportingMethodDescriptor"
              "#Scale score",
          "maximumScore": 36, "minimumScore": 1,
          "resultDatatypeTypeDescriptor":
              "uri://ed-fi.org/ResultDatatypeTypeDescriptor#Integer"}],
     "academicSubjects": [
         {"academicSubjectDescriptor":
              "uri://ed-fi.org/AcademicSubjectDescriptor#Mathematics"}]},
])
dump("objectiveAssessments", [
    {"id": "oa1",
     "assessmentReference": {"assessmentIdentifier": "ACT-MATH",
                             "namespace": "uri://act.org"},
     "identificationCode": "ALG", "description": "Algebra strand",
     "percentOfAssessment": 50,
     "scores": [
         {"assessmentReportingMethodDescriptor":
              "uri://ed-fi.org/AssessmentReportingMethodDescriptor"
              "#Raw score",
          "maximumScore": 18, "minimumScore": 0,
          "resultDatatypeTypeDescriptor":
              "uri://ed-fi.org/ResultDatatypeTypeDescriptor#Integer"}],
     "learningStandards": [
         {"learningStandardReference": {
             "learningStandardId": "LS-ALG-1",
             "link": {"href": "/ed-fi/learningStandards/ls1"}}}]},
])
dump("assessmentCategoryDescriptors", [
    {"assessmentCategoryDescriptorId": 81,
     "codeValue": "College entrance exam",
     "description": "College Entrance Exam"},
])
dump("assessmentReportingMethodDescriptors", [
    {"assessmentReportingMethodDescriptorId": 91,
     "codeValue": "Scale score", "description": "Scale Score"},
    {"assessmentReportingMethodDescriptorId": 92,
     "codeValue": "Raw score", "description": "Raw Score"},
])
dump("resultDatatypeTypeDescriptors", [
    {"resultDatatypeTypeDescriptorId": 95, "codeValue": "Integer",
     "description": "Integer"},
])
dump("performanceLevelDescriptors", [
    {"performanceLevelDescriptorId": 97, "codeValue": "Proficient",
     "description": "Proficient"},
    {"performanceLevelDescriptorId": 98, "codeValue": "Basic",
     "description": "Basic"},
])
dump("studentAssessments", [
    {"id": "sa1", "studentAssessmentIdentifier": "SA-1",
     "assessmentReference": {"assessmentIdentifier": "ACT-MATH",
                             "namespace": "uri://act.org"},
     "studentReference": {"studentUniqueId": "STU1"},
     "administrationDate": "2023-10-01",
     "whenAssessedGradeLevelDescriptor":
         "uri://ed-fi.org/GradeLevelDescriptor#Ninth grade",
     "scoreResults": [
         {"assessmentReportingMethodDescriptor":
              "uri://ed-fi.org/AssessmentReportingMethodDescriptor"
              "#Scale score",
          "result": "28",
          "resultDatatypeTypeDescriptor":
              "uri://ed-fi.org/ResultDatatypeTypeDescriptor#Integer"}],
     "performanceLevels": [
         {"assessmentReportingMethodDescriptor":
              "uri://ed-fi.org/AssessmentReportingMethodDescriptor"
              "#Scale score",
          "performanceLevelDescriptor":
              "uri://ed-fi.org/PerformanceLevelDescriptor#Proficient",
          "performanceLevelMet": True}],
     "studentObjectiveAssessments": [
         {"objectiveAssessmentReference": {"identificationCode": "ALG"},
          "scoreResults": [
              {"assessmentReportingMethodDescriptor":
                   "uri://ed-fi.org/AssessmentReportingMethodDescriptor"
                   "#Raw score",
               "result": "15",
               "resultDatatypeTypeDescriptor":
                   "uri://ed-fi.org/ResultDatatypeTypeDescriptor"
                   "#Integer"}],
          "performanceLevels": [
              {"assessmentReportingMethodDescriptor":
                   "uri://ed-fi.org/AssessmentReportingMethodDescriptor"
                   "#Raw score",
               "performanceLevelDescriptor":
                   "uri://ed-fi.org/PerformanceLevelDescriptor#Basic",
               "performanceLevelMet": True}]}]},
])
dump("staffEducationOrganizationAssignmentAssociations", [
    {"id": "sea1",  # Teacher → Section scope
     "staffClassificationDescriptor":
         "uri://ed-fi.org/StaffClassificationDescriptor#Teacher",
     "staffReference": {"staffUniqueId": "T100",
                        "link": {"href": "/ed-fi/staffs/st1"}},
     "educationOrganizationReference": {
         "educationOrganizationId": 100,
         "link": {"href": "/ed-fi/schools/s1"}},
     "beginDate": "2023-08-01"},
    {"id": "sea2",  # Principal → School scope
     "staffClassificationDescriptor":
         "uri://ed-fi.org/StaffClassificationDescriptor#Principal",
     "staffReference": {"staffUniqueId": "P1",
                        "link": {"href": "/ed-fi/staffs/st3"}},
     "educationOrganizationReference": {
         "educationOrganizationId": 100,
         "link": {"href": "/ed-fi/schools/s1"}},
     "beginDate": "2023-08-01"},
    {"id": "sea3",  # Superintendent → District scope
     "staffClassificationDescriptor":
         "uri://ed-fi.org/StaffClassificationDescriptor#Superintendent",
     "staffReference": {"staffUniqueId": "S1",
                        "link": {"href": "/ed-fi/staffs/st4"}},
     "educationOrganizationReference": {
         "educationOrganizationId": 5,
         "link": {"href": "/ed-fi/localEducationAgencies/lea-5"}},
     "beginDate": "2023-08-01"},
    {"id": "sea4",  # expired Superintendent assignment
     "staffClassificationDescriptor":
         "uri://ed-fi.org/StaffClassificationDescriptor#Superintendent",
     "staffReference": {"staffUniqueId": "SX",
                        "link": {"href": "/ed-fi/staffs/st5"}},
     "educationOrganizationReference": {
         "educationOrganizationId": 5,
         "link": {"href": "/ed-fi/localEducationAgencies/lea-5"}},
     "beginDate": "2021-08-01", "endDate": "2022-06-30"},
])
dump("studentSchoolAttendanceEvents", [
    {"id": "ae1", "eventDate": "2023-08-15",
     "attendanceEventCategoryDescriptor":
         "uri://ed-fi.org/AttendanceEventCategoryDescriptor#In Attendance",
     "schoolReference": {"schoolId": 100},
     "studentReference": {"studentUniqueId": "STU1"},
     "sessionReference": {"schoolYear": 2023}},
    {"id": "ae2", "eventDate": "2024-01-02",
     "attendanceEventCategoryDescriptor":
         "uri://ed-fi.org/AttendanceEventCategoryDescriptor#Excused Absence",
     "schoolReference": {"schoolId": 100},
     "studentReference": {"studentUniqueId": "STU1"},
     "sessionReference": {"schoolYear": 2023}},
])
dump("studentSectionAttendanceEvents", [
    {"id": "se1", "eventDate": "2024-01-02",
     "attendanceEventCategoryDescriptor":
         "uri://ed-fi.org/AttendanceEventCategoryDescriptor#Unexcused Absence",
     "studentReference": {"studentUniqueId": "STU1"},
     "sectionReference": {"schoolId": 100, "localCourseCode": "ALG1",
                          "schoolYear": 2023, "sectionIdentifier": "S-01",
                          "sessionName": "Fall"}},
])
dump("parents", [
    {"id": "p1", "parentUniqueId": "PAR1", "firstName": "Rosa",
     "lastSurname": "Garcia",
     "addresses": [
         {"addressTypeDescriptor":
              "uri://ed-fi.org/AddressTypeDescriptor#Home",
          "city": "Austin", "postalCode": "78701",
          "stateAbbreviationDescriptor":
              "uri://ed-fi.org/StateAbbreviationDescriptor#TX",
          "streetNumberName": "5 Oak Ln",
          "apartmentRoomSuiteNumber": "2B",
          "periods": [{"beginDate": "2020-01-01"}]},
         {"addressTypeDescriptor":
              "uri://ed-fi.org/AddressTypeDescriptor#Work",
          "city": "Austin", "postalCode": "78702",
          "stateAbbreviationDescriptor":
              "uri://ed-fi.org/StateAbbreviationDescriptor#TX",
          "streetNumberName": "9 Elm St",
          "apartmentRoomSuiteNumber": None,
          "periods": []}],
     "telephones": [
         {"telephoneNumber": "512-1111",
          "telephoneNumberTypeDescriptor":
              "uri://ed-fi.org/TelephoneNumberTypeDescriptor#Mobile"}],
     "electronicMails": [
         {"electronicMailAddress": "rosa@home.example",
          "electronicMailTypeDescriptor":
              "uri://ed-fi.org/ElectronicMailTypeDescriptor#Home/Personal",
          "primaryEmailAddressIndicator": True},
         {"electronicMailAddress": "rosa@work.example",
          "electronicMailTypeDescriptor":
              "uri://ed-fi.org/ElectronicMailTypeDescriptor#Work",
          "primaryEmailAddressIndicator": False}]},
])
dump("studentParentAssociations", [
    {"id": "spa1",
     "parentReference": {"parentUniqueId": "PAR1"},
     "studentReference": {"studentUniqueId": "STU1"},
     "primaryContactStatus": True, "livesWith": True,
     "emergencyContactStatus": False, "contactPriority": 1,
     "contactRestrictions": None,
     "relationDescriptor": "uri://ed-fi.org/RelationDescriptor#Mother"},
])
dump("grades", [
    {"gradingPeriodReference": {
        "gradingPeriodDescriptor":
            "uri://ed-fi.org/GradingPeriodDescriptor#First Six Weeks",
        "periodSequence": 1, "schoolId": 100, "schoolYear": 2023},
     "studentSectionAssociationReference": {
         "studentUniqueId": "STU1", "schoolId": 100,
         "beginDate": "2023-08-15", "localCourseCode": "ALG1",
         "schoolYear": 2023, "sectionIdentifier": "S-01",
         "sessionName": "Fall"},
     "letterGradeEarned": "B", "numericGradeEarned": 87.0,
     "gradeTypeDescriptor":
         "uri://ed-fi.org/GradeTypeDescriptor#Grading Period"},
    {"gradingPeriodReference": {
        "gradingPeriodDescriptor":
            "uri://ed-fi.org/GradingPeriodDescriptor#First Six Weeks",
        "periodSequence": 1, "schoolId": 100, "schoolYear": 2023},
     "studentSectionAssociationReference": {
         "studentUniqueId": "STU2", "schoolId": 100,
         "beginDate": "2023-08-15", "localCourseCode": "ALG1",
         "schoolYear": 2023, "sectionIdentifier": "S-01",
         "sessionName": "Fall"},
     "letterGradeEarned": "A", "numericGradeEarned": 0.0,  # 0 → fallback 95
     "gradeTypeDescriptor":
         "uri://ed-fi.org/GradeTypeDescriptor#Grading Period"},
    {"gradingPeriodReference": {
        "gradingPeriodDescriptor":
            "uri://ed-fi.org/GradingPeriodDescriptor#First Six Weeks",
        "periodSequence": 1, "schoolId": 100, "schoolYear": 2023},
     "studentSectionAssociationReference": {
         "studentUniqueId": "STU1", "schoolId": 100,
         "beginDate": "2023-08-15", "localCourseCode": "ALG1",
         "schoolYear": 2023, "sectionIdentifier": "S-01",
         "sessionName": "Fall"},
     "letterGradeEarned": "C", "numericGradeEarned": 75.0,
     "gradeTypeDescriptor":
         "uri://ed-fi.org/GradeTypeDescriptor#Exam"},  # excluded type
])
dump("programs", [
    {"id": "prog1", "programName": "Bilingual",
     "programTypeDescriptor":
         "uri://ed-fi.org/ProgramTypeDescriptor#Bilingual",
     "educationOrganizationReference": {"educationOrganizationId": 5}},
])
dump("programTypeDescriptors", [
    {"programTypeDescriptorId": 41, "codeValue": "Bilingual",
     "description": "Bilingual",
     "namespace": "uri://ed-fi.org/ProgramTypeDescriptor"},
])
dump("studentProgramAssociations", [
    {"studentReference": {"studentUniqueId": "STU1"},
     "beginDate": "2023-09-01",
     "programReference": {
         "programName": "Bilingual",
         "programTypeDescriptor":
             "uri://ed-fi.org/ProgramTypeDescriptor#Bilingual",
         "educationOrganizationId": 5,
         "link": {"href": "/ed-fi/programs/prog1"}},
     "educationOrganizationReference": {"educationOrganizationId": 5}},
])
dump("sexDescriptors", [
    {"sexDescriptorId": 51, "codeValue": "Female",
     "shortDescription": "Female",
     "namespace": "uri://ed-fi.org/SexDescriptor"},
])
dump("schoolYearTypes", [
    {"schoolYear": 2023, "currentSchoolYear": True,
     "schoolYearDescription": "2022-2023"},
    {"schoolYear": 2024, "currentSchoolYear": False,
     "schoolYearDescription": "2023-2024"},
])
dump("cohortYearTypeDescriptors", [
    {"cohortYearTypeDescriptorId": 11, "codeValue": "First grade",
     "shortDescription": "First grade",
     "namespace": "uri://ed-fi.org/CohortYearTypeDescriptor"},
])
dump("raceDescriptors", [
    {"raceDescriptorId": 21, "codeValue": "Asian",
     "shortDescription": "Asian",
     "namespace": "uri://ed-fi.org/RaceDescriptor"},
    {"raceDescriptorId": 22, "codeValue": "White",
     "shortDescription": "White",
     "namespace": "uri://ed-fi.org/RaceDescriptor"},
])
dump("languageDescriptors", [
    {"languageDescriptorId": 31, "codeValue": "Spanish",
     "shortDescription": "Spanish",
     "namespace": "uri://ed-fi.org/LanguageDescriptor"},
])
dump("feederSchoolAssociations", [
    {"feederSchoolReference": {"schoolId": 100},
     "schoolReference": {"schoolId": 200},
     "beginDate": "2015-01-01", "endDate": "2199-12-31"},
    {"feederSchoolReference": {"schoolId": 100},
     "schoolReference": {"schoolId": 300},
     "beginDate": "2015-01-01", "endDate": "2020-01-01"},  # expired
])
dump("cohorts", [
    {"id": "coh1", "cohortIdentifier": "CH-1",
     "cohortDescription": "Freshman mentoring",
     "cohortTypeDescriptor":
         "uri://ed-fi.org/CohortTypeDescriptor#Study partners",
     "educationOrganizationReference": {"educationOrganizationId": 5},
     "programs": [
         {"programReference": {
             "educationOrganizationId": 5, "programName": "Bilingual",
             "programTypeDescriptor":
                 "uri://ed-fi.org/ProgramTypeDescriptor#Bilingual",
             "link": {"href": "/ed-fi/programs/prog1"}}}]},
])
dump("studentCohortAssociations", [
    {"cohortReference": {"link": {"href": "/ed-fi/cohorts/coh1"}},
     "studentReference": {"studentUniqueId": "STU1",
                          "link": {"href": "/ed-fi/students/stu1"}},
     "beginDate": "2023-09-01"},
    {"cohortReference": {"link": {"href": "/ed-fi/cohorts/coh1"}},
     "studentReference": {"studentUniqueId": "STU2",  # exited → dropped
                          "link": {"href": "/ed-fi/students/stu2"}},
     "beginDate": "2023-09-01"},
])
dump("cohortTypeDescriptors", [
    {"cohortTypeDescriptorId": 61, "codeValue": "Study partners",
     "description": "Study partners cohort",
     "namespace": "uri://ed-fi.org/CohortTypeDescriptor"},
])
dump("gradeLevelDescriptors", [
    {"gradeLevelDescriptorId": 71, "codeValue": "Ninth grade",
     "description": "Grade 9",
     "namespace": "uri://ed-fi.org/GradeLevelDescriptor"},
])
dump("studentSchoolFoodServiceProgramAssociations", [
    {"studentReference": {"studentUniqueId": "STU1"},
     "programReference": {
         "programName": "Food Service", "educationOrganizationId": 5,
         "programTypeDescriptor":
             "uri://ed-fi.org/ProgramTypeDescriptor#Bilingual"},
     "educationOrganizationReference": {"educationOrganizationId": 5},
     "beginDate": "2023-08-20",
     "schoolFoodServiceProgramServices": [
         {"schoolFoodServiceProgramServiceDescriptor":
              "uri://ed-fi.org/SchoolFoodServiceProgramServiceDescriptor"
              "#Free Lunch"},
         {"schoolFoodServiceProgramServiceDescriptor":
              "uri://ed-fi.org/SchoolFoodServiceProgramServiceDescriptor"
              "#Free Breakfast"}]},
])
dump("schoolFoodServiceProgramServiceDescriptors", [
    {"schoolFoodServiceProgramServiceDescriptorId": 81,
     "codeValue": "Free Lunch", "description": "Free Lunch",
     "namespace":
         "uri://ed-fi.org/SchoolFoodServiceProgramServiceDescriptor"},
    {"schoolFoodServiceProgramServiceDescriptorId": 82,
     "codeValue": "Free Breakfast", "description": "Free Breakfast",
     "namespace":
         "uri://ed-fi.org/SchoolFoodServiceProgramServiceDescriptor"},
])
dump("disciplineActions", [
    {"disciplineActionIdentifier": "DA-1",
     "disciplineDate": "2023-10-05",
     "studentReference": {"studentUniqueId": "STU1"},
     "disciplines": [
         {"disciplineDescriptor":
              "uri://ed-fi.org/DisciplineDescriptor#In School Suspension"}],
     "staffs": [
         {"staffReference": {"staffUniqueId": "T100",
                             "link": {"href": "/ed-fi/staffs/st1"}}}]},
    {"disciplineActionIdentifier": "DA-2",
     "disciplineDate": "2023-11-06",
     "studentReference": {"studentUniqueId": "STU1"},
     "disciplines": [
         {"disciplineDescriptor":
              "uri://ed-fi.org/DisciplineDescriptor#Expulsion"}],
     "staffs": []},
])
dump("disciplineDescriptors", [
    {"disciplineDescriptorId": 91, "codeValue": "In School Suspension",
     "description": "ISS",
     "namespace": "uri://ed-fi.org/DisciplineDescriptor"},
    {"disciplineDescriptorId": 92, "codeValue": "Expulsion",
     "description": "Expulsion",
     "namespace": "uri://ed-fi.org/DisciplineDescriptor"},
])
