"""EP1 → EP2 end-to-end: a fake ODS serves the shared fixture
documents, `run_full_pipeline` pages the FULL packaged 80-endpoint
catalog (zero caller-supplied endpoint configuration — the reference's
`api_async` + `amt_parquet` path) and builds all 41 gold views from the
landed silver."""

from __future__ import annotations

import json

import pytest
from silver_docs import SILVER_DOCS

from api_to_amt_data_lake_spark.amt import registry
from api_to_amt_data_lake_spark.pipeline import run_full_pipeline
from api_to_amt_data_lake_spark.sources.endpoints import (
    ENDPOINT_CATALOG,
    collection_name,
    default_catalog,
    default_endpoints,
    table_name,
)
from api_to_amt_data_lake_spark.sources.rest import OdsConfig, land_all

SY = 2023


class _Resp:
    def __init__(self, payload):
        self.payload = payload
        self.status_code = 200

    def raise_for_status(self):
        pass

    def json(self):
        return self.payload


class FakeOds:
    """A complete fake ODS: root metadata (Ed-Fi 3.3 + TPDM), OAuth
    token, and paginated collections backed by SILVER_DOCS; every
    collection also serves a /deletes variant (one tombstone for
    `students`, empty elsewhere)."""

    def __init__(self):
        self.requests: list[str] = []

    def post(self, url, data=None, auth=None, timeout=None):
        assert data == {"grant_type": "client_credentials"}
        return _Resp({"access_token": "tok-e2e"})

    def get(self, url, params=None, headers=None, timeout=None):
        self.requests.append(url)
        if "/data/v3/" not in url:  # metadata root — no auth needed
            return _Resp({"dataModels": [
                {"name": "Ed-Fi", "version": "3.3.1-b"},
                {"name": "TPDM", "version": "1.1.0"},
            ]})
        assert headers["Authorization"] == "Bearer tok-e2e"
        tail = url.rsplit("/data/v3/", 1)[-1]  # e.g. "ed-fi/students"
        deletes = tail.endswith("/deletes")
        if deletes:
            tail = tail[: -len("/deletes")]
        coll = collection_name(tail)
        if deletes:
            docs = [{"id": "tombstone-1"}] if coll == "students" else []
        else:
            docs = SILVER_DOCS.get(coll, [])
        off, lim = params["offset"], params["limit"]
        return _Resp(docs[off:off + lim])


@pytest.fixture(scope="module")
def cfg():
    return OdsConfig(base_url="https://ods.example/data/v3",
                     token_url="https://ods.example/oauth/token",
                     client_id="k", client_secret="s", page_limit=3)


def test_catalog_matches_reference_shape():
    assert len(ENDPOINT_CATALOG) == 80
    assert len({t for _, t in ENDPOINT_CATALOG}) == 60
    assert sum(r.startswith("tpdm/") for r, _ in ENDPOINT_CATALOG) == 9
    assert len(default_endpoints(include_tpdm=False)) == 71
    recs = default_catalog()
    assert recs[0] == {"endpoint": "ed-fi/academicSubjectDescriptors",
                       "table_name": "base_edfi_descriptors",
                       "collection": "academicSubjectDescriptors"}
    assert table_name("ed-fi/students") == "base_edfi_students"
    assert table_name("students") == "base_edfi_students"  # bare name
    assert table_name("ed-fi/nope") is None


def test_land_all_defaults_to_full_catalog(tmp_path, cfg):
    ods = FakeOds()
    results = land_all(cfg, silver_root=str(tmp_path), school_year=SY,
                       session=ods)
    # 80 endpoints + 80 deletes variants, every one attempted.
    assert len(results) == 160
    # Landed directory names are the route's last segment — exactly
    # what the AMT views read back.
    landed = {d.name for d in (tmp_path / str(SY)).iterdir()}
    assert "students" in landed and "ed-fi" not in landed
    assert "deletes_students" in landed
    assert results["ed-fi/students"] == len(SILVER_DOCS["students"])
    assert results["deletes_ed-fi/students"] == 1
    # Fixture-less catalog endpoints were still paged (empty, one call).
    assert any(u.endswith("/ed-fi/addressTypeDescriptors")
               for u in ods.requests)


def test_land_all_skips_tpdm_when_not_advertised(tmp_path, cfg):
    class NoTpdm(FakeOds):
        def get(self, url, params=None, headers=None, timeout=None):
            if "/data/v3/" not in url:
                return _Resp({"dataModels": [
                    {"name": "Ed-Fi", "version": "4.0.0"}]})
            return super().get(url, params=params, headers=headers,
                               timeout=timeout)

    results = land_all(cfg, silver_root=str(tmp_path),
                       school_year=SY, session=NoTpdm())
    assert len(results) == 142  # 71 ed-fi routes × (data + deletes)
    assert not any(k.startswith(("tpdm/", "deletes_tpdm/"))
                   for k in results)


def test_full_pipeline_e2e_zero_config(tmp_path, spark, cfg):
    """The headline contract: fake ODS → land all 80 endpoints →
    build ALL 41 gold views, with no caller-supplied endpoint list."""
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    out = run_full_pipeline(
        spark, silver, gold, [SY], cfg=cfg, session=FakeOds(),
        run_date="2023-09-30")
    views = out[str(SY)]
    assert set(views) == set(registry.VIEWS)
    assert len(views) == 41
    # Landed silver is byte-compatible with the golden fixtures: the
    # same documents give the same gold rows the goldens pin.
    school = spark.read.parquet(views["schoolDim"])
    rows = school.collect()
    assert [r["SchoolKey"] for r in rows] == ["100"]
    assert rows[0]["SchoolName"] == "Alpha High"  # same as the golden
    date_dim = spark.read.parquet(views["dateDim"])
    assert date_dim.count() > 0
    # The deletes landing is present beside the data (S2): folded by
    # the incremental path, invisible to the full-rebuild gold.
    tomb = json.loads(
        next((tmp_path / "silver" / str(SY) / "deletes_students")
             .glob("*.json")).read_text())
    assert tomb == [{"id": "tombstone-1"}]
    # Post-build warehouse validation over the landed lake: every key
    # uniqueness and completeness invariant holds, and the RI checks
    # DETECT the cross-view orphans this deliberately-minimal fixture
    # contains (the goldens pin each view independently; e.g. the
    # demographics docs cover students whose enrollment fell out of the
    # enrolled-only studentSchoolDim) — proving the validator catches
    # dangling keys rather than waving them through.
    from api_to_amt_data_lake_spark.amt.validate import validate_gold
    report = validate_gold(spark, gold, SY).collect()
    by_kind = {}
    for r in report:
        by_kind.setdefault(r["kind"], []).append(r)
    assert all(r["status"] != "FAIL" for r in by_kind["uniqueness"])
    assert all(r["status"] != "FAIL" for r in by_kind["completeness"])
    ri_fails = {r["check"] for r in by_kind["referential"]
                if r["status"] == "FAIL"}
    # r9: the attendance facts' RI parent is allStudentSchoolDim (all
    # associations, exited included) — against it this fixture's chrab/
    # ews rows fully resolve, so only two deliberate orphan shapes
    # remain: grade rows for sections never synthesized and demographics
    # for students whose enrollment fell out of the enrolled-only dim.
    known_fixture_orphans = {
        "ews_studentSectionGradeFact.StudentSectionKey -> "
        "studentSectionDim.StudentSectionKey",
        "studentSchoolDemographicsBridge.StudentSchoolKey -> "
        "studentSchoolDim.StudentSchoolKey",
    }
    assert ri_fails == known_fixture_orphans, ri_fails
