"""Driver-side REST ingestion (SURVEY.md §2.1 S1-S4, §3 EP1).

Reference behavior re-expressed:
- S1 paginated scan: limit/offset loop until an empty page
  (`api/api.py:88-116`).
- S2 deletes scan: same endpoint + `/deletes` (`api/api.py:134-136`).
- S3 OAuth client-credentials token (`helper/token.py:13-31`).
- S4 change-version watermark (`api/changeVersion.py:57-94`) — min/max
  change version persisted between runs for incremental pulls.

Design differences (deliberate, scale-motivated):
- Pages land as one JSON file per page (not one giant file): Spark then
  parallelizes the parse across executors, and a failed page retries
  without re-pulling the collection.
- Endpoints fetch concurrently via a thread pool that actually overlaps
  I/O (the reference's `apply_async(...).get()` serializes —
  `api/api.py:130-131`).
- `requests` is imported lazily so the engine runs in environments
  without it (tests use the local filesystem path instead).
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field


@dataclass
class OdsConfig:
    base_url: str
    token_url: str
    client_id: str
    client_secret: str
    page_limit: int = 500
    max_workers: int = 8
    extra_params: dict[str, str] = field(default_factory=dict)


def fetch_token(cfg: OdsConfig, session=None) -> str:
    """S3: OAuth2 client-credentials grant → bearer token."""
    import requests  # deferred: optional dependency

    sess = session or requests
    resp = sess.post(cfg.token_url, data={"grant_type": "client_credentials"},
                     auth=(cfg.client_id, cfg.client_secret), timeout=60)
    resp.raise_for_status()
    return resp.json()["access_token"]


RETRYABLE_STATUS = (429, 500, 502, 503, 504)


def _get_with_retry(sess, url, *, params=None, headers=None, timeout=300,
                    max_retries: int = 4, backoff_s: float = 0.25):
    """GET with exponential backoff on throttling/transient-server status
    codes (the reference aborts the whole collection on any failed page —
    `api/api.py:109-116` logs and returns; an hourly 100-endpoint pull
    meets 429s and LB blips routinely, so retrying beats re-extracting)."""
    import time as _time

    attempt = 0
    while True:
        resp = sess.get(url, params=params, headers=headers, timeout=timeout)
        status = getattr(resp, "status_code", 200)
        if status in RETRYABLE_STATUS and attempt < max_retries:
            _time.sleep(backoff_s * (2 ** attempt))
            attempt += 1
            continue
        resp.raise_for_status()
        return resp


def fetch_collection_pages(
    cfg: OdsConfig, token: str, endpoint: str,
    min_change_version: int | None = None,
    max_change_version: int | None = None,
    deletes: bool = False,
    session=None,
):
    """S1/S2: generator of page payloads (lists of documents)."""
    import requests  # deferred

    sess = session or requests
    url = f"{cfg.base_url.rstrip('/')}/{endpoint}"
    if deletes:
        url += "/deletes"
    offset = 0
    while True:
        params: dict[str, object] = {
            "limit": cfg.page_limit, "offset": offset, **cfg.extra_params}
        if min_change_version is not None:
            params["minChangeVersion"] = min_change_version
        if max_change_version is not None:
            params["maxChangeVersion"] = max_change_version
        resp = _get_with_retry(
            sess, url, params=params,
            headers={"Authorization": f"Bearer {token}"}, timeout=300)
        page = resp.json()
        if not page:
            return
        yield page
        offset += cfg.page_limit


def land_collection(
    cfg: OdsConfig, token: str, endpoint: str, silver_root: str,
    school_year: str | int, deletes: bool = False, session=None, **cv,
) -> int:
    """Land one endpoint: one JSON file per page under
    `{silver_root}/{school_year}/{collection}/` where collection is the
    route's last path segment (ref `api/api.py:126` names landed files
    by `url.split("/")[-1]`, so "ed-fi/students" lands as "students" —
    the name every AMT view reads back). Returns document count."""
    from api_to_amt_data_lake_spark.sources.endpoints import collection_name

    name = collection_name(endpoint)
    if deletes:
        name = f"deletes_{name}"
    out_dir = os.path.join(str(silver_root), str(school_year), name)
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    for i, page in enumerate(
        fetch_collection_pages(cfg, token, endpoint, deletes=deletes,
                               session=session, **cv)
    ):
        with open(os.path.join(out_dir, f"{name}_page{i:05d}.json"), "w") as f:
            json.dump(page, f)
        total += len(page)
    return total


def land_all(
    cfg: OdsConfig, endpoints: list[str] | None = None,
    silver_root: str = "silver", school_year: str | int = "",
    with_deletes: bool = True, session=None,
    validate_api: bool = True,
) -> dict[str, int]:
    """EP1: fetch every endpoint (+ deletes) concurrently.

    `endpoints=None` pages the full packaged 80-endpoint catalog
    (`sources/endpoints.py`, the reference's `helper/endpoint/
    endpoint.json` consumed at `api/api.py:120-137`) — the `tpdm/`
    routes are skipped automatically when the ODS doesn't advertise the
    TPDM extension model (ref `is_tpdm_supported`, `api/api.py:80-83`).
    Catalog routes carry their data-model prefix ("ed-fi/...",
    "tpdm/..."), so point `base_url` at the `.../data/v3` root for
    catalog runs; explicit bare names ("students") against an
    `.../data/v3/ed-fi` base keep working unchanged.

    `validate_api` checks the ODS data-model version first and refuses
    unsupported models (ref `api/api.py:26-78` validate_supported_api).
    """
    if validate_api and not validate_supported_api(cfg, session=session):
        version = data_model_version(cfg, "Ed-Fi", session=session)
        raise RuntimeError(
            f"unsupported Ed-Fi data model version {version!r}; supported: "
            f"{', '.join(SUPPORTED_DATA_MODEL_VERSIONS)}")
    if endpoints is None:
        from api_to_amt_data_lake_spark.sources.endpoints import (
            default_endpoints,
        )
        tpdm = is_tpdm_supported(cfg, session=session) if validate_api \
            else True
        endpoints = default_endpoints(include_tpdm=tpdm)
    token = fetch_token(cfg, session=session)
    results: dict[str, int] = {}
    with ThreadPoolExecutor(max_workers=cfg.max_workers) as pool:
        futures = {
            pool.submit(land_collection, cfg, token, ep, silver_root,
                        school_year, session=session): ep
            for ep in endpoints
        }
        if with_deletes:
            futures.update({
                pool.submit(land_collection, cfg, token, ep, silver_root,
                            school_year, deletes=True, session=session):
                f"deletes_{ep}"
                for ep in endpoints
            })
        for fut, name in futures.items():
            results[name] = fut.result()
    return results


# --- Data-model version gate (ref api/api.py:26-78) ------------------------

SUPPORTED_DATA_MODEL_VERSIONS = ("3.3", "4.0")


def _metadata_root(cfg: OdsConfig) -> str:
    """The ODS root metadata document URL: the data URL minus its
    `/data/v3[/ed-fi]` suffix (the root serves `{"dataModels": [...]}`)."""
    url = cfg.base_url.rstrip("/")
    for suffix in ("/ed-fi", "/data/v3"):
        if url.endswith(suffix):
            url = url[: -len(suffix)]
    return url


def fetch_data_models(cfg: OdsConfig, session=None) -> list[dict]:
    """The ODS root's `dataModels` advertisement (name/version per model)."""
    import requests  # deferred

    sess = session or requests
    resp = sess.get(_metadata_root(cfg), timeout=60)
    resp.raise_for_status()
    return resp.json().get("dataModels", [])


def data_model_version(cfg: OdsConfig, name: str = "Ed-Fi",
                       session=None) -> str | None:
    for model in fetch_data_models(cfg, session=session):
        if str(model.get("name", "")).lower() == name.lower():
            return model.get("version")
    return None


def validate_supported_api(cfg: OdsConfig, session=None) -> bool:
    """True iff the ODS advertises an Ed-Fi data model on a supported
    major.minor (3.3 / 4.0) — the same gate the reference applies before
    paging (`api/api.py:73-78`): unknown models may rename collections,
    so refusing beats silently landing the wrong shapes."""
    version = data_model_version(cfg, "Ed-Fi", session=session)
    return bool(version) and version.startswith(SUPPORTED_DATA_MODEL_VERSIONS)


def is_tpdm_supported(cfg: OdsConfig, session=None) -> bool:
    """True when the ODS advertises the TPDM extension model (gates the
    epp/ collection like the reference's `is_tpdm_supported`)."""
    return any(str(m.get("name", "")).lower() == "tpdm"
               for m in fetch_data_models(cfg, session=session))


# --- S4: change-version watermark -----------------------------------------

def read_watermark(path: str) -> int | None:
    try:
        with open(path) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def write_watermark(path: str, version: int) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(str(version))


def newest_change_version(cfg: OdsConfig, token: str, session=None) -> int:
    """The ODS 'availableChangeVersions' endpoint (newestChangeVersion)."""
    import requests  # deferred

    sess = session or requests
    url = f"{cfg.base_url.rstrip('/')}/changeQueries/v1/availableChangeVersions"
    resp = sess.get(url, headers={"Authorization": f"Bearer {token}"}, timeout=60)
    resp.raise_for_status()
    return int(resp.json()["newestChangeVersion"])
