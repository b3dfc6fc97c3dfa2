"""Executor-distributed paginated scan: a Spark 4 Python Data Source.

`sources/rest.py` re-expresses the reference's limit/offset ingestion
loop (ref `api/api.py:88-116`) as driver-side page landing; this module
goes one step further and makes the paginated collection a first-class
`spark.read.format("paged_collection")` source, so page fetches run ON
THE EXECUTORS — the idiomatic Spark shape for a 100-endpoint, million-
row ODS pull (the driver plans partitions; N workers page concurrently;
a failed page retries with its task, not the whole collection).

Partitioning without a row count: offset pagination is DENSE — if page
k is empty, every page > k is empty too. So partition i of N reads
pages i, i+N, i+2N, ... and stops at its first empty/missing page
("strided until-empty"). No count probe, no driver round-trips, and
the N streams stay balanced to within one page.

Transports (option `transport`):
- `file` (default): pages are `page-<n>.json` files under `path` — the
  layout `sources/rest.py::land_collection` writes, so landed silver
  pages re-read distributed; also the hermetic test path.
- `http`: `url` is a template with `{limit}`/`{offset}` placeholders,
  fetched with stdlib urllib (executors may not have `requests`);
  `token` adds a bearer header.

Rows are `(offset, page, payload)` with payload = one record's JSON
text; downstream typed parsing is `F.from_json` / the existing
jsonNormalize path (`sources/json_source.py`), keeping schema handling
in one place.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "offset bigint, page int, payload string"


class PagedCollectionDataSource(DataSource):
    """`spark.dataSource.register(PagedCollectionDataSource)` then
    `spark.read.format("paged_collection").option("path", dir).load()`."""

    @classmethod
    def name(cls) -> str:
        return "paged_collection"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> "PagedCollectionReader":
        return PagedCollectionReader(self.options)

    def simpleStreamReader(self, schema) -> "PagedCollectionStreamReader":
        # strided partitioning is a batch concept; the stream reader
        # walks pages densely from its committed row offset.
        opts = dict(self.options)
        opts["num_partitions"] = "1"
        return PagedCollectionStreamReader(opts)


class _Part(InputPartition):
    def __init__(self, index: int):
        self.index = index


class PagedCollectionReader(DataSourceReader):
    def __init__(self, options: dict):
        self.transport = options.get("transport", "file")
        self.path = options.get("path")
        self.url = options.get("url")
        self.token = options.get("token")
        self.page_limit = int(options.get("page_limit", "500"))
        self.num_partitions = int(options.get("num_partitions", "8"))
        # file layout: "{page:05d}" formatted page number; default matches
        # this module's tests, pass e.g. "students_page{page:05d}.json" to
        # re-read pages landed by `sources/rest.py::land_collection`.
        self.file_pattern = options.get("file_pattern", "page-{page:05d}.json")
        if self.transport == "file" and not self.path:
            raise ValueError("file transport requires option 'path'")
        if self.transport == "http" and not self.url:
            raise ValueError("http transport requires option 'url'")

    def partitions(self):
        return [_Part(i) for i in range(self.num_partitions)]

    # -- per-page fetch ----------------------------------------------------
    def _fetch_page(self, page: int):
        """Return the page's record list, or None when the page does not
        exist (file missing / empty body) — the until-empty signal."""
        if self.transport == "file":
            fp = os.path.join(self.path, self.file_pattern.format(page=page))
            if not os.path.exists(fp):
                return None
            with open(fp, encoding="utf-8") as fh:
                recs = json.load(fh)
            return recs or None
        from urllib.request import Request, urlopen  # executor-side

        url = self.url.format(limit=self.page_limit,
                              offset=page * self.page_limit)
        req = Request(url)
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        with urlopen(req, timeout=300) as resp:
            recs = json.loads(resp.read().decode("utf-8"))
        return recs or None

    def read(self, partition: _Part):
        page = partition.index
        while True:
            recs = self._fetch_page(page)
            if recs is None:
                return  # dense offsets: nothing past the first empty page
            base = page * self.page_limit
            for j, rec in enumerate(recs):
                yield (base + j, page, json.dumps(rec, sort_keys=True))
            if len(recs) < self.page_limit:
                return  # partial page == last page of the collection
            page += self.num_partitions


def register(spark) -> None:
    """Idempotent registration of the source on a session."""
    spark.dataSource.register(PagedCollectionDataSource)


class PagedCollectionStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of a paginated collection: each micro-batch picks
    up the pages (and the tail of a partially-filled last page) that
    appeared since the last committed offset — continuous ODS ingestion
    without re-reading landed pages.

    Offsets are `{"row": N}`: the number of records consumed so far.
    Dense offset pagination makes replay exact — `readBetweenOffsets`
    re-reads precisely [start, end) rows from the page files, so a
    crashed batch re-emits identical rows (exactly-once downstream with
    an idempotent sink like `streaming/sink.py`).

    The Simple reader API reads on the DRIVER by design (Spark re-shards
    the produced batch); use it for the incremental tail where each
    batch is small — the batch `PagedCollectionReader` remains the
    executor-parallel path for full-collection backfills.
    """

    def __init__(self, options: dict):
        self._r = PagedCollectionReader(options)

    def initialOffset(self) -> dict:
        return {"row": 0}

    def _read_from(self, row0: int):
        limit = self._r.page_limit
        page, skip = divmod(row0, limit)
        rows = []
        while True:
            recs = self._r._fetch_page(page)
            if recs is None:
                break
            base = page * limit
            for j, rec in enumerate(recs[skip:], start=skip):
                rows.append((base + j, page, json.dumps(rec, sort_keys=True)))
            if len(recs) < limit:
                break  # partial page == current tail
            page += 1
            skip = 0
        return rows

    def read(self, start: dict):
        rows = self._read_from(start["row"])
        return iter(rows), {"row": start["row"] + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):
        n = end["row"] - start["row"]
        return iter(self._read_from(start["row"])[:n])
