"""Silver JSON collection source (SURVEY.md §2.1 S5).

Reference behavior (`parquet/Common/functions.py:10-23`): read the first
.json file in `{silver}/{school_year}/{endpoint}/` and parse the whole
document. Spark-first version: `spark.read.json` over the directory —
distributed parse, schema inference (or caller-provided schema for
stability), nested objects as StructType, arrays as ArrayType.

The reference's "first file only" quirk is reproduced *optionally*
(`first_file_only=True`) for parity testing; the engine default reads the
full directory, which is the behavior a 100 TB lake actually needs
(multiline JSON arrays split per-file across executors).
"""

from __future__ import annotations

import os
from glob import glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def col_or_null(df: DataFrame, path: str, cast: str = "string"):
    """Resolve a (possibly nested) field, or a typed null when the document
    never carries it — the Spark analogue of the reference's
    ``jsonNormalize(errors='ignore')`` + ``addColumnIfNotExists`` scaffold
    (`pandasWrapper.py:57-61,138-140`): views stay schema-stable when an
    optional field is absent from every landed document.
    """
    from pyspark.sql import functions as F

    root = path.split(".")[0]
    if root in df.columns:
        # The root may exist but a nested member may not (partial structs).
        try:
            df.select(path)
            return F.col(path).cast(cast)
        except Exception:
            return F.lit(None).cast(cast)
    return F.lit(None).cast(cast)


def array_col(df: DataFrame, path: str, element_type: str):
    """An array column for explode: the real column when the documents carry
    it (inferred schema — never cast, struct casts are positional), else a
    typed null literal so the downstream `explode` simply yields no rows.
    """
    from pyspark.sql import functions as F

    if path in df.columns:
        return F.col(path)
    return F.lit(None).cast(f"array<{element_type}>")


# DataFrame memo, keyed by (session, file list, mtimes, schema, firstOnly).
# A 41-view run touches the big endpoints (studentEducationOrganization-
# Associations, studentSchoolAssociations, students) from ~10 builders
# each; without the memo every builder pays its own schema-inference job
# (a full parse of the multiline JSON). The mtime component invalidates
# the entry when a test rewrites its silver fixture in place.
_READ_MEMO: dict[tuple, DataFrame] = {}


def read_collection(
    spark: SparkSession,
    silver_root: str,
    school_year: str | int,
    endpoint: str,
    schema: T.StructType | None = None,
    first_file_only: bool = False,
) -> DataFrame | None:
    """Read one endpoint's landed JSON documents.

    Returns None when the endpoint directory has no .json files — the
    view-contract layer (`plans.contracts`) converts None into a typed
    empty frame, mirroring `helper/data_frame_generation_result.py:8-23`.

    Files are written by the ingestion module as JSON arrays, so
    ``multiLine=True``. At scale, one file per API page keeps parse
    parallelism; `spark.read.json` fans the file list across executors.
    """
    path = os.path.join(str(silver_root), str(school_year), endpoint)
    files = sorted(glob(os.path.join(path, "*.json")))
    if not files:
        return None
    targets = files[:1] if first_file_only else files
    key = (
        id(spark.sparkContext),
        tuple(targets),
        tuple(int(os.path.getmtime(f) * 1000) for f in targets),
        schema.json() if schema is not None else None,
    )
    memo = _READ_MEMO.get(key)
    if memo is not None:
        return memo
    reader = spark.read.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(targets)
    _READ_MEMO[key] = df
    return df
