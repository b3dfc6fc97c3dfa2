"""View output contracts (SURVEY.md §1.4).

Reference semantics: each view declares RESULT_COLUMNS and ends with
`subset(df, columns)`; a view whose input is missing returns None, which
`helper/data_frame_generation_result.py:8-23` converts into an empty
DataFrame that still has the contract columns. Reproduced here as a small
dataclass: `conform` projects/reorders (adding ''-defaulted columns where a
branch never produced them), `empty` builds the typed empty frame.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class ViewContract:
    """Declares a gold view's output relation."""

    name: str
    columns: tuple[str, ...]
    # Column → Spark type name; unlisted columns are string (the reference
    # is aggressively stringly-typed — SURVEY.md §1.3).
    types: dict[str, str] = field(default_factory=dict)

    def schema(self) -> T.StructType:
        return T.StructType([
            T.StructField(c, _parse_type(self.types.get(c, "string")), True)
            for c in self.columns
        ])

    def empty(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame([], self.schema())

    def conform(self, df: DataFrame | None, spark: SparkSession) -> DataFrame:
        """Final projection to exactly the contract columns, in order.

        None (missing input) → typed empty frame. Missing columns are
        created as nulls cast to the contract type (the reference's
        `addColumnIfNotExists` uses '' — views that need '' do it
        explicitly before conform).
        """
        if df is None:
            return self.empty(spark)
        cols = []
        for c in self.columns:
            t = _parse_type(self.types.get(c, "string"))
            if c in df.columns:
                cols.append(F.col(c).cast(t).alias(c))
            else:
                cols.append(F.lit(None).cast(t).alias(c))
        return df.select(*cols)


def _parse_type(name: str) -> T.DataType:
    mapping = {
        "string": T.StringType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
    }
    if name in mapping:
        return mapping[name]
    return T._parse_datatype_string(name)
