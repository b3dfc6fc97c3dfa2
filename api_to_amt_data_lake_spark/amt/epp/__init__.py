"""epp collection views (reference `parquet/amt/epp/`)."""

from api_to_amt_data_lake_spark.amt.epp import (  # noqa: F401
    descriptor_dims,
    epp_dim,
)
