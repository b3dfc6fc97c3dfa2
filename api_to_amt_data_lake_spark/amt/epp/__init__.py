"""epp collection views (reference `parquet/amt/epp/`)."""

from api_to_amt_data_lake_spark.amt.epp import (  # noqa: F401
    candidate_dim,
    candidate_survey_dim,
    descriptor_dims,
    epp_dim,
    epp_financial_aid_fact,
    evaluation_element_rating_dim,
)
