from market_data_pipeline_spark.plans.introspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
)

__all__ = ["explain_str", "pushed_filters", "has_broadcast_join"]
