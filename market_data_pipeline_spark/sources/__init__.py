from market_data_pipeline_spark.sources.tables import (
    bars_from_events,
    bars_from_lineitem,
    load_table,
    series_from_events,
    TABLES,
)

__all__ = [
    "TABLES",
    "load_table",
    "series_from_events",
    "bars_from_events",
    "bars_from_lineitem",
]
