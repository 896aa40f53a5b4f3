from market_data_pipeline_spark.operators import (
    breadth,
    cleaning,
    dedup,
    fundamentals,
    indicators,
    quality,
    relational,
    screeners,
    similarity,
    text,
    universe,
)

__all__ = [
    "breadth",
    "cleaning",
    "dedup",
    "fundamentals",
    "indicators",
    "quality",
    "relational",
    "screeners",
    "similarity",
    "text",
    "universe",
]
