from market_data_pipeline_spark.operators import (
    behavior,
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
    "behavior",
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
