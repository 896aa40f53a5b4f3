"""market_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference pipeline (PatrickSandwich/market_data_pipeline, a pandas batch
ETL for Vietnamese stock-market data) as idiomatic, Catalyst-optimized Spark
DataFrame programs, plus the large-scale training-data operators (dedup,
similarity search, text analysis, multimodal columns) a 100 TB pipeline needs.

Design stance (SURVEY.md §7.0):
- One long DataFrame per entity (``series(symbol, time, close, ...)``), never
  file-per-symbol; ``symbol`` is the partition key every window op reuses so a
  whole indicator chain costs a single shuffle.
- Every operator is a pure ``DataFrame -> DataFrame`` function built from
  ``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd). Python touches
  data only in the two genuinely non-native operators (EMA recursion, embedding
  math), and there only through Arrow-vectorized pandas UDFs.
- Small dimensions are broadcast; big joins rely on Catalyst + AQE; every
  rolling expression carries the reference's ``min_periods`` semantics.
"""

from market_data_pipeline_spark.session import get_spark

__all__ = ["get_spark", "Pipeline", "load_config"]
__version__ = "0.1.0"


def __getattr__(name):
    # lazy so `import market_data_pipeline_spark` stays cheap for the driver
    if name == "Pipeline":
        from market_data_pipeline_spark.pipeline import Pipeline

        return Pipeline
    if name == "load_config":
        from market_data_pipeline_spark.config import load_config

        return load_config
    raise AttributeError(name)
