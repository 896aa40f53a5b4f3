"""Vietnamese financial-string parsing as native Catalyst expressions.

Reference: ``DataCleaner._parse_financial_value`` applied element-wise with
``df[col].apply(...)`` (/root/reference/src/transformers/data_cleaner.py:74-75,
176-197) — the reference's only scalar-UDF-shaped code. Semantics:

- ``'12%'``   → 0.12      (percent → fraction)
- ``'-2.5%'`` → -0.025
- ``'3 tỷ'``  → 3e9       (tỷ = billion)
- ``'5 triệu'`` / ``'5 tr'`` → 5e6  (triệu = million)
- ``'1,234.5'`` → 1234.5  (comma thousands separators stripped)
- anything non-numeric → NULL (pandas ``errors='coerce'``)

Implemented as a when/regexp chain — JVM-side and oracle-checkable — rather
than the UDF the reference uses. A pandas-UDF twin lives in tests as the
UDF-surface demonstration.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM = r"([-+]?[0-9]*\.?[0-9]+)"


def _num(col: Column) -> Column:
    """Extract the leading numeric token (commas pre-stripped) as double."""
    cleaned = F.regexp_replace(F.trim(col), ",", "")
    return F.regexp_extract(cleaned, _NUM, 1).cast("double")


def parse_financial_value(col: Column) -> Column:
    lower = F.lower(F.trim(col))
    base = _num(col)
    return (
        F.when(lower.rlike(r"%\s*$"), base / 100.0)
        .when(lower.rlike(r"(tỷ|ty)\s*$"), base * 1e9)
        .when(lower.rlike(r"(triệu|trieu|tr)\s*$"), base * 1e6)
        .otherwise(base)
    )


# DuckDB twin of the same chain (shared so Spark code and oracle evolve
# together). {c} is the input column expression.
_NUM_SQL = "try_cast(regexp_extract(replace(trim({c}), ',', ''), '([-+]?[0-9]*\\.?[0-9]+)', 1) AS DOUBLE)"
PARSE_FINANCIAL_SQL = (
    "CASE"
    " WHEN regexp_matches(lower(trim({c})), '%\\s*$') THEN " + _NUM_SQL + " / 100.0"
    " WHEN regexp_matches(lower(trim({c})), '(tỷ|ty)\\s*$') THEN " + _NUM_SQL + " * 1e9"
    " WHEN regexp_matches(lower(trim({c})), '(triệu|trieu|tr)\\s*$') THEN " + _NUM_SQL + " * 1e6"
    " ELSE " + _NUM_SQL + " END"
)


def statement_lines_udtf():
    """Python UDTF (Spark 4): explode a semi-structured ``k: v; k: v``
    statement line into (metric, value) rows — the row-generating shape of
    the reference's fundamental statement parsing
    (/root/reference/src/extractors/fundamental_extractor.py:505-549
    lowercases and numeric-coerces semi-dynamic metric columns; here the
    dynamic-wide frame becomes LONG form, which is the schema-stable way
    to ingest statements whose column set varies by API version).

    Registered per-session via ``spark.udtf.register``; unparseable
    segments are skipped, mirroring ``pd.to_numeric(errors='coerce')``.
    The UDTF runs row-local (no shuffle) and Arrow-batched; prefer the
    native regexp path when the grammar is fixed — this exists to cover
    the UDTF surface with a real reference semantic.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="metric string, value double")
    class ParseStatementLine:
        def eval(self, line: str):
            for part in (line or "").split(";"):
                if ":" not in part:
                    continue
                k, v = part.split(":", 1)
                try:
                    yield k.strip().lower(), float(v.strip())
                except ValueError:
                    continue

    return ParseStatementLine
