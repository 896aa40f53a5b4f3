"""Flag registered queries whose OUTPUT schema contains array/map/struct columns.

The driver canonicalizes results by pandas-sorting the raw cell values before
hashing; any list/dict-typed cell raises `TypeError: unhashable type` and the
row records as `err` regardless of value correctness (see inv_v_quantize in
CORRECTNESS_r04). Every registered query must therefore emit only scalar
columns — flatten arrays with array_join / explode before returning.

Usage: python tools/schema_shape_audit.py [sf_dir]
Exit code 1 if any registered output carries a non-scalar column.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from market_data_pipeline_spark.session import get_spark

BAD_PREFIXES = ("array<", "map<", "struct<")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    bad: list[tuple[str, str, str]] = []
    qs = entrymod.queries()
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, sf_dir)
            for f in df.schema.fields:
                t = f.dataType.simpleString()
                if t.startswith(BAD_PREFIXES):
                    bad.append((name, f.name, t))
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            bad.append((name, "<build failed>", repr(exc)[:120]))
    if bad:
        print(f"NON-SCALAR OUTPUT COLUMNS ({len(bad)}):")
        for name, col, t in bad:
            print(f"  {name}: {col} :: {t}")
        return 1
    print(f"OK: all {len(qs)} registered outputs are scalar-typed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
