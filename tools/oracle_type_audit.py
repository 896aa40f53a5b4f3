"""Audit oracle_sql() result TYPES against the Spark queries() schemas.

The driver hashes raw values; a DuckDB HUGEINT (sum over INTEGER) or a
DECIMAL where Spark emits double can hash-mismatch even when the values are
numerically identical (see inv_q12_priority_buckets in CORRECTNESS_r02).
This tool runs both sides at a small SF and flags per-column type drift so
every oracle can be CAST-pinned to the Spark type.

Usage: python tools/oracle_type_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from market_data_pipeline_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB arrow type -> the Spark simpleString types it is hash-compatible with.
_OK = {
    "int64": {"bigint"},
    "int32": {"int"},
    "int16": {"smallint"},
    "int8": {"tinyint"},
    "double": {"double"},
    "float": {"float"},
    "string": {"string"},
    "large_string": {"string"},
    "bool": {"boolean"},
    "date32[day]": {"date"},
    "binary": {"binary"},
    "large_binary": {"binary"},
}


def _arrow_name(t) -> str:
    s = str(t)
    return s


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_type_audit")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_flag = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = dict(sdf.dtypes)
        except Exception as e:  # noqa: BLE001
            print(f"SPARK-ERR {name}: {e}")
            n_flag += 1
            continue
        try:
            tbl = con.sql(sql).arrow()
        except Exception as e:  # noqa: BLE001
            print(f"ORACLE-ERR {name}: {e}")
            n_flag += 1
            continue
        dtypes = {f.name: _arrow_name(f.type) for f in tbl.schema}
        issues = []
        for col, dt in dtypes.items():
            st = stypes.get(col)
            if st is None:
                issues.append(f"{col}: oracle-only column (spark has {sorted(stypes)})")
                continue
            base = dt.split("[")[0] if dt.startswith("timestamp") else dt
            if dt.startswith("timestamp") and st.startswith("timestamp"):
                continue
            if dt.startswith("decimal"):
                issues.append(f"{col}: oracle {dt} vs spark {st} (DECIMAL drift)")
                continue
            ok = _OK.get(base)
            if ok is None:
                if dt.startswith("list") and st.startswith("array"):
                    continue
                issues.append(f"{col}: oracle {dt} vs spark {st} (unmapped)")
            elif st not in ok:
                issues.append(f"{col}: oracle {dt} vs spark {st}")
        for col in stypes:
            if col not in dtypes:
                issues.append(f"{col}: spark-only column")
        if issues:
            n_flag += 1
            print(f"FLAG {name}:")
            for i in issues:
                print(f"    {i}")
    print(f"done: {n_flag} flagged")
    spark.stop()


if __name__ == "__main__":
    main()
