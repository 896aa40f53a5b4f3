"""Dump `.explain("formatted")` for named queries to plans/<tag>/<name>_<suffix>.txt.

Evidence artifacts for the optimization rounds: the judge checks plan
claims (Exchange counts, join strategies, pushdown) against these files.

Usage: python tools/explain_dump.py <sf_dir> <tag> <suffix> [query ...]
e.g.   python tools/explain_dump.py /root/testdata/sf0.1 r09 before inv_w1_sma

With no query names, dumps every bench.py HEADLINE query.

Note: builders with eager phases (iterative fits, versioned-table builds)
execute those phases during the dump; the captured plan is the final
returned frame's — job-count evidence for the eager phases lives in
OPTIMIZATION notes instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from market_data_pipeline_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1]
    tag = sys.argv[2]
    suffix = sys.argv[3]
    names = sys.argv[4:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_dump")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({buf.getvalue().count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
