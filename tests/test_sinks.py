"""Sink surface (SURVEY.md §2.1 S14-S16, S18-S19): partitioned parquet write
with read-back verification, CSV round-trip, and snapshot caching.

The reference writes file-per-symbol parquet with a CSV fallback and a
write-then-reload count check (/root/reference/src/pipeline.py:308-319,
src/utils/data_exporter.py:22-58). Spark's task-commit protocol replaces the
tmp+fsync+rename dance (file_utils.py:26-59); partitionBy('symbol') replaces
the per-symbol ThreadPool fan-out (data_exporter.py:108-166).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from market_data_pipeline_spark.sources import sinks
from market_data_pipeline_spark.sources.tables import load_table


@pytest.fixture()
def bars_small(spark, sf_dir):
    from market_data_pipeline_spark.sources.tables import bars_from_events

    return bars_from_events(spark, sf_dir).filter(F.col("symbol") < 20)


def test_parquet_sink_partitioned_write_verify(spark, bars_small, tmp_path):
    """S14+S15: partitioned write, then reload and compare counts — the
    reference's write-then-verify as one assertion."""
    target = str(tmp_path / "bars_parquet")
    n = bars_small.count()
    assert sinks.write_parquet_verified(bars_small, target) == n
    back = spark.read.parquet(target)
    assert back.count() == n
    # partition pruning: a symbol filter must land in the scan's
    # PartitionFilters (directory-level skip), not a post-scan Filter
    pruned = back.filter(F.col("symbol") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "symbol" in m.group(1)


def test_csv_sink_roundtrip(spark, bars_small, tmp_path):
    """S16+S18: CSV write (atomic via task commit) and schema-pinned import."""
    target = str(tmp_path / "bars_csv")
    sinks.write_csv(bars_small, target)
    back = sinks.read_csv_pinned(spark, target, bars_small.schema)
    assert back.count() == bars_small.count()
    # CSV read-back normalizes nullability; names + types must survive
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in bars_small.schema.fields
    ]


def test_snapshot_cache_day_scoped(spark, sf_dir, tmp_path):
    """S13: the ticker-universe day-cache as a date-stamped snapshot table.
    Hit today, miss yesterday, miss on absent path — the reference's
    cache-valid-for-creation-day contract (market_scanner.py:131-148)."""
    import datetime as dt

    d = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    snap = str(tmp_path / "universe_snapshot")
    sinks.snapshot_write(d, snap)
    hit = sinks.snapshot_read(spark, snap)
    assert hit is not None and hit.count() == d.count()
    assert sinks.snapshot_read(spark, snap, dt.date.today() - dt.timedelta(days=1)) is None
    assert sinks.snapshot_read(spark, str(tmp_path / "nope")) is None


def test_merge_daily_partitions_incremental(spark, tmp_path):
    """Incremental upsert: only touched date partitions are rewritten; the
    batch row wins a key collision (keep-last); untouched days survive."""
    import os

    store = str(tmp_path / "bars_store")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-02", 11.0), (2, "2024-01-01", 20.0)],
        "symbol int, d string, close double",
    )
    sinks.merge_daily_partitions(base, store)
    # batch: corrects (1, 2024-01-02) and appends a new day
    batch = spark.createDataFrame(
        [(1, "2024-01-02", 99.0), (2, "2024-01-03", 23.0)],
        "symbol int, d string, close double",
    )
    untouched = os.path.getmtime(os.path.join(store, "d=2024-01-01"))
    sinks.merge_daily_partitions(batch, store)
    assert os.path.getmtime(os.path.join(store, "d=2024-01-01")) == untouched
    # partition-dir values come back type-inferred (string d → date); compare as str
    back = {(r.symbol, str(r.d)): r.close for r in spark.read.parquet(store).collect()}
    assert back == {
        (1, "2024-01-01"): 10.0,
        (1, "2024-01-02"): 99.0,
        (2, "2024-01-01"): 20.0,
        (2, "2024-01-03"): 23.0,
    }


def test_streaming_upsert_sink(spark, tmp_path):
    """§2.9: foreachBatch(streaming_upsert_sink) — a replayed batch with a
    correction converges to the corrected value (idempotent upsert)."""
    store = str(tmp_path / "stream_store")
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-02", 11.0)],
        "symbol int, d string, close double",
    ).write.parquet(src)
    stream = spark.readStream.schema("symbol int, d string, close double").parquet(src)
    sink = sinks.streaming_upsert_sink(store)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    # replay the same batch with one corrected row — merge must keep-last
    corrected = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-02", 42.0)],
        "symbol int, d string, close double",
    )
    sink(corrected, batch_id=1)
    back = {(r.symbol, str(r.d)): r.close for r in spark.read.parquet(store).collect()}
    assert back == {(1, "2024-01-01"): 10.0, (1, "2024-01-02"): 42.0}


def test_compact_store_merges_small_files(spark, tmp_path):
    """Maintenance: many per-batch small files collapse to one file per
    partition; row contents survive byte-for-byte; only asked-for
    partitions are rewritten."""
    import glob
    import os

    store = str(tmp_path / "frag_store")
    for batch in range(5):  # 5 appends → ≥5 files per partition dir
        spark.createDataFrame(
            [(s, "2024-01-01", float(batch * 10 + s)) for s in range(4)],
            "symbol int, d string, close double",
        ).coalesce(4).write.mode("append").partitionBy("d").parquet(store)
    spark.createDataFrame(
        [(1, "2024-01-02", 7.0)], "symbol int, d string, close double"
    ).write.mode("append").partitionBy("d").parquet(store)

    def files_in(day):
        return glob.glob(os.path.join(store, f"d={day}", "*.parquet"))

    assert len(files_in("2024-01-01")) >= 5
    before = spark.read.parquet(store)
    rows_before = sorted((r.symbol, str(r.d), r.close) for r in before.collect())
    day2_mtime = os.path.getmtime(os.path.join(store, "d=2024-01-02"))

    n = sinks.compact_store(spark, store, partitions=["2024-01-01"])
    assert n == 1
    assert len(files_in("2024-01-01")) == 1
    assert os.path.getmtime(os.path.join(store, "d=2024-01-02")) == day2_mtime
    after = spark.read.parquet(store)
    assert sorted((r.symbol, str(r.d), r.close) for r in after.collect()) == rows_before


def test_excel_sink_writes_real_xlsx(bars_small, tmp_path):
    """S17: Excel export works WITHOUT openpyxl (r1 verdict #4 'partial'):
    the stdlib fallback emits a real OOXML package — one worksheet per
    symbol, inline-string cells readable by any zip+XML parser."""
    import zipfile
    import xml.etree.ElementTree as ET

    path = str(tmp_path / "bars.xlsx")
    df = bars_small.limit(50)
    n = sinks.export_excel(df, path)
    n_symbols = df.select("symbol").distinct().count()
    assert n == n_symbols
    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert "[Content_Types].xml" in names and "xl/workbook.xml" in names
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheet_names = [s.get("name") for s in wb.iter(f"{NS}sheet")]
        assert len(sheet_names) == n_symbols
        ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = list(ws.iter(f"{NS}row"))
        header = [t.text for t in rows[0].iter(f"{NS}t")]
        assert "close" in header and len(rows) > 1
        # a numeric cell in the first data row round-trips as a number
        vals = [v.text for v in rows[1].iter(f"{NS}v")]
        assert any(v is not None for v in vals)


def test_xlsx_minimal_escapes_and_types(tmp_path):
    """The fallback writer escapes XML metacharacters and preserves
    bool/int/float/None cell typing."""
    import zipfile
    import xml.etree.ElementTree as ET

    path = str(tmp_path / "t.xlsx")
    sinks.write_xlsx_minimal(
        path,
        [("S<&1", [["a", "b"], ["x<&>y", 1.5], [None, True]])],
    )
    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        assert [s.get("name") for s in wb.iter(f"{NS}sheet")] == ["S<&1"]
        ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        texts = [t.text for t in ws.iter(f"{NS}t")]
        assert "x<&>y" in texts
        cells = list(ws.iter(f"{NS}c"))
        assert any(c.get("t") == "b" for c in cells)  # bool cell
        assert any(c.get("t") is None for c in cells)  # numeric cell


def test_markdown_to_pdf_report(tmp_path):
    """S20 (r1 verdict #4): the PDF sink emits a structurally valid PDF 1.4
    — header, xref offsets that point at their objects, page count, and the
    report text present in the uncompressed content streams."""
    from market_data_pipeline_spark import reports

    md = "# Daily Report\n\n## Section\n\n" + "\n".join(
        f"| SYM{i} | {i}.5 |" for i in range(120)
    )
    path = str(tmp_path / "r.pdf")
    pages = reports.markdown_to_pdf(md, path)
    raw = open(path, "rb").read()
    assert raw.startswith(b"%PDF-1.4") and raw.rstrip().endswith(b"%%EOF")
    assert pages >= 2  # 120+ lines paginate
    assert b"Daily Report" in raw and b"SYM42" in raw
    # xref offsets must land on "N 0 obj"
    xref_pos = int(raw.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0].strip())
    xref = raw[xref_pos:].splitlines()
    assert xref[0].strip() == b"xref"
    n_objs = int(xref[1].split()[1])
    for i, line in enumerate(xref[3 : 2 + n_objs], start=1):
        off = int(line.split()[0])
        assert raw[off:].startswith(f"{i} 0 obj".encode())
    assert f"/Count {pages}".encode() in raw


def test_markdown_to_pdf_heading_heavy_stays_on_page(tmp_path):
    """Pagination tracks cumulative leading, not a fixed line count: a
    heading-heavy report (23pt leading each) must break pages early enough
    that every baseline stays above the bottom margin — replay each content
    stream's Tf/TL/T* operators and check the running y-position."""
    import re

    from market_data_pipeline_spark import reports

    md = "\n".join(f"# Heading {i}" for i in range(100))
    path = str(tmp_path / "h.pdf")
    pages = reports.markdown_to_pdf(md, path)
    raw = open(path, "rb").read()
    streams = re.findall(rb"stream\n(.*?)\nendstream", raw, re.S)
    assert len(streams) == pages
    for s in streams:
        y, leading = 756.0, 14.0
        min_y = y
        for op in s.split(b"\n"):
            if op.endswith(b" TL"):
                leading = float(op.split()[0])
            elif op == b"T*":
                y -= leading
                if y < min_y:
                    min_y = y
        # last T* after the final line may dip below, but every DRAWN
        # baseline (y before each T*) must sit inside the page body
        assert min_y + leading >= 36, f"baseline below margin: {min_y + leading}"
    assert pages >= 4  # 100 headings at ~23pt leading cannot fit 54-per-page


def test_telegram_notifier_transport_injection(monkeypatch):
    """S21: unconfigured → no send (reference's env-gate); configured → one
    POST with {chat_id, text}; transport failure is swallowed."""
    import json

    sent: list[tuple[str, bytes]] = []
    notify = sinks.telegram_notifier(transport=lambda url, payload: sent.append((url, payload)))
    monkeypatch.delenv("TELEGRAM_BOT_TOKEN", raising=False)
    monkeypatch.delenv("TELEGRAM_CHAT_ID", raising=False)
    notify("pipeline failed", severity="error")
    assert sent == []
    monkeypatch.setenv("TELEGRAM_BOT_TOKEN", "tok")
    monkeypatch.setenv("TELEGRAM_CHAT_ID", "42")
    notify("pipeline failed", severity="error")
    assert len(sent) == 1 and "bottok/sendMessage" in sent[0][0]
    assert json.loads(sent[0][1]) == {"chat_id": "42", "text": "pipeline failed"}

    def boom(url, payload):
        raise OSError("no network")

    sinks.telegram_notifier(transport=boom)("x")  # must not raise


def test_markdown_to_html_report(spark, sf_dir):
    """S20: the HTML twin renders headings and tables from the md report."""
    from market_data_pipeline_spark import reports

    md = "# T\n\n## Sec\n\n| a | b |\n|---|---|\n| 1 | x<y |\n"
    html = reports.markdown_to_html(md, title="T")
    assert "<h1>T</h1>" in html and "<h2>Sec</h2>" in html
    assert "<th>a</th>" in html and "<td>x&lt;y</td>" in html


def test_clustered_write_produces_disjoint_key_ranges(spark, sf_dir, tmp_path):
    """Range-clustered layout: every parquet file must hold a disjoint
    span of the cluster key (that disjointness is what lets row-group
    min/max stats skip bytes at scale)."""
    import glob

    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "clustered")
    sinks.write_clustered(o, out, cluster_col="o_custkey", n_files=6, sort_cols=("o_orderdate",))

    spans = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        mn, mx = (
            spark.read.parquet(f)
            .agg(F.min("o_custkey"), F.max("o_custkey"))
            .collect()[0]
        )
        if mn is not None:
            spans.append((mn, mx))
    spans.sort()
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # ranges never interleave
    # and nothing was lost
    assert spark.read.parquet(out).count() == o.count()


def test_zordered_write_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout: every file's bounding box must be small in BOTH
    clustering dimensions (1-D clustering gives ~full span in the other
    dim; Morton interleaving bounds both)."""
    import glob
    import statistics

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    out = str(tmp_path / "zordered")
    sinks.write_zordered(li, out, "l_partkey", (1, 2000), "l_suppkey", (1, 100), n_files=16)

    spans_a, spans_b = [], []
    for f in glob.glob(f"{out}/part-*.parquet"):
        r = (
            spark.read.parquet(f)
            .agg(F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey"))
            .collect()[0]
        )
        if r[0] is not None:
            spans_a.append(r[1] - r[0])
            spans_b.append(r[3] - r[2])
    assert len(spans_a) >= 8
    # each dimension's average per-file span is a strict minority of its range
    assert statistics.mean(spans_a) < 0.6 * 2000
    assert statistics.mean(spans_b) < 0.6 * 100
    assert spark.read.parquet(out).count() == li.count()


def test_write_sharded_deterministic_layout(spark, sf_dir, tmp_path):
    """Sharded export: shard dirs hold exactly the ids whose Knuth
    scramble maps there, files are internally ordered by the shuffle
    key, and a rewrite reproduces the identical assignment."""
    import glob
    import os

    import pyarrow.parquet as pq

    from market_data_pipeline_spark.sources import sinks

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang"
    )
    target = str(tmp_path / "shards")
    sinks.write_sharded(docs, target, "doc_id", n_shards=8)

    seen = set()
    for d in sorted(glob.glob(os.path.join(target, "shard=*"))):
        k = int(d.rsplit("=", 1)[1])
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1  # one task per shard -> one file
        t = pq.read_table(files[0])
        ids = t.column("doc_id").to_pylist()
        keys = t.column("shuffle_key").to_pylist()
        assert keys == sorted(keys)  # ordered by the shuffle key
        for i, key in zip(ids, keys):
            assert key == (i * 2654435761) % (2**32)
            assert key % 8 == k
        seen.update(ids)
    expected = {r.doc_id for r in docs.select("doc_id").collect()}
    assert seen == expected

    # determinism: a second write yields byte-identical assignments
    target2 = str(tmp_path / "shards2")
    sinks.write_sharded(docs, target2, "doc_id", n_shards=8)
    for k in range(8):
        a = pq.read_table(glob.glob(os.path.join(target, f"shard={k}", "*.parquet"))[0])
        b = pq.read_table(glob.glob(os.path.join(target2, f"shard={k}", "*.parquet"))[0])
        assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()


def test_refresh_rollup_incremental_equals_full(spark, tmp_path):
    """Continuous-aggregate maintenance: a late daily batch refreshes only
    its touched weeks, untouched week partitions keep their bytes, and the
    incrementally-maintained store equals a from-scratch rollup."""
    import datetime
    import os

    from market_data_pipeline_spark.sources.sinks import (
        merge_daily_partitions,
        refresh_rollup,
    )
    from market_data_pipeline_spark.sources.tables import rollup_bars

    daily = str(tmp_path / "daily")
    rollup = str(tmp_path / "rollup")

    def bars(rows):
        return spark.createDataFrame(
            [(s, datetime.date.fromisoformat(d), o, h, l, c, v, n)
             for s, d, o, h, l, c, v, n in rows],
            "symbol string, d date, open double, high double, low double,"
            " close double, volume double, n_trades long",
        )

    # seed: two symbols, two weeks (2024-01-01 and 2024-01-08 are Mondays)
    seed = bars([
        ("AAA", "2024-01-01", 1.0, 2.0, 0.5, 1.5, 10.0, 3),
        ("AAA", "2024-01-03", 1.5, 3.0, 1.0, 2.5, 20.0, 4),
        ("AAA", "2024-01-08", 2.5, 4.0, 2.0, 3.0, 30.0, 5),
        ("BBB", "2024-01-02", 9.0, 9.5, 8.0, 9.1, 5.0, 2),
    ])
    merge_daily_partitions(seed, daily, key_cols=("symbol", "d"))
    assert refresh_rollup(seed, daily, rollup) == 2

    def mtimes():
        out = {}
        for root, _dirs, files in os.walk(rollup):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = mtimes()
    # late correction for week 1 only
    late = bars([("AAA", "2024-01-02", 1.2, 5.0, 1.1, 4.0, 7.0, 1)])
    merge_daily_partitions(late, daily, key_cols=("symbol", "d"))
    assert refresh_rollup(late, daily, rollup) == 1
    after = mtimes()

    # week-2 partition files are byte-for-byte untouched (same path+mtime)
    w2 = [p for p in before if "period_start=2024-01-08" in p]
    assert w2 and all(p in after and after[p] == before[p] for p in w2)

    # incrementally-maintained rollup == full recompute from the daily store
    # (partitioned reads reorder columns — pin a canonical projection)
    cols = ["symbol", "period_start", "open", "high", "low", "close",
            "volume", "n_trades", "n_days"]
    got = (
        spark.read.parquet(rollup)
        .select(cols)
        .orderBy("symbol", "period_start")
        .collect()
    )
    want = (
        rollup_bars(spark.read.parquet(daily), grain="week")
        .select(cols)
        .orderBy("symbol", "period_start")
        .collect()
    )
    norm = lambda rows: [tuple(r) for r in rows]
    assert norm(got) == norm(want)
    # and the late high propagated into week 1
    w1 = [r for r in got if r.symbol == "AAA" and str(r.period_start) == "2024-01-01"]
    assert w1[0].high == 5.0 and w1[0].n_days == 3


def test_read_jsonl_quarantined_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql import types as T

    from market_data_pipeline_spark.sources import sinks

    p = tmp_path / "in.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"id": 1, "text": "ok"}',
                '{"id": 2, "text": "fine", "extra": "ignored"}',
                "not json at all",
                '{"id": "notanint", "text": "typed"}',
                '{"id": 4}',
                "",  # blank line: NULL struct from from_json, must quarantine
                "null",  # literal JSON null: same
            ]
        )
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
    )
    good, bad = sinks.read_jsonl_quarantined(spark, str(p), schema)
    # extra fields ignored, missing fields null, schema pinned
    assert sorted((r["id"], r["text"]) for r in good.collect()) == [
        (1, "ok"),
        (2, "fine"),
        (4, None),
    ]
    assert good.schema == schema
    # malformed JSON and type-mismatched rows both quarantine with the
    # verbatim source line (replayable after a parser fix)
    assert sorted(r["raw_line"] for r in bad.collect()) == [
        "",
        "not json at all",
        "null",
        '{"id": "notanint", "text": "typed"}',
    ]
