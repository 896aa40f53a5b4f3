"""Sink surface (SURVEY.md §2.1 S13-S21) as engine API.

The reference's export layer is a per-symbol ThreadPool writing one parquet
file per symbol with a tmp+fsync+rename dance and a write-then-reload count
check (/root/reference/src/utils/data_exporter.py:22-58,108-166,
src/utils/file_utils.py:26-59, src/pipeline.py:308-319). Spark replaces all
of that with one job: ``partitionBy`` fans out per-symbol directories, the
task-commit protocol gives atomicity, and verification is a reload+count.

Driver-side formats (Excel, Telegram) stay driver-side by nature: Excel is a
single local file (one sheet per symbol, /root/reference/src/extractors/
get_ohlcv.py:26-41), Telegram is a side-effect POST on failure
(/root/reference/src/pipeline.py:408-431). Both are bounded-size outputs of
already-aggregated frames — never the 100 TB data path.
"""

from __future__ import annotations

import datetime as _dt
import logging
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def write_parquet_verified(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("symbol",),
    mode: str = "overwrite",
) -> int:
    """S14+S15 — partitioned parquet write, then reload and count-check.

    Returns the verified row count; raises if the reload disagrees with the
    written count (the reference's export_then_verify,
    src/pipeline.py:308-319). The count runs on the *written* files, so a
    lost task or partial commit surfaces here, not downstream.
    """
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    expected = df.count()
    writer.parquet(path)
    actual = df.sparkSession.read.parquet(path).count()
    if actual != expected:
        raise ValueError(f"parquet verify failed at {path}: wrote {expected}, read back {actual}")
    return actual


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """S16 — CSV export; atomicity comes from Spark's task-commit protocol
    (replaces tmp+fsync+rename, file_utils.py:26-59)."""
    df.write.mode(mode).option("header", header).csv(path)


def read_csv_pinned(spark: SparkSession, path: str, schema, header: bool = True) -> DataFrame:
    """S18 — schema-pinned CSV import (no inference pass over 100 TB)."""
    return spark.read.option("header", header).schema(schema).csv(path)


def jsonl_split(lines: DataFrame, schema) -> tuple[DataFrame, DataFrame]:
    """Split a text frame (column ``value``, one JSON document per row)
    into (good, bad) under a pinned schema — the parsing core shared by
    the batch reader (read_jsonl_quarantined) and the streaming ingest
    job (streaming/jobs.streaming_jsonl_ingest). Works identically on
    batch and streaming frames (pure expressions, no action)."""
    from pyspark.sql import types as T

    pinned = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            "value",
            pinned,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("__p"),
    )
    # from_json returns a NULL struct (not a struct with the corrupt field
    # set) for blank lines and literal JSON null — both must quarantine,
    # or they'd surface as phantom all-null "good" rows
    ok = F.col("__p").isNotNull() & F.col("__p._corrupt_record").isNull()
    good = parsed.filter(ok).select(
        [F.col(f"__p.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.filter(~ok).select(F.col("value").alias("raw_line"))
    return good, bad


def read_jsonl_quarantined(
    spark: SparkSession, path: str, schema
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingestion with corrupt-record quarantine: returns
    (good, bad) — parsed rows matching the pinned schema, and the raw
    text of every line that failed to parse.

    The crawl-dump reality: a 100 TB JSONL drop always contains some
    malformed lines, and the two failure modes to avoid are (a) schema
    inference (a full extra pass, and one bad line can flip a column to
    string) and (b) silent drops (DROPMALFORMED loses data with no audit
    trail). Implementation reads lines as text and parses with
    ``from_json`` carrying an embedded corrupt-record field — one scan,
    pure expressions, and it sidesteps the analyzer restriction on
    querying ``spark.read.json``'s corrupt column alone (SPARK-21610:
    that path requires a cache, which is exactly wrong at 100 TB). Good
    rows flow on; bad lines land in a quarantine frame the pipeline can
    count, alert on, and replay after a parser fix.
    """
    return jsonl_split(spark.read.text(path), schema)


def snapshot_write(df: DataFrame, path: str, snapshot_date: _dt.date | None = None) -> None:
    """S13 — day-scoped snapshot cache (ticker-universe day-cache,
    src/utils/market_scanner.py:131-148): stamp every row with the snapshot
    date and overwrite only that date's partition."""
    stamp = F.lit(snapshot_date) if snapshot_date else F.current_date()
    (
        df.withColumn("snapshot_date", stamp.cast("date"))
        .write.mode("overwrite")
        .partitionBy("snapshot_date")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def snapshot_read(
    spark: SparkSession, path: str, snapshot_date: _dt.date | None = None
) -> DataFrame | None:
    """S13 read side — None when today's (or the given day's) snapshot is
    absent, mirroring the reference's cache-miss → refetch path. The date
    filter prunes to one partition directory."""
    want = snapshot_date or _dt.date.today()
    try:
        snap = spark.read.parquet(path).filter(F.col("snapshot_date") == F.lit(want))
    except Exception:  # AnalysisException: path does not exist yet
        return None
    if not snap.take(1):
        return None
    return snap


def merge_daily_partitions(
    new_rows: DataFrame,
    path: str,
    partition_col: str = "d",
    key_cols: Sequence[str] = ("symbol", "d"),
    order_col: str | None = None,
) -> None:
    """Incremental day-batch upsert: rewrite ONLY the date partitions the
    new batch touches (the scale-correct form of the reference's daily
    append+dedupe, src/pipeline.py:308-319 + price_extractor.py:96).

    Plan: prune the existing store to the touched dates (partition pruning —
    at 100 TB this reads one day, not the store), union with the batch,
    keep-last per ``key_cols`` (batch rows win via a source-rank tiebreak,
    or ``order_col`` when a real ingest-order column exists), then
    ``partitionOverwriteMode=dynamic`` so untouched partitions are never
    rewritten. No table format needed — plain parquet.
    """
    spark = new_rows.sparkSession
    dates = [r[0] for r in new_rows.select(partition_col).distinct().collect()]
    if not dates:
        return
    merged = new_rows.withColumn("__src", F.lit(1))
    try:
        existing = spark.read.parquet(path).filter(F.col(partition_col).isin(dates))
        merged = existing.withColumn("__src", F.lit(0)).unionByName(merged)
    except Exception:  # first write: store does not exist yet
        pass
    from pyspark.sql import Window

    order = [F.col(order_col).desc()] if order_col else []
    w = Window.partitionBy(*key_cols).orderBy(*order, F.col("__src").desc())
    merged = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    # Spark rejects overwriting a path that is also an input of the plan;
    # materialize the (one-day-sized) merge result to break the lineage.
    merged = merged.localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .partitionBy(partition_col)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def streaming_upsert_sink(
    path: str,
    partition_col: str = "d",
    key_cols: Sequence[str] = ("symbol", "d"),
    order_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """§2.9 ingest sink: ``writeStream.foreachBatch(streaming_upsert_sink(p))``
    turns the incremental merge into a streaming upsert — each micro-batch
    rewrites only the date partitions it touches. Replaces the reference's
    daily-append loop (src/scripts/daily_update.py) with exactly-once
    batches: replays of a failed micro-batch converge because the merge is
    idempotent (keep-last on ``key_cols``).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_daily_partitions(
            batch_df, path, partition_col=partition_col, key_cols=key_cols, order_col=order_col
        )

    return sink


def compact_store(
    spark: SparkSession,
    path: str,
    partition_col: str = "d",
    target_rows_per_file: int = 2_000_000,
    partitions: Sequence[object] | None = None,
) -> int:
    """Maintenance: rewrite a partitioned store's small files into ~one file
    per ``target_rows_per_file`` rows, per partition. Daily upserts and
    streaming micro-batches accrete small files; at 100 TB the fix is a
    periodic per-partition rewrite, NOT a global repartition (which would
    shuffle the whole store). ``partitions`` limits the rewrite to given
    partition values (e.g. yesterday); default compacts everything.

    Returns the number of partitions rewritten. Uses the same dynamic
    partition overwrite as the merge, so concurrent readers never see a
    half-compacted partition directory.
    """
    store = spark.read.parquet(path)
    if partitions is None:
        partitions = [r[0] for r in store.select(partition_col).distinct().collect()]
    if not partitions:
        return 0
    counts = {
        r[0]: r[1]
        for r in store.filter(F.col(partition_col).isin(list(partitions)))
        .groupBy(partition_col)
        .count()
        .collect()
    }
    for value in partitions:
        n_files = max(1, -(-counts.get(value, 0) // target_rows_per_file))  # ceil div
        one = store.filter(F.col(partition_col) == F.lit(value)).repartition(n_files)
        one = one.localCheckpoint(eager=True)  # break lineage before self-overwrite
        (
            one.write.mode("overwrite")
            .partitionBy(partition_col)
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )
    return len(partitions)


def export_excel(
    df: DataFrame,
    path: str,
    sheet_col: str = "symbol",
    max_rows: int = 1_000_000,
) -> int:
    """S17 — Excel export, one sheet per ``sheet_col`` value
    (get_ohlcv.py:26-41: 31-char sheet names, skip-on-error per sheet).

    Excel is a driver-side single-file format, so the frame is collected via
    Arrow — guarded by ``max_rows`` so this can never be pointed at the data
    path. Uses openpyxl when installed; otherwise falls back to the
    dependency-free writer below (xlsx is a zip of XML parts — the minimal
    subset Excel/LibreOffice/pandas all read: inline-string worksheets, no
    styles). Either way the sink is REAL, not a stub.
    """
    import pandas as pd

    n = df.count()
    if n > max_rows:
        raise ValueError(f"refusing driver-side Excel export of {n} rows (max {max_rows})")
    pdf = df.toPandas()
    try:
        import openpyxl  # noqa: F401

        written = 0
        with pd.ExcelWriter(path, engine="openpyxl", datetime_format="yyyy-mm-dd") as writer:
            for key, part in pdf.groupby(sheet_col, sort=True):
                try:
                    part.to_excel(writer, sheet_name=str(key)[:31], index=False)
                    written += 1
                except Exception as exc:  # skip-on-error per sheet, like the reference
                    log.warning("skipping sheet %s: %s", key, exc)
        return written
    except ImportError:
        sheets = []
        for key, part in pdf.groupby(sheet_col, sort=True):
            try:
                rows = [list(part.columns)] + part.astype(object).values.tolist()
                sheets.append((str(key)[:31], rows))
            except Exception as exc:
                log.warning("skipping sheet %s: %s", key, exc)
        write_xlsx_minimal(path, sheets)
        return len(sheets)


def write_xlsx_minimal(path: str, sheets: Sequence[tuple[str, list[list]]]) -> None:
    """Dependency-free .xlsx writer (stdlib zipfile + hand-built OOXML).

    An xlsx file is a zip containing [Content_Types].xml, the package rels,
    xl/workbook.xml (+ its rels), and one worksheet part per sheet. Cells
    are written as inline strings or plain numbers — the minimal profile
    every reader (Excel, LibreOffice, pandas/openpyxl) accepts. Driver-side
    by design: inputs are small final frames, never the data path.

    ``sheets``: [(sheet_name, rows)] where rows[0] is the header.
    """
    import zipfile
    from xml.sax.saxutils import escape

    # cells carry no r= refs (readers accept ordered cells without them)
    def cell_xml(v) -> str:
        if v is None:
            return "<c/>"
        if isinstance(v, bool):
            return f'<c t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
                return f'<c t="inlineStr"><is><t>{v!r}</t></is></c>'
            return f"<c><v>{v!r}</v></c>"
        return f'<c t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    def sheet_xml(rows: list[list]) -> str:
        body = "".join(
            "<row>" + "".join(cell_xml(v) for v in r) + "</row>"
            for r in rows
        )
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{body}</sheetData></worksheet>"
        )

    n = len(sheets)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    from xml.sax.saxutils import quoteattr

    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<sheets>"
        + "".join(
            f"<sheet name={quoteattr(name)} sheetId=\"{i + 1}\" r:id=\"rId{i + 1}\"/>"
            for i, (name, _rows) in enumerate(sheets)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (_name, rows) in enumerate(sheets):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml(rows))


def telegram_notifier(
    transport: Callable[[str, bytes], None] | None = None,
) -> Callable[[str, str], None]:
    """S21 — failure-notification sink (pipeline.py:408-431 `_notify`).

    Returns ``notify(message, severity)``. Reads TELEGRAM_BOT_TOKEN /
    TELEGRAM_CHAT_ID from the environment like the reference; when they are
    unset it logs and returns (the reference's unconfigured path). The HTTP
    POST is injected via ``transport(url, payload)`` so tests run without
    network; send failures are swallowed with a warning, never failing the
    pipeline. Use from ``foreachBatch`` or a StreamingQueryListener.
    """
    import json
    import os

    def _default_transport(url: str, payload: bytes) -> None:
        import urllib.request

        req = urllib.request.Request(
            url=url, data=payload, headers={"Content-Type": "application/json"}, method="POST"
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            resp.read()

    send = transport or _default_transport

    def notify(message: str, severity: str = "info") -> None:
        log.info("Notify [%s]: %s", severity, message)
        token = os.getenv("TELEGRAM_BOT_TOKEN")
        chat_id = os.getenv("TELEGRAM_CHAT_ID")
        if not (token and chat_id):
            return
        url = f"https://api.telegram.org/bot{token}/sendMessage"
        payload = json.dumps({"chat_id": chat_id, "text": message}).encode("utf-8")
        try:
            send(url, payload)
        except Exception as exc:
            log.warning("telegram send failed: %s", exc)

    return notify


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int = 8,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Range-clustered sorted parquet layout: repartitionByRange on the
    cluster key (files hold DISJOINT key ranges) + sortWithinPartitions.

    Why it matters at 100 TB: parquet row-group min/max statistics only
    skip data when values are clustered — a random layout gives every
    row group the full key span and zero skipping. With this layout a
    selective filter on ``cluster_col`` touches 1/n_files of the bytes;
    the disjointness is asserted in tests by reading each file's own
    min/max. (Single-dimension clustering; compose keys for Z-order-ish
    multi-column behavior.)

    repartitionByRange samples the key distribution, so skewed keys still
    yield balanced files (contrast hash-partitioning by a skewed key).
    """
    cols = [cluster_col, *sort_cols]
    (
        df.repartitionByRange(n_files, F.col(cluster_col))
        .sortWithinPartitions(*[F.col(c) for c in cols])
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(
    col_a, lo_a: float, hi_a: float, col_b, lo_b: float, hi_b: float, bits: int = 16
):
    """Z-order (Morton) key over two numeric columns: normalize each to a
    ``bits``-wide integer rank, then interleave the bits — rows close in
    BOTH dimensions get close keys, so range-clustering on the key gives
    every file a small bounding box in (a, b) space and selective filters
    on EITHER column skip most files via row-group min/max stats.

    Pure shift/mask expressions (whole-stage codegen; no UDF). Bounds are
    caller-supplied — at 100 TB derive them once from table statistics, not
    a scan. Skew caveat: normalization is linear; heavily skewed columns
    should pass quantile-ish bounds (p1/p99) so the key space isn't wasted
    on outliers.
    """
    def to_rank(c, lo, hi):
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi) - float(lo))
        clamped = F.least(F.lit(1.0), F.greatest(F.lit(0.0), scaled))
        return F.least(
            F.lit((1 << bits) - 1), F.floor(clamped * F.lit(float(1 << bits))).cast("long")
        )

    ra, rb = to_rank(F.col(col_a) if isinstance(col_a, str) else col_a, lo_a, hi_a), to_rank(
        F.col(col_b) if isinstance(col_b, str) else col_b, lo_b, hi_b
    )
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(ra, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(rb, i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(bit_a, 2 * i + 1) + F.shiftleft(bit_b, 2 * i)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    bounds_a: tuple[float, float],
    col_b: str,
    bounds_b: tuple[float, float],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Two-dimensional clustered layout: range-partition + sort on the
    Z-order key of (col_a, col_b). Single-dimension ``write_clustered``
    makes one column skippable; this makes BOTH partially skippable —
    each file covers ~1/sqrt(n_files) of each dimension's range instead of
    all of one and 1/n_files of the other."""
    z = zorder_key(col_a, *bounds_a, col_b, *bounds_b, bits=bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def shard_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    shard_col: str = "shard",
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global shuffle for training-data export: every row
    gets a 32-bit Knuth-scramble key from its id and a shard in
    ``[0, n_shards)`` from that key. Ordering the corpus by
    (shard, shuffle_key) IS the reproducible global shuffle an LLM
    training run reads — no randomness, so any engine (and the DuckDB
    oracle) derives the identical layout from the ids alone.

    pmod keeps negative ids in range; the multiply wraps for ids >= 2^31
    under the session's pinned ansi.enabled=false (the shared _KNUTH
    convention, operators/features.py:21).
    """
    scramble = F.pmod(
        F.col(id_col).cast("bigint") * F.lit(2654435761), F.lit(4294967296)
    )
    return df.withColumn(key_col, scramble).withColumn(
        shard_col, F.pmod(F.col(key_col), F.lit(n_shards)).cast("int")
    )


def write_sharded(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 8,
    mode: str = "overwrite",
) -> None:
    """Sharded training-data export: ``shard=k/`` directories, rows inside
    each shard ordered by the deterministic shuffle key. The layout every
    epoch-shuffled data loader wants: pick shards, stream files in order,
    get a reproducible global permutation without a terabyte-scale sort.

    One task per shard here (repartition on the shard value), which is
    right while shard count ~ corpus/target-file-size. At 100 TB raise
    n_shards (shards are the parallelism unit downstream too) — the
    repartition stays a single hash exchange; no global sort ever runs
    (contrast orderBy(shuffle_key): a range exchange + full sort of the
    corpus for the same read-side guarantee).
    """
    out = shard_assign(df, id_col, n_shards)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )


def refresh_rollup(
    new_bars: DataFrame,
    daily_store: str,
    rollup_store: str,
    grain: str = "week",
) -> int:
    """Incremental continuous-aggregate maintenance: after a daily-bar
    batch lands (``merge_daily_partitions``), refresh the coarser-grain
    rollup store by recomputing ONLY the periods the batch touches — the
    hypertable continuous-aggregate refresh policy on plain parquet.

    Mechanics: the touched period starts come from the batch (O(periods)
    driver list, like the merge's date list); the daily store is pruned
    with an explicit day-list predicate — ``d IN (days of touched
    periods)`` pushes to the partition/row-group level, where a
    ``trunc(d) IN periods`` predicate would not prune a d-partitioned
    store — re-aggregated with the SAME ``rollup_bars`` the query surface
    uses (one definition, two consumers), and dynamic-partition-overwrite
    rewrites only those period partitions. A late tick for January never
    re-aggregates February; cost is O(touched periods), not O(store).

    Returns the number of refreshed periods.
    """
    import datetime

    from market_data_pipeline_spark.sources.tables import rollup_bars

    spark = new_bars.sparkSession
    periods = [
        r[0]
        for r in new_bars.select(F.trunc("d", grain).alias("p")).distinct().collect()
    ]
    if not periods:
        return 0
    days: list[datetime.date] = []
    for p in periods:
        if grain == "week":
            nxt = p + datetime.timedelta(days=7)
        elif grain in ("month", "mon", "mm"):
            nxt = (p.replace(day=1) + datetime.timedelta(days=32)).replace(day=1)
        else:
            raise ValueError(f"unsupported grain {grain!r} (week/month)")
        cur = p
        while cur < nxt:
            days.append(cur)
            cur += datetime.timedelta(days=1)
    daily = spark.read.parquet(daily_store).filter(F.col("d").isin(days))
    agg = rollup_bars(daily, grain=grain).localCheckpoint(eager=True)
    (
        agg.write.mode("overwrite")
        .partitionBy("period_start")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(rollup_store)
    )
    return len(periods)
