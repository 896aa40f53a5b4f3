"""Streaming surface: the stream result on a finite file set must equal the
batch plan on the same data. Multimodal: feature extraction over binary
payloads via mapInPandas."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import multimodal
from market_data_pipeline_spark.sources.tables import load_table
from market_data_pipeline_spark.streaming import jobs


def test_tumbling_stream_equals_batch(spark, sf_dir):
    ev = jobs.stream_events(spark, sf_dir)
    streamed = jobs.run_stream_to_memory(
        spark, jobs.tumbling_window_agg(ev, width="1 hour"), "t_tumble"
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("win_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


def test_streaming_dedup_passthrough_on_unique_keys(spark, sf_dir):
    ev = jobs.stream_events(spark, sf_dir)
    out = jobs.run_stream_to_memory(
        spark,
        jobs.streaming_dedup(ev).select("event_id"),
        "t_dedup",
        output_mode="append",
    )
    n_stream = out.count()
    n_batch = load_table(spark, sf_dir, "events").count()
    assert n_stream == n_batch  # (user_id, ts) unique in the synthetic data


def test_session_batch_boundaries(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=10), 2.0),
        (1, base + dt.timedelta(minutes=50), 3.0),  # 40 min gap → new session
        (2, base, 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = jobs.session_windows_batch(df, gap_minutes=30).collect()
    sessions = {(r.user_id, r.session_id): r.n_events for r in out}
    assert sessions == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_media_features_oracle(spark):
    df = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    media = multimodal.documents_as_media(df)
    feats = multimodal.extract_media_features(media).collect()[0]
    raw = b"abc"
    assert feats.media_id == 7
    assert feats.n_bytes == 3
    assert abs(feats.byte_mean - sum(raw) / 3) < 1e-9
    # portable fingerprint: md5 over the UPPERCASE hex of the head bytes
    assert feats.head_hash == hashlib.md5(raw[:64].hex().upper().encode()).hexdigest()


def test_resize_stub_rewrites_meta(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    media = multimodal.resize_stub(multimodal.documents_as_media(df))
    m = media.collect()[0].meta
    assert (m.width, m.height) == (224, 224)
    assert m.n_bytes == 5


def test_real_png_roundtrip_stats(spark):
    """documents_as_png emits REAL PNGs; extract_image_stats decodes them
    with the stdlib codec: dims from the header, px_sum == sum of the
    text's UTF-8 bytes (zero padding adds nothing)."""
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "x" * 40), (3, "")], "doc_id long, text string"
    )
    media = multimodal.documents_as_png(df, width=32)
    from market_data_pipeline_spark.operators import imagecodec as ic

    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert all(p[:8] == ic.PNG_MAGIC for p in payloads.values())
    stats = {r.media_id: r for r in multimodal.extract_image_stats(media).collect()}
    assert (stats[1].width, stats[1].height, stats[1].channels) == (32, 1, 1)
    assert stats[1].px_sum == sum(b"abcdef")
    assert (stats[2].width, stats[2].height) == (32, 2)  # 40 bytes → 2 rows
    assert stats[2].px_sum == sum(b"x" * 40)
    assert (stats[3].height, stats[3].px_sum) == (1, 0)  # empty → 1 zero row


def test_real_resize_produces_decodable_target_size(spark):
    """resize_images re-encodes a REAL PNG at the target size whose decoded
    pixels are the nearest-neighbor map of the source."""
    import numpy as np

    from market_data_pipeline_spark.operators import imagecodec as ic

    df = spark.createDataFrame([(5, "0123456789abcdef" * 8)], "doc_id long, text string")
    media = multimodal.documents_as_png(df, width=32)  # 128 bytes → 32x4
    small = multimodal.resize_images(media, target_w=8, target_h=2)
    row = small.collect()[0]
    img = ic.decode(bytes(row.payload))
    assert img.shape == (2, 8, 1)
    assert (row.meta.width, row.meta.height) == (8, 2)
    src = ic.decode(bytes(media.collect()[0].payload))
    assert np.array_equal(img, ic.resize_nearest(src, 8, 2))


def test_real_wav_roundtrip_stats(spark):
    """documents_as_wav emits REAL RIFF/WAVE; extract_audio_stats decodes:
    n_samples = ceil(bytes/2), amp_sum = sum of the LE int16 samples."""
    import numpy as np

    df = spark.createDataFrame([(1, "abc"), (2, "")], "doc_id long, text string")
    stats = {r.media_id: r for r in multimodal.extract_audio_stats(
        multimodal.documents_as_wav(df, sample_rate=8000)
    ).collect()}
    raw = b"abc\x00"
    want = int(np.frombuffer(raw, dtype="<i2").sum())
    assert (stats[1].n_samples, stats[1].channels, stats[1].sample_rate) == (2, 1, 8000)
    assert stats[1].amp_sum == want
    assert (stats[2].n_samples, stats[2].amp_sum) == (0, 0)


def test_real_y4m_frame_sample(spark):
    """documents_as_y4m emits a REAL YUV4MPEG2 stream; frame_sample decodes
    and keeps every Nth frame with its luma sum."""
    txt = "z" * 600  # 600 bytes → 3 frames of 256 (zero-padded)
    df = spark.createDataFrame([(9, txt)], "doc_id long, text string")
    media = multimodal.documents_as_y4m(df, frame_w=16, frame_h=16)
    assert bytes(media.collect()[0].payload).startswith(b"YUV4MPEG2 W16 H16")
    out = {r.frame_no: r.y_sum for r in multimodal.frame_sample(media, every_n=2).collect()}
    z = ord("z")
    assert out == {0: 256 * z, 2: (600 - 512) * z}  # frame 1 skipped


def test_stateful_running_totals_matches_batch(spark, sf_dir):
    """applyInPandasWithState final emissions == batch groupBy aggregate."""
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.sources.tables import load_table
    from market_data_pipeline_spark.streaming import stateful

    ev = jobs.stream_events(spark, sf_dir)
    out = jobs.run_stream_to_memory(
        spark, stateful.running_totals(ev), "stateful_t", output_mode="update"
    )
    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .collect()
    }
    batch = {
        r.user_id: (r.n, r.tv)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("value").alias("n"), F.round(F.sum("value"), 4).alias("tv"))
        .collect()
    }
    assert final == batch


def test_streaming_anomaly_zscore_matches_batch_prefix_scan(spark, sf_dir, tmp_path):
    """The stateful Welford detector, driven across TWO micro-batches (state
    must survive the batch boundary), flags exactly the rows a batch
    prefix-window z-score flags."""
    import time as _time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.sources.tables import load_table
    from market_data_pipeline_spark.streaming import stateful

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    src = str(tmp_path / "anom_src")
    cut = ev.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    first = ev.filter(F.unix_micros("ts") <= cut)
    second = ev.filter(F.unix_micros("ts") > cut)
    first.coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)  # distinct mtimes -> deterministic file order
    second.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(first.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    flagged = stateful.streaming_anomaly_zscore(stream, threshold=2.0, min_obs=10)
    got = jobs.run_stream_to_memory(spark, flagged, "anom_stream", output_mode="append")
    got_ids = {r.event_id for r in got.filter(F.col("is_anomaly")).collect()}

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batch = (
        ev.withColumn("__n", F.count("value").over(w))
        .withColumn("__mu", F.avg("value").over(w))
        .withColumn("__sd", F.stddev_samp("value").over(w))
        .filter((F.col("__n") >= 10) & (F.col("__sd") > 0))
        .withColumn("__z", (F.col("value") - F.col("__mu")) / F.col("__sd"))
        .filter(F.abs("__z") > 2.0)
    )
    want_ids = {r.event_id for r in batch.collect()}
    assert got_ids == want_ids
    assert len(want_ids) > 0
