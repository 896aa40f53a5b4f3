"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The IMAGE decode path is REAL: PNG and BMP are parsed by the dependency-free
codec in ``imagecodec.py`` (zlib inflate + full filter reconstruction +
CRC), so ``documents_as_png`` → ``extract_image_stats`` / ``resize_images``
is a true encode→decode→process round trip. Audio/video remain STUBS
(deterministic fakes clearly marked — no ffmpeg in the container). At
100 TB the rules encoded here: binary payloads never pass through a shuffle
you can avoid (derive features, then drop the blob), and batch memory =
maxRecordsPerBatch × payload size, tuned at the reader.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media-shaped table from documents: the text bytes stand in for
    an encoded payload. This is how binary columns enter the engine —
    ``binary`` + a typed metadata struct, no parsing at scan time."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            (F.length(F.col(text_col)) % 640 + 16).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 480 + 16).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> bytes:
    """STUB decode: a real pipeline calls PIL/ffmpeg here. Deterministic fake:
    identity. Raises for None to mirror codec failure paths."""
    if payload is None:
        raise NotImplementedError("decode of null payload (no codec in container)")
    return payload


def extract_media_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode → feature-extract over ``mapInPandas``: per Arrow batch, emit
    (media_id, n_bytes, byte_mean, head_hash). The blob is dropped in the
    output schema — features travel, payloads don't."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("byte_mean", T.DoubleType(), True),
            T.StructField("head_hash", T.StringType(), True),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = _fake_decode(bytes(payload))
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(raw),
                        "byte_mean": round(sum(raw) / len(raw), 6) if raw else None,
                        # fingerprint of the head bytes, hashed via their
                        # UPPERCASE hex so any engine (DuckDB md5 is
                        # VARCHAR-only) can reproduce it byte-for-byte
                        "head_hash": hashlib.md5(
                            raw[:64].hex().upper().encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "byte_mean", "head_hash"])

    return df.select("media_id", "payload").mapInPandas(feats, schema=out_schema)


def documents_as_png(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", width: int = 32
) -> DataFrame:
    """Build a media table with REAL PNG payloads: the document's UTF-8
    bytes become a zero-padded ``width``-wide grayscale image, encoded by
    the stdlib codec. Deterministic, loss-free (the text bytes are literally
    the pixel values), and every downstream decode is a true codec path —
    the fixture generator for the image operators, and the pattern a real
    ingest uses to wrap raw bytes into typed media rows."""
    from market_data_pipeline_spark.operators import imagecodec as ic

    out_schema = MEDIA_SCHEMA

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, txt in zip(pdf[id_col], pdf[text_col]):
                raw = (txt or "").encode("utf-8")
                h = max(1, -(-len(raw) // width))
                buf = np.zeros(h * width, dtype=np.uint8)
                buf[: len(raw)] = np.frombuffer(raw, np.uint8)
                payload = ic.png_encode(buf.reshape(h, width, 1))
                rows.append(
                    {
                        "media_id": mid,
                        "payload": payload,
                        "meta": {
                            "kind": "image/png",
                            "width": width,
                            "height": h,
                            "n_bytes": len(payload),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    return df.select(id_col, text_col).mapInPandas(encode, schema=out_schema)


def extract_image_stats(df: DataFrame) -> DataFrame:
    """REAL decode → per-image stats: dimensions and channel count from the
    parsed header, pixel sum/mean from the reconstructed pixel buffer. The
    blob is dropped in the output — features travel, payloads don't."""
    from market_data_pipeline_spark.operators import imagecodec as ic

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("px_sum", T.LongType(), True),
            T.StructField("px_mean", T.DoubleType(), True),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = ic.decode(bytes(payload))
                h, w, c = img.shape
                total = int(img.sum(dtype="int64"))
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "px_sum": total,
                        "px_mean": round(total / img.size, 6),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels", "px_sum", "px_mean"],
            )

    return df.select("media_id", "payload").mapInPandas(stats, schema=out_schema)


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """REAL resize: decode (PNG/BMP) → nearest-neighbor index map →
    re-encode PNG. Output payloads are valid PNGs of the target size and
    the metadata is derived from the actually-decoded image, not assumed."""
    from market_data_pipeline_spark.operators import imagecodec as ic

    out_schema = MEDIA_SCHEMA

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = ic.decode(bytes(payload))
                small = ic.resize_nearest(img, target_w, target_h)
                out = ic.png_encode(small)
                rows.append(
                    {
                        "media_id": mid,
                        "payload": out,
                        "meta": {
                            "kind": "image/png",
                            "width": target_w,
                            "height": target_h,
                            "n_bytes": len(out),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    return df.select("media_id", "payload").mapInPandas(resize, schema=out_schema)


def resize_stub(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """STUB resize: records the would-be output dims in metadata without
    decoding (no codec available). The schema/plumbing is the deliverable."""
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.kind").alias("kind"),
            F.lit(target_w).alias("width"),
            F.lit(target_h).alias("height"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB video frame sampling: emits (media_id, frame_no) rows for frames
    0, n, 2n … derived from payload length — the explode-shaped plumbing a
    real sampler uses."""
    n_frames = (F.col("meta.n_bytes") / 100).cast("int") + 1
    frames = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select("media_id", F.explode(frames).alias("frame_no"))
