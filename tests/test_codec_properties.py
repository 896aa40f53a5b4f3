"""Property-based round-trip tests (hypothesis) for the dependency-free
codecs — beyond the fixed fixtures in test_imagecodec/test_avcodec, these
drive randomized shapes and values through encode→decode and assert
byte-exact identity."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from market_data_pipeline_spark.operators import avcodec as av
from market_data_pipeline_spark.operators import imagecodec as ic


def _img(h, w, c, seed):
    return np.random.RandomState(seed).randint(0, 256, (h, w, c)).astype(np.uint8)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    f=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_round_trip_property(h, w, c, f, seed):
    img = _img(h, w, c, seed)
    assert np.array_equal(ic.png_decode(ic.png_encode(img, filter_type=f)), img)


@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
def test_bmp_round_trip_property(h, w, seed):
    img = _img(h, w, 3, seed)
    assert np.array_equal(ic.bmp_decode(ic.bmp_encode(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 500),
    channels=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_round_trip_property(n, channels, rate, seed):
    s = (
        np.random.RandomState(seed)
        .randint(-32768, 32768, (n, channels))
        .astype(np.int16)
    )
    out, got_rate = av.wav_decode(av.wav_encode(s, sample_rate=rate))
    assert got_rate == rate
    assert np.array_equal(out, s)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(0, 6),
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_round_trip_property(n, h, w, seed):
    frames = np.random.RandomState(seed).randint(0, 256, (n, h, w)).astype(np.uint8)
    out, fps = av.y4m_decode(av.y4m_encode(frames, fps=(24, 1)))
    assert fps == (24, 1)
    assert out.shape == (n, h, w)
    assert np.array_equal(out, frames)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    th=st.integers(1, 30),
    tw=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_nearest_samples_source_pixels(h, w, th, tw, seed):
    """Every output pixel of nearest-neighbor resize IS some source pixel
    (floor index map), and corners map to corners."""
    img = _img(h, w, 3, seed)
    out = ic.resize_nearest(img, tw, th)
    assert out.shape == (th, tw, 3)
    assert np.array_equal(out[0, 0], img[0, 0])
    src_rows = {bytes(r) for r in img.reshape(-1, 3)}
    assert all(bytes(p) in src_rows for p in out.reshape(-1, 3))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 3]),
    q=st.integers(70, 100),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_round_trip_property(h, w, c, q, seed):
    """JPEG is lossy, so the property is bounded error, not identity:
    dims/channels survive exactly, PSNR stays above the worst-case floor
    for uniform-random content at quality >= 70."""
    from market_data_pipeline_spark.operators import jpegcodec as J

    img = _img(h, w, c, seed)
    dec = J.jpeg_decode(J.jpeg_encode(img, quality=q))
    assert dec.shape == (h, w, c)
    # 15 dB floor: a tiny (e.g. 2x2) pure-noise patch at q=70 legitimately
    # lands near ~19 dB — chroma quantization steps are large and the
    # padded 8x8 block is mostly extrapolation. Structured content is
    # covered by the tighter fixed-case floors in test_jpegcodec.py.
    assert J.psnr(img, dec) > 15


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    f=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_adam7_round_trip_property(h, w, c, f, seed):
    """Interlaced layout must be bit-identical to sequential for any
    shape — including dims where some Adam7 passes are empty."""
    img = _img(h, w, c, seed)
    enc = ic.png_encode(img, filter_type=f, interlace=True)
    assert np.array_equal(ic.png_decode(enc), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    depth=st.sampled_from([1, 2, 4, 8]),
    f=st.integers(0, 4),
    inter=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_palette_round_trip_property(h, w, depth, f, inter, seed):
    rng = np.random.RandomState(seed)
    ncol = min(1 << depth, 1 + rng.randint(1, 1 << depth) if depth > 1 else 2)
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    img = pal[rng.randint(0, ncol, (h, w))]
    enc = ic.png_encode_palette(img, depth=depth, filter_type=f, interlace=inter)
    assert np.array_equal(ic.png_decode(enc), img)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    gray=st.booleans(),
    q=st.sampled_from([70, 90, 100]),
    sub=st.sampled_from(["444", "420"]),
    ri=st.sampled_from([0, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_progressive_equals_baseline_property(h, w, gray, q, sub, ri, seed):
    """Progressive and baseline quantize identical coefficients, so their
    decodes must be IDENTICAL arrays for any shape/quality/subsampling/
    restart interval."""
    from market_data_pipeline_spark.operators import jpegcodec as J

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w) if gray else (h, w, 3)).astype(np.uint8)
    base = J.jpeg_decode(
        J.jpeg_encode(img, quality=q, subsampling=sub, restart_interval=ri)
    )
    prog = J.jpeg_decode(
        J.jpeg_encode(img, quality=q, subsampling=sub, progressive=True,
                      restart_interval=ri)
    )
    assert np.array_equal(base, prog)
