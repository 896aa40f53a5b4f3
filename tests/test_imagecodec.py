"""Round-trip and cross-format tests for the dependency-free PNG/BMP codec
(operators/imagecodec.py) — the real decode path behind the multimodal
operators."""

import numpy as np
import pytest

from market_data_pipeline_spark.operators import imagecodec as ic


def _gradient(h, w, c):
    rng = np.random.RandomState(42)
    base = (np.arange(h)[:, None, None] * 7 + np.arange(w)[None, :, None] * 3) % 256
    noise = rng.randint(0, 256, (h, w, c))
    return ((base + noise) % 256).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip_all_filters_all_colors(channels, filter_type):
    img = _gradient(13, 17, channels)
    data = ic.png_encode(img, filter_type=filter_type)
    assert data[:8] == ic.PNG_MAGIC
    out = ic.png_decode(data)
    assert out.shape == (13, 17, channels)
    assert np.array_equal(out, img)


def test_png_crc_validated():
    img = _gradient(4, 4, 3)
    data = bytearray(ic.png_encode(img))
    data[40] ^= 0xFF  # corrupt a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        ic.png_decode(bytes(data))


def test_bmp_round_trip_with_padding():
    # width 5 → stride 15 pads to 16: exercises the 4-byte row padding
    img = _gradient(6, 5, 3)
    data = ic.bmp_encode(img)
    assert data[:2] == b"BM"
    out = ic.bmp_decode(data)
    assert np.array_equal(out, img)


def test_cross_format_same_pixels():
    img = _gradient(8, 8, 3)
    assert np.array_equal(ic.decode(ic.png_encode(img)), ic.decode(ic.bmp_encode(img)))


def test_sniff_and_unknown_raises():
    img = _gradient(2, 2, 3)
    assert ic.sniff(ic.png_encode(img)) == "png"
    assert ic.sniff(ic.bmp_encode(img)) == "bmp"
    # JPEG magic now dispatches to the REAL baseline codec — a truncated
    # stream is a loud parse error, not an unimplemented format
    assert ic.sniff(b"\xff\xd8\xff\xe0 fake jpeg") == "jpeg"
    with pytest.raises(ValueError):
        ic.decode(b"\xff\xd8\xff\xe0 fake jpeg")
    # genuinely unknown magic still names the gap
    with pytest.raises(NotImplementedError):
        ic.decode(b"GIF89a not a codec we ship")


def test_resize_nearest():
    img = _gradient(10, 20, 3)
    small = ic.resize_nearest(img, 5, 4)
    assert small.shape == (4, 5, 3)
    # corner pixels map to source corners under floor mapping
    assert np.array_equal(small[0, 0], img[0, 0])
    up = ic.resize_nearest(img, 40, 20)
    assert up.shape == (20, 40, 3)
    # upscale duplicates, never invents values
    assert set(np.unique(up)).issubset(set(np.unique(img)))
