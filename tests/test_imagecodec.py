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
    # GIF now dispatches to the real LZW codec (round 5) — malformed
    # payload is a loud parse error, not an unimplemented format
    assert ic.sniff(b"GIF89a truncated stream") == "gif"
    with pytest.raises(ValueError):
        ic.decode(b"GIF89a truncated stream")
    # genuinely unknown magic still names the gap
    with pytest.raises(NotImplementedError):
        ic.decode(b"II*\x00 tiff is not a codec we ship")


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


def test_png_adam7_interlace_round_trip():
    """Adam7: seven independently-filtered sub-images; the deinterlaced
    result must be bit-identical to the sequential layout for every
    channel count, filter type, and awkward (pass-degenerate) dims."""
    rng = np.random.RandomState(7)
    for ft in (0, 2, 4):
        for dims in ((13, 17, 3), (1, 1, 1), (3, 9, 4), (7, 2, 2)):
            img = rng.randint(0, 256, dims, np.uint8)
            enc = ic.png_encode(img, filter_type=ft, interlace=True)
            assert np.array_equal(ic.png_decode(enc), img), (ft, dims)


def test_png_16bit_reduces_to_high_byte():
    rng = np.random.RandomState(8)
    img16 = rng.randint(0, 65536, (11, 5, 3)).astype(np.uint16)
    for inter in (False, True):
        dec = ic.png_decode(ic.png_encode(img16, depth=16, interlace=inter))
        assert dec.dtype == np.uint8
        assert np.array_equal(dec, (img16 >> 8).astype(np.uint8))


def test_png_palette_round_trip_all_depths():
    """Color type 3 at depths 1/2/4/8 (packed indices) with PLTE, plus
    tRNS alpha for RGBA input — exact round trips."""
    rng = np.random.RandomState(9)
    for depth, ncol in ((8, 200), (4, 16), (2, 4), (1, 2)):
        pal = rng.randint(0, 256, (ncol, 3), np.uint8)
        img = pal[rng.randint(0, ncol, (10, 14))]
        for inter in (False, True):
            enc = ic.png_encode_palette(img, depth=depth, interlace=inter)
            assert np.array_equal(ic.png_decode(enc), img), (depth, inter)
    rgba = np.dstack([
        pal[rng.randint(0, 2, (6, 6))],
        rng.randint(0, 256, (6, 6), np.uint8),
    ])
    assert np.array_equal(ic.png_decode(ic.png_encode_palette(rgba)), rgba)
    with pytest.raises(ValueError):
        gradient = np.arange(3 * 300, dtype=np.uint8).reshape(10, 30, 3)
        ic.png_encode_palette(gradient, depth=2)  # too many colors


def test_png_sub8bit_grayscale_scales_to_full_range():
    """Hand-built 1-bit grayscale stream: decoder unpacks MSB-first bits
    and scales to 0/255 (RFC sample scaling)."""
    import struct
    import zlib

    rng = np.random.RandomState(10)
    w, h = 10, 3
    bits = rng.randint(0, 2, (h, w), np.uint8)
    rows = np.packbits(bits, axis=1)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 0)
    png = (ic.PNG_MAGIC + ic._png_chunk(b"IHDR", ihdr)
           + ic._png_chunk(b"IDAT", zlib.compress(raw))
           + ic._png_chunk(b"IEND", b""))
    assert np.array_equal(ic.png_decode(png)[:, :, 0], bits * 255)
