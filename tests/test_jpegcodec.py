"""Baseline JPEG codec contracts: structural validity of the emitted
stream, lossy round-trip fidelity bounds, exactness where the math
guarantees it, and loud rejection of unsupported JPEG variants."""

from __future__ import annotations

import numpy as np
import pytest

from market_data_pipeline_spark.operators import imagecodec as ic
from market_data_pipeline_spark.operators import jpegcodec as J


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 / max(w - 1, 1)).astype(np.uint8),
            (yy * 255 / max(h - 1, 1)).astype(np.uint8),
            ((xx + yy) * 255 / max(h + w - 2, 1)).astype(np.uint8),
        ],
        axis=-1,
    )


def test_stream_structure_and_sniff():
    enc = J.jpeg_encode(_gradient(16, 16), quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"
    assert ic.sniff(enc) == "jpeg"
    # the generic dispatch decodes it too
    assert ic.decode(enc).shape == (16, 16, 3)


def test_color_round_trip_psnr():
    img = _gradient(48, 64)
    dec = J.jpeg_decode(J.jpeg_encode(img, quality=90))
    assert dec.shape == img.shape
    assert J.psnr(img, dec) > 40  # smooth content at q90 is near-transparent


def test_noise_round_trip_psnr_floor():
    img = np.random.RandomState(7).randint(0, 256, (32, 32, 3), dtype=np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(img, quality=95))
    assert J.psnr(img, dec) > 30  # worst-case content still bounded


def test_grayscale_and_nonmultiple_of_8_dims():
    img = np.random.RandomState(3).randint(0, 256, (19, 13), dtype=np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(img, quality=95))
    assert dec.shape == (19, 13, 1)  # edge padding cropped back exactly
    assert J.psnr(img[:, :, None], dec) > 30


def test_uniform_image_exact_at_q100():
    for level in (0, 77, 128, 255):
        img = np.full((24, 24, 3), level, np.uint8)
        dec = J.jpeg_decode(J.jpeg_encode(img, quality=100))
        assert int(np.max(np.abs(dec.astype(int) - int(level)))) <= 1


def test_quality_monotone_in_size():
    img = _gradient(40, 40)
    sizes = [len(J.jpeg_encode(img, quality=q)) for q in (10, 50, 95)]
    assert sizes[0] <= sizes[1] <= sizes[2]


def test_progressive_round_trip_matches_baseline_exactly():
    """SOF2 with the full jpegtran-style scan script (spectral selection +
    successive approximation, incl. AC correction bits) quantizes the same
    coefficients as SOF0, so the decoded pixels must be IDENTICAL — a far
    stronger check than a PSNR bound."""
    for img in (_gradient(48, 64),
                np.random.RandomState(7).randint(0, 256, (32, 32, 3), np.uint8)):
        for sub in ("444", "420"):
            base = J.jpeg_decode(J.jpeg_encode(img, quality=95, subsampling=sub))
            penc = J.jpeg_encode(img, quality=95, subsampling=sub, progressive=True)
            i = penc.find(b"\xff\xc2")
            assert i > 0 and penc.find(b"\xff\xc0") == -1  # really SOF2
            assert penc.count(b"\xff\xda") == 10  # multi-scan script
            assert np.array_equal(base, J.jpeg_decode(penc))


def test_progressive_grayscale_and_flat_eobrun():
    """Grayscale script (4 scans) plus a flat image whose all-zero AC
    bands drive the EOBRUN accumulation/flush paths on both sides."""
    gray = np.random.RandomState(3).randint(0, 256, (19, 13), np.uint8)
    assert np.array_equal(
        J.jpeg_decode(J.jpeg_encode(gray, quality=95)),
        J.jpeg_decode(J.jpeg_encode(gray, quality=95, progressive=True)),
    )
    flat = np.full((40, 40, 3), 77, np.uint8)
    assert np.array_equal(
        J.jpeg_decode(J.jpeg_encode(flat, quality=90)),
        J.jpeg_decode(J.jpeg_encode(flat, quality=90, progressive=True)),
    )


def test_restart_intervals_round_trip():
    """DRI + RSTn: restart markers byte-align the stream and reset DC
    prediction (and EOB runs) every N MCUs; decode must equal the
    no-restart stream exactly, sequential and progressive alike."""
    img = _gradient(48, 64)
    ref = J.jpeg_decode(J.jpeg_encode(img, quality=90))
    for ri in (1, 3):
        for prog in (False, True):
            enc = J.jpeg_encode(img, quality=90, progressive=prog,
                                restart_interval=ri)
            assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
            assert np.array_equal(ref, J.jpeg_decode(enc))


def test_rejects_truncation_and_unsupported_frames():
    with pytest.raises(ValueError):
        J.jpeg_decode(b"\x00\x01\x02\x03")
    enc = bytearray(J.jpeg_encode(_gradient(16, 16)))
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC3  # lossless sequential — a named gap
    with pytest.raises(NotImplementedError):
        J.jpeg_decode(bytes(enc))


def test_rejects_non_8bit_sample_precision():
    """SOF1 permits 12-bit samples; the decoder's level shift assumes 8,
    so anything else must raise, never decode to silent garbage."""
    enc = bytearray(J.jpeg_encode(_gradient(16, 16)))
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 4] = 12  # marker(2) + length(2) -> sample-precision byte
    with pytest.raises(NotImplementedError, match="precision"):
        J.jpeg_decode(bytes(enc))


def test_420_subsampling_round_trip():
    """4:2:0 exercises the decoder's generic MCU interleave + chroma
    upsampling path: smaller payload than 4:4:4, luma-faithful output on
    smooth content, exact geometry on odd (non-MCU-aligned) dims."""
    img = _gradient(48, 64)
    e444 = J.jpeg_encode(img, quality=90, subsampling="444")
    e420 = J.jpeg_encode(img, quality=90, subsampling="420")
    assert len(e420) < len(e444)
    dec = J.jpeg_decode(e420)
    assert dec.shape == img.shape
    assert J.psnr(img, dec) > 35  # chroma halved, smooth content survives

    odd = _gradient(21, 35)
    d2 = J.jpeg_decode(J.jpeg_encode(odd, quality=95, subsampling="420"))
    assert d2.shape == odd.shape
    assert J.psnr(odd, d2) > 35

    with pytest.raises(ValueError):
        J.jpeg_encode(img, subsampling="422")
