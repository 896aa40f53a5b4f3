"""Round-trip tests for the dependency-free WAV/Y4M codecs
(operators/avcodec.py) — the real parse paths behind the multimodal audio
and video operators."""

import numpy as np
import pytest

from market_data_pipeline_spark.operators import avcodec as av


def test_wav_round_trip_mono_and_stereo():
    rng = np.random.RandomState(3)
    mono = rng.randint(-32768, 32768, 777).astype(np.int16)
    data = av.wav_encode(mono, sample_rate=8000)
    s, rate = av.wav_decode(data)
    assert rate == 8000 and s.shape == (777, 1)
    assert np.array_equal(s[:, 0], mono)

    stereo = rng.randint(-32768, 32768, (100, 2)).astype(np.int16)
    s2, rate2 = av.wav_decode(av.wav_encode(stereo, sample_rate=44100))
    assert rate2 == 44100 and np.array_equal(s2, stereo)


def test_wav_tolerates_extra_chunks_and_rejects_non_pcm():
    import struct

    mono = np.arange(10, dtype=np.int16)
    data = bytearray(av.wav_encode(mono))
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(data[:fmt_end]) + extra + bytes(data[fmt_end:])
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + b"WAVE" + spliced[12:]
    s, _ = av.wav_decode(spliced)
    assert np.array_equal(s[:, 0], mono)

    with pytest.raises(ValueError):
        av.wav_decode(b"OggS fake audio stream")


def test_y4m_round_trip_and_header():
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, (7, 6, 8)).astype(np.uint8)
    data = av.y4m_encode(frames, fps=(30, 1))
    assert data.startswith(b"YUV4MPEG2 W8 H6 F30:1")
    out, fps = av.y4m_decode(data)
    assert fps == (30, 1)
    assert np.array_equal(out, frames)


def test_y4m_rejects_unknown_chroma_and_truncation():
    frames = np.zeros((1, 4, 4), np.uint8)
    data = av.y4m_encode(frames)
    with pytest.raises(NotImplementedError):
        av.y4m_decode(data.replace(b"Cmono", b"C411 "))
    with pytest.raises(ValueError):
        av.y4m_decode(data[:-3])


def test_y4m_planar_color_spaces_round_trip_luma():
    """C420/C422/C444 framing: chroma planes advance the cursor exactly,
    so the luma round trip is byte-identical across all layouts."""
    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, (3, 6, 8)).astype(np.uint8)
    for cs in ("C420", "C420jpeg", "C420mpeg2", "C422", "C444"):
        data = av.y4m_encode(frames, fps=(24, 1), colorspace=cs)
        assert f" {cs}\n".encode() in data[:64]
        out, fps = av.y4m_decode(data)
        assert fps == (24, 1) and np.array_equal(out, frames), cs
    with pytest.raises(ValueError):
        av.y4m_encode(np.zeros((1, 5, 5), np.uint8), colorspace="C420")


def test_wav_float32_and_pcm8_and_extensible():
    import struct

    rng = np.random.RandomState(11)
    # IEEE float-32 payload survives bit-exactly with its dtype
    f = (rng.rand(200, 2).astype(np.float32) - 0.5) * 2
    s, rate = av.wav_decode(av.wav_encode(f, sample_rate=22050, fmt="float32"))
    assert rate == 22050 and s.dtype == np.float32 and np.array_equal(s, f)

    # unsigned PCM-8 widens losslessly to int16 (offset-binary, x256)
    mono = np.arange(10, dtype=np.int16)
    data = bytearray(av.wav_encode(mono))
    raw8 = bytes((np.arange(10) + 128).astype(np.uint8))
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt8
            + b"data" + struct.pack("<I", len(raw8)) + raw8)
    wav8 = b"RIFF" + struct.pack("<I", len(body)) + body
    s8, _ = av.wav_decode(wav8)
    assert s8.dtype == np.int16
    assert np.array_equal(s8[:, 0], np.arange(10) * 256)

    # WAVE_FORMAT_EXTENSIBLE resolving to PCM decodes like plain PCM
    pcm = rng.randint(-32768, 32768, 64).astype(np.int16)
    plain = av.wav_encode(pcm, sample_rate=16000)
    guid = struct.pack("<H", 1) + b"\x00\x00" + bytes(12)
    fmt_ext = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16) \
        + struct.pack("<HHI", 22, 16, 0x4) + guid
    raw = pcm.astype("<i2").tobytes()
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_ext)) + fmt_ext
            + b"data" + struct.pack("<I", len(raw)) + raw)
    wav_ext = b"RIFF" + struct.pack("<I", len(body)) + body
    se, re_ = av.wav_decode(wav_ext)
    assert re_ == 16000 and np.array_equal(se[:, 0], pcm)

    # compressed payloads stay a NAMED gap
    fmt_adpcm = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt_adpcm
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        av.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)
