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


def test_y4m_rejects_chroma_and_truncation():
    frames = np.zeros((1, 4, 4), np.uint8)
    data = av.y4m_encode(frames)
    with pytest.raises(NotImplementedError):
        av.y4m_decode(data.replace(b"Cmono", b"C420j"))
    with pytest.raises(ValueError):
        av.y4m_decode(data[:-3])
