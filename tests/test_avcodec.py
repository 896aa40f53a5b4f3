"""Round-trip tests for the dependency-free WAV/Y4M codecs
(operators/avcodec.py) — the real parse paths behind the multimodal audio
and video operators."""

import struct

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
    # high-bit-depth packings stay a NAMED gap (C411 decodes since r6)
    with pytest.raises(NotImplementedError):
        av.y4m_decode(data.replace(b"Cmono", b"C420p10").replace(b"W4", b"W4"))
    with pytest.raises(ValueError):
        av.y4m_decode(data[:-3])


def test_y4m_planar_color_spaces_round_trip_luma():
    """C420/C422/C444 framing: chroma planes advance the cursor exactly,
    so the luma round trip is byte-identical across all layouts."""
    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, (3, 6, 8)).astype(np.uint8)
    for cs in ("C420", "C420jpeg", "C420mpeg2", "C422", "C411", "C444"):
        data = av.y4m_encode(frames, fps=(24, 1), colorspace=cs)
        assert f" {cs}\n".encode() in data[:64]
        out, fps = av.y4m_decode(data)
        assert fps == (24, 1) and np.array_equal(out, frames), cs
    with pytest.raises(ValueError):
        av.y4m_encode(np.zeros((1, 5, 5), np.uint8), colorspace="C420")
    with pytest.raises(ValueError):
        av.y4m_encode(np.zeros((1, 4, 6), np.uint8), colorspace="C411")
    # interlaced streams store full frames — luma extraction unchanged
    data = av.y4m_encode(frames, colorspace="C420").replace(b" Ip ", b" It ")
    out, _ = av.y4m_decode(data)
    assert np.array_equal(out, frames)


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

    # still-unimplemented payloads stay a NAMED gap (0x55 = MP3-in-WAV)
    fmt_mp3 = struct.pack("<HHIIHH", 0x55, 1, 8000, 4000, 1, 0)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt_mp3
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        av.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def _ima_encode_block(samples, idx0=0):
    """Independent in-test IMA ADPCM encoder (mono block): header carries
    sample 0 verbatim; each later sample quantizes its delta to a nibble
    by mirroring the decoder's reconstruction (the standard encoder)."""
    steps = av._IMA_STEPS
    adj = av._IMA_INDEX_ADJ
    pred, idx = int(samples[0]), idx0
    nibs = []
    for s in samples[1:]:
        step = steps[idx]
        diff = int(s) - pred
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        # mirror the decoder to track its state exactly
        step = steps[idx]
        d = step >> 3
        if nib & 4:
            d += step
        if nib & 2:
            d += step >> 1
        if nib & 1:
            d += step >> 2
        pred = pred - d if nib & 8 else pred + d
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + adj[nib]))
        nibs.append(nib)
    body = bytes()
    for i in range(0, len(nibs), 2):
        lo = nibs[i]
        hi = nibs[i + 1] if i + 1 < len(nibs) else 0
        body += bytes([lo | (hi << 4)])
    return struct.pack("<hBB", int(samples[0]), idx0, 0) + body


def test_wav_ima_adpcm_decodes_bit_exact_and_tracks_signal():
    """IMA ADPCM (format 0x0011): engine decode must reproduce the
    independent encoder's tracked decoder state bit-exactly, and the
    reconstruction must track the source sine within ADPCM error."""
    import numpy as np

    n = 505  # 1 header sample + 504 nibbles = 63 groups of 8
    t = np.arange(n)
    sig = (3000 * np.sin(2 * np.pi * t / 40)).astype(np.int16)
    block = _ima_encode_block(sig, idx0=0)
    block_align = len(block)  # one block holding the whole signal
    fmt = struct.pack("<HHIIHH", 0x0011, 1, 8000, 4055, block_align, 4)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(block)) + block
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    decoded, rate = av.wav_decode(wav)
    assert rate == 8000 and decoded.shape == (n, 1)
    # bit-exact vs the encoder's mirrored decoder state
    pred, idx = int(sig[0]), 0
    want = [pred]
    steps, adj = av._IMA_STEPS, av._IMA_INDEX_ADJ
    data = block[4:]
    for b in data:
        for nib in (b & 0xF, b >> 4):
            step = steps[idx]
            d = step >> 3
            if nib & 4:
                d += step
            if nib & 2:
                d += step >> 1
            if nib & 1:
                d += step >> 2
            pred = pred - d if nib & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + adj[nib]))
            want.append(pred)
    assert decoded[:, 0].tolist() == want[: n]
    # and the lossy reconstruction really tracks the signal
    err = np.abs(decoded[: n, 0].astype(np.int64) - sig.astype(np.int64))
    assert np.median(err) < 200 and err.max() < 2000


def test_wav_g711_mulaw_alaw_decode():
    """G.711 expansion must match the canonical reference: spot-check the
    defining code points and verify a round trip through an independent
    in-test compressor lands within one quantization segment."""
    mu, al = av._mulaw_table(), av._alaw_table()
    # canonical anchors (Sun ulaw2linear/alaw2linear reference tables):
    assert mu[0xFF] == 0 and mu[0x7F] == 0  # positive and "negative" zero
    assert mu[0x00] == -32124 and mu[0x80] == 32124  # full scale
    assert mu.min() == -32124 and mu.max() == 32124
    assert al[0xD5] == 8 and al[0x55] == -8  # near-zero codes
    assert al[0xAA] == 32256 and al[0x2A] == -32256  # full scale
    assert al.min() == -32256 and al.max() == 32256

    def wav(fmt_tag, codes, ch=1, rate=8000):
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * ch, ch, 8)
            + b"data" + struct.pack("<I", len(codes)) + codes
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # decode every possible byte once: output must equal the table
    allb = bytes(range(256))
    s, r = av.wav_decode(wav(7, allb))
    assert r == 8000 and s.shape == (256, 1)
    assert np.array_equal(s[:, 0], mu)
    s, _ = av.wav_decode(wav(6, allb))
    assert np.array_equal(s[:, 0], al)
    # stereo framing
    s, _ = av.wav_decode(wav(7, allb, ch=2))
    assert s.shape == (128, 2)


def test_g711_tables_match_cpython_reference():
    """Full 256-entry parity with CPython's audioop (the Sun reference
    implementation); guarded — audioop is removed in 3.13."""
    audioop = pytest.importorskip("audioop")
    mu = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2")
    al = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), dtype="<i2")
    assert np.array_equal(av._mulaw_table(), mu)
    assert np.array_equal(av._alaw_table(), al)


def test_wav_ms_adpcm_decodes_bit_exact():
    """MS-ADPCM (format 0x0002): in-test independent encoder (mirroring
    the decoder's two-tap prediction + delta adaptation) → engine decode
    must equal the tracked reconstruction bit-for-bit, and the lossy
    output must track the source sine."""
    n = 500
    t = np.arange(n)
    sig = (5000 * np.sin(2 * np.pi * t / 37)).astype(np.int16).astype(int)

    coef1, coef2 = av._MS_COEFS[1]  # predictor 1: two-tap (512, -256)
    delta = 32
    s2, s1 = sig[0], sig[1]
    codes, recon = [], [int(s2), int(s1)]
    for s in sig[2:]:
        pred = (s1 * coef1 + s2 * coef2) >> 8
        err = int(s) - pred
        code = max(-8, min(7, int(round(err / delta)))) & 0xF
        signed = code - 16 if code & 8 else code
        val = max(-32768, min(32767, pred + signed * delta))
        recon.append(val)
        codes.append(code)
        s2, s1 = s1, val
        delta = max(16, (av._MS_ADAPT[code] * delta) >> 8)
    if len(codes) % 2:
        codes.append(0)
        # the padding code extends the tracked state too
        pred = (s1 * coef1 + s2 * coef2) >> 8
        recon.append(max(-32768, min(32767, pred)))
    body = bytes([1]) + struct.pack("<h", 32) + struct.pack("<h", sig[1]) + struct.pack("<h", sig[0])
    for i in range(0, len(codes), 2):
        body += bytes([(codes[i] << 4) | codes[i + 1]])  # HIGH nibble first
    block_align = len(body)
    fmt = struct.pack("<HHIIHH", 0x0002, 1, 8000, 4000, block_align, 4)
    wav_body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    decoded, rate = av.wav_decode(b"RIFF" + struct.pack("<I", len(wav_body)) + wav_body)
    assert rate == 8000 and decoded.shape[1] == 1
    assert decoded[:, 0].tolist() == recon
    err = np.abs(np.asarray(recon[: n], dtype=np.int64) - np.asarray(sig[: len(recon)][: n]))
    assert np.median(err) < 300


def test_wav_ima_adpcm_short_final_block_and_fact_trim():
    """Real-world ADPCM WAVs routinely end with a short final block; the
    decoder must decode it (not drop it), and a fact chunk's
    dwSampleLength must trim tail padding."""
    n = 505  # full block: 1 header sample + 504 nibbles
    t = np.arange(n + 161)  # 161 extra → short final block (80 nibble bytes + header)
    sig = (3000 * np.sin(2 * np.pi * t / 40)).astype(np.int16)
    full = _ima_encode_block(sig[:n], idx0=0)
    short = _ima_encode_block(sig[n:], idx0=0)  # 4-byte header + 80 bytes
    assert len(short) < len(full)
    block_align = len(full)

    def wav(data, fact=None):
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 0x0011, 1, 8000, 4055, block_align, 4)
        )
        if fact is not None:
            body += b"fact" + struct.pack("<II", 4, fact)[:8][:4] + struct.pack("<I", fact)
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    decoded, _ = av.wav_decode(wav(full + short))
    # both blocks decode in full: 505 + 161 samples
    assert decoded.shape == (n + 161, 1)
    # the short block alone decodes identically to its slice of the tail
    alone, _ = av.wav_decode(wav(short))
    assert decoded[n:, 0].tolist() == alone[:, 0].tolist()
    # fact chunk trims padding samples
    trimmed, _ = av.wav_decode(wav(full + short, fact=n + 100))
    assert trimmed.shape == (n + 100, 1)
    # a fragment shorter than the block header is an error, never a drop
    with pytest.raises(ValueError):
        av.wav_decode(wav(full + short[:3]))


def test_wav_ms_adpcm_short_final_block():
    """MS-ADPCM short final block: the truncated code stream decodes; a
    fragment without a complete header raises."""
    # one minimal full block + one shorter block (header + fewer codes)
    def ms_block(n_code_bytes):
        # predictor 1, delta 32, s1=100, s2=50, then n code bytes of 0
        return (
            bytes([1]) + struct.pack("<h", 32)
            + struct.pack("<h", 100) + struct.pack("<h", 50)
            + bytes(n_code_bytes)
        )

    full = ms_block(20)
    short = ms_block(5)
    block_align = len(full)
    fmt = struct.pack("<HHIIHH", 0x0002, 1, 8000, 4000, block_align, 4)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(full + short)) + full + short
    )
    decoded, _ = av.wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)
    # full block: 2 header samples + 40 nibbles; short: 2 + 10
    assert decoded.shape == (42 + 12, 1)
    frag = full + short[:4]  # 4 < 7-byte mono header
    body2 = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(frag)) + frag
    )
    with pytest.raises(ValueError):
        av.wav_decode(b"RIFF" + struct.pack("<I", len(body2)) + body2)
