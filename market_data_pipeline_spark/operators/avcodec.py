"""Dependency-free audio/video codecs: WAV (RIFF) and Y4M (YUV4MPEG2).

Companions to ``imagecodec.py`` (round-3): with PNG/BMP for images, WAV
for audio and YUV4MPEG2 for video, every media family in the multimodal
operators has at least one REAL parse path — no compressed codecs (no
MP3/H.264; that genuinely needs ffmpeg), but the container/stream handling,
chunk walking, and sample math are the true formats, byte-exact.

Audio travels as (n_samples, channels) numpy arrays + sample rate: int16
for PCM-16/PCM-8 payloads, float32 for IEEE-float payloads (the decoder
also resolves WAVE_FORMAT_EXTENSIBLE to its PCM/float subformat). Video
travels as (n_frames, h, w) uint8 LUMA arrays + fps — the decoder reads
Cmono and the planar C420*/C422/C444 colorspaces (chroma planes parsed
for correct stream framing; luma is what the feature extractors use, so
chroma is not returned). IMA/DVI ADPCM (format 0x0011, the classic 4-bit
compressed WAV) decodes for real since round 5; G.711 µ-law/A-law (formats 7/6) expand through the canonical
Sun tables (bit-identical to CPython's audioop reference); MS-ADPCM (0x0002) decodes through the canonical
two-tap predictor + delta-adaptation recurrence. Remaining audio gaps
(MP3-in-WAV and friends) raise NotImplementedError — named gaps, not
silent corruption.
"""

from __future__ import annotations

import struct

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2 "

_WAVE_PCM = 1
_WAVE_MS_ADPCM = 2
_WAVE_FLOAT = 3
_WAVE_ALAW = 6
_WAVE_MULAW = 7
_WAVE_IMA_ADPCM = 0x0011
_WAVE_EXTENSIBLE = 0xFFFE


def _mulaw_table() -> np.ndarray:
    """G.711 µ-law byte → int16 (the canonical expansion: invert bits,
    extract exponent/mantissa, remove the 132 bias)."""
    u = np.arange(256, dtype=np.int32) ^ 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    man = u & 0x0F
    mag = ((man << 3) + 0x84 << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_table() -> np.ndarray:
    """G.711 A-law byte → int16 (even-bit inversion, segment expansion).
    NOTE the sign convention is opposite to µ-law: after the 0x55 XOR a
    SET sign bit means POSITIVE (the Sun reference alaw2linear)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    man = a & 0x0F
    mag = np.where(exp == 0, (man << 4) + 8, ((man << 4) + 0x108) << (exp - 1))
    return np.where(sign, mag, -mag).astype(np.int16)

# MS-ADPCM tables (RIFF registry / Microsoft multimedia standards)
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230)
_MS_COEFS = ((256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232))


def _ms_adpcm_decode(raw: bytes, channels: int, block_align: int) -> np.ndarray:
    """MS-ADPCM (format 0x0002) data chunk → (n, channels) int16. Block:
    per channel a predictor index (1 byte), then per channel int16 delta
    and TWO int16 history samples (sample2 older, sample1 newer — emitted
    oldest-first), then interleaved 4-bit codes (HIGH nibble first, the
    opposite of IMA). Prediction: (s1·c1 + s2·c2) >> 8 plus signed
    code × delta; delta adapts via the 16-entry table with a floor of 16.
    Canonical integer recurrence — bit-exact vs any conforming decoder.
    A short FINAL block (real-world WAVs routinely end one) is decoded as
    long as its header is complete — the nibble recurrence handles a
    truncated code stream naturally; a final fragment shorter than the
    header is undecodable and raised, not silently dropped."""
    header = 7 * channels
    if block_align <= header:
        raise ValueError(f"MS ADPCM block_align {block_align} too small")
    out: list[np.ndarray] = []
    tail = len(raw) % block_align
    if 0 < tail <= header:
        raise ValueError(
            f"MS ADPCM trailing fragment ({tail} bytes) shorter than the "
            f"{header}-byte block header"
        )
    for off in range(0, len(raw), block_align):
        block = raw[off : off + block_align]
        preds = []
        for c in range(channels):
            pi = block[c]
            if pi >= len(_MS_COEFS):
                raise ValueError(f"MS ADPCM predictor index {pi} out of range")
            preds.append(_MS_COEFS[pi])
        deltas = [
            struct.unpack_from("<h", block, channels + 2 * c)[0]
            for c in range(channels)
        ]
        s1 = [
            struct.unpack_from("<h", block, 3 * channels + 2 * c)[0]
            for c in range(channels)
        ]
        s2 = [
            struct.unpack_from("<h", block, 5 * channels + 2 * c)[0]
            for c in range(channels)
        ]
        chans: list[list[int]] = [[s2[c], s1[c]] for c in range(channels)]
        ci = 0
        for b in block[header:]:
            for code in (b >> 4, b & 0xF):
                c = ci % channels
                ci += 1
                coef1, coef2 = preds[c]
                pred = (s1[c] * coef1 + s2[c] * coef2) >> 8
                signed = code - 16 if code & 8 else code
                pred += signed * deltas[c]
                pred = max(-32768, min(32767, pred))
                chans[c].append(pred)
                s2[c], s1[c] = s1[c], pred
                deltas[c] = max(16, (_MS_ADAPT[code] * deltas[c]) >> 8)
        out.append(
            np.column_stack([np.asarray(cs, dtype=np.int16) for cs in chans])
        )
    if not out:
        return np.zeros((0, channels), dtype=np.int16)
    return np.concatenate(out, axis=0)


# IMA/DVI ADPCM quantizer tables (public spec: IMA Digital Audio Focus and
# Technical Working Groups, 1992; identical in every implementation)
_IMA_INDEX_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_adpcm_decode(raw: bytes, channels: int, block_align: int) -> np.ndarray:
    """IMA ADPCM data chunk → (n, channels) int16. Block layout (per the
    IMA spec / RIFF registry): per channel a 4-byte header (initial int16
    predictor — emitted as sample 0 — step index, reserved), then 4-byte
    nibble groups interleaved per channel, LOW nibble first. The update
    recurrence is the canonical integer form (diff built from step>>3 plus
    conditional step, step>>1, step>>2 terms), so output is bit-exact
    against any conforming decoder. A short FINAL block (common in
    real-world ADPCM WAVs) is decoded as long as its per-channel headers
    are complete — the nibble-group loop slices safely past the end, so a
    truncated code stream just yields fewer samples; a final fragment
    shorter than the headers is undecodable and raised, never dropped."""
    header = 4 * channels
    if block_align < header + 4:
        raise ValueError(f"IMA ADPCM block_align {block_align} too small")
    out: list[np.ndarray] = []
    tail = len(raw) % block_align
    if 0 < tail < header:
        raise ValueError(
            f"IMA ADPCM trailing fragment ({tail} bytes) shorter than the "
            f"{header}-byte block headers"
        )
    for off in range(0, len(raw), block_align):
        block = raw[off : off + block_align]
        preds: list[int] = []
        idxs: list[int] = []
        chans: list[list[int]] = []
        for c in range(channels):
            p, i, _r = struct.unpack_from("<hBB", block, c * 4)
            preds.append(p)
            idxs.append(min(max(i, 0), 88))
            chans.append([p])
        data = block[4 * channels :]
        n_groups = -(-len(data) // (4 * channels))  # ceil: partial tail group decodes
        for g in range(n_groups):
            for c in range(channels):
                base = (g * channels + c) * 4
                pred, idx, samples = preds[c], idxs[c], chans[c]
                for b in data[base : base + 4]:
                    for nib in (b & 0xF, b >> 4):
                        step = _IMA_STEPS[idx]
                        diff = step >> 3
                        if nib & 4:
                            diff += step
                        if nib & 2:
                            diff += step >> 1
                        if nib & 1:
                            diff += step >> 2
                        pred = pred - diff if nib & 8 else pred + diff
                        pred = max(-32768, min(32767, pred))
                        idx = max(0, min(88, idx + _IMA_INDEX_ADJ[nib]))
                        samples.append(pred)
                preds[c], idxs[c] = pred, idx
        out.append(
            np.column_stack([np.asarray(cs, dtype=np.int16) for cs in chans])
        )
    if not out:
        return np.zeros((0, channels), dtype=np.int16)
    return np.concatenate(out, axis=0)


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000, fmt: str = "pcm16"
) -> bytes:
    """(n, channels) or (n,) samples → minimal RIFF/WAVE file.

    ``fmt``: "pcm16" (int16 payload, format tag 1) or "float32"
    (IEEE-float payload, format tag 3)."""
    if fmt == "pcm16":
        s = np.asarray(samples, dtype="<i2")
        tag, width = _WAVE_PCM, 2
    elif fmt == "float32":
        s = np.asarray(samples, dtype="<f4")
        tag, width = _WAVE_FLOAT, 4
    else:
        raise ValueError(f"wav_encode fmt {fmt!r} (pcm16 or float32)")
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    data = s.tobytes()
    block_align = channels * width
    fmt_body = struct.pack(
        "<HHIIHH", tag, channels, sample_rate,
        sample_rate * block_align, block_align, width * 8,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE → ((n, channels) samples, sample_rate). Walks the chunk
    list (tolerates extra chunks like LIST/INFO), validates sizes.
    PCM-16 → int16; PCM-8 (unsigned) → int16 (widened ×256, the standard
    lossless embedding); IEEE float-32 → float32. WAVE_FORMAT_EXTENSIBLE
    resolves to the subformat GUID's leading tag."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    ext = b""
    raw = None
    fact_samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"WAV fmt chunk truncated ({len(body)} bytes)")
            fmt = struct.unpack("<HHIIHH", body[:16])
            ext = body[16:]
        elif cid == b"data":
            raw = body
        elif cid == b"fact" and len(body) >= 4:
            # dwSampleLength: true per-channel sample count for compressed
            # formats — the tail block's padding samples are trimmed to it
            (fact_samples,) = struct.unpack("<I", body[:4])
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if channels < 1:
        raise ValueError(f"WAV declares {channels} channels")
    if audio_format == _WAVE_EXTENSIBLE:
        # fmt extension: cbSize(2) validBits(2) channelMask(4) GUID(16);
        # the GUID's first two bytes are the effective format tag
        if len(ext) < 10 or struct.unpack("<H", ext[:2])[0] < 22:
            raise ValueError("WAVE_FORMAT_EXTENSIBLE missing subformat")
        audio_format = struct.unpack("<H", ext[8:10])[0]
    if audio_format == _WAVE_IMA_ADPCM:
        if bits != 4:
            raise NotImplementedError(
                f"IMA ADPCM with {bits}-bit nibbles (4-bit only)"
            )
        s = _ima_adpcm_decode(raw, channels, fmt[4])
        if fact_samples is not None:
            s = s[:fact_samples]
        return s, sample_rate
    if audio_format == _WAVE_MS_ADPCM:
        if bits != 4:
            raise NotImplementedError(
                f"MS ADPCM with {bits}-bit codes (4-bit only)"
            )
        s = _ms_adpcm_decode(raw, channels, fmt[4])
        if fact_samples is not None:
            s = s[:fact_samples]
        return s, sample_rate
    if audio_format in (_WAVE_MULAW, _WAVE_ALAW):
        if bits != 8:
            raise NotImplementedError(f"G.711 with {bits}-bit codes (8 only)")
        table = _mulaw_table() if audio_format == _WAVE_MULAW else _alaw_table()
        usable = len(raw) - (len(raw) % channels)
        codes = np.frombuffer(raw[:usable], dtype=np.uint8).reshape(-1, channels)
        return table[codes], sample_rate
    if audio_format == _WAVE_PCM and bits == 16:
        width, dtype = 2, "<i2"
    elif audio_format == _WAVE_PCM and bits == 8:
        width, dtype = 1, np.uint8
    elif audio_format == _WAVE_FLOAT and bits == 32:
        width, dtype = 4, "<f4"
    else:
        raise NotImplementedError(
            f"WAV format={audio_format} bits={bits} "
            "(PCM-8/PCM-16/float-32/IMA-ADPCM/G.711 only)"
        )
    usable = len(raw) - (len(raw) % (width * channels))
    s = np.frombuffer(raw[:usable], dtype=dtype).reshape(-1, channels)
    if audio_format == _WAVE_PCM and bits == 8:
        # unsigned 8-bit PCM is offset-binary; widen losslessly to int16
        s = ((s.astype(np.int16) - 128) * 256).astype(np.int16)
    return s, sample_rate


def ima_adpcm_encode(
    samples: np.ndarray,
    sample_rate: int,
    samples_per_block: int = 505,
) -> tuple[bytes, np.ndarray]:
    """Mono int16 → IMA ADPCM RIFF/WAVE (format 0x0011), plus the
    encoder's OWN reconstruction (its mirrored-decoder state track).
    ``wav_decode`` of the returned bytes must equal that reconstruction
    bit-exactly — the encoder/decoder state-agreement invariant the
    round-trip query asserts. The tail block pads by repeating the last
    sample (silence when empty); step index carries across blocks, each
    block header re-seeds the predictor with its true first sample."""
    if samples.ndim != 1:
        raise ValueError("ima_adpcm_encode takes mono (1-D) samples")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + 8*k")
    x = samples.astype(np.int64)
    if x.size:
        blocks = -(-x.size // samples_per_block)
        pad = blocks * samples_per_block - x.size
        if pad:
            x = np.concatenate([x, np.full(pad, int(x[-1]), dtype=np.int64)])
    data = bytearray()
    recon: list[int] = []
    idx = 0
    for off in range(0, x.size, samples_per_block):
        blk = x[off : off + samples_per_block]
        pred = int(blk[0])
        data += struct.pack("<hBB", pred, idx, 0)
        recon.append(pred)
        nibs = []
        for s in blk[1:]:
            step = _IMA_STEPS[idx]
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
            d = step >> 3
            if nib & 4:
                d += step
            if nib & 2:
                d += step >> 1
            if nib & 1:
                d += step >> 2
            pred = pred - d if nib & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_INDEX_ADJ[nib]))
            recon.append(pred)
            nibs.append(nib)
        for i in range(0, len(nibs), 2):
            data += bytes([nibs[i] | (nibs[i + 1] << 4)])
    block_align = 4 + (samples_per_block - 1) // 2
    fmt = struct.pack(
        "<HHIIHH", _WAVE_IMA_ADPCM, 1, sample_rate,
        sample_rate * block_align // samples_per_block or 1, block_align, 4,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return (
        b"RIFF" + struct.pack("<I", len(body)) + body,
        np.asarray(recon, dtype=np.int16),
    )


def _chroma_plane_bytes(colorspace: str, w: int, h: int) -> int | None:
    """Total bytes of BOTH chroma planes per frame, or None when the
    colorspace is unsupported. C420 variants (C420, C420jpeg, C420mpeg2,
    C420paldv) share the plane LAYOUT — they differ only in chroma siting,
    which is irrelevant to luma extraction and stream framing."""
    if colorspace == "Cmono":
        return 0
    # exact C420 variant list: C420p10/p16 also start with "C420" but
    # carry 16-bit samples — a prefix match would frame them silently
    # wrong; unknown packings must fall through to the NAMED gap
    if colorspace in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        if w % 2 or h % 2:
            raise ValueError(f"C420 needs even dims, got {w}x{h}")
        return 2 * ((w // 2) * (h // 2))
    if colorspace == "C422":
        if w % 2:
            raise ValueError(f"C422 needs even width, got {w}")
        return 2 * ((w // 2) * h)
    if colorspace == "C411":
        if w % 4:
            raise ValueError(f"C411 needs width divisible by 4, got {w}")
        return 2 * ((w // 4) * h)
    if colorspace == "C444":
        return 2 * (w * h)
    return None


def y4m_encode(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "Cmono",
) -> bytes:
    """(n_frames, h, w) uint8 luma → YUV4MPEG2 stream. For the planar
    color spaces (C420/C422/C444) the chroma planes are written neutral
    (128) — grayscale content in a color container, the standard way to
    carry luma-only video through color-expecting tools."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError("y4m_encode needs (n_frames, h, w)")
    n, h, w = f.shape
    cb = _chroma_plane_bytes(colorspace, w, h)
    if cb is None:
        raise ValueError(f"y4m_encode colorspace {colorspace!r}")
    head = (
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    ).encode()
    neutral = bytes([128]) * cb
    out = bytearray(head)
    for i in range(n):
        out += b"FRAME\n" + f[i].tobytes() + neutral
    return bytes(out)


def y4m_decode(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 → ((n_frames, h, w) uint8 LUMA, (fps_num, fps_den)).
    Cmono and the planar C420*/C422/C411/C444 spaces are framed correctly
    (chroma planes advance the cursor; luma is returned — the multimodal
    feature extractors are luma-based). Interlaced streams (I param
    It/Ib/Im) store full frames in Y4M regardless, so luma extraction is
    identical — field separation is a display concern, not a framing one.
    Other colorspaces (high-bit-depth C420p10/p16 packings) raise
    NotImplementedError."""
    if not data.startswith(Y4M_MAGIC):
        raise ValueError("not a Y4M stream (bad magic)")
    nl = data.index(b"\n")
    params = data[len(Y4M_MAGIC) : nl].decode().split()
    w = h = None
    fps = (25, 1)
    colorspace = "C420"
    for p in params:
        if p.startswith("W"):
            w = int(p[1:])
        elif p.startswith("H"):
            h = int(p[1:])
        elif p.startswith("F"):
            num, den = p[1:].split(":")
            fps = (int(num), int(den))
        elif p.startswith("C"):
            colorspace = p
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    chroma = _chroma_plane_bytes(colorspace, w, h)
    if chroma is None:
        raise NotImplementedError(
            f"Y4M colorspace {colorspace} (Cmono/C420*/C422/C444 only)"
        )
    luma_bytes = w * h
    frame_bytes = luma_bytes + chroma
    frames = []
    pos = nl + 1
    while pos < len(data):
        eol = data.index(b"\n", pos)
        if data[pos:eol].split(b" ")[0] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        start = eol + 1
        chunk = data[start : start + frame_bytes]
        if len(chunk) != frame_bytes:
            raise ValueError("Y4M truncated frame")
        frames.append(
            np.frombuffer(chunk[:luma_bytes], np.uint8).reshape(h, w)
        )
        pos = start + frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps
