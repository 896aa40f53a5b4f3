"""Dependency-free audio/video codecs: WAV (RIFF PCM) and Y4M (YUV4MPEG2).

Companions to ``imagecodec.py`` (round-3): with PNG/BMP for images, PCM WAV
for audio and YUV4MPEG2 for video, every media family in the multimodal
operators has at least one REAL parse path — no compressed codecs (no
MP3/H.264; that genuinely needs ffmpeg), but the container/stream handling,
chunk walking, and sample math are the true formats, byte-exact.

Audio travels as (n_samples, channels) int16 numpy arrays + sample rate;
video as (n_frames, h, w) uint8 luma arrays + fps (Cmono — the Y4M
grayscale variant; C420 would add subsampled chroma planes).
"""

from __future__ import annotations

import struct

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2 "


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n, channels) or (n,) int16 → minimal RIFF/WAVE PCM file."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    data = s.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 → ((n, channels) int16, sample_rate). Walks the
    chunk list (tolerates extra chunks like LIST/INFO), validates sizes."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"WAV fmt chunk truncated ({len(body)} bytes)")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if channels < 1:
        raise ValueError(f"WAV declares {channels} channels")
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(f"WAV format={audio_format} bits={bits} (PCM-16 only)")
    usable = len(raw) - (len(raw) % (2 * channels))
    s = np.frombuffer(raw[:usable], dtype="<i2").reshape(-1, channels)
    return s, sample_rate


def y4m_encode(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n_frames, h, w) uint8 luma → YUV4MPEG2 Cmono stream."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 3:
        raise ValueError("y4m_encode needs (n_frames, h, w)")
    n, h, w = f.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode()
    out = bytearray(head)
    for i in range(n):
        out += b"FRAME\n" + f[i].tobytes()
    return bytes(out)


def y4m_decode(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 Cmono → ((n_frames, h, w) uint8, (fps_num, fps_den))."""
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
    if colorspace != "Cmono":
        raise NotImplementedError(f"Y4M colorspace {colorspace} (Cmono only)")
    frame_bytes = w * h
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
        frames.append(np.frombuffer(chunk, np.uint8).reshape(h, w))
        pos = start + frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps
