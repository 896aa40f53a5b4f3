"""Dependency-free GIF87a/89a codec — real LZW, palettes, interlace,
multi-frame extraction.

Completes the image side the way the round-5 ADPCM/G.711 work completed
audio: PNG/BMP/JPEG (imagecodec.py, jpegcodec.py) cover lossless filters
and DCT; GIF adds the LZW dictionary coder and the animation container —
the format crawl corpora actually carry memes/screen-recordings in, and
the multimodal frame-sampling twin of Y4M for palettized content.

Decode contracts: ``gif_decode`` renders every frame independently onto
a logical-screen canvas seeded with the background color (frame
extraction feeds per-frame feature UDFs, which want independent frames);
``gif_decode_composited`` is the PLAYER semantics — a persistent canvas
with GIF89a inter-frame disposal (none / keep, restore-to-background,
restore-to-previous) and transparency revealing the prior composite.
Unknown extension blocks are walked and skipped by their sub-block
structure, never guessed at.

Reference parity note: the reference repo has no media surface at all;
this module extends BASELINE.json's multimodal north star.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (payload, position after the 0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF truncated inside sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if len(data) < pos + n:
            raise ValueError("GIF sub-block overruns file")
        pos += n


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    LSB-first bit packing, CLEAR resets the dictionary, EOI ends; the
    width grows AFTER the dictionary fills the current width (cap 12
    bits). Stops at ``max_pixels`` outputs (defensive against trailing
    junk in malformed streams)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh() -> list[tuple[int, ...] | None]:
        table: list[tuple[int, ...] | None] = [(i,) for i in range(clear)]
        table += [None, None]  # CLEAR and EOI
        return table

    table = fresh()
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: tuple[int, ...] | None = None
    out: list[int] = []
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
                if entry is None:
                    raise ValueError(f"GIF LZW: bad first code {code}")
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + (entry[0],))
            elif code == len(table):
                entry = prev + (prev[0],)  # the KwKwK case
                table.append(entry)
            else:
                raise ValueError(f"GIF LZW: code {code} out of range")
            out.extend(entry)
            if len(out) >= max_pixels:
                return out[:max_pixels]
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """GIF LZW encoder (the decoder's exact inverse): emits CLEAR first,
    resets the dictionary at 4096 entries, EOI last."""
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev: tuple[int, ...] = ()
    for idx in indices:
        cand = prev + (idx,)
        if cand in table:
            prev = cand
            continue
        emit(table[prev], width)
        table[cand] = next_code
        # width grows when the NEXT code to assign no longer fits — the
        # mirror of the decoder's post-fill growth rule
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = (idx,)
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray, h: int) -> np.ndarray:
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def gif_decode(data: bytes) -> tuple[list[np.ndarray], tuple[int, int]]:
    """GIF bytes → (frames, (screen_w, screen_h)); each frame (h, w, 3)
    uint8 RGB on the logical screen (see module docstring for the
    independent-frame contract)."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    transparent: int | None = None
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                gc_flags = payload[0]
                transparent = payload[3] if gc_flags & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block id 0x{b:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code, lzw, w * h)
        if len(idx) < w * h:
            raise ValueError(f"GIF frame short: {len(idx)} of {w * h} pixels")
        grid = np.asarray(idx, dtype=np.int32).reshape(h, w)
        if iflags & 0x40:
            grid = _deinterlace(grid, h)
        canvas_idx = np.full((sh, sw), int(bg), dtype=np.int32)
        canvas_idx[top : top + h, left : left + w] = grid
        safe = np.clip(canvas_idx, 0, len(pal) - 1)
        rgb = pal[safe]
        if transparent is not None:
            bg_rgb = pal[min(int(bg), len(pal) - 1)]
            rgb = np.where((canvas_idx == transparent)[..., None], bg_rgb, rgb)
        frames.append(rgb.astype(np.uint8))
        transparent = None  # graphic control applies to ONE image
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return frames, (sw, sh)


def gif_encode(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray | None = None,
    interlace: bool = False,
    screen: tuple[int, int] | None = None,
    frame_meta: list[dict | None] | None = None,
) -> bytes:
    """Palette-index frames → GIF89a. ``frames``: one (h, w) index array
    or a list of them (an animation); ``palette``: (n, 3) uint8 (default:
    256-level gray). Round-trips bit-exactly through gif_decode's palette
    lookup.

    ``screen``: explicit (width, height) of the logical screen (default:
    the first frame's size — then every frame must share it). With a
    screen, frames may be SMALLER rects placed via ``frame_meta``.
    ``frame_meta``: per-frame dict (or None) with any of ``left``/``top``
    (rect placement), ``disposal`` (0–3, GIF89a graphic-control disposal
    method), ``transparent`` (palette index). A frame with any meta gets
    a graphic-control extension; disposal/transparency compose under
    ``gif_decode_composited``."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if palette is None:
        g = np.arange(256, dtype=np.uint8)
        palette = np.stack([g, g, g], axis=1)
    n_pal = len(palette)
    bits = max(2, int(np.ceil(np.log2(max(2, n_pal)))))
    pal_n = 1 << bits
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[:n_pal] = palette
    if screen is None:
        sh, sw = frames[0].shape
    else:
        sw, sh = screen
    metas = frame_meta or [None] * len(frames)
    if len(metas) != len(frames):
        raise ValueError("frame_meta length must match frames")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    min_code = max(2, bits)
    for fr, meta in zip(frames, metas):
        h, w = fr.shape
        m = meta or {}
        left, top = int(m.get("left", 0)), int(m.get("top", 0))
        if left + w > sw or top + h > sh:
            raise ValueError("frame rect exceeds the logical screen")
        if screen is None and (h, w) != (sh, sw):
            raise ValueError("animation frames must share one size")
        if int(fr.max(initial=0)) >= n_pal:
            raise ValueError("frame index exceeds palette size")
        if meta is not None:
            disposal = int(m.get("disposal", 0))
            if not 0 <= disposal <= 3:
                raise ValueError(f"GIF disposal method {disposal} (0-3)")
            transparent = m.get("transparent")
            packed = (disposal << 2) | (1 if transparent is not None else 0)
            out += b"\x21\xf9\x04" + bytes(
                [packed, 0, 0, int(transparent or 0)]
            ) + b"\x00"
        rows = np.asarray(fr, dtype=np.uint8)
        if interlace:
            order = [
                y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
            ]
            rows = rows[np.asarray(order)]
        out += b"\x2c" + struct.pack(
            "<HHHHB", left, top, w, h, 0x40 if interlace else 0
        )
        out += bytes([min_code])
        stream = _lzw_encode(min_code, rows.reshape(-1).tolist())
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_decode_composited(data: bytes) -> tuple[list[np.ndarray], tuple[int, int]]:
    """GIF bytes → (composited frames, (screen_w, screen_h)) — the PLAYER
    semantics, closing the disposal non-goal: a persistent RGB canvas is
    seeded with the background color; each frame draws its rect (GIF89a
    transparency leaves the current composite visible), the post-frame
    canvas is emitted, then the frame's graphic-control disposal applies:
    0/1 leave the rect, 2 restores the rect to the background color,
    3 restores it to the canvas as it was BEFORE this frame.

    Everything else (LZW, palettes, interlace, sub-block walking) is the
    same machinery as ``gif_decode``, which stays the independent-frame
    contract for per-frame feature extraction."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad magic)")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (
        gct[min(int(bg), len(gct) - 1)]
        if gct is not None
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).astype(np.uint8).copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            label = data[pos]
            pos += 1
            payload, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                gc_flags = payload[0]
                disposal = (gc_flags >> 2) & 0x07
                transparent = payload[3] if gc_flags & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(f"GIF: unexpected block id 0x{b:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(min_code, lzw, w * h)
        if len(idx) < w * h:
            raise ValueError(f"GIF frame short: {len(idx)} of {w * h} pixels")
        grid = np.asarray(idx, dtype=np.int32).reshape(h, w)
        if iflags & 0x40:
            grid = _deinterlace(grid, h)
        saved = canvas[top : top + h, left : left + w].copy()  # for disposal 3
        rgb = pal[np.clip(grid, 0, len(pal) - 1)]
        region = canvas[top : top + h, left : left + w]
        if transparent is not None:
            opaque = (grid != transparent)[..., None]
            region[...] = np.where(opaque, rgb, region)
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            canvas[top : top + h, left : left + w] = saved
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return frames, (sw, sh)
