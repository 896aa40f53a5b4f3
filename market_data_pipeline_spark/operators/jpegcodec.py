"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the round-3 scope note "compressed formats stay stubbed": JPEG is
now REAL — a standards-compliant JFIF encoder and decoder in numpy + pure
Python, no PIL/libjpeg/ffmpeg.

Scope (honest):
- Encoder: baseline sequential (SOF0) or progressive (SOF2, spectral
  selection + successive approximation, the jpegtran-style scan script),
  8-bit, grayscale or YCbCr 4:4:4 / 4:2:0, optional restart intervals,
  quality-scaled Annex-K-style quantization matrices, and SELF-COMPUTED
  canonical Huffman tables written into DHT segments (JPEG permits custom
  tables; uniform code lengths trade compression ratio for zero reliance
  on memorized Annex K constants — any standard decoder reads the output).
- Decoder: baseline sequential (SOF0/1) and progressive (SOF2) with full
  spectral-selection + successive-approximation scan handling (EOBRUN,
  AC refinement correction bits), restart intervals (DRI + RSTn), any
  DHT including mid-stream redefinition, 1- or 3-component, 4:4:4 and
  4:2:0/4:2:2 sampling (chroma upsampled by pixel replication), 0xFF00
  byte unstuffing. Arithmetic coding (DAC), hierarchical/lossless frames,
  and 12-bit precision raise NotImplementedError — named gaps, not
  silent corruption.
- JPEG is LOSSY: round-trip tests assert PSNR bounds and exactness only
  where the math guarantees it (block-constant images at quality 100
  survive DC-only quantization exactly when the DC step divides the
  shifted level).

Pixels travel as (height, width, channels) uint8 arrays, matching
``imagecodec``.
"""

from __future__ import annotations

import re
import struct

import numpy as np

# --------------------------------------------------------------------------
# shared constants
# --------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K example luminance/chrominance quantization tables (public spec
# constants, universally shipped by every JPEG implementation).
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    d = np.zeros((8, 8))
    for i in range(8):
        c = np.sqrt(0.125) if i == 0 else 0.5
        for j in range(8):
            d[i, j] = c * np.cos((2 * j + 1) * i * np.pi / 16.0)
    return d


_DCT = _dct_matrix()


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base quantization table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((table * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., 0].astype(np.float64), px[..., 1].astype(np.float64),
               px[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = px[..., 0], px[..., 1] - 128.0, px[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# bit IO
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # marker — entropy data ends; feed zero padding
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_bit(self) -> int:
        return self.read(1)


# --------------------------------------------------------------------------
# Huffman tables
# --------------------------------------------------------------------------


def _uniform_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """(bits[1..16], huffval) giving every symbol the same canonical code
    length L with 2**L > len(symbols) — valid JPEG (the all-ones code at
    the maximum length is never assigned), decodable by any conformant
    reader; compression ratio is sacrificed for table self-sufficiency."""
    n = max(1, len(symbols))
    L = 1
    while (1 << L) <= n:
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(symbols)
    return bits, list(symbols)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------


def _block_grid(chan: np.ndarray, by: int, bx: int, qt: np.ndarray) -> np.ndarray:
    """Pad (h, w) to exactly (by*8, bx*8) by edge replication, DCT and
    quantize every 8x8 block: returns an int32 (by, bx, 8, 8) grid."""
    h, w = chan.shape
    padded = np.pad(
        chan.astype(np.float64), ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge"
    )
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    # vectorized 2D DCT over all blocks: D @ B @ D.T
    coeffs = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    return np.rint(coeffs / qt).astype(np.int32)


def _box2(chan: np.ndarray) -> np.ndarray:
    """2x2 box-mean downsample (the 4:2:0 chroma reduction); odd edges
    replicate before averaging."""
    h, w = chan.shape
    padded = np.pad(chan, ((0, h % 2), (0, w % 2)), mode="edge")
    hh, ww = padded.shape
    return padded.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))


def _zz(block: np.ndarray) -> np.ndarray:
    return block.reshape(64)[ZIGZAG]


def _run_lengths(zz: np.ndarray):
    """Yield (run, value) AC pairs plus a trailing EOB marker (None)."""
    ac = zz[1:]
    last_nz = np.nonzero(ac)[0]
    end = (last_nz[-1] + 1) if len(last_nz) else 0
    run = 0
    for v in ac[:end]:
        if v == 0:
            run += 1
            if run == 16:
                yield (15, 0)  # ZRL
                run = 0
        else:
            yield (run, int(v))
            run = 0
    if end < 63:
        yield None  # EOB


def jpeg_encode(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w[, c]) uint8 (c=1 gray or c=3 RGB) to JFIF.

    ``subsampling``: "444" keeps full-resolution chroma; "420" box-averages
    chroma 2x2 (the near-universal photographic default — roughly halves
    the payload for color content at a small chroma-fidelity cost).
    ``progressive``: emit SOF2 with the jpegtran-style scan script
    (spectral selection + one successive-approximation refinement) instead
    of a single sequential scan — identical quantized coefficients, so the
    decoded pixels match the baseline encoding bit-for-bit.
    ``restart_interval``: if > 0, emit DRI and split entropy data with
    RSTn markers every N MCUs (the mechanism real encoders use so a
    100 TB-scale reader can resync/parallelize within one scan)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    if c not in (1, 3):
        raise ValueError(f"jpeg_encode: {c} channels unsupported (1 or 3)")
    if subsampling not in ("444", "420"):
        raise ValueError(f"jpeg_encode: subsampling {subsampling!r} (444 or 420)")
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)
    if c == 1:
        planes = [px[:, :, 0].astype(np.float64)]
        qts = [qt_l]
        qt_ids = [0]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsampling == "420":
            planes = [y, _box2(cb), _box2(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]
        qt_ids = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    grids = [
        _block_grid(p, mcus_y * sv, mcus_x * sh, q)
        for p, (sh, sv), q in zip(planes, samp, qts)
    ]

    comp_tbl = [0] + ([1, 1] if c == 3 else [])
    dims = (h, w, hmax, vmax, mcus_y, mcus_x)
    if progressive:
        script = _progressive_script(c)
    else:
        script = [(list(range(c)), 0, 63, 0, 0)]
    scan_events = [
        _scan_events(grids, samp, comp_tbl, sc, ss, se, ah, al,
                     restart_interval, dims)
        for (sc, ss, se, ah, al) in script
    ]
    tables, ecs_list = _serialize_scans(scan_events)

    # Assemble the stream.
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for qid, qt in ([(0, qt_l)] + ([(1, qt_c)] if c == 3 else [])):
        body = bytes([qid]) + bytes(int(x) for x in qt.reshape(64)[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    comps = b""
    for ci in range(c):
        sh, sv = samp[ci]
        comps += bytes([ci + 1, (sh << 4) | sv, qt_ids[ci]])
    sof = struct.pack(">BHHB", 8, h, w, c) + comps
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", 2 + len(sof)
    ) + sof
    for (cls, tid), (bits, vals) in sorted(tables.items()):
        body = bytes([cls * 16 + tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for (sc, ss, se, ah, al), ecs in zip(script, ecs_list):
        sos = bytes([len(sc)])
        for ci in sc:
            t = comp_tbl[ci]
            sos += bytes([ci + 1, t * 16 + t])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += ecs
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _progressive_script(c: int) -> list[tuple[list[int], int, int, int, int]]:
    """jpegtran-shaped scan script (component list, Ss, Se, Ah, Al):
    coarse DC for all components, coarse AC per component (luma split in
    two bands so low frequencies render first), then one successive-
    approximation refinement pass each (Ah=1 -> Al=0) — exercising every
    progressive decode path including AC correction bits."""
    comps = list(range(c))
    script: list[tuple[list[int], int, int, int, int]] = [(comps, 0, 0, 0, 1)]
    if c == 1:
        script += [([0], 1, 63, 0, 1)]
    else:
        script += [([0], 1, 5, 0, 1), ([0], 6, 63, 0, 1),
                   ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1)]
    script.append((comps, 0, 0, 1, 0))
    if c == 1:
        script += [([0], 1, 63, 1, 0)]
    else:
        script += [([0], 1, 5, 1, 0), ([0], 6, 63, 1, 0),
                   ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0)]
    return script


def _comp_block_dims(fh, fw, sh, sv, hmax, vmax) -> tuple[int, int]:
    """Block-grid dims of one component for NON-interleaved scans: per
    T.81 A.2 they derive from the component's own sample dims, not the
    MCU-padded frame grid (the two differ for subsampled frames whose
    size is not an MCU multiple)."""
    cw = -(-(fw * sh) // hmax)
    chh = -(-(fh * sv) // vmax)
    return -(-chh // 8), -(-cw // 8)


def _scan_units(scan_comps, samp, dims):
    """Yield one list of (ci, gy, gx) blocks per restart unit: the MCU for
    interleaved scans (ns > 1), a single block in component raster order
    otherwise."""
    fh, fw, hmax, vmax, mcus_y, mcus_x = dims
    if len(scan_comps) > 1:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                unit = []
                for ci in scan_comps:
                    sh, sv = samp[ci]
                    for r in range(sv):
                        for q in range(sh):
                            unit.append((ci, my * sv + r, mx * sh + q))
                yield unit
    else:
        ci = scan_comps[0]
        sh, sv = samp[ci]
        by, bx = _comp_block_dims(fh, fw, sh, sv, hmax, vmax)
        for gy in range(by):
            for gx in range(bx):
                yield [(ci, gy, gx)]


def _scan_events(grids, samp, comp_tbl, scan_comps, ss, se, ah, al, ri, dims):
    """Entropy events for one scan: ("sym", class, tid, symbol),
    ("bits", value, nbits), ("rst",). The ss=0..63 Ah=Al=0 case is
    baseline sequential; the progressive cases follow T.81 G.1.2 — the
    AC-refinement pass mirrors the well-known libjpeg bit-buffering
    discipline (correction bits ride after the next emitted symbol; the
    tail of an end-of-band block defers behind the pending EOBRUN)."""
    ev: list[tuple] = []
    eobrun = 0
    eob_bits: list[int] = []  # correction bits bound to the pending EOBRUN

    def flush_eobrun(tid: int) -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            ev.append(("sym", 1, tid, n << 4))
            if n:
                ev.append(("bits", eobrun - (1 << n), n))
            eobrun = 0
        if eob_bits:
            ev.extend(("bits", b, 1) for b in eob_bits)
            eob_bits.clear()

    prev_dc = {ci: 0 for ci in scan_comps}
    for ui, unit in enumerate(_scan_units(scan_comps, samp, dims)):
        if ri and ui and ui % ri == 0:
            if ss:
                flush_eobrun(comp_tbl[scan_comps[0]])
            ev.append(("rst",))
            prev_dc = {ci: 0 for ci in scan_comps}
        for ci, gy, gx in unit:
            t = comp_tbl[ci]
            zz = _zz(grids[ci][gy, gx])
            if ss == 0 and se == 63:  # baseline sequential, full band
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                size, bits = _magnitude(diff)
                ev.append(("sym", 0, t, size))
                ev.append(("bits", bits, size))
                for item in _run_lengths(zz):
                    if item is None:
                        ev.append(("sym", 1, t, 0x00))
                    else:
                        run, v = item
                        s, vb = _magnitude(v)
                        ev.append(("sym", 1, t, run * 16 + s))
                        ev.append(("bits", vb, s))
            elif ss == 0 and ah == 0:  # DC first: arithmetic >> Al
                dc = int(zz[0]) >> al
                diff = dc - prev_dc[ci]
                prev_dc[ci] = dc
                size, bits = _magnitude(diff)
                ev.append(("sym", 0, t, size))
                ev.append(("bits", bits, size))
            elif ss == 0:  # DC refinement: one raw bit, no Huffman code
                ev.append(("bits", (int(zz[0]) >> al) & 1, 1))
            elif ah == 0:  # AC first: point transform is magnitude >> Al
                band = [int(v) for v in zz[ss:se + 1]]
                run = 0
                for v in band:
                    a = (-((-v) >> al)) if v < 0 else (v >> al)
                    if a == 0:
                        run += 1
                        continue
                    flush_eobrun(t)
                    while run > 15:
                        ev.append(("sym", 1, t, 0xF0))
                        run -= 16
                    s, vb = _magnitude(a)
                    ev.append(("sym", 1, t, run * 16 + s))
                    ev.append(("bits", vb, s))
                    run = 0
                if run:  # block ends in zeros -> member of an EOB run
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun(t)
            else:  # AC refinement (Ah = Al + 1)
                band = [int(v) for v in zz[ss:se + 1]]
                absv = [(-v if v < 0 else v) >> al for v in band]
                eob_pos = -1
                for i, a in enumerate(absv):
                    if a == 1:
                        eob_pos = i
                run = 0
                cur_bits: list[int] = []  # bits owed after this block's next symbol
                for i, a in enumerate(absv):
                    if a == 0:
                        run += 1
                        continue
                    # ZRLs are emitted before ANY nonzero-history coefficient
                    # once run exceeds 15 (and cannot fold into the EOB), so
                    # buffered correction bits never span a ZRL window — the
                    # decoder's 16-zero walk consumes exactly these bits.
                    while run > 15 and i <= eob_pos:
                        flush_eobrun(t)
                        ev.append(("sym", 1, t, 0xF0))
                        run -= 16
                        ev.extend(("bits", b, 1) for b in cur_bits)
                        cur_bits.clear()
                    if a > 1:  # already-significant: correction bit only
                        cur_bits.append(a & 1)
                        continue
                    flush_eobrun(t)
                    ev.append(("sym", 1, t, run * 16 + 1))
                    ev.append(("bits", 0 if band[i] < 0 else 1, 1))
                    ev.extend(("bits", b, 1) for b in cur_bits)
                    cur_bits.clear()
                    run = 0
                if run or cur_bits:
                    eobrun += 1
                    eob_bits.extend(cur_bits)
                    if eobrun == 0x7FFF or len(eob_bits) > 900:
                        flush_eobrun(t)
    if ss:  # end of scan: flush any pending end-of-band run
        flush_eobrun(comp_tbl[scan_comps[0]])
    return ev


def _serialize_scans(scan_events):
    """Build the uniform Huffman tables from every symbol any scan emits,
    then serialize each scan's events to its entropy-coded segment
    (restart events split the bitstream and insert RSTn markers).
    Returns ({(class, tid): (bits, huffval)}, [ecs bytes per scan])."""
    syms: dict[tuple[int, int], set[int]] = {}
    for ev_list in scan_events:
        for e in ev_list:
            if e[0] == "sym":
                syms.setdefault((e[1], e[2]), set()).add(e[3])
    tables = {k: _uniform_table(sorted(v)) for k, v in syms.items()}
    codes = {k: _canonical_codes(*t) for k, t in tables.items()}
    ecs_list = []
    for ev_list in scan_events:
        segs = []
        bw = _BitWriter()
        for e in ev_list:
            if e[0] == "sym":
                code, ln = codes[(e[1], e[2])][e[3]]
                bw.write(code, ln)
            elif e[0] == "bits":
                if e[2]:
                    bw.write(e[1], e[2])
            else:  # restart boundary: byte-align and mark
                segs.append(bw.flush())
                bw = _BitWriter()
        segs.append(bw.flush())
        parts = []
        for i, seg in enumerate(segs):
            parts.append(seg)
            if i < len(segs) - 1:
                parts.append(bytes([0xFF, 0xD0 + (i % 8)]))
        ecs_list.append(b"".join(parts))
    return tables, ecs_list


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


_RST_SPLIT = re.compile(b"\xff[\xd0-\xd7]")


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline-sequential (SOF0/1) or progressive (SOF2) JPEG to
    (h, w, c) uint8 (c = 1 or 3). Multi-scan: every SOS accumulates
    coefficients (progressive scans refine them across passes); the IDCT
    runs once at the end over the assembled coefficient grids."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    ri = 0
    scans: list[tuple] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.float64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.float64)
                    p += 64
                qt = np.zeros(64)
                qt[ZIGZAG] = vals
                qts[tid] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT — may be redefined between scans
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                # SOF1 permits 12-bit samples; the block decode assumes an
                # 8-bit level shift, so anything else must be a named gap,
                # never silent garbage
                raise NotImplementedError(
                    f"only 8-bit sample precision supported (got {prec})"
                )
            progressive = marker == 0xC2
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential (SOF0/1) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xCC:
            raise NotImplementedError("arithmetic coding not supported")
        elif marker == 0xDD:  # DRI
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS: capture scan params + entropy bytes
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            mapping = []
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i], seg[2 + 2 * i]
                mapping.append((cid, tsel >> 4, tsel & 0xF))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos += seglen
            p = pos
            while p < len(data) - 1:
                if data[p] == 0xFF and data[p + 1] != 0x00 and not (
                    0xD0 <= data[p + 1] <= 0xD7
                ):
                    break
                p += 1
            intervals = _RST_SPLIT.split(data[pos:p])
            scans.append(
                (mapping, ss, se, ahal >> 4, ahal & 0xF, dict(huff), ri, intervals)
            )
            pos = p
            continue
        pos += seglen
    if frame is None:
        raise ValueError("no SOF segment found")
    if not scans:
        raise ValueError("no SOS segment found")
    return _decode_frame(frame, progressive, qts, scans)


def _decode_frame(frame, progressive, qts, scans) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    dims = (fh, fw, hmax, vmax, mcus_y, mcus_x)
    samp = [(ch, cv) for _, ch, cv, _ in comps]
    idx_by_cid = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    coef = [
        np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int64)
        for _, ch, cv, _ in comps
    ]
    for mapping, ss, se, ah, al, huff, ri, intervals in scans:
        if progressive and ss == 0 and se == 63:
            raise ValueError("invalid progressive scan header (full band)")
        if not progressive and (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("invalid sequential scan header")
        _apply_scan(
            coef, samp, idx_by_cid, mapping, ss, se, ah, al, huff, ri,
            intervals, dims,
        )

    # Dequantize + IDCT vectorized across every block of each component.
    out_planes = []
    for (cid, ch, cv, qid), grid in zip(comps, coef):
        qt = qts[qid]
        gy, gx, _ = grid.shape
        nat = np.zeros((gy, gx, 64))
        nat[..., ZIGZAG] = grid
        deq = nat.reshape(gy, gx, 8, 8) * qt
        spat = np.einsum("ji,abjk,kl->abil", _DCT, deq, _DCT) + 128.0
        plane = spat.transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8)
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:  # upsample by replication, then crop
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:fh, :fw])
    stacked = np.stack(out_planes, axis=-1)
    if stacked.shape[-1] == 1:
        return np.clip(np.rint(stacked), 0, 255).astype(np.uint8)
    if stacked.shape[-1] == 3:
        return _ycbcr_to_rgb(stacked)
    raise NotImplementedError(f"{stacked.shape[-1]}-component JPEG unsupported")


def _apply_scan(
    coef, samp, idx_by_cid, mapping, ss, se, ah, al, huff, ri, intervals, dims
) -> None:
    """Decode one scan's entropy data into the coefficient grids.
    Sequential full-band, progressive DC first/refine and AC first/refine
    all share the unit iteration (and therefore restart handling): every
    Ri units the reader jumps to the next RST-delimited interval and
    resets the DC predictors and EOB run."""
    scan_comps = [idx_by_cid[cid] for cid, _, _ in mapping]
    tsel = {idx_by_cid[cid]: (dc, ac) for cid, dc, ac in mapping}
    seg_iter = iter(intervals)
    br = _BitReader(next(seg_iter))
    prev_dc = {ci: 0 for ci in scan_comps}
    eobrun = 0

    def read_symbol(table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in entropy stream")

    for ui, unit in enumerate(_scan_units(scan_comps, samp, dims)):
        if ri and ui and ui % ri == 0:
            seg = next(seg_iter, None)
            if seg is None:
                raise ValueError("missing restart marker in entropy stream")
            br = _BitReader(seg)
            prev_dc = {ci: 0 for ci in scan_comps}
            eobrun = 0
        for ci, gy, gx in unit:
            dc_tid, ac_tid = tsel[ci]
            block = coef[ci][gy, gx]
            if ss == 0 and se == 63:  # baseline sequential full band
                s = read_symbol(huff[(0, dc_tid)])
                prev_dc[ci] += _extend(br.read(s), s)
                block[0] = prev_dc[ci]
                act = huff[(1, ac_tid)]
                k = 1
                while k < 64:
                    sym = read_symbol(act)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("AC run exceeds block")
                    block[k] = _extend(br.read(size), size)
                    k += 1
            elif ss == 0 and ah == 0:  # progressive DC first
                s = read_symbol(huff[(0, dc_tid)])
                prev_dc[ci] += _extend(br.read(s), s)
                block[0] = prev_dc[ci] << al
            elif ss == 0:  # progressive DC refinement: raw bit, no Huffman
                if br.read_bit():
                    block[0] |= 1 << al
            elif ah == 0:  # progressive AC first
                if eobrun:
                    eobrun -= 1
                    continue
                act = huff[(1, ac_tid)]
                k = ss
                while k <= se:
                    sym = read_symbol(act)
                    r, s = sym >> 4, sym & 0xF
                    if s:
                        k += r
                        if k > se:
                            raise ValueError("AC run exceeds band")
                        block[k] = _extend(br.read(s), s) << al
                        k += 1
                    elif r == 15:  # ZRL: 16 zeros (15 + loop advance)
                        k += 16
                    else:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read(r)
                        eobrun -= 1  # current block is part of the run
                        break
            else:  # progressive AC refinement
                eobrun = _refine_ac(br, read_symbol, huff[(1, ac_tid)],
                                    block, ss, se, al, eobrun)


def _refine_ac(br, read_symbol, act, block, ss, se, al, eobrun) -> int:
    """T.81 G.1.2.3 AC successive-approximation refinement of one block's
    zigzag coefficients: newly-significant coefficients carry a sign bit;
    every already-significant coefficient passed over reads one correction
    bit; an EOBn covers blocks whose band tail is corrections only.
    Returns the remaining EOB run."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int, stop_zeros) -> int:
        """Advance from k reading correction bits at nonzero coefficients;
        with stop_zeros=N, stop AT the (N+1)-th zero coefficient."""
        zeros = stop_zeros
        while k <= se:
            c = int(block[k])
            if c != 0:
                if br.read_bit() and (c & p1) == 0:
                    block[k] = c + (p1 if c >= 0 else m1)
            elif zeros is not None:
                zeros -= 1
                if zeros < 0:
                    return k
            k += 1
        return k

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = read_symbol(act)
            r, s = sym >> 4, sym & 0xF
            newval = 0
            if s:
                newval = p1 if br.read_bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read(r)
                break  # rest of the block is EOB-tail corrections
            k = correct(k, r)
            if newval and k <= se:
                block[k] = newval
            k += 1
    if eobrun:
        correct(k, None)
        eobrun -= 1
    return eobrun


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
