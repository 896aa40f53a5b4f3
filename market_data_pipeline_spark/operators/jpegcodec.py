"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the round-3 scope note "compressed formats stay stubbed": JPEG is
now REAL — a standards-compliant JFIF encoder and decoder in numpy + pure
Python, no PIL/libjpeg/ffmpeg.

Scope (honest):
- Encoder: baseline sequential, 8-bit, grayscale or YCbCr 4:4:4 (no
  subsampling), quality-scaled Annex-K-style quantization matrices, and
  SELF-COMPUTED canonical Huffman tables written into DHT segments (JPEG
  permits custom tables; uniform code lengths trade compression ratio for
  zero reliance on memorized Annex K constants — any standard decoder
  reads the output).
- Decoder: baseline sequential (SOF0), any DHT, 1- or 3-component, 4:4:4
  and 4:2:0/4:2:2 sampling (chroma upsampled by pixel replication),
  0xFF00 byte unstuffing. Progressive (SOF2), arithmetic coding, and
  restart intervals raise NotImplementedError — named gaps, not silent
  corruption.
- JPEG is LOSSY: round-trip tests assert PSNR bounds and exactness only
  where the math guarantees it (block-constant images at quality 100
  survive DC-only quantization exactly when the DC step divides the
  shifted level).

Pixels travel as (height, width, channels) uint8 arrays, matching
``imagecodec``.
"""

from __future__ import annotations

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
    pixels: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode (h, w[, c]) uint8 (c=1 gray or c=3 RGB) to baseline JFIF.

    ``subsampling``: "444" keeps full-resolution chroma; "420" box-averages
    chroma 2x2 (the near-universal photographic default — roughly halves
    the payload for color content at a small chroma-fidelity cost)."""
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

    def mcu_blocks():
        """(component index, quantized block) in interleaved MCU order —
        the one ordering both the alphabet pass and the emission share."""
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (sh, sv) in enumerate(samp):
                    for r in range(sv):
                        for q in range(sh):
                            yield ci, grids[ci][my * sv + r, mx * sh + q]

    # First pass: gather symbol alphabets for the custom Huffman tables.
    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    comp_tbl = [0] + ([1, 1] if c == 3 else [])
    prev_dc_by_comp = [0] * c
    for ci, b in mcu_blocks():
        t = comp_tbl[ci]
        zz = _zz(b)
        size, _ = _magnitude(int(zz[0]) - prev_dc_by_comp[ci])
        prev_dc_by_comp[ci] = int(zz[0])
        dc_syms[t].add(size)
        for item in _run_lengths(zz):
            if item is None:
                ac_syms[t].add(0x00)
            else:
                run, v = item
                s, _ = _magnitude(v)
                ac_syms[t].add(run * 16 + s)
    n_tables = 2 if c == 3 else 1
    dc_tables = [_uniform_table(sorted(dc_syms[t])) for t in range(n_tables)]
    ac_tables = [_uniform_table(sorted(ac_syms[t])) for t in range(n_tables)]
    dc_codes = [_canonical_codes(*t) for t in dc_tables]
    ac_codes = [_canonical_codes(*t) for t in ac_tables]

    # Entropy-coded segment in the same interleaved MCU order.
    bw = _BitWriter()
    prev_dc_by_comp = [0] * c
    for ci, b in mcu_blocks():
        t = comp_tbl[ci]
        zz = _zz(b)
        diff = int(zz[0]) - prev_dc_by_comp[ci]
        prev_dc_by_comp[ci] = int(zz[0])
        size, bits = _magnitude(diff)
        code, ln = dc_codes[t][size]
        bw.write(code, ln)
        if size:
            bw.write(bits, size)
        for item in _run_lengths(zz):
            if item is None:
                code, ln = ac_codes[t][0x00]
                bw.write(code, ln)
            else:
                run, v = item
                s, vb = _magnitude(v)
                code, ln = ac_codes[t][run * 16 + s]
                bw.write(code, ln)
                if s:
                    bw.write(vb, s)
    ecs = bw.flush()

    # Assemble the stream.
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for qid, qt in ([(0, qt_l)] + ([(1, qt_c)] if c == 3 else [])):
        body = bytes([qid]) + bytes(int(x) for x in qt.reshape(64)[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    # SOF0
    comps = b""
    for ci in range(c):
        sh, sv = samp[ci]
        comps += bytes([ci + 1, (sh << 4) | sv, qt_ids[ci]])
    sof = struct.pack(">BHHB", 8, h, w, c) + comps
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    for cls, tables in ((0, dc_tables), (1, ac_tables)):
        for tid, (bits, vals) in enumerate(tables):
            body = bytes([cls * 16 + tid]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    sos = bytes([c])
    for ci in range(c):
        t = comp_tbl[ci]
        sos += bytes([ci + 1, t * 16 + t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += ecs
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline sequential JPEG to (h, w, c) uint8 (c = 1 or 3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
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
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                # SOF1 permits 12-bit samples; the block decode below assumes
                # 8-bit level shift, so anything else must be a named gap,
                # never silent garbage
                raise NotImplementedError(
                    f"only 8-bit sample precision supported (got {prec})"
                )
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            mapping = []
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i], seg[2 + 2 * i]
                mapping.append((cid, tsel >> 4, tsel & 0xF))
            scan = mapping
            pos += seglen
            ecs_start = pos
            # entropy data runs to the next non-RST/stuffed marker
            p = pos
            while p < len(data) - 1:
                if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (0xD0 <= data[p + 1] <= 0xD7):
                    break
                p += 1
            ecs = data[ecs_start:p]
            pos = p
            return _decode_scan(frame, scan, qts, huff, ecs)
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(frame, scan, qts, huff, ecs) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(ch for _, ch, _, _ in comps)
    vmax = max(cv for _, _, cv, _ in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    br = _BitReader(ecs)
    comp_by_id = {cid: (ch, cv, qid) for cid, ch, cv, qid in comps}
    planes = {}
    for cid, ch, cv, qid in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
    prev_dc = {cid: 0 for cid, *_ in comps}

    def read_symbol(table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in entropy stream")

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, dc_id, ac_id in scan:
                ch, cv, qid = comp_by_id[cid]
                dct = huff[(0, dc_id)]
                act = huff[(1, ac_id)]
                qt = qts[qid]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        s = read_symbol(dct)
                        diff = _extend(br.read(s), s)
                        prev_dc[cid] += diff
                        zz[0] = prev_dc[cid]
                        k = 1
                        while k < 64:
                            sym = read_symbol(act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run exceeds block")
                            zz[k] = _extend(br.read(size), size)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = zz
                        deq = block.reshape(8, 8) * qt
                        spat = _DCT.T @ deq @ _DCT + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = spat

    out_planes = []
    for cid, ch, cv, qid in comps:
        p = planes[cid]
        # upsample to full resolution by replication, then crop
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:fh, :fw])
    stacked = np.stack(out_planes, axis=-1)
    if stacked.shape[-1] == 1:
        return np.clip(np.rint(stacked), 0, 255).astype(np.uint8)
    if stacked.shape[-1] == 3:
        return _ycbcr_to_rgb(stacked)
    raise NotImplementedError(f"{stacked.shape[-1]}-component JPEG unsupported")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
