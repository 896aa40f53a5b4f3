"""GIF87a/89a codec (operators/gifcodec.py): LZW round trips incl.
dictionary growth/reset, interlace, animation frames, transparency, and
malformed-stream rejection."""

import struct

import numpy as np
import pytest

from market_data_pipeline_spark.operators import gifcodec as g
from market_data_pipeline_spark.operators import imagecodec as ic


def test_gif_round_trip_small_palette():
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 16, (23, 31)).astype(np.uint8)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    frames, (sw, sh) = g.gif_decode(g.gif_encode(idx, pal))
    assert (sw, sh) == (31, 23) and len(frames) == 1
    assert np.array_equal(frames[0], pal[idx])


def test_gif_lzw_dictionary_growth_and_reset():
    # 24k random pixels over 250 colors: the dictionary walks every code
    # width up to 12 bits and resets at 4096 at least once
    rng = np.random.RandomState(11)
    big = rng.randint(0, 250, (120, 200)).astype(np.uint8)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    frames, _ = g.gif_decode(g.gif_encode(big, pal))
    assert np.array_equal(frames[0], pal[big])


def test_gif_interlaced_round_trip():
    rng = np.random.RandomState(13)
    idx = rng.randint(0, 8, (17, 9)).astype(np.uint8)  # odd height: uneven passes
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    frames, _ = g.gif_decode(g.gif_encode(idx, pal, interlace=True))
    assert np.array_equal(frames[0], pal[idx])


def test_gif_animation_frames_decode_independently():
    rng = np.random.RandomState(17)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    frames_in = [rng.randint(0, 16, (10, 12)).astype(np.uint8) for _ in range(3)]
    frames, _ = g.gif_decode(g.gif_encode(frames_in, pal))
    assert len(frames) == 3
    for got, src in zip(frames, frames_in):
        assert np.array_equal(got, pal[src])


def test_gif_transparency_shows_background():
    """A GIF89a graphic-control extension with the transparency flag makes
    the transparent index render as the background color."""
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    data = bytearray(g.gif_encode(idx, pal))
    # splice a graphic-control block (transparent index = 1) before 0x2C;
    # background index in the header is 0 -> palette[0] shows through
    img_at = data.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x01\x00\x00\x01\x00"
    spliced = bytes(data[:img_at]) + gce + bytes(data[img_at:])
    frames, _ = g.gif_decode(spliced)
    want = pal[idx].copy()
    want[idx == 1] = pal[0]
    assert np.array_equal(frames[0], want)


def test_gif_errors_and_sniff():
    with pytest.raises(ValueError):
        g.gif_decode(b"NOTGIF" + b"\x00" * 20)
    # truncated sub-block chain
    pal = np.zeros((4, 3), dtype=np.uint8)
    ok = g.gif_encode(np.zeros((4, 4), dtype=np.uint8), pal)
    with pytest.raises(ValueError):
        g.gif_decode(ok[:-6])
    # frame index beyond the palette is rejected at encode
    with pytest.raises(ValueError):
        g.gif_encode(np.full((2, 2), 9, dtype=np.uint8), pal)
    # imagecodec dispatch: sniff + first-frame decode
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 4, (5, 6)).astype(np.uint8)
    payload = g.gif_encode(idx, pal)
    assert ic.sniff(payload) == "gif"
    assert ic.decode(payload).shape == (5, 6, 3)


def test_gif_spec_sample_stream_decodes():
    """Hand-assembled minimal GIF (2x2, 2-bit palette, known LZW codes)
    built byte-by-byte from the spec layout — guards against the encoder
    and decoder agreeing on a SHARED bug."""
    # palette: 4 colors; image indices: [[1, 1], [2, 2]]
    pal = bytes([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    header = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0) + pal
    # LZW, min code 2: codes CLEAR(4),1,1,2 at width 3; after the third
    # data code the table reaches 8 entries so the width grows to 4 —
    # the remaining 2 and EOI(5) pack at 4 bits (LSB-first)
    bits = [(4, 3), (1, 3), (1, 3), (2, 3), (2, 4), (5, 4)]
    acc = nb = 0
    stream = bytearray()
    for c, w in bits:
        acc |= c << nb
        nb += w
        while nb >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        stream.append(acc & 0xFF)
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0) + bytes([2])
    img += bytes([len(stream)]) + bytes(stream) + b"\x00" + b"\x3b"
    frames, (sw, sh) = g.gif_decode(header + img)
    assert (sw, sh) == (2, 2)
    want = np.array(
        [[[20, 20, 20], [20, 20, 20]], [[30, 30, 30], [30, 30, 30]]],
        dtype=np.uint8,
    )
    assert np.array_equal(frames[0], want)


def test_gif_disposal_composition_round_trip():
    """Player-semantics decode: partial rects composite onto a persistent
    canvas; disposal 2 restores the rect to background, disposal 3 to the
    pre-frame canvas; transparency reveals the prior composite."""
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    base = np.full((4, 4), 1, dtype=np.uint8)  # red screen
    patch2 = np.full((2, 2), 2, dtype=np.uint8)  # green 2x2, disposal 3
    patch3 = np.array([[3, 0], [0, 3]], dtype=np.uint8)  # blue diag, 0 transparent
    data = g.gif_encode(
        [base, patch2, patch3],
        palette=pal,
        screen=(4, 4),
        frame_meta=[
            None,
            {"left": 1, "top": 1, "disposal": 3},
            {"left": 2, "top": 2, "transparent": 0},
        ],
    )
    frames, (sw, sh) = g.gif_decode_composited(data)
    assert (sw, sh) == (4, 4) and len(frames) == 3
    red, green, blue = pal[1], pal[2], pal[3]
    # frame 1: all red
    assert (frames[0] == red).all()
    # frame 2: green patch at (1,1)-(2,2) over red
    assert (frames[1][1:3, 1:3] == green).all()
    assert (frames[1][0, :] == red).all() and (frames[1][3, :] == red).all()
    # frame 3: disposal 3 restored the green patch to red BEFORE drawing;
    # blue diagonal at (2,2) and (3,3), transparent cells show the
    # restored composite (red)
    f3 = frames[2]
    assert (f3[2, 2] == blue).all() and (f3[3, 3] == blue).all()
    assert (f3[2, 3] == red).all() and (f3[3, 2] == red).all()
    assert (f3[1, 1] == red).all()  # green was disposed back to the prior canvas


def test_gif_disposal_restore_to_background():
    """Disposal 2 clears the frame's rect to the background color for the
    NEXT frame's composite."""
    pal = np.array([[9, 9, 9], [255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    f1 = np.full((2, 2), 1, dtype=np.uint8)
    f2 = np.array([[2]], dtype=np.uint8)
    data = g.gif_encode(
        [f1, f2],
        palette=pal,
        screen=(2, 2),
        frame_meta=[{"disposal": 2}, {"left": 1, "top": 1}],
    )
    frames, _ = g.gif_decode_composited(data)
    # frame 2: f1's rect (whole screen) restored to bg (index 0 = 9,9,9),
    # then the single green pixel drawn at (1,1)
    assert (frames[1][0, 0] == pal[0]).all()
    assert (frames[1][1, 1] == pal[2]).all()
    # the independent-frame decoder still renders frame 2 alone on a
    # bg-seeded canvas — both contracts coexist
    indep, _ = g.gif_decode(data)
    assert (indep[1][1, 1] == pal[2]).all() and (indep[1][0, 0] == pal[0]).all()
