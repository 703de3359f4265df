"""Pure-stdlib PNG codec (operators/multimodal.py round 8): zlib
inflate/deflate + all five scanline filters + CRC-framed chunks. The
encoder cycles filter types per row, so every unfilter path is pinned
by the round-trip tests — a broken Sub/Up/Average/Paeth would corrupt
pixels at specific rows."""

from __future__ import annotations

import pytest

from data_engineering_challenge_spark.operators.multimodal import (
    PNG_SIG,
    decode_bmp,
    decode_png,
    encode_png,
    resize_nearest,
)


def _pix(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 7 + y) % 256, (x + y * 5) % 256, (x * 3 + y * 11) % 256)


@pytest.mark.parametrize("w,h", [(1, 1), (1, 7), (2, 3), (5, 5), (16, 16), (13, 6)])
def test_roundtrip_identity(w, h):
    """Heights >= 5 exercise every filter type (row y uses y % 5)."""
    payload = encode_png(w, h, _pix)
    assert payload[: len(PNG_SIG)] == PNG_SIG
    dw, dh, grid = decode_png(payload)
    assert (dw, dh) == (w, h)
    for y in range(h):
        for x in range(w):
            assert grid[y][x] == _pix(x, y), (x, y)


def test_each_filter_row_roundtrips_hard_pixels():
    """Gradient-heavy pixels where a sign/carry bug in any filter's
    byte arithmetic (mod-256 wraparound) would show."""
    def pix(x, y):
        return ((x * 37 + y * 101) % 256, (255 - x * 3) % 256, (x * x + y) % 256)

    w, h = 9, 10  # rows 0..9 cover each filter twice
    _, _, grid = decode_png(encode_png(w, h, pix))
    assert all(
        grid[y][x] == pix(x, y) for y in range(h) for x in range(w)
    )


def test_resize_pipeline_matches_bmp_semantics():
    """PNG and BMP route through the same resize_nearest: resized (x,y)
    is source (2x, 2y) on both paths."""
    w, h = 6, 8
    _, _, grid = decode_png(encode_png(w, h, _pix))
    nw, nh, ngrid = resize_nearest(w, h, grid, 0.5)
    assert (nw, nh) == (3, 4)
    for y in range(nh):
        for x in range(nw):
            assert ngrid[y][x] == _pix(2 * x, 2 * y)


def test_reencode_of_resized_is_lossless():
    w, h = 7, 9
    _, _, grid = decode_png(encode_png(w, h, _pix))
    nw, nh, ngrid = resize_nearest(w, h, grid, 0.5)
    rw, rh, rgrid = decode_png(encode_png(nw, nh, lambda x, y: ngrid[y][x]))
    assert (rw, rh) == (nw, nh)
    assert rgrid == ngrid


def test_decode_rejects_corrupt_crc():
    payload = bytearray(encode_png(4, 5, _pix))
    # flip a byte inside the IDAT data region (after sig + IHDR chunk)
    idat_at = payload.index(b"IDAT")
    payload[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_decode_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + b"\x00" * 60)
    import struct
    import zlib

    from data_engineering_challenge_spark.operators.multimodal import _png_chunk

    # grayscale (color type 0) is out of scope for the truecolor codec
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 6)
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bad)


def test_png_and_bmp_agree_on_pixels():
    """The two codecs store the same logical image (PNG is RGB,
    top-down; BMP is BGR, bottom-up): decoding both must yield the
    same logical grid."""
    from data_engineering_challenge_spark.operators.multimodal import encode_bmp

    w, h = 5, 6
    png_grid = decode_png(encode_png(w, h, _pix))[2]
    bmp_grid = decode_bmp(encode_bmp(w, h, lambda x, y: _pix(x, y)[::-1]))[2]
    for y in range(h):
        for x in range(w):
            assert png_grid[y][x] == bmp_grid[y][x][::-1]


def test_resize_media_routes_png_bmp_and_fallback(spark):
    """One frame with a PNG payload, a BMP payload, and an unknown
    binary payload: resize_media must take the REAL codec path for the
    first two (dims read back from re-decoded files) and the
    deterministic fake for the third."""
    from data_engineering_challenge_spark.operators.multimodal import (
        encode_bmp,
        resize_media,
    )

    png = encode_png(8, 6, _pix)
    bmp = encode_bmp(10, 4, lambda x, y: _pix(x, y)[::-1])
    fake = bytes([40, 30]) + b"\x00" * 10  # fake decoder: w=40, h=30
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)), (3, bytearray(fake))],
        "doc_id bigint, payload binary",
    )
    got = {
        r.doc_id: (r.orig_width, r.orig_height, r.new_width, r.new_height)
        for r in resize_media(df, "doc_id", "payload", 0.5).collect()
    }
    assert got == {1: (8, 6, 4, 3), 2: (10, 4, 5, 2), 3: (40, 30, 20, 15)}
