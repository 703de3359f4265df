"""Pure-stdlib BMP codec (operators/multimodal.py round 7): the real
decode -> transform -> re-encode path the resize stage runs, pinned on
generated payloads including the row-padding widths (3*w % 4 != 0)
where a byte-offset bug would land."""

from __future__ import annotations

import pytest

from data_engineering_challenge_spark.operators.multimodal import (
    decode_bmp,
    encode_bmp,
    resize_nearest,
)


def _pix(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 7 + y) % 256, (x + y * 5) % 256, (x * 3 + y * 11) % 256)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (5, 4), (16, 16), (7, 1)])
def test_roundtrip_identity(w, h):
    payload = encode_bmp(w, h, _pix)
    # header sanity: BM magic + declared size matches actual bytes
    assert payload[:2] == b"BM"
    assert len(payload) == 54 + ((3 * w + 3) // 4 * 4) * h
    dw, dh, grid = decode_bmp(payload)
    assert (dw, dh) == (w, h)
    for y in range(h):
        for x in range(w):
            assert grid[y][x] == _pix(x, y), (x, y)


def test_resize_nearest_picks_even_source_pixels():
    w, h = 6, 4
    _, _, grid = decode_bmp(encode_bmp(w, h, _pix))
    nw, nh, ngrid = resize_nearest(w, h, grid, 0.5)
    assert (nw, nh) == (3, 2)
    for y in range(nh):
        for x in range(nw):
            assert ngrid[y][x] == _pix(2 * x, 2 * y)


def test_resize_floors_at_one_pixel():
    _, _, grid = decode_bmp(encode_bmp(1, 1, _pix))
    nw, nh, ngrid = resize_nearest(1, 1, grid, 0.5)
    assert (nw, nh) == (1, 1)
    assert ngrid[0][0] == _pix(0, 0)


def test_reencode_of_resized_is_lossless():
    w, h = 5, 5  # odd width -> padded rows on both encodes
    _, _, grid = decode_bmp(encode_bmp(w, h, _pix))
    nw, nh, ngrid = resize_nearest(w, h, grid, 0.5)
    rw, rh, rgrid = decode_bmp(encode_bmp(nw, nh, lambda x, y: ngrid[y][x]))
    assert (rw, rh) == (nw, nh)
    assert rgrid == ngrid


def test_decode_rejects_non_bmp_and_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    # 24-bit header with a nonzero compression field must be rejected
    good = bytearray(encode_bmp(2, 2, _pix))
    good[30] = 1  # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(good))
