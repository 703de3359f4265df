"""Pure-stdlib WAV codec (operators/multimodal.py round 8): the real
RIFF decode -> resample -> re-encode path, pinned on generated
payloads including odd sample counts (word-alignment of chunks) and
extremes of the int16 range."""

from __future__ import annotations

import struct

import pytest

from data_engineering_challenge_spark.operators.multimodal import (
    decode_wav,
    encode_wav,
    resample_nearest,
)


def _wave(n: int) -> list[int]:
    return [((i * 977) % 65536) - 32768 for i in range(n)]


@pytest.mark.parametrize("n", [1, 2, 7, 16, 17, 240])
def test_roundtrip_identity(n):
    payload = encode_wav(16000, _wave(n))
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    # declared RIFF size == actual remainder
    assert struct.unpack_from("<I", payload, 4)[0] == len(payload) - 8
    rate, samples = decode_wav(payload)
    assert rate == 16000
    assert samples == _wave(n)


def test_int16_extremes_survive():
    rate, samples = decode_wav(encode_wav(8000, [-32768, 32767, 0, -1]))
    assert samples == [-32768, 32767, 0, -1]


def test_chunk_walk_skips_unknown_chunks():
    payload = encode_wav(8000, [1, 2, 3, 4])
    # splice a LIST chunk (odd size -> exercises word alignment)
    # between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, samples = decode_wav(spliced)
    assert (rate, samples) == (8000, [1, 2, 3, 4])


def test_resample_nearest_takes_even_samples():
    s = _wave(17)
    down = resample_nearest(s, 0.5)
    assert down == [s[2 * i] for i in range(8)]


def test_non_pcm_rejected():
    payload = bytearray(encode_wav(8000, [0, 0]))
    payload[20] = 3  # audio_fmt = IEEE float
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(payload))


def test_garbage_rejected():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3\x03junkjunkjunk")


def test_truncated_chunk_rejected():
    # a data chunk whose declared size exceeds the remaining bytes must
    # raise the documented ValueError, not struct.error (ADVICE r8)
    payload = encode_wav(8000, [1, 2, 3, 4])
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_wav(payload[:-3])


def test_oversized_fmt_size_rejected():
    payload = bytearray(encode_wav(8000, [1, 2]))
    payload[16] = 0xFF  # fmt chunk claims 255 bytes it does not have
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_wav(bytes(payload))
