"""The pure-Python image codecs (operators/multimodal.py): PPM and
24-bit BMP encode/decode round-trips, format edge cases, and the
dispatcher's failure mode. Pure numpy -- no Spark session needed."""

from __future__ import annotations

import numpy as np
import pytest

from discogs_xml_to_parquet_spark.operators.multimodal import (
    _pixels_of,
    decode_image,
    encode_bmp,
    encode_ppm,
)


def _img(h: int, w: int) -> np.ndarray:
    return (np.arange(h * w * 3, dtype=np.int64) * 37 % 256).astype(
        np.uint8).reshape(h, w, 3)


def test_ppm_round_trip():
    a = _img(5, 7)
    assert (decode_image(encode_ppm(a)) == a).all()


def test_bmp_round_trip_with_padding():
    # w*3 = 9 -> 3 padding bytes per row: the padded path
    a = _img(4, 3)
    assert (decode_image(encode_bmp(a)) == a).all()


def test_bmp_round_trip_unpadded():
    # w*3 = 12 -> no padding
    a = _img(2, 4)
    assert (decode_image(encode_bmp(a)) == a).all()


def test_bmp_and_ppm_decode_identically():
    """The codec-independence pin behind the driver lane: the same
    pixels through either on-disk layout (BGR bottom-up padded vs
    RGB raster) decode to the same array."""
    a = _pixels_of(12345)
    assert (decode_image(encode_bmp(a)) == decode_image(encode_ppm(a))).all()


def test_p3_ascii_ppm_and_comments():
    payload = b"P3\n# a comment\n2 1\n# another\n255\n1 2 3 4 5 6\n"
    a = decode_image(payload)
    assert a.shape == (1, 2, 3)
    assert a.tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_top_down_bmp():
    """Negative-height BMPs store rows top-down; the decoder must
    honor the sign."""
    import struct

    a = _img(3, 2)
    b = bytearray(encode_bmp(a))
    # flip to top-down: negate height, reverse stored row order
    row = 2 * 3
    stride = row + (4 - row % 4) % 4
    off = 54
    rows = [bytes(b[off + i * stride:off + (i + 1) * stride])
            for i in range(3)]
    b[off:] = b"".join(reversed(rows))
    struct.pack_into("<i", b, 22, -3)
    assert (decode_image(bytes(b)) == a).all()


def test_round_trip_property():
    """Property: ANY (h, w) in [1, 12] with arbitrary uint8 pixels
    round-trips through both codecs (hypothesis drives sizes and
    bytes, covering every padding residue w*3 % 4)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 12), w=st.integers(1, 12),
        seed=st.integers(0, 2**31),
    )
    def check(h: int, w: int, seed: int) -> None:
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_image(encode_ppm(a)) == a).all()
        assert (decode_image(encode_bmp(a)) == a).all()

    check()


def test_unknown_magic_raises():
    with pytest.raises(ValueError, match="unknown image magic"):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_unsupported_bmp_depth_raises():
    import struct

    b = bytearray(encode_bmp(_img(1, 1)))
    struct.pack_into("<H", b, 28, 8)  # 8 bpp
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_image(bytes(b))


def test_p3_out_of_range_sample_raises():
    """An ASCII sample above maxval must fail loudly, not wrap mod
    256 into a plausible-looking pixel."""
    with pytest.raises(ValueError, match="out of range"):
        decode_image(b"P3\n1 1\n255\n300 1 2\n")
    with pytest.raises(ValueError, match="out of range"):
        decode_image(b"P3\n2 1\n255\n1 2 3\n")  # truncated raster


def test_ppm_maxval_guard():
    with pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
