import io

import numpy as np
import pytest

from finito_tpu.io import sdsl
from finito_tpu.utils.bits import (
    bit_width_for_max,
    pack_bits,
    pack_values,
    unpack_bits,
    unpack_values,
)


def test_bit_width_for_max():
    # matches 64 - __builtin_clzll(x)
    assert bit_width_for_max(1) == 1
    assert bit_width_for_max(2) == 2
    assert bit_width_for_max(28) == 5
    assert bit_width_for_max(29) == 5
    assert bit_width_for_max(63) == 6
    assert bit_width_for_max(64) == 7


@pytest.mark.parametrize("width", [1, 2, 3, 5, 7, 8, 13, 31, 33, 63, 64])
def test_pack_unpack_roundtrip(width):
    rng = np.random.default_rng(width)
    n = 1000
    if width == 64:
        vals = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    else:
        vals = rng.integers(0, 2**width, size=n, dtype=np.uint64)
    words = pack_values(vals, width)
    assert words.dtype == np.uint64
    assert words.size == (n * width + 63) // 64
    back = unpack_values(words, n, width)
    np.testing.assert_array_equal(vals, back)


def test_pack_values_layout():
    # width-2 values [2,3,0,0,2,3,1,3] -> bits 10 11 00 00 10 11 01 11 LSB-first
    vals = np.array([2, 3, 0, 0, 2, 3, 1, 3], dtype=np.uint64)
    words = pack_values(vals, 2)
    expected = 0
    for i, v in enumerate(vals):
        expected |= int(v) << (2 * i)
    assert int(words[0]) == expected


def test_bit_pack_roundtrip():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=777).astype(np.uint8)
    words = pack_bits(bits)
    np.testing.assert_array_equal(unpack_bits(words, 777), bits)


def test_sdsl_int_vector_bytes():
    # int_vector<0> with width 5, values {16,11,28,6,4,27}:
    # header = 8-byte LE bit count (30), 1-byte width (5), one data word.
    vals = np.array([16, 11, 28, 6, 4, 27], dtype=np.uint64)
    buf = io.BytesIO()
    nbytes = sdsl.write_int_vector_stream(buf, vals, 5)
    raw = buf.getvalue()
    assert nbytes == len(raw) == 8 + 1 + 8
    assert raw[:8] == (30).to_bytes(8, "little")
    assert raw[8] == 5
    word = 0
    for i, v in enumerate(vals):
        word |= int(v) << (5 * i)
    assert raw[9:] == word.to_bytes(8, "little")
    buf.seek(0)
    back = sdsl.read_int_vector_stream(buf)
    assert back.width == 5
    np.testing.assert_array_equal(back.values, vals)


def test_sdsl_fixed_width_has_no_width_byte():
    vals = np.array([2, 3, 0, 1], dtype=np.uint64)
    buf = io.BytesIO()
    sdsl.write_int_vector_stream(buf, vals, 2, template_width=2)
    raw = buf.getvalue()
    assert len(raw) == 8 + 8  # no width byte
    assert raw[:8] == (8).to_bytes(8, "little")
    buf.seek(0)
    back = sdsl.read_int_vector_stream(buf, template_width=2)
    np.testing.assert_array_equal(back.values, vals)


def test_sdsl_bit_vector_roundtrip():
    bits = np.array([0, 1, 1, 0, 1] * 30, dtype=np.uint8)
    buf = io.BytesIO()
    n = sdsl.write_bit_vector_stream(buf, bits)
    assert n == 8 + ((150 + 63) // 64) * 8
    buf.seek(0)
    np.testing.assert_array_equal(sdsl.read_bit_vector_stream(buf), bits)


def test_serialize_string_roundtrip():
    buf = io.BytesIO()
    sdsl.serialize_string(buf, "plain-matrix")
    buf.seek(0)
    assert sdsl.load_string(buf) == "plain-matrix"


def test_lcs_device_equals_host():
    import numpy as np
    from finito_tpu.ops.lcs_jax import lcs_array_device
    from finito_tpu.sbwt.construct import build_plain_matrix_sbwt
    from finito_tpu.sbwt.lcs import lcs_array
    from tests.test_device_engine import gen_dspss

    rng = np.random.default_rng(8)
    for k in (4, 7):
        unitigs = [u.encode() for u in gen_dspss(rng, 8, k + 2, 40, k)]
        sbwt = build_plain_matrix_sbwt(unitigs, k)
        np.testing.assert_array_equal(lcs_array_device(sbwt), lcs_array(sbwt))
