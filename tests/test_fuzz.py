"""Corruption robustness: damaged containers must fail cleanly (exception),
never crash or return wrong data silently for structural damage."""

import numpy as np
import pytest

from slimfastq_tpu.api import decode_fastq, encode_fastq
from slimfastq_tpu.utils.synth import synth_fastq

SMALL = dict(lanes=32, aux_lanes=8, block_records=128)


@pytest.fixture(scope="module")
def enc():
    return encode_fastq(synth_fastq(300, read_len=40, seed=0), **SMALL)


def test_truncations_raise_value_error(enc):
    """Every truncation point must raise ValueError specifically (short
    header, short block, missing/short index)."""
    for cut in (0, 3, 10, 21, len(enc) // 2, len(enc) - 3):
        with pytest.raises(ValueError):
            decode_fastq(enc[:cut])


@pytest.mark.slow  # stress/scale coverage; core format suite skips
def test_bitflips_raise_value_error(enc):
    """Format v2 CRC-covers every byte (header CRC, per-block body CRC with
    the length prefix validated against the parse, index CRC, end magic):
    any single-bit flip anywhere in the container must raise ValueError —
    CRC32 detects all 1- and 2-bit errors at these lengths, so silent
    wrong output would be a coverage hole, not bad luck."""
    rng = np.random.default_rng(0)
    for _ in range(40):
        buf = bytearray(enc)
        i = int(rng.integers(0, len(buf)))
        buf[i] ^= 1 << int(rng.integers(0, 8))
        with pytest.raises(ValueError):
            decode_fastq(bytes(buf))


def test_wrong_magic(enc):
    with pytest.raises(ValueError):
        decode_fastq(b"XXXX" + enc[4:])


def test_varint_bounds():
    """Corrupt varints must raise a codec error, never loop or IndexError
    (mirrors the bound in native/host.cpp get_varint)."""
    from slimfastq_tpu.utils.bits import get_varint, put_varint
    buf = bytearray()
    put_varint(buf, 1 << 63)
    v, p = get_varint(bytes(buf), 0)
    assert v == 1 << 63 and p == len(buf)
    with pytest.raises(ValueError):
        get_varint(b"\x80" * 11, 0)   # overlong (no terminator)
    with pytest.raises(ValueError):
        get_varint(b"\x80\x80", 0)    # truncated buffer
