"""Native (C++/vectorised) host pipeline vs pure-Python reference:
containers must be byte-identical, decode must round-trip, on normal and
adversarial inputs."""

import numpy as np
import pytest

from slimfastq_tpu import native
from slimfastq_tpu.api import decode_fastq, encode_fastq
from slimfastq_tpu.utils.synth import synth_fastq

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")

SMALL = dict(lanes=32, aux_lanes=8, block_records=256)


def _both(data, level=3):
    enc_py = encode_fastq(data, level=level, use_native=False, **SMALL)
    enc_nat = encode_fastq(data, level=level, use_native=True, **SMALL)
    assert enc_py == enc_nat, "native container differs from reference"
    dec_nat = decode_fastq(enc_nat, use_native=True)
    dec_py = decode_fastq(enc_nat, use_native=False)
    assert dec_nat == data
    assert dec_py == data
    return enc_nat


def test_native_matches_python_basic():
    _both(synth_fastq(600, read_len=80, seed=2, var_len=True, n_rate=0.003))


@pytest.mark.slow  # stress/scale coverage; core format suite skips
def test_native_matches_python_levels():
    for lv in (1, 4):
        _both(synth_fastq(200, read_len=50, seed=lv), level=lv)


@pytest.mark.slow  # stress/scale coverage; core format suite skips
def test_native_adversarial():
    cases = [
        b"@r1\nACGT\n+\nIIII\n",
        b"@r1\n\n+\n\n@r2\nACGT\n+\nIIII\n",
        b"@r1\nNNNN\n+\n!!!!\n",
        (b"@r1 x\nACGT\n+\nIIII\n"
         b"@r2 y\nACGT\n+r2 y\nIIII\n"
         b"@r3 z\nACGT\n+other\nIIII\n"),
        b"@run007:1\nAC\n+\nII\n@run008:2\nGT\n+\nII\n",
    ]
    for data in cases:
        _both(data)


@pytest.mark.slow  # stress/scale coverage; core format suite skips
def test_native_multi_block():
    _both(synth_fastq(700, read_len=40, seed=7, var_len=True))


@pytest.mark.slow  # stress/scale coverage; core format suite skips
def test_native_lane_skewed_exceptions():
    """One record carrying (nearly) ALL non-ACGT exception bytes: aux lane
    0 holds every SEQX run, so a per-lane arena stride derived from the
    balanced average overflows (round-2 review finding — seqx_encode raised
    RuntimeError while the Python path encoded fine)."""
    reads = [b"NX" * 5000] + [b"ACGT" * 16] * 15
    data = b"".join(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s))
                    for i, s in enumerate(reads))
    _both(data)


def test_native_index_rejects_malformed():
    with pytest.raises(ValueError):
        native.fastq_index(b"not fastq\n")
    with pytest.raises(ValueError):
        native.fastq_index(b"@r1\nACGT\n+\nIII\n")  # qual len mismatch


def test_native_empty():
    assert decode_fastq(encode_fastq(b"", use_native=True, **SMALL),
                        use_native=True) == b""
