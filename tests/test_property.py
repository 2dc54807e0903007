"""Property-based round-trip testing (SURVEY.md §4 item 3): arbitrary
record shapes and alphabets through the full pipeline."""

import numpy as np
from hypothesis import given, settings, strategies as st

from slimfastq_tpu.api import decode_fastq, encode_fastq
import pytest

SMALL = dict(lanes=8, aux_lanes=4, block_records=32)

id_st = st.binary(min_size=0, max_size=24).map(
    lambda b: bytes(x if x not in (10, 13) else 95 for x in b))
seq_alpha = st.sampled_from(b"ACGTNacgtnRYX")
qual_alpha = st.integers(min_value=33, max_value=126)


@st.composite
def record(draw):
    L = draw(st.integers(min_value=0, max_value=40))
    rid = draw(id_st)
    seq = bytes(draw(st.lists(seq_alpha, min_size=L, max_size=L)))
    qual = bytes(draw(st.lists(qual_alpha, min_size=L, max_size=L)))
    plus_kind = draw(st.integers(0, 2))
    if plus_kind == 0:
        plus = b"+"
    elif plus_kind == 1:
        plus = b"+" + rid
    else:
        plus = b"+" + draw(id_st)
    return b"@" + rid + b"\n" + seq + b"\n" + plus + b"\n" + qual + b"\n"


@settings(max_examples=15, deadline=None)
@given(st.lists(record(), min_size=0, max_size=60))
@pytest.mark.slow  # stress/scale coverage; core format suite skips
def test_roundtrip_property(records):
    data = b"".join(records)
    enc = encode_fastq(data, level=2, **SMALL)
    assert decode_fastq(enc) == data
