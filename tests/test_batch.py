"""Single-chip small-block window batching (round-4 VERDICT next #3):
api.encode_fastq / decode_fastq batch underfilled blocks through the
vmapped multi-block kernels (streams_jax.*_blocks via the
parallel/sharded orchestration with dev=backend). Containers and decoded
bytes must be IDENTICAL to the unbatched path and the oracle."""

import numpy as np
import pytest

from slimfastq_tpu.api import decode_fastq, encode_fastq
from slimfastq_tpu.ops import streams_jax
from slimfastq_tpu.utils.synth import synth_fastq
from slimfastq_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

CFG = dict(lanes=32, aux_lanes=8, block_records=40)


def test_batched_encode_bytes_identical(monkeypatch):
    data = synth_fastq(330, read_len=60, seed=11, var_len=True,
                       n_rate=0.01)
    monkeypatch.setenv("SFQ_BATCH_BLOCKS", "1")
    seq = encode_fastq(data, level=3, backend=streams_jax, **CFG)
    monkeypatch.delenv("SFQ_BATCH_BLOCKS")
    bat = encode_fastq(data, level=3, backend=streams_jax, **CFG)
    assert bat == seq
    assert decode_fastq(bat, backend=streams_jax) == data


def test_batched_decode_bytes_identical(monkeypatch):
    data = synth_fastq(250, read_len=50, seed=5, n_rate=0.002)
    enc = encode_fastq(data, level=2, backend=streams_jax, **CFG)
    monkeypatch.setenv("SFQ_BATCH_BLOCKS", "1")
    out_seq = decode_fastq(enc, backend=streams_jax)
    monkeypatch.delenv("SFQ_BATCH_BLOCKS")
    out_bat = decode_fastq(enc, backend=streams_jax)
    assert out_seq == out_bat == data


def test_batched_matches_oracle():
    data = synth_fastq(170, read_len=40, seed=3, var_len=True,
                       n_rate=0.02)
    oracle = encode_fastq(data, level=3, use_native=False, **CFG)
    bat = encode_fastq(data, level=3, backend=streams_jax, **CFG)
    assert bat == oracle


@pytest.mark.slow
def test_batched_l4_match_trials(monkeypatch):
    """v5 match trials inside a batched window (blocks above the
    1024-record matcher threshold) stay byte-identical to unbatched."""
    cfg = dict(lanes=64, aux_lanes=8, block_records=1536)
    data = synth_fastq(4608, read_len=60, seed=7, n_rate=0.001)
    monkeypatch.setenv("SFQ_BATCH_BLOCKS", "1")
    seq = encode_fastq(data, level=4, backend=streams_jax, **cfg)
    monkeypatch.setenv("SFQ_BATCH_BLOCKS", "3")
    bat = encode_fastq(data, level=4, backend=streams_jax, **cfg)
    assert bat == seq
    out = decode_fastq(bat, backend=streams_jax)
    assert out == data
