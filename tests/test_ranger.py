"""Unit tests for the lane-interleaved binary range coder (NumPy oracle).

The oracle is the normative bit-format spec (SURVEY.md §4 item 1: coder
golden/round-trip tests + model-update law tests).
"""

import numpy as np
import pytest

from slimfastq_tpu.ops import ranger_np as R


def _roundtrip(syms, counts, ctxs, depth, num_ctx, rate=4):
    S, W = syms.shape
    table = R.table_init(num_ctx * ((1 << depth) - 1))
    enc = R.LaneEncoder(W, R.worst_case_bytes(S * depth))
    for t in range(S):
        active = counts > t
        R.encode_symbols(enc, table, ctxs[t], syms[t], active, depth, rate)
    enc.flush()
    lens = enc.ptr.copy()
    payload = enc.out[:, : int(lens.max())]

    table2 = R.table_init(num_ctx * ((1 << depth) - 1))
    dec = R.LaneDecoder(payload, lens)
    out = np.zeros_like(syms)
    for t in range(S):
        active = counts > t
        out[t] = R.decode_symbols(dec, table2, ctxs[t], active, depth, rate)
    assert np.array_equal(table, table2), "enc/dec model state diverged"
    return out, lens


def test_roundtrip_random_u6():
    rng = np.random.default_rng(0)
    W, S = 16, 400
    syms = rng.integers(0, 64, size=(S, W)).astype(np.uint32)
    counts = rng.integers(0, S + 1, size=W)
    counts[0], counts[1] = 0, S
    ctxs = rng.integers(0, 50, size=(S, W)).astype(np.uint32)
    out, _ = _roundtrip(syms, counts, ctxs, 6, 50)
    mask = np.arange(S)[:, None] < counts[None, :]
    assert np.array_equal(out[mask], syms[mask])


@pytest.mark.parametrize("depth", [1, 2, 6, 8])
def test_roundtrip_depths(depth):
    rng = np.random.default_rng(depth)
    W, S = 8, 200
    syms = rng.integers(0, 1 << depth, size=(S, W)).astype(np.uint32)
    counts = np.full(W, S)
    ctxs = np.zeros((S, W), dtype=np.uint32)
    out, _ = _roundtrip(syms, counts, ctxs, depth, 1)
    assert np.array_equal(out, syms)


def test_skewed_compresses():
    """Near-constant symbols must cost far less than uniform."""
    W, S = 8, 1000
    syms = np.zeros((S, W), dtype=np.uint32)
    syms[::97] = 3
    counts = np.full(W, S)
    ctxs = np.zeros((S, W), dtype=np.uint32)
    _, lens = _roundtrip(syms, counts, ctxs, 6, 1)
    bits_per_sym = lens.sum() * 8 / (S * W)
    assert bits_per_sym < 1.0, bits_per_sym


def test_all_lanes_one_context_collision():
    """Every lane hitting the same context each step (worst-case scatter
    collisions) must stay bit-exact — the deterministic-update law."""
    rng = np.random.default_rng(7)
    W, S = 32, 300
    syms = rng.integers(0, 4, size=(S, W)).astype(np.uint32)
    counts = np.full(W, S)
    ctxs = np.zeros((S, W), dtype=np.uint32)
    out, _ = _roundtrip(syms, counts, ctxs, 2, 1)
    assert np.array_equal(out, syms)


def test_update_law_clamps():
    table = R.table_init(4)
    idx = np.zeros(8, dtype=np.int64)
    bit = np.zeros(8, dtype=np.uint32)  # all push p up
    active = np.ones(8, dtype=bool)
    for _ in range(200):
        p = R.table_read(table, idx)
        R.table_update(table, idx, p, bit, active, rate=2)
    assert table[0] <= R.PROB_MAX
    bit[:] = 1
    for _ in range(200):
        p = R.table_read(table, idx)
        R.table_update(table, idx, p, bit, active, rate=2)
    assert table[0] >= R.PROB_MIN


def test_single_lane_single_symbol():
    syms = np.array([[5]], dtype=np.uint32)
    counts = np.array([1])
    ctxs = np.zeros((1, 1), dtype=np.uint32)
    out, _ = _roundtrip(syms, counts, ctxs, 6, 1)
    assert out[0, 0] == 5


def test_zero_symbols_lane_only_flush():
    W = 4
    enc = R.LaneEncoder(W, R.worst_case_bytes(8))
    enc.flush()
    assert (enc.ptr == R.FLUSH_BYTES).all()
    dec = R.LaneDecoder(enc.out[:, : R.FLUSH_BYTES],
                        np.full(W, R.FLUSH_BYTES))
    assert dec is not None  # init must not read past lane length
