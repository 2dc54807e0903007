"""Unit tests for the lane-interleaved binary range coder (NumPy oracle).

The oracle is the normative bit-format spec (SURVEY.md §4 item 1: coder
golden/round-trip tests + model-update law tests). Primitives are unmasked
(pad-coded lockstep format); ragged-lane behaviour is tested at the stream
level in test_streams/test_jax_equivalence.
"""

import numpy as np
import pytest

from slimfastq_tpu.ops import ranger_np as R


def _roundtrip(syms, ctxs, depth, num_ctx, rate=4):
    S, W = syms.shape
    nodes = (1 << depth) - 1
    sac = num_ctx * nodes
    tsize = (num_ctx + 1) * nodes
    table = R.table_init(tsize, sac)
    enc = R.LaneEncoder(W, R.worst_case_bytes(S * depth))
    for t in range(S):
        R.encode_symbols(enc, table, ctxs[t], syms[t], depth, rate, sac)
    enc.flush()
    lens = enc.ptr.copy()
    payload = enc.out[:, : int(lens.max())]

    table2 = R.table_init(tsize, sac)
    dec = R.LaneDecoder(payload, lens)
    out = np.zeros_like(syms)
    for t in range(S):
        out[t] = R.decode_symbols(dec, table2, ctxs[t], depth, rate, sac)
    assert np.array_equal(table, table2), "enc/dec model state diverged"
    return out, lens


def test_roundtrip_random_u6():
    rng = np.random.default_rng(0)
    W, S = 16, 400
    syms = rng.integers(0, 64, size=(S, W)).astype(np.uint32)
    ctxs = rng.integers(0, 50, size=(S, W)).astype(np.uint32)
    out, _ = _roundtrip(syms, ctxs, 6, 50)
    assert np.array_equal(out, syms)


@pytest.mark.parametrize("depth", [1, 2, 6, 8])
def test_roundtrip_depths(depth):
    rng = np.random.default_rng(depth)
    W, S = 8, 200
    syms = rng.integers(0, 1 << depth, size=(S, W)).astype(np.uint32)
    ctxs = np.zeros((S, W), dtype=np.uint32)
    out, _ = _roundtrip(syms, ctxs, depth, 1)
    assert np.array_equal(out, syms)


def test_skewed_compresses():
    """Near-constant symbols must cost far less than uniform."""
    W, S = 8, 1000
    syms = np.zeros((S, W), dtype=np.uint32)
    syms[::97] = 3
    ctxs = np.zeros((S, W), dtype=np.uint32)
    _, lens = _roundtrip(syms, ctxs, 6, 1)
    bits_per_sym = lens.sum() * 8 / (S * W)
    assert bits_per_sym < 1.0, bits_per_sym


def test_all_lanes_one_context_collision():
    """Every lane hitting the same context each step (worst-case scatter
    collisions) must stay bit-exact — the deterministic-update law."""
    rng = np.random.default_rng(7)
    W, S = 32, 300
    syms = rng.integers(0, 4, size=(S, W)).astype(np.uint32)
    ctxs = np.zeros((S, W), dtype=np.uint32)
    out, _ = _roundtrip(syms, ctxs, 2, 1)
    assert np.array_equal(out, syms)


def test_sacrificial_context_cheap_and_frozen():
    """Padded steps (sacrificial ctx) must cost ~nothing and not adapt."""
    W, S, depth = 4, 1000, 6
    num_ctx = 2
    syms = np.zeros((S, W), dtype=np.uint32)
    ctxs = np.full((S, W), num_ctx, dtype=np.uint32)  # all sacrificial
    nodes = (1 << depth) - 1
    sac = num_ctx * nodes
    table = R.table_init((num_ctx + 1) * nodes, sac)
    before = table.copy()
    enc = R.LaneEncoder(W, R.worst_case_bytes(S * depth))
    for t in range(S):
        R.encode_symbols(enc, table, ctxs[t], syms[t], depth, 4, sac)
    enc.flush()
    assert np.array_equal(table, before), "sacrificial entries adapted"
    bits_per_sym = enc.ptr.sum() * 8 / (S * W)
    assert bits_per_sym < 0.1, bits_per_sym


def test_update_law_clamps_and_markers_cancel():
    table = R.table_init(4, 4)
    idx = np.zeros(8, dtype=np.int64)
    bit = np.zeros(8, dtype=np.uint32)  # all push p up
    for _ in range(200):
        R.table_mark(table, idx, 4)
        marked = table[idx]
        R.table_update(table, idx, marked, bit, 2, 4)
    assert 0 <= table[0] <= R.PROB_MAX  # markers fully cancelled
    bit[:] = 1
    for _ in range(200):
        R.table_mark(table, idx, 4)
        marked = table[idx]
        R.table_update(table, idx, marked, bit, 2, 4)
    assert R.PROB_MIN <= table[0] <= R.PROB_MAX


def test_collision_cap_slows_merged_update():
    """64 colliding lanes must move p by at most ~2^CAP_LOG2 single
    steps, not 64."""
    one = R.table_init(1 + 1, 1)
    many = R.table_init(1 + 1, 1)
    bit1 = np.zeros(1, dtype=np.uint32)
    bitN = np.zeros(64, dtype=np.uint32)
    R.table_mark(one, np.zeros(1, np.int64), 1)
    R.table_update(one, np.zeros(1, np.int64), one[np.zeros(1, np.int64)],
                   bit1, 4, 1)
    single_step = one[0] - R.PROB_INIT
    R.table_mark(many, np.zeros(64, np.int64), 1)
    R.table_update(many, np.zeros(64, np.int64),
                   many[np.zeros(64, np.int64)], bitN, 4, 1)
    merged = many[0] - R.PROB_INIT
    assert merged <= (1 << R.CAP_LOG2) * single_step + 64
    assert many[0] <= R.PROB_MAX


def test_single_lane_single_symbol():
    syms = np.array([[5]], dtype=np.uint32)
    ctxs = np.zeros((1, 1), dtype=np.uint32)
    out, _ = _roundtrip(syms, ctxs, 6, 1)
    assert out[0, 0] == 5


def test_pad_steps_format_rule():
    assert R.pad_steps(0) == 0
    assert R.pad_steps(1) == R.STEP_BUCKET
    assert R.pad_steps(R.STEP_BUCKET) == R.STEP_BUCKET
    assert R.pad_steps(R.STEP_BUCKET + 1) == 2 * R.STEP_BUCKET
