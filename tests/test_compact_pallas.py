"""On-device (Pallas) emission compaction vs the host reference
(interpret mode on CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from slimfastq_tpu.ops import compact_pallas as CP


@pytest.mark.parametrize("seed,NC,W,CB", [(0, 32, 32, 64), (1, 16, 8, 32)])
def test_compact_matches_reference(seed, NC, W, CB):
    rng = np.random.default_rng(seed)
    eptrs = rng.integers(0, CB // 3, size=(NC, W)).astype(np.int32)
    ebufs = np.zeros((NC, W, CB), dtype=np.int32)
    for c in range(NC):
        for w in range(W):
            ebufs[c, w, : eptrs[c, w]] = rng.integers(1, 256, eptrs[c, w])
    Bmax = 1024
    out, totals = CP.compact_device(jnp.asarray(ebufs),
                                    jnp.asarray(eptrs), Bmax)
    out = np.asarray(out)
    totals = np.asarray(totals)
    for w in range(W):
        ref = np.concatenate([ebufs[c, w, : eptrs[c, w]]
                              for c in range(NC)]) if totals[w] else \
            np.zeros(0, np.int32)
        assert np.array_equal(out[w, : totals[w]], ref), f"lane {w}"


def test_compact_empty_lanes():
    NC, W, CB = 8, 8, 32
    eptrs = np.zeros((NC, W), dtype=np.int32)
    ebufs = np.zeros((NC, W, CB), dtype=np.int32)
    out, totals = CP.compact_device(jnp.asarray(ebufs),
                                    jnp.asarray(eptrs), 256)
    assert int(np.asarray(totals).sum()) == 0


@pytest.mark.parametrize("seed,NC,W,CB", [(2, 16, 16, 64)])
def test_compact_v2_matches_reference(seed, NC, W, CB):
    rng = np.random.default_rng(seed)
    eptrs = rng.integers(0, CB // 3, size=(NC, W)).astype(np.int32)
    ebufs = np.zeros((NC, W, CB), dtype=np.int32)
    for c in range(NC):
        for w in range(W):
            ebufs[c, w, : eptrs[c, w]] = rng.integers(1, 256, eptrs[c, w])
    out, totals = CP.compact_device_v2(jnp.asarray(ebufs),
                                       jnp.asarray(eptrs), 1024)
    out = np.asarray(out)
    totals = np.asarray(totals)
    for w in range(W):
        ref = np.concatenate([ebufs[c, w, : eptrs[c, w]]
                              for c in range(NC)]) if totals[w] else \
            np.zeros(0, np.int32)
        assert np.array_equal(out[w, : totals[w]], ref), f"lane {w}"


def test_device_compact_encode_path_identical(monkeypatch):
    """SFQ_DEVICE_COMPACT encode path (pallas impl) must produce
    byte-identical payloads/lens to the host compactor. The TPU-only
    gate is monkeypatched open (on CPU the Pallas kernel runs in
    interpret mode); test_compact_xla covers the default xla impl."""
    from slimfastq_tpu.config import config_for_level
    from slimfastq_tpu.ops import streams_jax
    from slimfastq_tpu.pipeline import _lane_lengths_matrix

    rng = np.random.default_rng(3)
    cfg = config_for_level(2, lanes=16, aux_lanes=8)
    W = cfg.lanes
    lengths = rng.integers(0, 50, size=80).astype(np.int64)
    ll = _lane_lengths_matrix(lengths, W)
    counts = ll.sum(axis=0)
    S = int(counts.max())
    syms = np.zeros((S, W), dtype=np.uint32)
    offs = np.zeros(W, dtype=np.int64)
    for r, L in enumerate(lengths):
        w = r % W
        syms[offs[w]: offs[w] + L, w] = rng.integers(0, 64, L)
        offs[w] += L

    p_host, l_host = streams_jax.encode_stream_ll("qual", cfg.qual, syms,
                                                  ll, counts)
    monkeypatch.setattr(streams_jax, "_use_device_compact",
                        lambda W: W % 8 == 0)
    monkeypatch.setattr(streams_jax, "_COMPACT_IMPL", "pallas")
    p_dev, l_dev = streams_jax.encode_stream_ll("qual", cfg.qual, syms,
                                                ll, counts)
    assert np.array_equal(l_host, l_dev)
    assert np.array_equal(p_host, p_dev)
