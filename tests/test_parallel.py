"""Multi-device sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4 item 4): blocks sharded N ways must produce byte-identical
payloads to the sequential per-block path."""

import numpy as np
import pytest

import jax

from slimfastq_tpu.config import config_for_level
from slimfastq_tpu.ops import streams_np
from slimfastq_tpu.parallel import mesh as pmesh
from slimfastq_tpu.pipeline import _seq_symbol_layout, _scatter_record_symbols


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return pmesh.make_mesh(8)


def _make_qual_blocks(num_blocks, n_rec, W, seed=0):
    rng = np.random.default_rng(seed)
    cfg = config_for_level(2, lanes=W, aux_lanes=8)
    syms_l, counts_l, pos_l, reset_l, steps_l = [], [], [], [], []
    for b in range(num_blocks):
        lengths = rng.integers(10, 60, size=n_rec).astype(np.int64)
        _, counts, S, pos, reset = _seq_symbol_layout(lengths, W)
        recs = [np.clip(35 + np.cumsum(rng.integers(-2, 3, size=L)),
                        0, 63).astype(np.uint32) for L in lengths]
        syms = _scatter_record_symbols(recs, W, S, counts)
        syms_l.append(syms)
        counts_l.append(counts)
        pos_l.append(pos)
        reset_l.append(reset)
        steps_l.append(S)
    return cfg, syms_l, counts_l, pos_l, reset_l, steps_l


def test_sharded_encode_matches_oracle(mesh8):
    cfg, syms_l, counts_l, pos_l, reset_l, steps_l = _make_qual_blocks(
        8, 48, 16)
    results = pmesh.encode_stream_blocks("qual", cfg.qual, mesh8,
                                         syms_l, counts_l, pos_l, reset_l)
    for b in range(8):
        p_np, l_np = streams_np.encode_stream(
            "qual", cfg.qual, syms_l[b], counts_l[b],
            pos=pos_l[b], reset=reset_l[b])
        p_jx, l_jx = results[b]
        assert np.array_equal(l_np, l_jx), f"block {b} lane lens differ"
        assert np.array_equal(p_np, p_jx), f"block {b} payload differs"


def test_sharded_encode_mixed_step_buckets(mesh8):
    """Blocks whose pad_steps buckets differ (e.g. a final partial block)
    must still encode byte-identically to sequential (ADVICE.md round-1
    medium finding: common-Sp batching changed short blocks' bytes)."""
    rng = np.random.default_rng(11)
    cfg = config_for_level(2, lanes=16, aux_lanes=8)
    W = 16
    syms_l, counts_l, pos_l, reset_l = [], [], [], []
    for n_rec in (160, 48, 160, 16):  # Sp crosses a STEP_BUCKET boundary
        lengths = rng.integers(10, 60, size=n_rec).astype(np.int64)
        _, counts, S, pos, reset = _seq_symbol_layout(lengths, W)
        recs = [np.clip(35 + np.cumsum(rng.integers(-2, 3, size=L)),
                        0, 63).astype(np.uint32) for L in lengths]
        syms_l.append(_scatter_record_symbols(recs, W, S, counts))
        counts_l.append(counts)
        pos_l.append(pos)
        reset_l.append(reset)
    from slimfastq_tpu.ops import ranger_np as R
    assert len({R.pad_steps(s.shape[0]) for s in syms_l}) > 1
    results = pmesh.encode_stream_blocks("qual", cfg.qual, mesh8,
                                         syms_l, counts_l, pos_l, reset_l)
    for b in range(len(syms_l)):
        p_np, l_np = streams_np.encode_stream(
            "qual", cfg.qual, syms_l[b], counts_l[b],
            pos=pos_l[b], reset=reset_l[b])
        p_jx, l_jx = results[b]
        assert np.array_equal(l_np, l_jx), f"block {b} lane lens differ"
        assert np.array_equal(p_np, p_jx), f"block {b} payload differs"


def test_sharded_file_partial_last_block_byte_identical(mesh8):
    """Whole-file sharded encode with a short final block must equal the
    sequential container byte-for-byte."""
    from slimfastq_tpu.api import encode_fastq
    from slimfastq_tpu.parallel.sharded import encode_fastq_sharded
    from slimfastq_tpu.utils.synth import synth_fastq
    from slimfastq_tpu.config import config_for_level as cfl
    data = synth_fastq(300, read_len=50, seed=21, var_len=True)
    cfg = cfl(2, lanes=16, aux_lanes=8, block_records=128)  # 128+128+44
    seq = encode_fastq(data, cfg=cfg, use_native=False)
    shd = encode_fastq_sharded(data, cfg, mesh=mesh8)
    assert shd == seq


def test_sharded_file_mixed_qual_depth_and_minq(mesh8):
    """Blocks with different per-block qual depth (6 vs 7 bit) and minq
    must encode byte-identically to sequential through the device-raw
    sharded path (per-block qual bias is a vmapped input; depth groups
    compile separately)."""
    from slimfastq_tpu.api import decode_fastq, encode_fastq
    from slimfastq_tpu.parallel.sharded import encode_fastq_sharded
    rng = np.random.default_rng(7)
    recs = []
    for r in range(96):
        L = int(rng.integers(20, 50))
        seq = bytes(rng.choice(list(b"ACGT"), size=L).astype(np.uint8))
        if r < 48:  # block 0: narrow range (depth 6, minq '#')
            qual = bytes((35 + rng.integers(0, 40, size=L))
                         .astype(np.uint8))
        else:       # block 1: wide range (depth 7, different minq)
            qual = bytes((33 + rng.integers(0, 90, size=L))
                         .astype(np.uint8))
        recs.append(b"@r%d\n%s\n+\n%s\n" % (r, seq, qual))
    data = b"".join(recs)
    cfg = config_for_level(2, lanes=16, aux_lanes=8, block_records=48)
    seq_bytes = encode_fastq(data, cfg=cfg, use_native=False)
    shd = encode_fastq_sharded(data, cfg, mesh=mesh8)
    assert shd == seq_bytes
    assert decode_fastq(shd) == data


def test_sharded_decode_roundtrip(mesh8):
    cfg, syms_l, counts_l, pos_l, reset_l, steps_l = _make_qual_blocks(
        5, 32, 16, seed=3)  # 5 blocks: exercises padding to mesh size
    enc = pmesh.encode_stream_blocks("qual", cfg.qual, mesh8,
                                     syms_l, counts_l, pos_l, reset_l)
    pay_l = [p for p, _ in enc]
    lens_l = [l for _, l in enc]
    dec = pmesh.decode_stream_blocks("qual", cfg.qual, mesh8,
                                     pay_l, lens_l, counts_l, steps_l,
                                     pos_l, reset_l)
    for b in range(5):
        S = steps_l[b]
        mask = np.arange(S)[:, None] < counts_l[b][None, :]
        assert np.array_equal(dec[b][mask], syms_l[b][:S][mask])
