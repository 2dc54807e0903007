"""Device-side lane pack/unpack (ops/pack_jax) and the raw SEQ+QUAL
pipeline path: byte equality against the host pack (native.pack_lanes)
and the pure-Python oracle container bytes."""

import numpy as np
import pytest

from slimfastq_tpu import api, native
from slimfastq_tpu.ops import pack_jax, ranger_np as R
from slimfastq_tpu.ops import streams_jax, streams_np
from slimfastq_tpu.utils.synth import synth_fastq

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _random_ranges(rng, n, maxlen):
    lens = rng.integers(0, maxlen, size=n).astype(np.int64)
    total = int(lens.sum())
    data = rng.integers(33, 120, size=total + 7).astype(np.uint8)
    offs = np.zeros(n, dtype=np.int64)
    offs[1:] = np.cumsum(lens[:-1])
    offs += 7
    return data, offs, lens, total


@pytest.mark.parametrize("n,W,maxlen", [(100, 8, 30), (257, 32, 50),
                                        (64, 16, 1), (33, 8, 0)])
def test_pack_device_equals_host(n, W, maxlen):
    import jax.numpy as jnp
    rng = np.random.default_rng(n)
    data, offs, lens, _ = _random_ranges(rng, n, maxlen + 1)
    counts = np.bincount(np.arange(n) % W, weights=lens,
                         minlength=W).astype(np.int64)
    S = int(counts.max()) if counts.size else 0
    Sp = max(R.pad_steps(S), 1)
    ref, _, _, _ = native.pack_lanes(data, offs, lens, W, Sp, bias=5,
                                     dtype=np.uint8)
    dpad = np.zeros(pack_jax.pad_flat(len(data)), dtype=np.uint8)
    dpad[: len(data)] = data
    got = np.asarray(pack_jax.pack_device(
        jnp.asarray(dpad), offs.astype(np.int32), lens.astype(np.int32),
        W, Sp, bias=5))
    mask = np.arange(Sp)[:, None] < counts[None, :]
    assert (got[mask] == ref[:Sp][mask]).all()

    # inverse: scatter back to record-major
    rec_starts = np.zeros(n, dtype=np.int64)
    rec_starts[1:] = np.cumsum(lens[:-1])
    total = int(lens.sum())
    flat = np.asarray(pack_jax.unpack_device(
        jnp.asarray(got), rec_starts.astype(np.int32),
        lens.astype(np.int32), W, total, bias=-5))[:total]
    ref_flat = native.unpack_lanes(ref.astype(np.uint8), lens, W,
                                   rec_starts, total, bias=-5)
    assert (flat == ref_flat[:total]).all()


@pytest.mark.parametrize("reads,var,n_rate,level", [
    (300, True, 0.02, 3),
    pytest.param(128, False, 0.0, 1, marks=pytest.mark.slow),
    pytest.param(500, True, 0.3, 2, marks=pytest.mark.slow)])
def test_raw_path_container_equals_oracle(reads, var, n_rate, level):
    d = synth_fastq(reads, read_len=60, seed=reads, var_len=var,
                    n_rate=n_rate)
    kw = dict(lanes=32, aux_lanes=8)
    ref = api.encode_fastq(d, level=level, backend=streams_np,
                           use_native=False, **kw)
    raw = api.encode_fastq(d, level=level, backend=streams_jax,
                           use_native=True, **kw)
    assert raw == ref
    assert api.decode_fastq(raw, backend=streams_jax,
                            use_native=True) == d


def test_raw_path_edge_cases():
    cases = [
        b"@r1\n\n+\n\n@r2\nACGT\n+\nIIII\n",       # zero-length read
        b"@r1\nNNNNN\n+\nIIIII\n",                  # all-N read
        b"@a b\nACGTACGT\n+a b\nIIIIJJJJ\n" * 7,    # plus-line copies
        b"@r1\n\n+\n\n",                            # single empty record
    ]
    kw = dict(lanes=32, aux_lanes=8)
    for d in cases:
        ref = api.encode_fastq(d, level=3, backend=streams_np,
                               use_native=False, **kw)
        raw = api.encode_fastq(d, level=3, backend=streams_jax,
                               use_native=True, **kw)
        assert raw == ref
        assert api.decode_fastq(raw, backend=streams_jax,
                                use_native=True) == d


def test_scan_bad_matches_pack_lanes():
    rng = np.random.default_rng(3)
    d = synth_fastq(400, read_len=50, seed=3, var_len=True, n_rate=0.1)
    data = np.frombuffer(d, dtype=np.uint8)
    idx, n = native.fastq_index(data)
    lens = idx["seq_len"].astype(np.int64)
    _, _, nbad_ref, rec_bad_ref = native.pack_lanes(
        data, idx["seq_off"], lens, 16, 4096, map256=None, bias=0,
        dtype=np.uint8)
    # pack_lanes without map counts no bad; use the mapped variant
    from slimfastq_tpu.pipeline import _BASE_TO_CODE
    _, _, nbad_ref, rec_bad_ref = native.pack_lanes(
        data, idx["seq_off"], lens, 16, 4096, map256=_BASE_TO_CODE,
        dtype=np.uint8)
    nbad, rec_bad = native.scan_bad(data, idx["seq_off"], lens)
    assert nbad == nbad_ref
    assert (rec_bad == rec_bad_ref).all()
