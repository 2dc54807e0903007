#!/usr/bin/env python
"""Fine-grained profile of the decode host glue (everything in
decode_block_device/finish that is NOT device kernels): the remaining
dec_finish budget after ids_decode. Run on a QUIET host."""

import io
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from slimfastq_tpu import api, container, native  # noqa: E402
from slimfastq_tpu.config import config_for_level  # noqa: E402
from slimfastq_tpu.ops import streams_jax  # noqa: E402
from slimfastq_tpu import pipeline_native as PN  # noqa: E402
from slimfastq_tpu.utils.synth import synth_fastq  # noqa: E402

pc = time.perf_counter


def tmin(fn, it=9):
    fn()
    best = 1e9
    for _ in range(it):
        t0 = pc()
        fn()
        best = min(best, pc() - t0)
    return best * 1000


def main():
    d = synth_fastq(65536, read_len=100, seed=0, var_len=False,
                    n_rate=0.0005)
    cfg = config_for_level(3, lanes=1024, aux_lanes=64,
                           block_records=65536)
    enc = api.encode_fastq(d, cfg=cfg, backend=streams_jax)
    f = io.BytesIO(enc)
    cfg2 = container.read_header(f)
    blk = container.read_block(f, cfg2.fmt)

    # pre-decode the aux symbol matrices once (device work, not timed)
    inter = PN.decode_block_device(blk, cfg2, streams_jax)
    (n, prev_step, lengths, flags, idd_lanes, idx_lanes, sx_lanes,
     rec_starts, seq_bytes, qual_bytes) = inter

    # the bench's dec_finish = decode_block_fast with a shim: aux decode
    # returns precomputed matrices. Reproduce that and time each part.
    from slimfastq_tpu.pipeline import _lane_lengths_matrix
    Wa = cfg2.aux_lanes
    W = cfg2.lanes

    # piece 1: dec_lanes equivalents (transpose + row views) per stream
    for name in ("LEN", "FLAG", "IDD", "IDX", "SEQX"):
        es = blk.streams[name]
        c = es.sym_counts
        if c is None:
            rec_per_lane = (n - np.arange(Wa) + Wa - 1) // Wa
            c = 3 * rec_per_lane
        syms = np.zeros((int(np.asarray(c).max()) if len(c) else 0, Wa),
                        np.uint8)

        def piece(syms=syms, c=c):
            rows = native.transpose_mat(np.ascontiguousarray(syms))
            return [rows[w, : c[w]] for w in range(len(c))]
        print(f"dec_lanes {name}: {tmin(piece):.3f} ms")

    # piece 2: flags reorder
    rec_per_lane = (n - np.arange(Wa) + Wa - 1) // Wa
    f_grouped = np.concatenate(
        [np.zeros(3 * int(r), np.uint8) for r in rec_per_lane])

    def flags_reorder():
        forder = PN._group_order(n, Wa)
        out = np.zeros(3 * n, dtype=np.uint8)
        out.reshape(n, 3)[forder] = f_grouped.reshape(n, 3)
        return out
    print(f"flags reorder: {tmin(flags_reorder):.3f} ms")

    # piece 3: lens_decode + cumsum + ll_mat
    len_lanes = [np.zeros(0, np.uint8)] * Wa
    print(f"ll_mat+counts: "
          f"{tmin(lambda: _lane_lengths_matrix(lengths, W).sum(axis=0)):.3f}"
          " ms")
    rs = np.zeros(n, dtype=np.int64)

    def starts():
        rs[1:] = np.cumsum(lengths[:-1])
        return rs
    print(f"rec_starts: {tmin(starts):.3f} ms")

    print(f"ids_decode: {tmin(lambda: native.ids_decode(n, Wa, flags, idd_lanes, idx_lanes, prev_step)):.3f} ms")
    print(f"seqx_apply: {tmin(lambda: native.seqx_apply(sx_lanes, cfg2.fmt, n, rec_starts, lengths, seq_bytes)):.3f} ms")
    ida, ioff, ilen, pla, poff, plen = native.ids_decode(
        n, Wa, flags, idd_lanes, idx_lanes, prev_step)
    sb = np.ascontiguousarray(seq_bytes)
    qb = np.ascontiguousarray(qual_bytes)
    print(f"fastq_assemble: {tmin(lambda: native.fastq_assemble(n, ida, ioff, ilen, sb, rec_starts, qb, lengths, pla, poff, plen)):.3f} ms")

    # whole finish via the bench's shim protocol
    seq_flat = seq_bytes.copy()
    qual_flat = qual_bytes

    class _Shim:
        def __init__(self):
            self.plain = []
            for name in ("LEN", "FLAG", "IDD", "IDX", "SEQX"):
                es = blk.streams[name]
                c = es.sym_counts
                if c is None:
                    c = 3 * rec_per_lane
                S = int(np.asarray(c).max()) if len(c) else 0
                self.plain.append(np.zeros((S, Wa), np.uint8))

        def decode_stream(self, kind, geom, payload, lens, counts, S,
                          pos=None, reset=None):
            return self.plain.pop(0)

        def decode_seq_qual_raw(self, *a, **k):
            return seq_flat.copy(), qual_flat

    # NOTE: zeroed aux matrices break the real chains — this times the
    # structural glue only, not a correct decode
    import contextlib
    with contextlib.suppress(Exception):
        print(f"decode_block_fast (shim, glue-only): "
              f"{tmin(lambda: PN.decode_block_fast(blk, cfg2, _Shim())):.3f}"
              " ms")


if __name__ == "__main__":
    main()
