#!/usr/bin/env python
"""Fine-grained host-stage profile of one encode+decode block (CPU-only;
run on a quiet machine — the dev VM's CPU-steal makes means useless, so
everything is min-of-N). Usage:

    JAX_PLATFORMS=cpu python tools/profile_host.py [reads] [read_len]

The ad-hoc versions of this script drove every round-2 host optimization
(BASELINE.md "Round-2 late update"); checked in so future rounds start
from the same measurements.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from slimfastq_tpu import native  # noqa: E402
from slimfastq_tpu.config import config_for_level  # noqa: E402
from slimfastq_tpu.utils.synth import synth_fastq  # noqa: E402

pc = time.perf_counter


def tmin(fn, it=7):
    fn()
    best = 1e9
    for _ in range(it):
        t0 = pc()
        fn()
        best = min(best, pc() - t0)
    return best * 1000


def main() -> None:
    reads = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    d = synth_fastq(reads, read_len=read_len, seed=0, var_len=False,
                    n_rate=0.0005)
    data = np.frombuffer(d, dtype=np.uint8)
    cfg = config_for_level(3, lanes=1024, aux_lanes=64,
                           block_records=reads)
    W, Wa = cfg.lanes, cfg.aux_lanes
    idx, n = native.fastq_index(data)
    lengths = idx["seq_len"].astype(np.int64)
    bidx = {k: np.ascontiguousarray(idx[k])
            for k in ("id_off", "id_len", "plus_off", "plus_len")}

    from slimfastq_tpu.pipeline_native import stream_jobs_fast
    from slimfastq_tpu.pipeline import _lane_lengths_matrix

    print(f"-- encode host stages ({reads} x {read_len} bp, "
          f"{len(d)/1e6:.1f} MB) --")
    print(f"fastq_index      {tmin(lambda: native.fastq_index(data)):7.2f} ms")
    print(f"prep total       "
          f"{tmin(lambda: stream_jobs_fast(data, idx, 0, n, cfg, want_pos_reset=False, device_pack=True)):7.2f} ms")
    print(f"  ids_encode     {tmin(lambda: native.ids_encode(data, bidx, n, Wa, Wa)):7.2f} ms")
    print(f"  scan_bad       {tmin(lambda: native.scan_bad(data, idx['seq_off'], lengths)):7.2f} ms")
    print(f"  minmax         {tmin(lambda: native.minmax_ranges(data, idx['qual_off'], lengths)):7.2f} ms")
    print(f"  lens_encode    {tmin(lambda: native.lens_encode(lengths, Wa, Wa)):7.2f} ms")
    print(f"  ll_mat         {tmin(lambda: _lane_lengths_matrix(lengths, W)):7.2f} ms")

    flags, dl, xl = native.ids_encode(data, bidx, n, Wa, Wa)
    print("-- decode host stages --")
    print(f"ids_decode       {tmin(lambda: native.ids_decode(n, Wa, flags, dl, xl, Wa)):7.2f} ms")
    ida, ioff, ilen, pla, poff, plen = native.ids_decode(n, Wa, flags, dl,
                                                         xl, Wa)
    rec_starts = np.zeros(n, dtype=np.int64)
    rec_starts[1:] = np.cumsum(lengths[:-1])
    total = int(lengths.sum())
    seq = data[:total].copy()
    qual = data[:total].copy()
    print(f"fastq_assemble   "
          f"{tmin(lambda: native.fastq_assemble(n, ida, ioff, ilen, seq, rec_starts, qual, lengths, pla, poff, plen)):7.2f} ms")


if __name__ == "__main__":
    main()
