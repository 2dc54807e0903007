#!/usr/bin/env python
"""Sweep aux_lanes (round-2 VERDICT item #1(b), carried to round 4 #6):
the aux-lane count bounds the parallelism of the host ID codec (C++
OpenMP over lanes) AND is a format knob (lane-local delta baselines =
r - aux_lanes), so more lanes = faster host ID coding but slightly
looser deltas. Measures ids_encode/ids_decode wall time and the
compressed-size cost per Wa on a 64k-record block.

Run on a QUIET host (host timings; min-of-N):
  JAX_PLATFORMS=cpu python tools/sweep_aux.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from slimfastq_tpu import native  # noqa: E402
from slimfastq_tpu.api import decode_fastq, encode_fastq  # noqa: E402
from slimfastq_tpu.utils.synth import synth_fastq  # noqa: E402


def tmin(fn, n=7):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    reads = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    data = synth_fastq(reads, read_len=100, seed=0)
    buf = np.frombuffer(data, dtype=np.uint8)
    idx, n = native.fastq_index(data)
    bidx = {k: np.ascontiguousarray(idx[k])
            for k in ("id_off", "id_len", "plus_off", "plus_len")}
    base_total = None
    print(f"{'Wa':>4} {'ids_enc ms':>11} {'ids_dec ms':>11} "
          f"{'container B':>12} {'vs Wa=64':>9}")
    for wa in (32, 64, 128, 256):
        t_enc, (flags, dl, xl) = tmin(
            lambda: native.ids_encode(buf, bidx, n, wa, wa))
        # decode twin needs record-order flags + the lane buffers
        dlanes = [np.frombuffer(bytes(b), dtype=np.uint8) for b in dl]
        xlanes = [np.frombuffer(bytes(b), dtype=np.uint8) for b in xl]
        t_dec, _ = tmin(lambda: native.ids_decode(
            n, wa, np.asarray(flags, dtype=np.uint8), dlanes, xlanes, wa))
        enc = encode_fastq(data, level=3, aux_lanes=wa)
        assert decode_fastq(enc) == data
        total = len(enc)
        if wa == 64:
            base_total = total
        rel = (f"{(total - base_total) / base_total * 100:+.3f}%"
               if base_total else "—")
        print(f"{wa:>4} {t_enc*1e3:>11.2f} {t_dec*1e3:>11.2f} "
              f"{total:>12} {rel:>9}")
        if base_total is None:
            base_total = total


if __name__ == "__main__":
    main()
