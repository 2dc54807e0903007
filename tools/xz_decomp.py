#!/usr/bin/env python
"""Decompose the deficit vs xz -6 on the LZ-favourable synthetic corpora
(round-2 VERDICT missing #4 / next-round #9): how much is adaptation
(cold-table) cost vs missing long-range matching?

Method: encode X (cold) and X||X in ONE block (the second copy runs on
fully warmed tables). size(second copy) = size(X||X) - size(X) is the
context model's entropy on X with adaptation cost removed. The remaining
gap to xz's size on X is long-range structure a per-symbol context model
cannot see (xz matches whole reads verbatim against earlier reads —
possible in these high-coverage synthetic corpora at MB scale, not in
real gigabase-genome resequencing; see BASELINE.md).

Usage: JAX_PLATFORMS=cpu python tools/xz_decomp.py [level]
"""

import lzma
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from slimfastq_tpu.api import encode_fastq  # noqa: E402
from slimfastq_tpu.utils.synth import corpus  # noqa: E402

SPECS = [("illumina", 500), ("novaseq", 500), ("longread", 12),
         ("nheavy", 500), ("sra", 500)]


def main() -> int:
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    kw = dict(level=level, lanes=32, aux_lanes=8, block_records=10 ** 7)
    print(f"{'corpus':<10}{'raw':>9}{'sfq':>8}{'sfq_warm':>9}"
          f"{'xz-6':>8}{'adapt%':>8}{'lzgap%':>8}")
    for name, n in SPECS:
        data = corpus(name, n, seed=1234)
        cold = len(encode_fastq(data, **kw))
        both = len(encode_fastq(data + data, **kw))
        warm = both - cold
        xz = len(lzma.compress(data, preset=6))
        # adaptation share of the xz gap vs residual long-range gap, as %
        # of the cold size
        adapt = (cold - warm) / cold * 100
        lzgap = (warm - xz) / cold * 100
        print(f"{name:<10}{len(data):>9}{cold:>8}{warm:>9}{xz:>8}"
              f"{adapt:>+8.2f}{lzgap:>+8.2f}")
    print("\nadapt% = size the codec loses to cold tables (recoverable by"
          "\n         faster adaptation / priming); lzgap% = what remains"
          "\n         above xz even with fully warm tables (long-range"
          "\n         verbatim matches, outside a context model's reach).")
    return 0


if __name__ == "__main__":
    main()
