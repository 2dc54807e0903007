#!/usr/bin/env python
"""Print the BASELINE.md corpus ratio table: sfq levels vs gzip/bzip2/xz.

Corpora are the five size-regression families (utils/synth.corpus) at a
larger size than the checked-in fixtures so adaptive tables warm up,
plus `lowcov`: reads sampled at <=1x coverage. The default synthetic
genome is num_reads*read_len/8 long (8x coverage), which lets LZ77
codecs match entire reads verbatim against earlier reads — real
resequencing data from a gigabase genome offers no such cross-read
matches at MB file scales, so `lowcov` is the realistic regime for
judging the context-model codecs against LZ. General-purpose codec
throughputs are printed for context (single-threaded CPython bindings).

Run on CPU: `python tools/ratio_table.py [reads]`.
"""

import bz2
import gzip
import lzma
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from slimfastq_tpu.api import decode_fastq, encode_fastq  # noqa: E402
from slimfastq_tpu.utils.synth import corpus, synth_fastq  # noqa: E402

CORPORA = ("illumina", "lowcov", "novaseq", "longread", "nheavy", "sra")
LEVELS = (1, 3, 4)


def _data(name: str, reads: int) -> bytes:
    if name == "lowcov":
        return synth_fastq(reads, read_len=100, seed=0, n_rate=0.0005,
                           genome_size=reads * 200)
    n = max(reads // 8, 256) if name == "longread" else reads
    return corpus(name, n, seed=0)


def main() -> None:
    reads = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    speeds = {}
    print("| corpus | raw MB | " + " | ".join(f"sfq -{lv}" for lv in LEVELS)
          + " | gzip -9 | bzip2 -9 | xz -6 |")
    print("|---" * (len(LEVELS) + 5) + "|")
    for name in CORPORA:
        data = _data(name, reads)
        row = [name, f"{len(data) / 1e6:.2f}"]
        for lv in LEVELS:
            enc = encode_fastq(data, level=lv)
            assert decode_fastq(enc) == data, f"{name} L{lv} round trip"
            row.append(f"{len(data) / len(enc):.2f}x")
        for tag, fn in (("gzip", lambda d: gzip.compress(d, 9)),
                        ("bzip2", lambda d: bz2.compress(d, 9)),
                        ("xz", lambda d: lzma.compress(d, preset=6))):
            t0 = time.perf_counter()
            c = fn(data)
            dt = time.perf_counter() - t0
            speeds.setdefault(tag, []).append(len(data) / dt / 1e6)
            row.append(f"{len(data) / len(c):.2f}x")
        print("| " + " | ".join(row) + " |", flush=True)
    for tag, v in speeds.items():
        print(f"{tag} compress speed: {sum(v)/len(v):.1f} MB/s "
              f"(single core)", flush=True)


if __name__ == "__main__":
    main()
