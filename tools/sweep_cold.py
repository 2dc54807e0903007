#!/usr/bin/env python
"""Measure-first probe for the cold-table problem (round-2 VERDICT
missing #4 / next-round #6): on the small sizes.json corpora L4 trails
L3 because its larger contexts adapt more slowly.

Phase 1 (this script): sweep adaptation-rate variants of the L4 geometry
over the regression corpora + a 16k illumina corpus, printing compressed
totals per variant. Rates are per-geometry fields already serialized in
the container header, so a LEVELS change is a config/format bump, not a
kernel change.

Usage: JAX_PLATFORMS=cpu python tools/sweep_cold.py [--quick]
"""

import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from slimfastq_tpu.api import encode_fastq  # noqa: E402
from slimfastq_tpu.config import LEVELS, config_for_level  # noqa: E402
from slimfastq_tpu.utils.synth import corpus, synth_fastq  # noqa: E402

SPECS = [("illumina", 500), ("novaseq", 500), ("longread", 12),
         ("nheavy", 500), ("sra", 500)]
CFG = dict(lanes=32, aux_lanes=8, block_records=256)


def main() -> int:
    quick = "--quick" in sys.argv
    corpora = {}
    for name, n in SPECS:
        corpora[name] = corpus(name, n, seed=1234)
    if not quick:
        corpora["illum16k"] = synth_fastq(16384, read_len=100, seed=0,
                                          var_len=False, n_rate=0.0005)

    l3 = config_for_level(3, **CFG)
    l4 = config_for_level(4, **CFG)
    variants = {"L3": l3, "L4": l4}
    # rate sweep: faster adaptation (smaller shift) on qual / seq / both
    for dq in (-1, -2):
        variants[f"L4 qr{dq}"] = replace(
            l4, qual=replace(l4.qual, rate=l4.qual.rate + dq))
    for ds in (-1, -2):
        variants[f"L4 sr{ds}"] = replace(
            l4, seq=replace(l4.seq, rate=l4.seq.rate + ds))
    variants["L4 qr-1 sr-1"] = replace(
        l4, qual=replace(l4.qual, rate=l4.qual.rate - 1),
        seq=replace(l4.seq, rate=l4.seq.rate - 1))
    variants["L4 qr-2 sr-2"] = replace(
        l4, qual=replace(l4.qual, rate=l4.qual.rate - 2),
        seq=replace(l4.seq, rate=l4.seq.rate - 2))
    variants["L3 qr-1 sr-1"] = replace(
        l3, qual=replace(l3.qual, rate=l3.qual.rate - 1),
        seq=replace(l3.seq, rate=l3.seq.rate - 1))
    variants["L3 qr-2 sr-2"] = replace(
        l3, qual=replace(l3.qual, rate=l3.qual.rate - 2),
        seq=replace(l3.seq, rate=l3.seq.rate - 2))
    print(f"L3 rates: qual={l3.qual.rate} seq={l3.seq.rate}; "
          f"L4 rates: qual={l4.qual.rate} seq={l4.seq.rate}")

    names = list(corpora)
    print(f"{'variant':<14}" + "".join(f"{n:>10}" for n in names))
    base = {}
    for vname, cfg in variants.items():
        row = []
        for cname in names:
            c = cfg
            if cname == "illum16k":   # warm-table probe: one big block,
                c = replace(cfg, block_records=16384, lanes=256)
            enc = encode_fastq(corpora[cname], cfg=c)
            row.append(len(enc))
            if vname == "L3":
                base[cname] = len(enc)
        rel = "".join(f"{(sz / base[c] - 1) * 100:>+9.2f}%" for sz, c in
                      zip(row, names))
        print(f"{vname:<14}" + "".join(f"{sz:>10}" for sz in row))
        print(f"{'':<14}" + rel)
    return 0


if __name__ == "__main__":
    main()
