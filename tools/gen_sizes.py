#!/usr/bin/env python
"""Regenerate tests/data/sizes.json — the checked-in per-stream
compressed-size baseline used by tests/test_sizes.py (SURVEY.md §4 item 5).

Run after an INTENTIONAL ratio-affecting change (new context model, level
geometry change), review the diff, and commit the new JSON together with
the change. Matches the test's corpora/levels exactly.
"""

import io
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from slimfastq_tpu import container                          # noqa: E402
from slimfastq_tpu.api import decode_fastq, encode_fastq     # noqa: E402
from slimfastq_tpu.utils.synth import corpus                 # noqa: E402

# (corpus, num_reads) — small enough for CI, diverse enough to catch
# per-stream regressions on different data shapes
SPECS = [("illumina", 500), ("novaseq", 500), ("longread", 12),
         ("nheavy", 500), ("sra", 500)]
LEVELS = (1, 2, 3, 4)
CFG = dict(lanes=32, aux_lanes=8, block_records=256)


def measure() -> dict:
    out: dict = {}
    for name, n in SPECS:
        data = corpus(name, n, seed=1234)
        ent: dict = {"raw": len(data), "levels": {}}
        for lv in LEVELS:
            enc = encode_fastq(data, level=lv, **CFG)
            assert decode_fastq(enc) == data, (name, lv)
            f = io.BytesIO(enc)
            cfg = container.read_header(f)
            streams: dict[str, int] = {}
            for blk in container.iter_blocks(f, cfg):
                for sname, es in blk.streams.items():
                    streams[sname] = streams.get(sname, 0) \
                        + int(es.lane_lens.sum())
            ent["levels"][str(lv)] = {"total": len(enc), "streams": streams}
            print(f"{name:9s} L{lv}: {len(data):8d} -> {len(enc):8d} "
                  f"({len(data)/len(enc):.3f}x)")
        out[name] = ent
    return out


if __name__ == "__main__":
    path = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                        "sizes.json")
    with open(path, "w") as f:
        json.dump(measure(), f, indent=1, sort_keys=True)
    print("wrote", os.path.normpath(path))
