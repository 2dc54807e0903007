#!/usr/bin/env python
"""Size/round-trip comparison against a real slimfastq binary, for when the
sealed environment gains one (BASELINE.md notes the comparison is blocked
until then).

Usage:
    python tools/compare_reference.py <input.fastq> [--slimfastq PATH]

Reports, per level 1-4: our container size, slimfastq's size at the
matching level (if the binary is available), gzip -9, and verifies our
bit-exact round trip on the input.
"""

import argparse
import gzip
import json
import os
import shutil
import subprocess
import sys
import tempfile


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--slimfastq", default=shutil.which("slimfastq"),
                    help="path to a slimfastq binary (optional)")
    ap.add_argument("--levels", default="1,2,3,4")
    args = ap.parse_args()

    from slimfastq_tpu.api import decode_fastq, encode_fastq

    with open(args.input, "rb") as f:
        data = f.read()
    out = {"input": args.input, "raw_bytes": len(data),
           "gzip9_bytes": len(gzip.compress(data, 9)), "levels": {}}

    for lv in (int(x) for x in args.levels.split(",")):
        enc = encode_fastq(data, level=lv)
        assert decode_fastq(enc) == data, f"round-trip failed at level {lv}"
        rec = {"ours_bytes": len(enc),
               "ours_ratio": round(len(data) / len(enc), 4)}
        if args.slimfastq:
            with tempfile.TemporaryDirectory() as td:
                sfq = os.path.join(td, "ref.sfq")
                r = subprocess.run([args.slimfastq, f"-{lv}", args.input,
                                    sfq], capture_output=True)
                if r.returncode == 0 and os.path.exists(sfq):
                    ref = os.path.getsize(sfq)
                    rec["slimfastq_bytes"] = ref
                    rec["ours_vs_slimfastq"] = round(len(enc) / ref, 4)
        out["levels"][lv] = rec
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
