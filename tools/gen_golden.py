#!/usr/bin/env python
"""Regenerate the golden bit-format container fixtures in tests/data/.

ONLY run this after an INTENTIONAL format change (container framing,
header layout, level geometry, coder constants), review the diff, and
commit the new fixtures together with the change — these files are the
tripwire that makes silent format breaks fail tests/test_golden.py.

Regenerates golden_v5_l{1..4}.sfq from the checked-in golden_v2.fastq
(the input FASTQ is version-agnostic). Does NOT touch golden_v1.* or
golden_v2_l*.sfq / golden_v3_l*.sfq / golden_v4_l*.sfq (backward-compat pins: containers from older rounds
must keep decoding forever) or golden_streams.npz (level-2 stream
payloads; regenerate by hand only if the coder itself changes).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from slimfastq_tpu.api import decode_fastq, encode_fastq  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def main() -> None:
    with open(os.path.join(DATA, "golden_v2.fastq"), "rb") as f:
        data = f.read()
    for level in (1, 2, 3, 4):
        enc = encode_fastq(data, level=level, lanes=32, aux_lanes=8,
                           block_records=160, use_native=False)
        assert decode_fastq(enc) == data, f"round trip broken at L{level}"
        path = os.path.join(DATA, f"golden_v5_l{level}.sfq")
        with open(path, "wb") as f:
            f.write(enc)
        print(f"wrote {os.path.normpath(path)} ({len(enc)} bytes)")


if __name__ == "__main__":
    main()
