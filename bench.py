#!/usr/bin/env python
"""Benchmark: FASTQ encode+decode throughput per chip (BASELINE.md metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline is computed against the only reference figure available in this
sealed environment: slimfastq's qualitative ~0.1 GB/s single-core speed
(BASELINE.md, marked unverified — no published numbers were retrievable).

Protocol: synthesise Illumina-like FASTQ, one full warm-up pass (jit
compilation; shapes are bucketed so timed passes hit the cache), then timed
encode + decode through the real end-to-end API (host parsing + device
coding + container), with round-trip verification.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    reads = int(os.environ.get("SFQ_BENCH_READS", 8192))
    read_len = int(os.environ.get("SFQ_BENCH_LEN", 100))
    level = int(os.environ.get("SFQ_BENCH_LEVEL", 3))

    from slimfastq_tpu.api import decode_fastq, encode_fastq
    from slimfastq_tpu.ops import streams_jax
    from slimfastq_tpu.utils.synth import synth_fastq

    import jax
    platform = jax.devices()[0].platform

    data = synth_fastq(reads, read_len=read_len, seed=0, var_len=False,
                       n_rate=0.0005)
    raw = len(data)
    kw = dict(lanes=512, aux_lanes=64, block_records=4096)

    # warm-up: compiles every stream kernel at the bucketed shapes
    enc = encode_fastq(data, level=level, backend=streams_jax, **kw)
    dec = decode_fastq(enc, backend=streams_jax)
    assert dec == data, "round-trip mismatch in warm-up"

    t0 = time.perf_counter()
    enc = encode_fastq(data, level=level, backend=streams_jax, **kw)
    t1 = time.perf_counter()
    dec = decode_fastq(enc, backend=streams_jax)
    t2 = time.perf_counter()
    assert dec == data, "round-trip mismatch"

    t_enc = t1 - t0
    t_dec = t2 - t1
    gbps = 2 * raw / (t_enc + t_dec) / 1e9
    out = {
        "metric": "fastq_encode_decode_throughput",
        "value": round(gbps, 6),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 0.1, 4),
        "platform": platform,
        "raw_bytes": raw,
        "compressed_bytes": len(enc),
        "ratio": round(raw / len(enc), 4),
        "encode_s": round(t_enc, 4),
        "decode_s": round(t_dec, 4),
        "level": level,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
