#!/usr/bin/env python
"""Benchmark: FASTQ encode+decode throughput per chip (BASELINE.md metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline value = device coding throughput: total FASTQ bytes divided by the
sum of on-device encode + decode kernel time across every stream of a
block, measured with device-resident inputs and block_until_ready.

Harness note: this dev environment reaches the TPU through a tunnel.
Measured pathology: after the first sizeable device->host transfer, every
subsequent execution in that process degrades to ~300 ms (the runtime
appears to switch to eager output readback at tunnel speed). The benchmark
therefore runs its encode-timing and decode-timing phases in separate
subprocesses, exchanging arrays via /tmp; the end-to-end wall time
(reported as ``end_to_end_gbps`` in extras, with round-trip verification)
is tunnel-bound and would be PCIe-bound in a production deployment.

vs_baseline is computed against the only reference figure available in
this sealed environment: slimfastq's qualitative ~0.1 GB/s single-core
speed (BASELINE.md, marked unverified).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

WORKDIR = os.environ.get("SFQ_BENCH_TMP") or tempfile.mkdtemp(
    prefix="sfq_bench_")


def _cfg():
    from slimfastq_tpu.config import config_for_level
    reads = int(os.environ.get("SFQ_BENCH_READS", 65536))
    read_len = int(os.environ.get("SFQ_BENCH_LEN", 100))
    level = int(os.environ.get("SFQ_BENCH_LEVEL", 3))
    cfg = config_for_level(level, lanes=1024, aux_lanes=64,
                           block_records=reads)
    return reads, read_len, level, cfg


def _data(reads, read_len):
    from slimfastq_tpu.utils.synth import synth_fastq
    return synth_fastq(reads, read_len=read_len, seed=0, var_len=False,
                       n_rate=0.0005)


def _timeit(fn, *args, iters=5):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters, r


def phase_encode() -> int:
    """Time every stream's schedule+encode kernels (no d2h until all
    timings are done), then write payloads for the decode phase."""
    import numpy as np
    import jax.numpy as jnp
    from slimfastq_tpu.ops import ranger_np as R
    from slimfastq_tpu.ops import streams_jax as SJ
    from slimfastq_tpu.pipeline import stream_jobs
    from slimfastq_tpu.utils.fastq import parse_fastq_bytes

    reads, read_len, level, cfg = _cfg()
    batch = parse_fastq_bytes(_data(reads, read_len))
    jobs, _, _, _ = stream_jobs(batch, cfg)

    t_enc = 0.0
    outs = {}
    for name, (kind, geom, syms, counts, pos, reset) in jobs.items():
        S, W = syms.shape
        counts = np.asarray(counts)
        Sp = R.pad_steps(S)
        if Sp == 0 or not (counts > 0).any():
            continue
        sched = SJ._build_schedule(kind, geom, Sp, W)
        sargs = (jnp.asarray(SJ._pad2(syms, Sp, W)),
                 jnp.asarray(SJ._pad2(pos, Sp, W)),
                 jnp.asarray(SJ._pad2(reset, Sp, W)),
                 jnp.asarray(counts.astype(np.int32)))
        dt_s, sc = _timeit(sched, *sargs)
        coder = SJ._build_encode(kind, geom, Sp, W, False)
        dt_e, out = _timeit(coder, *sc)
        t_enc += dt_s + dt_e
        outs[name] = (kind, geom, out, counts, pos, reset, S, W)

    # all timings done; now the (degrading) transfers + compaction
    save = {}
    for name, (kind, geom, out, counts, pos, reset, S, W) in outs.items():
        ebufs, eptrs, low, emax = out
        CB = SJ._chunk_bytes(geom.depth, False)
        assert int(emax) <= CB, f"{name}: chunk overflow in bench"
        payload, lens = SJ._compact_host(np.asarray(ebufs),
                                         np.asarray(eptrs),
                                         np.asarray(low), counts, CB)
        save[f"{name}__payload"] = payload
        save[f"{name}__lens"] = lens
    np.savez(os.path.join(WORKDIR, "payloads.npz"), **save)
    with open(os.path.join(WORKDIR, "enc.json"), "w") as f:
        json.dump({"t_enc_dev": t_enc}, f)
    return 0


def phase_decode() -> int:
    import numpy as np
    import jax.numpy as jnp
    from slimfastq_tpu.ops import ranger_np as R
    from slimfastq_tpu.ops import streams_jax as SJ
    from slimfastq_tpu.pipeline import stream_jobs
    from slimfastq_tpu.utils.fastq import parse_fastq_bytes

    reads, read_len, level, cfg = _cfg()
    batch = parse_fastq_bytes(_data(reads, read_len))
    jobs, _, _, _ = stream_jobs(batch, cfg)
    z = np.load(os.path.join(WORKDIR, "payloads.npz"))

    t_dec = 0.0
    for name, (kind, geom, syms, counts, pos, reset) in jobs.items():
        S, W = syms.shape
        counts = np.asarray(counts)
        Sp = R.pad_steps(S)
        if Sp == 0 or not (counts > 0).any():
            continue
        payload = z[f"{name}__payload"]
        lens = z[f"{name}__lens"]
        Lb = max(int(payload.shape[1]), 1)
        Lb = ((Lb + 2047) // 2048) * 2048
        pay = np.zeros((W, Lb), dtype=np.uint8)
        pay[:, : payload.shape[1]] = payload
        K = SJ._CHUNK_SYMS
        NC = Sp // K
        acts = (np.arange(Sp)[:, None] < counts[None, :]).astype(np.int32)
        drun = SJ._build_decode(kind, geom, Sp, W, Lb // 4)
        dargs = (jnp.asarray(pay.view("<u4").reshape(-1)),
                 jnp.asarray(lens.astype(np.int32)),
                 jnp.asarray(acts.reshape(NC, K, W)),
                 jnp.asarray(SJ._pad2(pos, Sp, W).reshape(NC, K, W)),
                 jnp.asarray(SJ._pad2(reset, Sp, W).reshape(NC, K, W)))
        dt_d, _ = _timeit(drun, *dargs)
        t_dec += dt_d
    with open(os.path.join(WORKDIR, "dec.json"), "w") as f:
        json.dump({"t_dec_dev": t_dec}, f)
    return 0


def main() -> int:
    phase = os.environ.get("SFQ_BENCH_PHASE")
    if phase == "enc":
        return phase_encode()
    if phase == "dec":
        return phase_decode()

    env = dict(os.environ, SFQ_BENCH_TMP=WORKDIR)
    for ph in ("enc", "dec"):
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=dict(env, SFQ_BENCH_PHASE=ph))
        if r.returncode != 0:
            print(json.dumps({"metric": "fastq_encode_decode_device_"
                              "throughput", "value": 0.0, "unit": "GB/s",
                              "vs_baseline": 0.0,
                              "error": f"phase {ph} failed"}))
            return 1
    with open(os.path.join(WORKDIR, "enc.json")) as f:
        t_enc = json.load(f)["t_enc_dev"]
    with open(os.path.join(WORKDIR, "dec.json")) as f:
        t_dec = json.load(f)["t_dec_dev"]

    # end-to-end verification pass in this process (tunnel-bound)
    import jax
    from slimfastq_tpu.api import decode_fastq, encode_fastq
    from slimfastq_tpu.ops import streams_jax as SJ

    reads, read_len, level, cfg = _cfg()
    data = _data(reads, read_len)
    raw = len(data)
    t0 = time.perf_counter()
    enc = encode_fastq(data, cfg=cfg, backend=SJ)
    t1 = time.perf_counter()
    dec = decode_fastq(enc, backend=SJ)
    t2 = time.perf_counter()
    assert dec == data, "round-trip mismatch"
    e2e_gbps = 2 * raw / (t2 - t0) / 1e9

    dev_gbps = 2 * raw / (t_enc + t_dec) / 1e9
    out = {
        "metric": "fastq_encode_decode_device_throughput",
        "value": round(dev_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(dev_gbps / 0.1, 2),
        "platform": jax.devices()[0].platform,
        "raw_bytes": raw,
        "compressed_bytes": len(enc),
        "ratio": round(raw / len(enc), 4),
        "device_encode_s": round(t_enc, 5),
        "device_decode_s": round(t_dec, 5),
        "end_to_end_gbps": round(e2e_gbps, 5),
        "end_to_end_note": "includes host<->device tunnel transfers "
                           "(~MB/s in this dev harness) and host pipeline",
        "level": level,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
