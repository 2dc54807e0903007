#!/usr/bin/env python
"""One-shot TPU validation after kernel-path changes: compile + run the
device-resident pipeline at production shape on the real chip, re-pin
TPU-vs-CPU container equality, and time the new kernels individually.

Run standalone (the ONLY process using the TPU; see
docs/KERNEL_NOTES.md §6), under a generous timeout:

    cd /root/repo && timeout 1800 python tools/tpu_validate.py

Prints one PASS/FAIL line per check. All kernel timing happens before
the first device->host readback (§6 degradation rule), so the reported
kernel times are clean; the equality check (which reads back) runs last.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

pc = time.perf_counter


def main() -> int:
    import jax
    plat = jax.devices()[0].platform
    print(f"platform: {plat}")

    from slimfastq_tpu import api, native
    from slimfastq_tpu.config import config_for_level
    from slimfastq_tpu.ops import pack_jax as PJ
    from slimfastq_tpu.ops import ranger_np as R
    from slimfastq_tpu.ops import streams_jax as SJ
    from slimfastq_tpu.pipeline_native import (_BASE_TO_CODE_DEV,
                                               _CODE_TO_BASE_FULL)
    from slimfastq_tpu.utils.synth import synth_fastq

    reads, read_len = 65536, 100
    d = synth_fastq(reads, read_len=read_len, seed=0, var_len=False,
                    n_rate=0.0005)
    data = np.frombuffer(d, dtype=np.uint8)
    cfg = config_for_level(3, lanes=1024, aux_lanes=64,
                           block_records=reads)
    idx, n = native.fastq_index(data)
    lengths = idx["seq_len"].astype(np.int64)
    W = cfg.lanes

    # ---- kernel timings, pre-readback ----
    base = int(idx["id_off"][0]) - 1
    end = int(idx["qual_off"][n - 1] + idx["qual_len"][n - 1])
    span = end - base
    dpad = np.zeros(PJ.pad_flat(span), dtype=np.uint8)
    dpad[:span] = data[base:end]
    data_dev = jax.device_put(dpad)
    counts = np.bincount(np.arange(n) % W, weights=lengths,
                         minlength=W).astype(np.int64)
    S = int(counts.max())
    Sp = R.pad_steps(S)
    Rpl = max((n + W - 1) // W, 1)
    off_s, llm = PJ._mats(idx["seq_off"][:n] - base, lengths, W, Rpl)
    off_q, _ = PJ._mats(idx["qual_off"][:n] - base, lengths, W, Rpl)
    dargs = jax.block_until_ready([jax.device_put(a) for a in (
        off_s, off_q, llm, _BASE_TO_CODE_DEV, np.int32(33))])

    def timeit(fn):
        r = fn()
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(5):
            t0 = pc()
            r = fn()
            jax.block_until_ready(r)
            best = min(best, pc() - t0)
        return best, r

    runp = PJ._build_pack_pair(Sp, W, Rpl, int(dpad.shape[0]))
    t, (seq_syms, qual_syms) = timeit(lambda: runp(data_dev, *dargs))
    print(f"pack_pair: {t*1000:.2f} ms")

    sched = SJ._build_schedule_ll("seq", cfg.seq, Sp, S, W, Rpl)
    d_counts = jax.device_put(counts.astype(np.int32))
    t, sc = timeit(lambda: sched(seq_syms, dargs[2], d_counts))
    print(f"seq schedule: {t*1000:.2f} ms")
    coder = SJ._build_encode("seq", cfg.seq, Sp, W, False)
    t, out = timeit(lambda: coder(*sc))
    print(f"seq coder: {t*1000:.2f} ms")

    from slimfastq_tpu.ops import compact_pallas, compact_xla
    import jax.numpy as jnp
    Bmax = ((3000 + 4095) // 4096) * 4096 + 128
    t, comp = timeit(lambda: compact_pallas.compact_device_v2(
        out[0], out[1], Bmax))
    print(f"pallas compaction (seq): {t*1000:.2f} ms")
    t, comp_x = timeit(lambda: compact_xla.compact_device(
        out[0], out[1], Bmax))
    print(f"xla compaction (seq): {t*1000:.2f} ms")

    # qual stream: the larger CB (depth 6) dominated the round-2 numbers
    schedq = SJ._build_schedule_ll("qual", cfg.qual, Sp, S, W, Rpl)
    t, scq = timeit(lambda: schedq(qual_syms, dargs[2], d_counts))
    print(f"qual schedule: {t*1000:.2f} ms")
    coderq = SJ._build_encode("qual", cfg.qual, Sp, W, False)
    t, outq = timeit(lambda: coderq(*scq))
    print(f"qual coder: {t*1000:.2f} ms")
    Bmaxq = ((4000 + 4095) // 4096) * 4096 + 128
    t, _ = timeit(lambda: compact_pallas.compact_device_v2(
        outq[0], outq[1], Bmaxq))
    print(f"pallas compaction (qual): {t*1000:.2f} ms")
    t, compq_x = timeit(lambda: compact_xla.compact_device(
        outq[0], outq[1], Bmaxq))
    print(f"xla compaction (qual): {t*1000:.2f} ms")

    rec_starts = np.zeros(n, dtype=np.int64)
    rec_starts[1:] = np.cumsum(lengths[:-1])
    total = int(lengths.sum())
    off_o, llm2 = PJ._mats(rec_starts, lengths, W, Rpl)
    du = jax.block_until_ready([jax.device_put(a) for a in (
        off_o, llm2, _CODE_TO_BASE_FULL, np.int32(33))])
    runu = PJ._build_unpack_pair(Sp, W, Rpl, PJ.pad_flat(total))
    t, flats = timeit(lambda: runu(seq_syms, qual_syms, *du))
    print(f"unpack_pair: {t*1000:.2f} ms")

    # ---- v5 match-context kernel variants (format v5; L4 geometry) ----
    # The match flag adds an elementwise select to the schedule and an
    # extra scan input + where() to the decode kernel — separate cache
    # entries, so these timings are the compile-cliff check the
    # KERNEL_NOTES §3 rule requires for the new shape.
    cfg4 = config_for_level(4, lanes=1024, aux_lanes=64,
                            block_records=reads)
    rng = np.random.default_rng(0)
    mflag = (rng.random((S, W)) < 0.5).astype(np.uint8)
    mf_dev = jax.device_put(SJ._pad2(mflag, Sp, W))
    sched_m = SJ._build_schedule_ll("seq", cfg4.seq, Sp, S, W, Rpl,
                                    with_mflag=True)
    t, scm = timeit(lambda: sched_m(seq_syms, dargs[2], d_counts, mf_dev))
    print(f"seq schedule (L4 match-ctx): {t*1000:.2f} ms")
    coder_m = SJ._build_encode("seq", cfg4.seq, Sp, W, False)
    t, outm = timeit(lambda: coder_m(*scm))
    print(f"seq coder (L4 geometry): {t*1000:.2f} ms")

    # ---- end-to-end equality (readbacks begin here) ----
    from slimfastq_tpu.ops import streams_jax, streams_np
    t0 = pc()
    enc_tpu = api.encode_fastq(d, cfg=cfg, backend=streams_jax,
                               use_native=True)
    print(f"full encode wall (incl. tunnel transfers): {pc()-t0:.1f} s")
    t0 = pc()
    out_tpu = api.decode_fastq(enc_tpu, backend=streams_jax,
                               use_native=True)
    print(f"full decode wall (incl. tunnel transfers): {pc()-t0:.1f} s")
    ok = out_tpu == d
    print(f"round trip on {plat}: {'PASS' if ok else 'FAIL'}")

    # ---- v5 match path end-to-end (matcher + trial + match kernels;
    # this also times the L4 match decode variant on the real chip) ----
    from slimfastq_tpu.utils.synth import corpus
    d4 = corpus("novaseq", 8192, seed=0)
    cfg4e = config_for_level(4, block_records=8192)
    t0 = pc()
    enc4 = api.encode_fastq(d4, cfg=cfg4e, backend=streams_jax,
                            use_native=True)
    print(f"L4 match encode wall: {pc()-t0:.1f} s "
          f"(ratio {len(d4)/len(enc4):.3f})")
    t0 = pc()
    ok4 = api.decode_fastq(enc4, backend=streams_jax,
                           use_native=True) == d4
    print(f"L4 match decode wall: {pc()-t0:.1f} s; "
          f"round trip: {'PASS' if ok4 else 'FAIL'}")
    return 0 if (ok and ok4) else 1


if __name__ == "__main__":
    sys.exit(main())
