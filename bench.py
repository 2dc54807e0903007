#!/usr/bin/env python
"""Benchmark: FASTQ encode+decode throughput per chip (BASELINE.md metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline value (round 5+) = ANCHORED WALL-CLOCK end-to-end throughput:
2 x raw FASTQ bytes of an SFQ_WALL_BLOCKS-block run (default 4 x the
pinned 64k-record block) divided by the measured wall time of real
api.encode_fastq + decode_fastq invocations (the 3-stage pipelined host
path, kernels replayed from a tape) plus the TPU pass's measured kernel
seconds per block. No per-stage synthesis: the wall clock pays
orchestration, contention and pipeline (in)efficiency for real. The
former headline — the sum of per-stage minima (host stages from a
CPU-only pass + device kernels with block_until_ready) — is retained as
`value_stage_sum`, the per-block diagnostic upper bound.

Round-3 pipeline shape (device-resident layout transform): the raw block
bytes cross to the device once; lane packing (gather), coding, payload
compaction (Pallas), decoding and lane unpacking (scatter) all happen on
device; the host keeps parsing, the serial ID/LEN codecs, container IO
and final FASTQ assembly.

Host<->device transfer time is EXCLUDED from the headline and reported
separately (tunnel_h2d_s / tunnel_d2h_s with byte volumes): this dev
harness reaches its TPU through a ~0.4-25 MB/s tunnel where a production
host's PCIe/DMA moves GB/s (docs/KERNEL_NOTES.md §6). The transferred
volumes are reported so any assumed link speed can be priced in.

Protocol notes (pinned; BASELINE.md "Bench protocol"):
- one 64k-record x 100 bp block (SFQ_BENCH_READS/LEN/LEVEL override),
  W=1024 lanes, level 3;
- the encode and decode phases each run TWICE, in four subprocesses:
  a CPU-only pass (axon plugin stripped from sys.path) supplies the
  host-stage timings, and a TPU pass supplies the kernel timings.
  Rationale, both re-measured here: (a) after the first device->host
  readback of ANY size — even a 4-byte scalar — an axon process
  degrades to ~0.3-2.3 s/exec (KERNEL_NOTES §6; big h2d is harmless),
  so each TPU phase does ALL kernel timing before its first readback
  (the Pallas compaction kernel's data-dependent output bound comes
  from the CPU pass's container, not from an eptrs readback);
- the CPU and TPU passes must produce byte-identical containers
  (asserted) — every bench run re-pins device/host kernel equivalence
  at production shape (device compaction is exercised on the TPU pass,
  host compaction on the CPU pass; they are byte-identical by test);
- kernels timed with SFQ_BENCH_ITERS (default 3) repetitions after a
  warm-up; host stages timed the same way (steady-state per-block cost
  on a host that encodes many blocks — the first block additionally
  pays one-time .so build / OpenMP spin-up, reported as
  host_cold_extra_s);
- a phase whose med/min spread stays > 3x after the in-process
  re-measures is rerun in a FRESH subprocess (fresh tunnel session) up
  to SFQ_BENCH_PHASE_RETRIES (default 2) more times; if no attempt gets
  below 3x the summary carries "degraded": true — a degraded run is
  visibly unusable rather than silently recorded;
- a fifth CPU-only subprocess times ONE real encode_fastq+decode_fastq
  wall clock (wallclock_gbps_cpu_backend): the un-synthesized anchor
  for the per-stage sum (kernels run on the host cores there, so it
  lower-bounds the production figure — BASELINE.md explains the delta);
- the decode phase round-trip-verifies its output against the input, so
  the timed path is pinned to the real bit format;
- `python bench.py table` prints the BASELINE.md per-config table.

vs_baseline is computed against the only reference figure available in
this sealed environment: slimfastq's qualitative ~0.1 GB/s single-core
speed (BASELINE.md, marked unverified).
"""

import io
import json
import os
import subprocess
import sys
import tempfile
import time

WORKDIR = os.environ.get("SFQ_BENCH_TMP") or tempfile.mkdtemp(
    prefix="sfq_bench_")
os.makedirs(WORKDIR, exist_ok=True)
ITERS = int(os.environ.get("SFQ_BENCH_ITERS", 3))
MODE = os.environ.get("SFQ_BENCH_MODE", "tpu")   # "cpu" | "tpu" pass

pc = time.perf_counter


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


_SPREADS = []   # per-timed-stage (min, median) pairs, for reproducibility


def _note_spread(best, samples):
    samples = sorted(samples)
    med = samples[len(samples) // 2]
    _SPREADS.append((best, med))
    return best


def _timeit(fn, *args, iters=None):
    """Kernel cost = MIN of `iters` timed executions after a warm-up
    (compile) call: device dispatch rides the dev-harness tunnel, whose
    latency hiccups can inflate an individual execution by 10-100x (one
    measured run: 8 ms of kernels reported as 110 ms under mean-of-3).
    Degradation guard (round-2 VERDICT weak #1): when the sample median
    exceeds 3x the min — a tunnel in a bad state — re-measure up to two
    more rounds so a transient hiccup cannot decide the recorded figure;
    every stage's (min, median) lands in _SPREADS for the summary."""
    import jax
    iters = max(ITERS, 5) if iters is None else iters
    r = fn(*args)          # warm-up / compile
    jax.block_until_ready(r)
    samples = []
    for _round in range(3):
        for _ in range(iters):
            t0 = pc()
            r = fn(*args)
            jax.block_until_ready(r)
            samples.append(pc() - t0)
        best = min(samples)
        med = sorted(samples)[len(samples) // 2]
        if med <= 3 * best:
            break
    _note_spread(best, samples)
    return best, r


def _timeit_host(fn, *args, iters=None):
    """Steady-state host-stage cost: one warm-up call (page faults,
    OpenMP spin-up, lazy .so build), then the MIN of `iters` calls —
    this 4-core dev VM suffers intermittent ~1 s CPU-steal stalls
    (measured: the same numpy/C++ call is bimodal 0.08 s / 1.3 s), so
    the min, not the mean, estimates the undisturbed per-block cost.
    Returns (min_s, cold_first_s, result)."""
    iters = max(ITERS, 5) if iters is None else iters
    t0 = pc()
    r = fn(*args)
    cold = pc() - t0
    samples = []
    for _round in range(3):
        for _ in range(iters):
            t0 = pc()
            r = fn(*args)
            samples.append(pc() - t0)
        best = min(samples)
        med = sorted(samples)[len(samples) // 2]
        if med <= 3 * best:   # CPU-steal stall guard: re-measure
            break
    _note_spread(best, samples)
    return best, cold, r


def _cpath():
    return os.path.join(WORKDIR, f"bench_{MODE}.sfq")


def _cpu_container_lens():
    """Per-stream lane-length arrays from the CPU pass's container (used
    by the TPU pass to size the Pallas compaction output without any
    device->host readback)."""
    import numpy as np
    from slimfastq_tpu import container
    path = os.path.join(WORKDIR, "bench_cpu.sfq")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        f = io.BytesIO(fh.read())
    cfg = container.read_header(f)
    blk = container.read_block(f, cfg.fmt)
    return {name: np.asarray(es.lane_lens)
            for name, es in blk.streams.items()}


def phase_encode() -> int:
    """Host prep -> raw h2d -> device pack + kernels + Pallas compaction
    (all timed before any readback) -> d2h -> flush append -> write."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from slimfastq_tpu import container, native
    from slimfastq_tpu.ops import ranger_np as R
    from slimfastq_tpu.ops import streams_jax as SJ
    from slimfastq_tpu.ops import pack_jax as PJ
    from slimfastq_tpu.pipeline import (EncodedBlock, EncodedStream,
                                        streams_for)
    from slimfastq_tpu.pipeline_native import (stream_jobs_fast,
                                               _BASE_TO_CODE_DEV)

    reads, read_len, level, cfg = _cfg()
    data_b = _data(reads, read_len)
    raw = len(data_b)
    data = np.frombuffer(data_b, dtype=np.uint8)
    on_tpu = jax.default_backend() == "tpu"
    W = cfg.lanes

    t = {k: 0.0 for k in ("host_index", "host_prep", "host_pack", "h2d",
                          "dev_pack", "dev_enc", "dev_compact", "d2h",
                          "host_compact", "host_write", "host_cold_extra")}
    dt, cold, (idx, n) = _timeit_host(lambda: native.fastq_index(data))
    t["host_index"] = dt
    t["host_cold_extra"] += max(0.0, cold - dt)
    dt, cold, (jobs, _, minq, qual_depth, ll_mat, _extra) = _timeit_host(
        lambda: stream_jobs_fast(data, idx, 0, n, cfg,
                                 want_pos_reset=False, device_pack=True))
    t["host_prep"] = dt
    t["host_cold_extra"] += max(0.0, cold - dt)

    # ---- raw block bytes: pad (host) + one h2d ----
    lengths = idx["seq_len"][:n].astype(np.int64)
    base = int(idx["id_off"][0]) - 1
    end = int(idx["qual_off"][n - 1] + idx["qual_len"][n - 1])

    def _padraw():
        # np.empty + tail-only zero — what pipeline_native actually does
        span = end - base
        dpad = np.empty(PJ.pad_flat(span), dtype=np.uint8)
        dpad[:span] = data[base:end]
        dpad[span:] = 0
        return dpad
    dt, cold, dpad = _timeit_host(_padraw)
    t["host_pack"] += dt
    t["host_cold_extra"] += max(0.0, cold - dt)
    t0 = pc()
    data_dev = jax.block_until_ready(jax.device_put(dpad))
    t["h2d"] += pc() - t0
    h2d_bytes = dpad.nbytes

    # ---- device lane pack (SEQ + QUAL fused) ----
    counts_sq = np.asarray(jobs["SEQ"][3])
    S = int(counts_sq.max()) if counts_sq.size else 0
    Sp = R.pad_steps(S)
    Rpl = max((n + W - 1) // W, 1)
    off_s, llm = PJ._mats(idx["seq_off"][:n] - base, lengths, W, Rpl)
    off_q, _ = PJ._mats(idx["qual_off"][:n] - base, lengths, W, Rpl)
    t0 = pc()
    d_off_s, d_off_q, d_llm, d_smap, d_qbias, d_counts = \
        jax.block_until_ready([jax.device_put(a) for a in (
            off_s, off_q, llm, _BASE_TO_CODE_DEV, np.int32(minq),
            counts_sq.astype(np.int32))])
    t["h2d"] += pc() - t0
    h2d_bytes += off_s.nbytes + off_q.nbytes + llm.nbytes + 256 + 4 \
        + counts_sq.nbytes
    runp = PJ._build_pack_pair(Sp, W, Rpl, int(dpad.shape[0]))
    dt, (seq_syms, qual_syms) = _timeit(
        lambda: runp(data_dev, d_off_s, d_off_q, d_llm, d_smap, d_qbias))
    t["dev_pack"] += dt
    dev_syms = {"SEQ": seq_syms, "QUAL": qual_syms}

    # Kernel-timing pass: NO device->host readback of any size until every
    # kernel has been timed (KERNEL_NOTES §6: one scalar d2h permanently
    # degrades the process). The soft-buffer overflow check (emax) is
    # deferred; an overflowing stream is re-coded hard, untimed, below.
    cpu_lens = _cpu_container_lens() if on_tpu else None
    per_stream = {}
    for name in streams_for(cfg.fmt):
        kind, geom, syms, counts, pos, reset = jobs[name]
        counts = np.asarray(counts)
        use_ll = name in ("SEQ", "QUAL")
        if use_ll:
            Sp_s, W_s = Sp, W
            if Sp_s == 0 or not (counts > 0).any():
                per_stream[name] = None
                continue
            sched = SJ._build_schedule_ll(kind, geom, Sp_s, S, W_s, Rpl)
            dt_s, sc = _timeit(sched, dev_syms[name], d_llm, d_counts)
        else:
            S_s, W_s = syms.shape
            Sp_s = R.pad_steps(S_s)
            if Sp_s == 0 or not (counts > 0).any():
                per_stream[name] = None
                continue

            def _pack():
                return (SJ._pad2(syms, Sp_s, W_s),
                        SJ._pad2(pos, Sp_s, W_s),
                        SJ._pad2(reset, Sp_s, W_s),
                        counts.astype(np.int32))
            dt, cold, host_args = _timeit_host(_pack)
            t["host_pack"] += dt
            t["host_cold_extra"] += max(0.0, cold - dt)
            t0 = pc()
            dargs = jax.block_until_ready(
                [jax.device_put(a) for a in host_args])
            t["h2d"] += pc() - t0
            h2d_bytes += sum(a.nbytes for a in host_args)
            sched = SJ._build_schedule(kind, geom, Sp_s, W_s)
            dt_s, sc = _timeit(sched, *dargs)
        coder = SJ._build_encode(kind, geom, Sp_s, W_s, False)
        dt_e, out = _timeit(coder, *sc)
        t["dev_enc"] += dt_s + dt_e
        comp = None
        if on_tpu and cpu_lens is not None and W_s % 8 == 0:
            # device compaction (SFQ_COMPACT_IMPL selects xla/pallas),
            # sized from the CPU container (no eptrs readback)
            Bmax = int(cpu_lens[name].max()) if len(cpu_lens[name]) else 0
            Bmax = ((Bmax + 4095) // 4096) * 4096 + 128
            dt_c, comp = _timeit(
                lambda o=out, B=Bmax: (
                    SJ.compact_device_impl(o[0], o[1], B)[0],
                    jnp.sum(o[1], axis=0)))
            t["dev_compact"] += dt_c
        per_stream[name] = (out, sc, counts, kind, geom, Sp_s, W_s, comp)

    # all kernel timings done; the first readbacks happen here
    hard_retries = 0
    d2h_bytes = 0
    comp_in = {}
    for name, v in per_stream.items():
        if v is None:
            continue
        out, sc, counts, kind, geom, Sp_s, W_s, comp = v
        CB = SJ._chunk_bytes(geom.depth, False)
        if int(out[3]) > CB:   # soft-buffer overflow: re-code, untimed
            hard_retries += 1
            coder = SJ._build_encode(kind, geom, Sp_s, W_s, True)
            out = coder(*sc)
            CB = SJ._chunk_bytes(geom.depth, True)
            assert int(out[3]) <= CB, f"{name}: hard-buffer overflow"
            comp = None
        t0 = pc()
        if comp is not None:
            pay = np.asarray(comp[0].astype(jnp.uint8))
            totals = np.asarray(comp[1]).astype(np.int64)
            low = np.asarray(out[2])
            t["d2h"] += pc() - t0
            d2h_bytes += pay.nbytes + totals.nbytes + low.nbytes
            comp_in[name] = ("dev", pay, totals, low, counts)
        else:
            ebufs = np.asarray(out[0])
            eptrs = np.asarray(out[1])
            low = np.asarray(out[2])
            t["d2h"] += pc() - t0
            d2h_bytes += ebufs.nbytes + eptrs.nbytes + low.nbytes
            comp_in[name] = ("host", ebufs, eptrs, low, counts, CB)
        per_stream[name] = True  # drop the device-side tuples: ~300 MB of
        # live emission buffers/schedules (a production encoder frees them
        # before container IO) measurably skewed the write-stage timing
    del dev_syms

    streams = {}
    for name in streams_for(cfg.fmt):
        kind, geom, syms, counts, pos, reset = jobs[name]
        counts = np.asarray(counts)
        if per_stream.get(name) is None:
            W_s = W if name in ("SEQ", "QUAL") else cfg.aux_lanes
            payload = np.zeros((W_s, 0), dtype=np.uint8)
            lens = np.zeros(W_s, dtype=np.int64)
        elif comp_in[name][0] == "dev":
            _, pay, totals, low, counts = comp_in[name]
            dt, cold, (payload, lens) = _timeit_host(
                lambda: SJ._flush_append(pay, totals, low, counts))
            t["host_compact"] += dt
            t["host_flush"] = t.get("host_flush", 0.0) + dt
            t["host_cold_extra"] += max(0.0, cold - dt)
        else:
            _, ebufs, eptrs, low, counts, CB = comp_in[name]
            dt, cold, (payload, lens) = _timeit_host(
                lambda: SJ._compact_host(ebufs, eptrs, low, counts, CB))
            t["host_compact"] += dt
            t["host_cold_extra"] += max(0.0, cold - dt)
            # ALSO time the flush-append this stream would cost when the
            # device compacts the payload (the TPU deployment's only
            # host-side compaction work); summarize() uses it when the
            # TPU pass ran the Pallas compactor. Inputs reconstructed
            # from the host-compacted payload: identical bytes.
            act = counts > 0
            totals = np.where(act, lens - 4, 0).astype(np.int64)
            dt_f, _, _ = _timeit_host(
                lambda: SJ._flush_append(payload, totals, low, counts))
            t["host_flush"] = t.get("host_flush", 0.0) + dt_f
        comp_in[name] = None  # free this stream's dense buffers
        streams[name] = EncodedStream(counts.astype(np.int64), lens,
                                      payload)
    blk = EncodedBlock(n, minq, qual_depth, streams)

    def _write():
        with open(_cpath(), "wb") as f:
            container.write_header(f, cfg)
            offs = [container.write_block(f, blk)]
            container.write_index(f, offs)
    dt, cold, _ = _timeit_host(_write)
    t["host_write"] = dt
    t["host_cold_extra"] += max(0.0, cold - dt)
    t["hard_retries"] = hard_retries

    np.save(os.path.join(WORKDIR, "lengths.npy"),
            idx["seq_len"][:n].astype(np.int64))
    t["spread"] = round(max((m / b for b, m in _SPREADS if b > 0),
                            default=1.0), 3)
    t["raw"] = raw
    t["compressed"] = os.path.getsize(_cpath())
    t["d2h_bytes"] = d2h_bytes
    t["h2d_bytes"] = h2d_bytes
    with open(os.path.join(WORKDIR, f"enc_{MODE}.json"), "w") as f:
        json.dump(t, f)
    return 0


def phase_decode() -> int:
    """Container read -> host prep -> h2d -> device kernels + lane unpack
    (timed before any big d2h) -> d2h flats -> host finish -> verify."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from slimfastq_tpu import container, native
    from slimfastq_tpu.ops import ranger_np as R
    from slimfastq_tpu.ops import streams_jax as SJ
    from slimfastq_tpu.ops import pack_jax as PJ
    from slimfastq_tpu.pipeline import _lane_lengths_matrix, streams_for
    from slimfastq_tpu.pipeline_native import (decode_block_fast,
                                               _CODE_TO_BASE_FULL)

    reads, read_len, level, _ = _cfg()
    data_b = _data(reads, read_len)

    t = {k: 0.0 for k in ("host_read", "host_dec_prep", "h2d", "dev_dec",
                          "dev_unpack", "d2h", "host_dec_finish",
                          "host_cold_extra")}

    def _read():
        with open(_cpath(), "rb") as fh:
            f = io.BytesIO(fh.read())
        cfg = container.read_header(f)
        return cfg, container.read_block(f, cfg.fmt)
    dt, cold, (cfg, blk) = _timeit_host(_read)
    t["host_read"] = dt
    t["host_cold_extra"] += max(0.0, cold - dt)

    # timing scaffolding only: lengths are decoded from the LEN stream in
    # the verified host-finish pass below; here they pre-shape the
    # decode-kernel arguments so every kernel can be timed before the
    # first big d2h (KERNEL_NOTES §6 degradation)
    lengths = np.load(os.path.join(WORKDIR, "lengths.npy"))
    n = blk.num_records
    W, Wa = cfg.lanes, cfg.aux_lanes

    ll_mat = _lane_lengths_matrix(lengths, W)
    scounts = ll_mat.sum(axis=0)
    Sq = int(scounts.max()) if scounts.size else 0
    rec_per_lane = (n - np.arange(Wa) + Wa - 1) // Wa
    from slimfastq_tpu.pipeline import QUAL_NODELTA
    qgeom = replace(cfg.qual, depth=blk.qual_depth,
                    delta_bits=0 if (blk.flags & QUAL_NODELTA)
                    else cfg.qual.delta_bits)
    specs = []   # (name, kind, geom, counts, S)
    for name in streams_for(cfg.fmt):
        es = blk.streams[name]
        if name == "FLAG":
            kind, geom, counts = "flag", cfg.flags, 3 * rec_per_lane
        elif name == "SEQ":
            kind, geom, counts = "seq", cfg.seq, scounts
        elif name == "QUAL":
            kind, geom, counts = "qual", qgeom, scounts
        else:
            kind, geom, counts = "byte", cfg.bytes_, \
                np.asarray(es.sym_counts)
        S = Sq if name in ("SEQ", "QUAL") else \
            (int(np.asarray(counts).max()) if len(counts) else 0)
        specs.append((name, kind, geom, counts, S))

    def _dec_prep():
        packed = {}
        for name, kind, geom, counts, S in specs:
            es = blk.streams[name]
            counts = np.asarray(counts)
            Sp = R.pad_steps(S)
            if Sp == 0 or not (counts > 0).any():
                packed[name] = None
                continue
            Wn = es.payload.shape[0]
            Lb = max(int(es.payload.shape[1]), 1)
            Lb = ((Lb + 2047) // 2048) * 2048
            pay = np.empty((Wn, Lb), dtype=np.uint8)  # kernel masks tail
            pay[:, : es.payload.shape[1]] = es.payload
            words = pay.view("<u4").reshape(Wn * (Lb // 4))
            K = SJ._CHUNK_SYMS
            NC = Sp // K
            if name in ("SEQ", "QUAL"):
                Rpl = max(ll_mat.shape[0], 1)
                llm = np.zeros((Rpl, W), dtype=np.int32)
                llm[: ll_mat.shape[0]] = ll_mat
                host_args = (words, es.lane_lens.astype(np.int32), llm,
                             counts.astype(np.int32))
            else:
                acts = (np.arange(Sp)[:, None] < counts[None, :]) \
                    .astype(np.int32).reshape(NC, K, Wn)
                zeros = np.zeros((NC, K, Wn), dtype=np.uint32)
                host_args = (words, es.lane_lens.astype(np.int32), acts,
                             zeros, zeros)
            packed[name] = (kind, geom, counts, S, Sp, Lb // 4, host_args)
        return packed
    dt, cold, packed = _timeit_host(_dec_prep)
    t["host_dec_prep"] = dt
    t["host_cold_extra"] += max(0.0, cold - dt)

    h2d_bytes = 0
    dev_syms = {}
    for name, kind, geom, counts, S in specs:
        if packed[name] is None:
            continue
        kind, geom, counts, S, Sp, Lw, host_args = packed[name]
        t0 = pc()
        dargs = jax.block_until_ready(
            [jax.device_put(a) for a in host_args])
        t["h2d"] += pc() - t0
        h2d_bytes += sum(a.nbytes for a in host_args)
        if name in ("SEQ", "QUAL"):
            Rpl = host_args[2].shape[0]
            run = SJ._build_decode_ll(kind, geom, Sp, S, W, Rpl, Lw)
        else:
            run = SJ._build_decode(kind, geom, Sp,
                                   host_args[2].shape[2], Lw)
        dt, syms = _timeit(run, *dargs)
        t["dev_dec"] += dt
        dev_syms[name] = syms

    # ---- device lane unpack (SEQ + QUAL fused), timed pre-readback ----
    total = int(lengths.sum())
    rec_starts = np.zeros(n, dtype=np.int64)
    rec_starts[1:] = np.cumsum(lengths[:-1])
    Rpl = max((n + W - 1) // W, 1)
    off_mat, llm2 = PJ._mats(rec_starts, lengths, W, Rpl)
    t0 = pc()
    d_off, d_llm2, d_dmap, d_qb = jax.block_until_ready(
        [jax.device_put(a) for a in (off_mat, llm2, _CODE_TO_BASE_FULL,
                                     np.int32(blk.minq))])
    t["h2d"] += pc() - t0
    Sp_sq = R.pad_steps(Sq)
    runu = PJ._build_unpack_pair(Sp_sq, W, Rpl, PJ.pad_flat(total))
    dt, flats = _timeit(
        lambda: runu(dev_syms["SEQ"], dev_syms["QUAL"], d_off, d_llm2,
                     d_dmap, d_qb))
    t["dev_unpack"] += dt

    # readbacks: flats for SEQ/QUAL, symbol matrices for aux streams
    d2h_bytes = 0
    t0 = pc()
    seq_flat = np.asarray(flats[0])[:total].copy()
    qual_flat = np.asarray(flats[1])[:total].copy()
    t["d2h"] += pc() - t0
    d2h_bytes += total * 2
    host_syms = {}
    for name, kind, geom, counts, S in specs:
        if name in ("SEQ", "QUAL"):
            continue
        if packed[name] is None:
            Wn = blk.streams[name].payload.shape[0]
            host_syms[name] = np.zeros((S, Wn), dtype=np.uint8)
            continue
        kind, geom, counts, S, Sp, Lw, _ = packed[name]
        t0 = pc()
        arr = np.asarray(dev_syms[name])
        t["d2h"] += pc() - t0
        d2h_bytes += arr.nbytes
        out = arr[:S]
        mask = np.arange(S)[:, None] < counts[None, :]
        host_syms[name] = np.where(mask, out, arr.dtype.type(0))

    class _Shim:
        """Returns the already-device-decoded aux symbol matrices and the
        device-unpacked SEQ/QUAL flats in decode_block_fast's
        deterministic call order."""
        def __init__(self):
            self.plain = [host_syms[k] for k in
                          ("LEN", "FLAG", "IDD", "IDX", "SEQX")]

        def decode_stream(self, kind, geom, payload, lens, counts, S,
                          pos=None, reset=None):
            return self.plain.pop(0)

        def decode_seq_qual_raw(self, *a, **k):
            # read-only views, mirroring streams_jax.decode_seq_qual_raw
            # (SEQX patches land in the assembled output, not here)
            return seq_flat, qual_flat

    dt, cold, out = _timeit_host(
        lambda: decode_block_fast(blk, cfg, _Shim()))
    t["host_dec_finish"] = dt
    t["host_cold_extra"] += max(0.0, cold - dt)
    assert out == data_b, "round-trip mismatch"
    t["spread"] = round(max((m / b for b, m in _SPREADS if b > 0),
                            default=1.0), 3)
    t["d2h_bytes"] = d2h_bytes
    t["h2d_bytes"] = h2d_bytes
    with open(os.path.join(WORKDIR, f"dec_{MODE}.json"), "w") as f:
        json.dump(t, f)
    return 0


class _ReplayBackend:
    """Record/replay wrapper around a streams backend: in "record" mode
    every kernel-entry call runs for real and its output is taped; in
    "replay" mode outputs are served from the tape in call order (the
    api pipeline's backend call order is deterministic: all device calls
    happen on the main thread, block by block). Replay makes the kernel
    share of a wall-clock run ~free, so the measured wall time is the
    HOST pipeline — parsing, modelling, container IO, assembly, thread
    handoffs — under real single-process contention. summarize() adds
    the separately-measured TPU kernel seconds back in."""

    def __init__(self, real):
        self._real = real
        self._tape: dict[str, list] = {}
        self._fifo: dict[str, list] = {}
        self.mode = "record"

    def start_replay(self):
        self.mode = "replay"
        self._fifo = {k: list(v) for k, v in self._tape.items()}

    def _call(self, name, *args, **kw):
        if self.mode == "record":
            out = getattr(self._real, name)(*args, **kw)
            self._tape.setdefault(name, []).append(out)
            return out
        return self._fifo[name].pop(0)

    # the exact surface pipeline_native/pipeline probe with hasattr()
    def encode_stream(self, *a, **k):
        return self._call("encode_stream", *a, **k)

    def encode_stream_ll(self, *a, **k):
        return self._call("encode_stream_ll", *a, **k)

    def encode_seq_qual_raw(self, *a, **k):
        return self._call("encode_seq_qual_raw", *a, **k)

    def decode_stream(self, *a, **k):
        return self._call("decode_stream", *a, **k)

    def decode_stream_ll(self, *a, **k):
        return self._call("decode_stream_ll", *a, **k)

    def decode_seq_qual_raw(self, *a, **k):
        return self._call("decode_seq_qual_raw", *a, **k)

    # batched multi-block surface (small-block window batching): the
    # tape stores each window call's final per-block results (which
    # include the batched paths' in-call host compaction, ~0.5 ms/block
    # — the anchored wall is that much conservative-side elsewhere)
    def encode_seq_qual_raw_blocks(self, *a, **k):
        return self._call("encode_seq_qual_raw_blocks", *a, **k)

    def encode_stream_blocks(self, *a, **k):
        return self._call("encode_stream_blocks", *a, **k)

    def decode_seq_qual_raw_blocks(self, *a, **k):
        return self._call("decode_seq_qual_raw_blocks", *a, **k)

    def decode_stream_blocks(self, *a, **k):
        return self._call("decode_stream_blocks", *a, **k)


def phase_wall() -> int:
    """Single-process wall-clock anchor — the HEADLINE phase since round
    5: time real api.encode_fastq + decode_fastq invocations over
    SFQ_WALL_BLOCKS (default 4) blocks of the pinned shape, in THIS
    process, wall clock — no per-stage synthesis. Multi-block is the
    honest production shape: the 3-stage pipeline (prep || device ||
    write, read || device || finish) only overlaps across block
    boundaries, and a sustained encoder is never single-block. Figures:

    - wall_cpu_*: one full invocation with the JAX kernels executing on
      the host cores (CPU backend). Real but kernel-dominated here —
      the coder scan that takes ~8 ms on the chip takes ~45 s on CPU —
      so it lower-bounds production throughput by orders of magnitude.
    - wall_host_*: the same invocations with kernel outputs replayed
      from a tape (recorded in the timed cpu run), so the wall clock
      measures everything EXCEPT kernels: the whole host pipeline under
      real contention, including pipeline overlap. summarize() adds the
      TPU pass's measured kernel seconds (x blocks, conservatively
      serial — the real pipeline overlaps them) to form the anchored
      headline."""
    from slimfastq_tpu.api import decode_fastq, encode_fastq
    from slimfastq_tpu.ops import streams_jax
    from slimfastq_tpu.utils.synth import synth_fastq

    reads, read_len, level, cfg = _cfg()
    B = max(1, int(os.environ.get("SFQ_WALL_BLOCKS", "4")))
    data = synth_fastq(reads * B, read_len=read_len, seed=0,
                       var_len=False, n_rate=0.0005)
    kw = dict(lanes=cfg.lanes, aux_lanes=cfg.aux_lanes,
              block_records=cfg.block_records)
    back = _ReplayBackend(streams_jax)
    # warm-up on ONE block: compiles every kernel shape the B-block run
    # uses (all full blocks share shapes) + builds the .so (untimed)
    wdata = _data(reads, read_len)
    enc_w = encode_fastq(wdata, level=level, backend=streams_jax, **kw)
    out = decode_fastq(enc_w, backend=streams_jax)
    assert out == wdata, "wall-clock round-trip mismatch"
    # one REAL timed invocation (records the tape as a side effect)
    t0 = pc()
    enc = encode_fastq(data, level=level, backend=back, **kw)
    wall_cpu_e = pc() - t0
    t0 = pc()
    out = decode_fastq(enc, backend=back)
    wall_cpu_d = pc() - t0
    assert out == data, "wall-clock round-trip mismatch"
    # replay runs: kernels served from the tape -> host-pipeline wall
    es, ds = [], []
    for _ in range(max(ITERS, 5)):
        back.start_replay()
        t0 = pc()
        enc2 = encode_fastq(data, level=level, backend=back, **kw)
        es.append(pc() - t0)
        t0 = pc()
        out = decode_fastq(enc2, backend=back)
        ds.append(pc() - t0)
        assert enc2 == enc and out == data, "replay mismatch"
    best_e, best_d = min(es), min(ds)
    med = (sorted(es)[len(es) // 2] + sorted(ds)[len(ds) // 2])
    t = {"wall_cpu_encode_s": wall_cpu_e, "wall_cpu_decode_s": wall_cpu_d,
         "wall_host_encode_s": best_e, "wall_host_decode_s": best_d,
         "raw": len(data), "blocks": B,
         "spread": round(med / max(best_e + best_d, 1e-9), 3)}
    with open(os.path.join(WORKDIR, "wall.json"), "w") as f:
        json.dump(t, f)
    return 0


def _cpu_env(base):
    env = dict(base, SFQ_BENCH_MODE="cpu", JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if "axon" not in p)
    return env


def run_phases():
    """Subprocess phases: (cpu-enc, cpu-dec) for clean host-stage timing,
    (tpu-enc, tpu-dec) for kernel timing, plus a cpu-only wall phase (one
    real encode_fastq+decode_fastq wall-clock anchor). Asserts the cpu
    and tpu passes wrote byte-identical containers.

    Degradation guard (round-3 VERDICT #2): a phase whose recorded
    med/min spread still exceeds 3x after _timeit's in-process
    re-measures gets rerun in a FRESH subprocess (fresh tunnel session /
    fresh host state) up to SFQ_BENCH_PHASE_RETRIES more times; the
    attempt with the lowest spread wins (containers are deterministic,
    so attempts are interchangeable). A phase that never gets below 3x
    marks the run degraded in summarize().

    Returns (host_enc, host_dec, dev_enc, dev_dec, wall) timing dicts."""
    base = dict(os.environ, SFQ_BENCH_TMP=WORKDIR)
    timeout_s = int(os.environ.get("SFQ_BENCH_PHASE_TIMEOUT", 2400))
    retries = int(os.environ.get("SFQ_BENCH_PHASE_RETRIES", 2))
    plan = [("cpu", "enc"), ("cpu", "dec"), ("tpu", "enc"),
            ("tpu", "dec"), ("cpu", "wall")]
    for mode, ph in plan:
        env = _cpu_env(base) if mode == "cpu" else dict(
            base, SFQ_BENCH_MODE=mode)
        jpath = os.path.join(
            WORKDIR, f"{ph}_{mode}.json" if ph != "wall" else "wall.json")
        best = None
        for attempt in range(1 + retries):
            try:
                # the timeout guards against a wedged device tunnel: a
                # hung TPU phase must fail the run, not hang the driver
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=dict(env, SFQ_BENCH_PHASE=ph), timeout=timeout_s)
            except subprocess.TimeoutExpired:
                raise RuntimeError(
                    f"phase {mode}/{ph} timed out after {timeout_s}s "
                    "(device tunnel hung?)")
            if r.returncode != 0:
                raise RuntimeError(f"phase {mode}/{ph} failed")
            with open(jpath) as f:
                res = json.load(f)
            spread = res.get("spread", 1.0)
            res["phase_attempts"] = attempt + 1
            if best is None or spread < best.get("spread", 1.0):
                best = res
            if spread <= 3.0:
                break
        with open(jpath, "w") as f:
            json.dump(best, f)
    with open(os.path.join(WORKDIR, "bench_cpu.sfq"), "rb") as f:
        cpu_bytes = f.read()
    with open(os.path.join(WORKDIR, "bench_tpu.sfq"), "rb") as f:
        tpu_bytes = f.read()
    if cpu_bytes != tpu_bytes:
        raise RuntimeError("cpu/tpu containers differ — kernel "
                           "equivalence broken at production shape")
    out = []
    for mode in ("cpu", "tpu"):
        for ph in ("enc", "dec"):
            with open(os.path.join(WORKDIR, f"{ph}_{mode}.json")) as f:
                out.append(json.load(f))
    with open(os.path.join(WORKDIR, "wall.json")) as f:
        out.append(json.load(f))
    return tuple(out)


def summarize(enc, dec, denc, ddec, level, wall=None):
    """Host stages from the cpu pass (enc, dec); device kernels and
    tunnel transfers from the tpu pass (denc, ddec); wall-clock anchor
    from the wall pass."""
    raw = enc["raw"]
    # compaction host cost: when the TPU pass ran the Pallas device
    # compactor, the deployment's host work is only the flush append
    # (timed in the CPU pass on identical bytes); otherwise the full
    # host compaction
    compact_s = enc.get("host_flush", enc["host_compact"]) \
        if denc.get("dev_compact", 0) > 0 else enc["host_compact"]
    host_enc = (enc["host_index"] + enc["host_prep"] + enc["host_pack"]
                + compact_s + enc["host_write"])
    host_dec = (dec["host_read"] + dec["host_dec_prep"]
                + dec["host_dec_finish"])
    dev = (denc["dev_enc"] + denc["dev_pack"] + denc["dev_compact"]
           + ddec["dev_dec"] + ddec["dev_unpack"])
    tunnel = denc["h2d"] + denc["d2h"] + ddec["h2d"] + ddec["d2h"]
    e2e = host_enc + host_dec + dev
    # production-PCIe estimate (round-2 VERDICT weak #3): price the
    # reported transfer volumes at a conservative 10 GB/s host link
    # instead of excluding them (the dev tunnel's MB/s is meaningless)
    PCIE_GBPS = 10.0
    xfer_bytes = (denc.get("h2d_bytes", 0) + denc.get("d2h_bytes", 0)
                  + ddec.get("h2d_bytes", 0) + ddec.get("d2h_bytes", 0))
    pcie_s = xfer_bytes / (PCIE_GBPS * 1e9)
    spreads = {
        "enc_cpu": enc.get("spread", 1.0),
        "dec_cpu": dec.get("spread", 1.0),
        "enc_tpu": denc.get("spread", 1.0),
        "dec_tpu": ddec.get("spread", 1.0),
    }
    out = {
        "metric": "fastq_encode_decode_e2e_throughput",
        "value": round(2 * raw / e2e / 1e9, 4),
        "unit": "GB/s",
        "vs_baseline": round(2 * raw / e2e / 1e9 / 0.1, 2),
        "value_with_pcie_at_10gbps": round(2 * raw / (e2e + pcie_s) / 1e9,
                                           4),
        "pcie_estimate_s": round(pcie_s, 5),
        # a run whose timings never stabilised (any phase still > 3x
        # med/min after the in-process re-measures AND the fresh-
        # subprocess retries) is visibly unusable, not silently recorded
        "degraded": any(s > 3.0 for s in spreads.values()),
        "timing_spread_med_over_min": spreads,
        "phase_attempts": {
            "enc_cpu": enc.get("phase_attempts", 1),
            "dec_cpu": dec.get("phase_attempts", 1),
            "enc_tpu": denc.get("phase_attempts", 1),
            "dec_tpu": ddec.get("phase_attempts", 1),
        },
        "raw_bytes": raw,
        "compressed_bytes": enc["compressed"],
        "ratio": round(raw / enc["compressed"], 4),
        "level": level,
        "device_gbps": round(2 * raw / dev / 1e9, 4),
        "host_encode_s": round(host_enc, 5),
        "host_decode_s": round(host_dec, 5),
        "device_encode_s": round(denc["dev_enc"] + denc["dev_pack"]
                                 + denc["dev_compact"], 5),
        "device_decode_s": round(ddec["dev_dec"] + ddec["dev_unpack"], 5),
        "tunnel_s": round(tunnel, 5),
        "tunnel_h2d_s": round(denc["h2d"] + ddec["h2d"], 5),
        "tunnel_d2h_s": round(denc["d2h"] + ddec["d2h"], 5),
        "tunnel_d2h_bytes": denc["d2h_bytes"] + ddec["d2h_bytes"],
        "tunnel_h2d_bytes": denc.get("h2d_bytes", 0)
        + ddec.get("h2d_bytes", 0),
        "tunnel_note": "host<->device time excluded from headline; this "
                       "dev harness tunnels at ~MB/s where production "
                       "PCIe moves GB/s (KERNEL_NOTES §6)",
        "host_cold_extra_s": round(enc["host_cold_extra"]
                                   + dec["host_cold_extra"], 5),
        "hard_retries": denc.get("hard_retries", 0),
        "host_breakdown_s": {
            "index": round(enc["host_index"], 5),
            "prep": round(enc["host_prep"], 5),
            "pack": round(enc["host_pack"], 5),
            "compact": round(compact_s, 5),
            # informational ONLY (not in the headline): what host-side
            # compaction costs when NO device compactor runs — the
            # CPU-only deployment's price, kept for comparison
            "compact_if_no_device": round(enc["host_compact"], 5),
            "write": round(enc["host_write"], 5),
            "read": round(dec["host_read"], 5),
            "dec_prep": round(dec["host_dec_prep"], 5),
            "dec_finish": round(dec["host_dec_finish"], 5),
        },
        "device_breakdown_s": {
            "pack": round(denc["dev_pack"], 5),
            "enc_coder": round(denc["dev_enc"], 5),
            "compact": round(denc["dev_compact"], 5),
            "dec_coder": round(ddec["dev_dec"], 5),
            "unpack": round(ddec["dev_unpack"], 5),
        },
    }
    if wall is not None:
        # Measured single-process wall-clock anchor — the HEADLINE
        # since round 5 (round-4 VERDICT next #1: "make the anchored
        # number the headline"): the host pipeline over SFQ_WALL_BLOCKS
        # blocks with kernels replayed from a tape, plus the TPU pass's
        # measured kernel seconds per block (added serially — the real
        # pipeline overlaps them, so this is conservative). The per-
        # stage min-of-N sum is retained as value_stage_sum (the
        # diagnostic upper bound; the round-2..4 headline).
        B = wall.get("blocks", 1)
        wraw = wall.get("raw", raw * B)
        w_cpu = wall["wall_cpu_encode_s"] + wall["wall_cpu_decode_s"]
        w_host = wall["wall_host_encode_s"] + wall["wall_host_decode_s"]
        anchored = 2 * wraw / (w_host + dev * B) / 1e9
        stage_sum = out["value"]
        out.update({
            "value": round(anchored, 4),
            "vs_baseline": round(anchored / 0.1, 2),
            "value_stage_sum": stage_sum,
            "headline": "wallclock_anchored",
            "wall_blocks": B,
            "wall_raw_bytes": wraw,
            "value_anchored_with_pcie_at_10gbps": round(
                2 * wraw / (w_host + (dev + pcie_s) * B) / 1e9, 4),
            "wallclock_gbps_cpu_backend": round(2 * wraw / w_cpu / 1e9,
                                                5),
            "wallclock_cpu_encode_s": round(wall["wall_cpu_encode_s"], 5),
            "wallclock_cpu_decode_s": round(wall["wall_cpu_decode_s"], 5),
            "wallclock_host_encode_s": round(wall["wall_host_encode_s"],
                                             5),
            "wallclock_host_decode_s": round(wall["wall_host_decode_s"],
                                             5),
            "value_wallclock_anchored": round(anchored, 4),
            "wallclock_note": "value = anchored wall clock: host "
                              "pipeline over wall_blocks blocks "
                              "(kernels replayed) + measured TPU kernel "
                              "seconds; value_stage_sum = per-stage "
                              "min-of-N sum (BASELINE.md)",
        })
        if wall.get("spread", 1.0) > 3.0:
            out["degraded"] = True
    return out


def main() -> int:
    phase = os.environ.get("SFQ_BENCH_PHASE")
    if phase == "enc":
        return phase_encode()
    if phase == "dec":
        return phase_decode()
    if phase == "wall":
        return phase_wall()

    if len(sys.argv) > 1 and sys.argv[1] == "table":
        # BASELINE.md protocol table: per-config rows
        rows = []
        for reads, length, level in ((16384, 100, 3), (65536, 100, 3),
                                     (65536, 100, 1), (65536, 100, 4)):
            os.environ["SFQ_BENCH_READS"] = str(reads)
            os.environ["SFQ_BENCH_LEN"] = str(length)
            os.environ["SFQ_BENCH_LEVEL"] = str(level)
            enc, dec, denc, ddec, wall = run_phases()
            s = summarize(enc, dec, denc, ddec, level, wall)
            rows.append((reads, length, level, s))
            print(f"| {reads} | {length} | {level} | {s['value']} | "
                  f"{s['device_gbps']} | {s['ratio']} | "
                  f"{s['host_encode_s'] + s['host_decode_s']:.3f} | "
                  f"{s['device_encode_s'] + s['device_decode_s']:.4f} |")
        return 0

    import jax
    reads, read_len, level, cfg = _cfg()
    try:
        enc, dec, denc, ddec, wall = run_phases()
    except RuntimeError as e:
        out = {"metric": "fastq_encode_decode_e2e_throughput",
               "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0,
               "error": str(e)}
        # salvage the CPU pass's host-stage numbers if that half ran
        try:
            with open(os.path.join(WORKDIR, "enc_cpu.json")) as f:
                ec = json.load(f)
            with open(os.path.join(WORKDIR, "dec_cpu.json")) as f:
                dc = json.load(f)
            out["host_encode_s"] = round(
                ec["host_index"] + ec["host_prep"] + ec["host_pack"]
                + ec["host_compact"] + ec["host_write"], 5)
            out["host_decode_s"] = round(
                dc["host_read"] + dc["host_dec_prep"]
                + dc["host_dec_finish"], 5)
        except (OSError, KeyError, ValueError):
            pass
        print(json.dumps(out))
        return 1
    out = summarize(enc, dec, denc, ddec, level, wall)
    out["platform"] = jax.devices()[0].platform
    out["reads"] = reads
    out["read_len"] = read_len
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
