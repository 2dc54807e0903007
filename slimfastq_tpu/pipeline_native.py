"""Fast host pipeline: C++ (native/) + vectorised NumPy block assembly.

Byte-format identical to pipeline.py (the behavioural oracle) — tests
assert container equality between the two paths. Works directly on the
raw FASTQ buffer + index arrays, never materialising per-record Python
objects (SURVEY.md §3.5: hosts own parsing; keep it native).
"""

from __future__ import annotations

import numpy as np

from . import native
from .config import CodecConfig
from .pipeline import (STREAMS, EncodedBlock, EncodedStream,
                       _seq_symbol_layout, _BASE_TO_CODE, _CODE_TO_BASE)
from .utils.bits import get_varint, put_varint
from .ops import streams_np

# device-side byte<->symbol maps (full 256-entry tables, gather-friendly):
# encode maps non-ACGT to symbol 0 (the SEQX stream patches them back on
# decode); decode maps any symbol byte through its low 2 bits
_BASE_TO_CODE_DEV = np.where(_BASE_TO_CODE == 255, 0,
                             _BASE_TO_CODE).astype(np.uint8)
_CODE_TO_BASE_FULL = _CODE_TO_BASE[np.arange(256) & 3].astype(np.uint8)


def _group_order(n: int, W: int) -> np.ndarray:
    """Stable grouping of records by lane (record r -> lane r % W);
    closed form (an argsort here cost ~1.3 ms at 64k records)."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    Rpl = (n + W - 1) // W
    grid = (np.arange(W, dtype=np.int64)[:, None]
            + np.arange(Rpl, dtype=np.int64)[None, :] * W).ravel()
    return grid[grid < n]


def _lanes_to_mat(lanes_b, Wa: int):
    """Per-lane byte buffers -> ([S, Wa] u8 matrix, counts). Row-major
    fill (contiguous memcpy per lane) + one blocked C++ transpose — the
    column-strided fill this replaces cost ~3.4 ms per stream."""
    counts = np.array([len(b) for b in lanes_b], dtype=np.int64)
    S = int(counts.max()) if counts.size else 0
    if S == 0:
        return np.zeros((0, Wa), dtype=np.uint8), counts
    symsT = np.zeros((Wa, S), dtype=np.uint8)
    for w, b in enumerate(lanes_b):
        if len(b):
            symsT[w, : len(b)] = b
    return native.transpose_mat(symsT), counts




def stream_jobs_fast(data: np.ndarray, idx: dict, lo: int, hi: int,
                     cfg: CodecConfig, want_pos_reset: bool = True,
                     device_pack: bool = False):
    """Native/vectorised twin of pipeline.stream_jobs: builds every
    stream's (kind, geom, syms, counts, pos, reset) coding job straight
    from the raw buffer + index arrays (no per-record Python objects).
    Returns (jobs, n, minq, qual_depth, ll_mat). With
    want_pos_reset=False, SEQ/QUAL jobs carry pos=reset=None and callers
    derive them on device from ll_mat (encode_stream_ll). With
    device_pack=True, SEQ/QUAL jobs carry syms=None too — the lane pack
    happens on the device (backend.encode_seq_qual_raw) and the host
    only runs the non-ACGT census (native.scan_bad) for SEQX."""
    n = hi - lo
    W, Wa = cfg.lanes, cfg.aux_lanes
    sl = slice(lo, hi)
    id_off = idx["id_off"][sl]
    id_len = idx["id_len"][sl]
    seq_off = idx["seq_off"][sl]
    plus_off = idx["plus_off"][sl]
    plus_len = idx["plus_len"][sl]
    qual_off = idx["qual_off"][sl]
    lengths = idx["seq_len"][sl].astype(np.int64)

    jobs: dict[str, tuple] = {}
    prev_step = Wa if cfg.fmt >= 3 else 1  # delta baseline (frozen/fmt)

    # --- LEN ---------------------------------------------------------------
    lsyms, lcounts = _lanes_to_mat(native.lens_encode(lengths, Wa,
                                                      prev_step), Wa)
    jobs["LEN"] = ("byte", cfg.bytes_, lsyms, lcounts, None, None)

    # --- IDs + plus: flags/IDD/IDX -----------------------------------------
    bidx = {"id_off": np.ascontiguousarray(id_off),
            "id_len": np.ascontiguousarray(id_len),
            "plus_off": np.ascontiguousarray(plus_off),
            "plus_len": np.ascontiguousarray(plus_len)}
    flags, dl, xl = native.ids_encode(data, bidx, n, Wa, prev_step)
    # FLAG stream: 3 symbols per record, lane-grouped (row-major fill +
    # one transpose; the int64 fancy-index reorder here cost ~4.3 ms)
    f3 = flags.reshape(n, 3)
    rec_per_lane = ((n - np.arange(Wa) + Wa - 1) // Wa
                    if n else np.zeros(Wa, dtype=np.int64))
    fcounts = (3 * rec_per_lane).astype(np.int64)
    maxrec = int(rec_per_lane.max()) if n else 0
    if maxrec:
        fT = np.zeros((Wa, 3 * maxrec), dtype=np.uint8)
        for w in range(Wa):
            sub = f3[w::Wa]
            if sub.size:
                fT[w, : sub.size] = sub.ravel()
        fsyms = native.transpose_mat(fT)
    else:
        fsyms = np.zeros((0, Wa), dtype=np.uint8)
    jobs["FLAG"] = ("flag", cfg.flags, fsyms, fcounts, None, None)

    for name, lanes_b in (("IDD", dl), ("IDX", xl)):
        syms, counts = _lanes_to_mat(lanes_b, Wa)
        jobs[name] = ("byte", cfg.bytes_, syms, counts, None, None)

    # --- SEQ + SEQX ---------------------------------------------------------
    from .pipeline import _lane_lengths_matrix
    ll_mat = _lane_lengths_matrix(lengths, W)
    scounts = ll_mat.sum(axis=0)
    S = int(scounts.max()) if scounts.size else 0
    pos = reset = None
    if want_pos_reset:
        _, scounts, S, pos, reset = _seq_symbol_layout(lengths, W)
    if device_pack:
        sq = None
        nbad, rec_bad = native.scan_bad(data, seq_off, lengths)
    else:
        sq, _, nbad, rec_bad = native.pack_lanes(data, seq_off, lengths, W,
                                                 S, map256=_BASE_TO_CODE,
                                                 dtype=np.uint8)
    if nbad:
        # rare path: run-length exception lane streams, emitted in C++
        # byte-identically to pipeline.stream_jobs (format v2); only the
        # records pack_lanes flagged are rescanned
        seqx_lane = native.seqx_encode(data, seq_off, lengths, Wa,
                                       rec_bad=rec_bad, nbad=nbad)
    else:
        seqx_lane = [np.zeros(0, dtype=np.uint8)] * Wa
    sxsyms, sx_counts = _lanes_to_mat(seqx_lane, Wa)
    jobs["SEQX"] = ("byte", cfg.bytes_, sxsyms, sx_counts, None, None)
    jobs["SEQ"] = ("seq", cfg.seq, sq, scounts, pos, reset)

    # --- QUAL ---------------------------------------------------------------
    if n and int(lengths.sum()):
        minq, maxq = native.minmax_ranges(data, qual_off, lengths)
    else:
        minq = maxq = 33
    qrange = maxq - minq + 1
    qual_depth = 6 if qrange <= 64 else (7 if qrange <= 128 else 8)
    if device_pack:
        qs = None
    else:
        qs, _, _, _ = native.pack_lanes(data, qual_off, lengths, W, S,
                                        bias=minq, dtype=np.uint8)
    from dataclasses import replace
    qgeom = replace(cfg.qual, depth=qual_depth)
    jobs["QUAL"] = ("qual", qgeom, qs, scounts, pos, reset)

    return jobs, n, minq, qual_depth, ll_mat


def prepare_block_fast(data: np.ndarray, idx: dict, lo: int, hi: int,
                       cfg: CodecConfig, backend):
    """Host-only half of encode_block_fast (stream modeling + aux lane
    matrices). The returned opaque tuple feeds encode_prepared_block —
    split so a pipelined caller can prep block k+1 while block k is on
    the device (both halves release the GIL in their hot parts)."""
    ll_capable = hasattr(backend, "encode_stream_ll")
    raw_capable = hi > lo and hasattr(backend, "encode_seq_qual_raw") \
        and native.available()
    if raw_capable:
        # device offsets are int32: blocks whose raw byte span exceeds
        # 2 GiB (possible only with raised block_records x very long
        # reads) take the host-pack path instead of silently wrapping
        base = int(idx["id_off"][lo]) - 1  # the record's '@'
        last = hi - 1
        end = int(idx["qual_off"][last] + idx["qual_len"][last])
        raw_capable = (end - base) < (1 << 31)
    jobs, n, minq, qual_depth, ll_mat = stream_jobs_fast(
        data, idx, lo, hi, cfg, want_pos_reset=not ll_capable,
        device_pack=raw_capable)
    raw_args = None
    if raw_capable:
        # the block's raw byte range ships to the device once (padded to
        # the shape bucket HERE, in the pipelined host half); offsets
        # become block-local
        from .ops import pack_jax
        sl = slice(lo, hi)
        lengths = idx["seq_len"][sl].astype(np.int64)
        span = end - base
        # np.empty + tail-only zero: a full np.zeros pass cost ~1 ms on
        # a 16 MB block for bytes that are immediately overwritten
        dpad = np.empty(pack_jax.pad_flat(span), dtype=np.uint8)
        dpad[:span] = data[base:end]
        dpad[span:] = 0
        raw_args = (dpad, idx["seq_off"][sl] - base,
                    idx["qual_off"][sl] - base, lengths)
    return (jobs, n, minq, qual_depth, ll_mat, raw_args, ll_capable)


def encode_prepared_block(pre, cfg: CodecConfig, backend) -> EncodedBlock:
    """Device half of encode_block_fast: code every stream of a prepared
    block and assemble the EncodedBlock."""
    jobs, n, minq, qual_depth, ll_mat, raw_args, ll_capable = pre
    raw_out = None
    if raw_args is not None:
        blk_bytes, seq_offs, qual_offs, lengths = raw_args
        raw_out = backend.encode_seq_qual_raw(
            jobs["SEQ"][1], jobs["QUAL"][1], blk_bytes, seq_offs,
            qual_offs, lengths, cfg.lanes, _BASE_TO_CODE_DEV, minq,
            ll_mat, jobs["SEQ"][3], padded=True)
    streams: dict[str, EncodedStream] = {}
    for name in STREAMS:
        kind, geom, syms, counts, pos, reset = jobs[name]
        if raw_out is not None and name in ("SEQ", "QUAL"):
            payload, lens = raw_out[name]
        elif ll_capable and name in ("SEQ", "QUAL"):
            payload, lens = backend.encode_stream_ll(kind, geom, syms,
                                                     ll_mat, counts)
        else:
            payload, lens = backend.encode_stream(kind, geom, syms, counts,
                                                  pos=pos, reset=reset)
        streams[name] = EncodedStream(np.asarray(counts).astype(np.int64),
                                      lens, payload)
    return EncodedBlock(n, minq, qual_depth, streams)


def encode_block_fast(data: np.ndarray, idx: dict, lo: int, hi: int,
                      cfg: CodecConfig, backend) -> EncodedBlock:
    return encode_prepared_block(
        prepare_block_fast(data, idx, lo, hi, cfg, backend), cfg, backend)


def decode_block_device(blk: EncodedBlock, cfg: CodecConfig, backend,
                        skip_seq_qual: bool = False):
    """Device half of block decode: entropy-decode all seven streams and
    lane-unpack SEQ/QUAL to record-major byte buffers. Returns an opaque
    intermediate for decode_block_finish (the host-heavy half: ID chain
    decode, SEQX patch, FASTQ assembly) — split so a pipelined caller
    can overlap block k's host finish with block k+1's device work.
    skip_seq_qual=True decodes only the aux streams (the sharded driver
    batches SEQ/QUAL across blocks) — the intermediate carries None in
    the seq/qual byte slots and the caller patches them in."""
    n = blk.num_records
    W, Wa = cfg.lanes, cfg.aux_lanes
    if n == 0:
        return None

    def dec_lanes(name, kind="byte", geom=None, counts=None, pos=None,
                  reset=None):
        es = blk.streams[name]
        g = geom if geom is not None else cfg.bytes_
        c = counts if counts is not None else es.sym_counts
        S = int(np.asarray(c).max()) if len(c) else 0
        syms = backend.decode_stream(kind, g, es.payload, es.lane_lens,
                                     c, S, pos=pos, reset=reset)
        if syms.size:  # one blocked transpose, then zero-copy row views
            rows = native.transpose_mat(np.ascontiguousarray(syms))
            if rows.dtype != np.uint8:  # numpy-oracle backend: one
                rows = rows.astype(np.uint8)  # whole-matrix downcast
            return [rows[w, : c[w]] for w in range(len(c))]
        return [np.zeros(0, dtype=np.uint8) for _ in range(len(c))]

    prev_step = Wa if cfg.fmt >= 3 else 1  # delta baseline (frozen/fmt)

    # 1. lengths
    len_lanes = dec_lanes("LEN")
    lengths = native.lens_decode(len_lanes, n, Wa, prev_step)

    # 2. flags (implicit counts: 3 per record)
    rec_per_lane = (n - np.arange(Wa) + Wa - 1) // Wa
    fcounts = 3 * rec_per_lane
    flag_lanes = dec_lanes("FLAG", kind="flag", geom=cfg.flags,
                           counts=fcounts)
    # back to record order: lane-grouped triples -> [n, 3] (C++ gather)
    f_grouped = np.concatenate([fl for fl in flag_lanes]) if n else \
        np.zeros(0, np.uint8)
    flags = native.flags_reorder(f_grouped, n, Wa)

    # 3. ID delta/exception streams (the chain decode itself is in the
    # finish half)
    idd_lanes = dec_lanes("IDD")
    idx_lanes = dec_lanes("IDX")

    # 4. seq exceptions (parsed + patched in C++ in the finish half)
    sx_lanes = dec_lanes("SEQX")

    # 5/6. seq + qual -> record-major flat byte buffers
    from .pipeline import _lane_lengths_matrix
    ss = blk.streams["SEQ"]
    qs = blk.streams["QUAL"]
    from dataclasses import replace
    qgeom = replace(cfg.qual, depth=blk.qual_depth)
    rec_starts = np.zeros(n, dtype=np.int64)
    rec_starts[1:] = np.cumsum(lengths[:-1])
    total = int(lengths.sum())

    if skip_seq_qual:
        return (n, prev_step, lengths, flags, idd_lanes, idx_lanes,
                sx_lanes, rec_starts, None, None)

    if (hasattr(backend, "decode_seq_qual_raw") and native.available()
            and total < (1 << 31)):   # int32 device offsets (see encode)
        # device-raw path: decode + lane-unpack on device, d2h two flat
        # record-major buffers (no [S, W] matrices on the host)
        ll_mat = _lane_lengths_matrix(lengths, W)
        scounts = ll_mat.sum(axis=0)
        S = int(scounts.max()) if scounts.size else 0
        seq_bytes, qual_bytes = backend.decode_seq_qual_raw(
            cfg.seq, qgeom, ss.payload, ss.lane_lens, qs.payload,
            qs.lane_lens, ll_mat, scounts, S, rec_starts, lengths, total,
            _CODE_TO_BASE_FULL, blk.minq)
    else:
        if hasattr(backend, "decode_stream_ll"):
            ll_mat = _lane_lengths_matrix(lengths, W)
            scounts = ll_mat.sum(axis=0)
            S = int(scounts.max()) if scounts.size else 0
            seq_syms = backend.decode_stream_ll("seq", cfg.seq, ss.payload,
                                                ss.lane_lens, ll_mat,
                                                scounts, S)
            qual_syms = backend.decode_stream_ll("qual", qgeom, qs.payload,
                                                 qs.lane_lens, ll_mat,
                                                 scounts, S)
        else:
            _, scounts, S, pos, reset = _seq_symbol_layout(lengths, W)
            seq_syms = backend.decode_stream("seq", cfg.seq, ss.payload,
                                             ss.lane_lens, scounts, S,
                                             pos=pos, reset=reset)
            qual_syms = backend.decode_stream("qual", qgeom, qs.payload,
                                              qs.lane_lens, scounts, S,
                                              pos=pos, reset=reset)
        base_map = np.zeros(256, dtype=np.uint8)
        base_map[:4] = _CODE_TO_BASE
        seq_bytes = native.unpack_lanes(seq_syms & 3, lengths, W,
                                        rec_starts, total, map256=base_map)
        qual_bytes = native.unpack_lanes(qual_syms, lengths, W, rec_starts,
                                         total, bias=blk.minq)

    return (n, prev_step, lengths, flags, idd_lanes, idx_lanes, sx_lanes,
            rec_starts, seq_bytes, qual_bytes)


def decode_block_finish(inter, cfg: CodecConfig) -> memoryview | bytes:
    """Host half of block decode: ID chain decode, SEQX patch, FASTQ
    assembly. Returns a bytes-like (memoryview, zero-copy)."""
    if inter is None:
        return b""
    (n, prev_step, lengths, flags, idd_lanes, idx_lanes, sx_lanes,
     rec_starts, seq_bytes, qual_bytes) = inter
    ida, ioff, ilen, pla, poff, plen = native.ids_decode(
        n, cfg.aux_lanes, flags, idd_lanes, idx_lanes, prev_step)
    # SEQX exception runs are patched into the ASSEMBLED output's seq
    # fields (closed-form offsets), so seq/qual stay read-only views —
    # no 6.5 MB writable copy per block just to patch a few runs
    return native.fastq_assemble(
        n, ida, ioff, ilen,
        np.ascontiguousarray(seq_bytes), rec_starts,
        np.ascontiguousarray(qual_bytes), lengths,
        pla, poff, plen, sx_lanes=sx_lanes, fmt=cfg.fmt)


def decode_block_fast(blk: EncodedBlock, cfg: CodecConfig,
                      backend) -> memoryview | bytes:
    """Decode one block straight to FASTQ bytes (native assembly)."""
    return decode_block_finish(decode_block_device(blk, cfg, backend), cfg)
