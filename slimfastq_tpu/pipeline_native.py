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

U32 = np.uint32


def _group_order(n: int, W: int) -> np.ndarray:
    """Stable grouping of records by lane (record r -> lane r % W)."""
    return np.argsort(np.arange(n) % W, kind="stable")


def _gather_ranges(src: np.ndarray, offs: np.ndarray, lens: np.ndarray):
    """Concatenate src[offs[i]:offs[i]+lens[i]] for all i (vectorised)."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=src.dtype)
    starts = np.zeros(len(lens), dtype=np.int64)
    starts[1:] = np.cumsum(lens[:-1])
    idx = np.repeat(offs - starts, lens) + np.arange(total, dtype=np.int64)
    return src[idx]


def _lane_matrix(flat_grouped: np.ndarray, lane_totals: np.ndarray):
    """Per-lane concatenated bytes (grouped flat) -> [S, W] matrix."""
    W = len(lane_totals)
    S = int(lane_totals.max()) if W else 0
    syms = np.zeros((S, W), dtype=U32)
    if flat_grouped.size == 0:
        return syms, lane_totals.astype(np.int64)
    starts = np.zeros(W, dtype=np.int64)
    starts[1:] = np.cumsum(lane_totals[:-1])
    rows = (np.arange(flat_grouped.size, dtype=np.int64)
            - np.repeat(starts, lane_totals))
    cols = np.repeat(np.arange(W), lane_totals)
    syms[rows, cols] = flat_grouped
    return syms, lane_totals.astype(np.int64)


def _matrix_to_grouped(syms: np.ndarray, lane_totals: np.ndarray):
    """Inverse of _lane_matrix."""
    W = len(lane_totals)
    total = int(lane_totals.sum())
    if total == 0:
        return np.zeros(0, dtype=syms.dtype)
    starts = np.zeros(W, dtype=np.int64)
    starts[1:] = np.cumsum(lane_totals[:-1])
    rows = (np.arange(total, dtype=np.int64)
            - np.repeat(starts, lane_totals))
    cols = np.repeat(np.arange(W), lane_totals)
    return syms[rows, cols]


def _per_record_lane_layout(lengths: np.ndarray, W: int):
    """Group records by lane; return (order, lane_totals, grouped record
    lengths)."""
    n = len(lengths)
    order = _group_order(n, W)
    glens = lengths[order]
    lane_totals = np.bincount(np.arange(n) % W, weights=lengths,
                              minlength=W).astype(np.int64)
    return order, lane_totals, glens


def encode_block_fast(data: np.ndarray, idx: dict, lo: int, hi: int,
                      cfg: CodecConfig, backend) -> EncodedBlock:
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

    streams: dict[str, EncodedStream] = {}

    def enc(name, kind, geom, syms, counts, pos=None, reset=None):
        payload, lens = backend.encode_stream(kind, geom, syms, counts,
                                              pos=pos, reset=reset)
        streams[name] = EncodedStream(counts.astype(np.int64), lens, payload)

    # --- LEN ---------------------------------------------------------------
    flat, rec_nbytes = native.lens_encode(lengths, Wa)
    nb64 = rec_nbytes.astype(np.int64)
    boffs = np.zeros(n, dtype=np.int64)
    boffs[1:] = np.cumsum(nb64[:-1])
    order_a = _group_order(n, Wa)
    grouped = _gather_ranges(flat, boffs[order_a], nb64[order_a])
    lane_tot = np.bincount(np.arange(n) % Wa, weights=nb64,
                           minlength=Wa).astype(np.int64)
    lsyms, lcounts = _lane_matrix(grouped, lane_tot)
    enc("LEN", "byte", cfg.bytes_, lsyms, lcounts)

    # --- IDs + plus: flags/IDD/IDX -----------------------------------------
    bidx = {"id_off": np.ascontiguousarray(id_off),
            "id_len": np.ascontiguousarray(id_len),
            "plus_off": np.ascontiguousarray(plus_off),
            "plus_len": np.ascontiguousarray(plus_len)}
    flags, dl, xl = native.ids_encode(data, bidx, n, Wa)
    # FLAG stream: 3 symbols per record, lane-grouped
    f3 = flags.reshape(n, 3).astype(np.int64)
    forder = _group_order(n, Wa)
    fgrouped = f3[forder].reshape(-1)
    flane_tot = 3 * np.bincount(np.arange(n) % Wa,
                                minlength=Wa).astype(np.int64)
    fsyms, fcounts = _lane_matrix(fgrouped, flane_tot)
    enc("FLAG", "flag", cfg.flags, fsyms, fcounts)

    for name, lanes_b in (("IDD", dl), ("IDX", xl)):
        counts = np.array([len(b) for b in lanes_b], dtype=np.int64)
        S = int(counts.max()) if counts.size else 0
        syms = np.zeros((S, Wa), dtype=U32)
        for w, b in enumerate(lanes_b):
            if len(b):
                syms[: len(b), w] = b
        enc(name, "byte", cfg.bytes_, syms, counts)

    # --- SEQ + SEQX ---------------------------------------------------------
    from .pipeline import _lane_lengths_matrix
    ll_mat = _lane_lengths_matrix(lengths, W)
    scounts = ll_mat.sum(axis=0)
    S = int(scounts.max()) if scounts.size else 0
    # device backends derive pos/reset from ll_mat on device; the oracle
    # backend needs them on host
    ll_capable = hasattr(backend, "encode_stream_ll")
    if not ll_capable:
        _, scounts, S, pos, reset = _seq_symbol_layout(lengths, W)
    sq, _, nbad = native.pack_lanes(data, seq_off, lengths, W, S,
                                    map256=_BASE_TO_CODE)
    seqx_lane = [bytearray() for _ in range(Wa)]
    if nbad:
        # rare path: locate non-ACGT bytes record-major
        rm_flat = _gather_ranges(data, seq_off, lengths)
        codes_rm = _BASE_TO_CODE[rm_flat]
        bad = codes_rm == 255
        rec_starts = np.zeros(n, dtype=np.int64)
        rec_starts[1:] = np.cumsum(lengths[:-1])
        bad_idx = np.nonzero(bad)[0]
        recs = np.searchsorted(rec_starts, bad_idx, side="right") - 1
        poss = bad_idx - rec_starts[recs]
        prev_xrec = [-1] * Wa
        cur_rec = -1
        prev_p = -1
        for bi, r, p in zip(bad_idx, recs, poss):
            w = int(r) % Wa
            ordinal = int(r) // Wa
            xb = seqx_lane[w]
            if r != cur_rec:
                put_varint(xb, ordinal - prev_xrec[w])
                put_varint(xb, int(p))
                prev_xrec[w] = ordinal
                cur_rec = r
            else:
                put_varint(xb, 0)
                put_varint(xb, int(p) - prev_p)
            xb.append(int(rm_flat[bi]))
            prev_p = int(p)
    sx_counts = np.array([len(b) for b in seqx_lane], dtype=np.int64)
    sxS = int(sx_counts.max()) if sx_counts.size else 0
    sxsyms = np.zeros((sxS, Wa), dtype=U32)
    for w, b in enumerate(seqx_lane):
        if b:
            sxsyms[: len(b), w] = np.frombuffer(bytes(b), dtype=np.uint8)
    enc("SEQX", "byte", cfg.bytes_, sxsyms, sx_counts)

    if n and int(lengths.sum()):
        minq, maxq = native.minmax_ranges(data, qual_off, lengths)
    else:
        minq = maxq = 33
    qual_depth = 6 if (maxq - minq + 1) <= 64 else 7
    qs, _, _ = native.pack_lanes(data, qual_off, lengths, W, S,
                                 bias=minq)
    from dataclasses import replace
    qgeom = replace(cfg.qual, depth=qual_depth)

    if ll_capable:
        pay, lens_ = backend.encode_stream_ll("seq", cfg.seq, sq, ll_mat,
                                              scounts)
        streams["SEQ"] = EncodedStream(scounts.astype(np.int64), lens_, pay)
        pay, lens_ = backend.encode_stream_ll("qual", qgeom, qs, ll_mat,
                                              scounts)
        streams["QUAL"] = EncodedStream(scounts.astype(np.int64), lens_,
                                        pay)
    else:
        enc("SEQ", "seq", cfg.seq, sq, scounts, pos=pos, reset=reset)
        enc("QUAL", "qual", qgeom, qs, scounts, pos=pos, reset=reset)

    return EncodedBlock(n, minq, qual_depth, streams)


def decode_block_fast(blk: EncodedBlock, cfg: CodecConfig,
                      backend) -> bytes:
    """Decode one block straight to FASTQ bytes (native assembly)."""
    n = blk.num_records
    W, Wa = cfg.lanes, cfg.aux_lanes
    if n == 0:
        return b""

    def dec_lanes(name, kind="byte", geom=None, counts=None, pos=None,
                  reset=None):
        es = blk.streams[name]
        g = geom if geom is not None else cfg.bytes_
        c = counts if counts is not None else es.sym_counts
        S = int(np.asarray(c).max()) if len(c) else 0
        syms = backend.decode_stream(kind, g, es.payload, es.lane_lens,
                                     c, S, pos=pos, reset=reset)
        return [np.ascontiguousarray(syms[: c[w], w]).astype(np.uint8)
                for w in range(len(c))]

    # 1. lengths
    len_lanes = dec_lanes("LEN")
    lengths = native.lens_decode(len_lanes, n, Wa)

    # 2. flags (implicit counts: 3 per record)
    rec_per_lane = (n - np.arange(Wa) + Wa - 1) // Wa
    fcounts = 3 * rec_per_lane
    flag_lanes = dec_lanes("FLAG", kind="flag", geom=cfg.flags,
                           counts=fcounts)
    # back to record order: lane-grouped triples -> [n, 3]
    forder = _group_order(n, Wa)
    f_grouped = np.concatenate([fl for fl in flag_lanes]) if n else \
        np.zeros(0, np.uint8)
    flags = np.zeros(3 * n, dtype=np.uint8)
    flags.reshape(n, 3)[forder] = f_grouped.reshape(n, 3)

    # 3. IDs + plus
    idd_lanes = dec_lanes("IDD")
    idx_lanes = dec_lanes("IDX")
    ida, ioff, ilen, pla, poff, plen = native.ids_decode(
        n, Wa, flags, idd_lanes, idx_lanes)

    # 4. seq exceptions
    sx_lanes = dec_lanes("SEQX")
    exc: list[tuple[int, int, int]] = []  # (record, pos, char)
    for w in range(Wa):
        buf, p = sx_lanes[w].tobytes(), 0
        ordinal, bpos = -1, -1
        while p < len(buf):
            drec, p = get_varint(buf, p)
            dpos_, p = get_varint(buf, p)
            if drec:
                ordinal += drec
                bpos = dpos_
            else:
                bpos += dpos_
            exc.append((w + ordinal * Wa, bpos, int(buf[p])))
            p += 1

    # 5/6. seq + qual
    from .pipeline import _lane_lengths_matrix
    ss = blk.streams["SEQ"]
    qs = blk.streams["QUAL"]
    from dataclasses import replace
    qgeom = replace(cfg.qual, depth=blk.qual_depth)
    if hasattr(backend, "decode_stream_ll"):
        ll_mat = _lane_lengths_matrix(lengths, W)
        scounts = ll_mat.sum(axis=0)
        S = int(scounts.max()) if scounts.size else 0
        seq_syms = backend.decode_stream_ll("seq", cfg.seq, ss.payload,
                                            ss.lane_lens, ll_mat, scounts,
                                            S)
        qual_syms = backend.decode_stream_ll("qual", qgeom, qs.payload,
                                             qs.lane_lens, ll_mat, scounts,
                                             S)
    else:
        _, scounts, S, pos, reset = _seq_symbol_layout(lengths, W)
        seq_syms = backend.decode_stream("seq", cfg.seq, ss.payload,
                                         ss.lane_lens, scounts, S,
                                         pos=pos, reset=reset)
        qual_syms = backend.decode_stream("qual", qgeom, qs.payload,
                                          qs.lane_lens, scounts, S,
                                          pos=pos, reset=reset)

    # lane matrices -> record-major flat buffers (C++ unpack)
    rec_starts = np.zeros(n, dtype=np.int64)
    rec_starts[1:] = np.cumsum(lengths[:-1])
    total = int(lengths.sum())
    base_map = np.zeros(256, dtype=np.uint8)
    base_map[:4] = _CODE_TO_BASE
    seq_bytes = native.unpack_lanes(seq_syms & 3, lengths, W, rec_starts,
                                    total, map256=base_map)
    for r, p, ch in exc:
        seq_bytes[rec_starts[r] + p] = ch
    qual_bytes = native.unpack_lanes(qual_syms, lengths, W, rec_starts,
                                     total, bias=blk.minq)

    return native.fastq_assemble(
        n, ida, ioff, ilen,
        np.ascontiguousarray(seq_bytes), rec_starts,
        np.ascontiguousarray(qual_bytes), lengths,
        pla, poff, plen)
