"""Sharded whole-file encode: blocks data-parallel over a device mesh.

Single-controller version (one process, N devices). For a multi-host pod
slice the same structure applies with ``jax.distributed.initialize`` and a
global mesh: each host feeds its addressable block shards
(``jax.make_array_from_process_local_data``) and either gathers payloads
to host 0 or writes disjoint container shards whose indexes are merged —
blocks are independent by construction, so the result is byte-identical
to the sequential container (the correctness gate in test_parallel.py).
"""

from __future__ import annotations

import io

import numpy as np

from .. import container, native
from ..config import CodecConfig
from ..pipeline import STREAMS, EncodedBlock, EncodedStream, stream_jobs
from ..utils.fastq import parse_fastq_bytes
from . import mesh as pmesh


def _blocks_jobs(data: bytes, cfg: CodecConfig):
    """Host-side modeling for every block. Returns (list of job-dicts,
    list of (n, minq, qual_depth)). Uses the native (C++/vectorised) job
    builder when available — the same host prep as the sequential API, so
    sharded and sequential paths share one implementation."""
    all_jobs = []
    metas = []
    if native.available():
        import numpy as np
        from ..pipeline_native import stream_jobs_fast
        buf = np.frombuffer(data, dtype=np.uint8)
        idx, n = native.fastq_index(data)
        for lo in range(0, max(n, 1), cfg.block_records):
            hi = min(lo + cfg.block_records, n)
            jobs, nb, minq, qd, _ll = stream_jobs_fast(buf, idx, lo, hi,
                                                       cfg)
            all_jobs.append(jobs)
            metas.append((nb, minq, qd))
        return all_jobs, metas
    batch = parse_fastq_bytes(data)
    n = len(batch)
    for lo in range(0, max(n, 1), cfg.block_records):
        hi = min(lo + cfg.block_records, n)
        from ..api import _batch_slice
        jobs, nb, minq, qd = stream_jobs(_batch_slice(batch, lo, hi), cfg)
        all_jobs.append(jobs)
        metas.append((nb, minq, qd))
    return all_jobs, metas


def encode_fastq_sharded(data: bytes, cfg: CodecConfig,
                         mesh=None) -> bytes:
    """Encode a FASTQ buffer with blocks sharded across the mesh devices.

    Output bytes are identical to the sequential ``api.encode_fastq`` with
    the same config.
    """
    mesh = mesh or pmesh.make_mesh()
    all_jobs, metas = _blocks_jobs(data, cfg)
    B = len(all_jobs)

    # batch each stream across blocks and run sharded
    results: list[dict[str, EncodedStream]] = [dict() for _ in range(B)]
    for name in STREAMS:
        kinds = [jb[name] for jb in all_jobs]
        kind, geom = kinds[0][0], kinds[0][1]
        # qual depth can vary per block (6 vs 7): group by geometry
        groups: dict[object, list[int]] = {}
        for b, (k, g, *_rest) in enumerate(kinds):
            groups.setdefault(g, []).append(b)
        for g, idxs in groups.items():
            syms_l = [kinds[b][2] for b in idxs]
            counts_l = [np.asarray(kinds[b][3]) for b in idxs]
            pos_l = [kinds[b][4] for b in idxs]
            reset_l = [kinds[b][5] for b in idxs]
            nonempty = [i for i, b in enumerate(idxs)
                        if syms_l[i].shape[0] > 0
                        and (counts_l[i] > 0).any()]
            enc = pmesh.encode_stream_blocks(
                kind, g, mesh,
                [syms_l[i] for i in nonempty],
                [counts_l[i] for i in nonempty],
                [pos_l[i] for i in nonempty],
                [reset_l[i] for i in nonempty])
            it = iter(enc)
            for i, b in enumerate(idxs):
                if i in nonempty:
                    payload, lens = next(it)
                else:
                    W = syms_l[i].shape[1]
                    payload = np.zeros((W, 0), dtype=np.uint8)
                    lens = np.zeros(W, dtype=np.int64)
                results[b][name] = EncodedStream(
                    counts_l[i].astype(np.int64), lens, payload)

    out = io.BytesIO()
    container.write_header(out, cfg)
    offsets = []
    for b in range(B):
        nb, minq, qd = metas[b]
        blk = EncodedBlock(nb, minq, qd, results[b])
        offsets.append(container.write_block(out, blk))
    container.write_index(out, offsets)
    return out.getvalue()


def decode_fastq_sharded(data: bytes, mesh=None) -> bytes:
    """Decode a container with the heavy per-read streams (SEQ/QUAL) of all
    blocks decoded data-parallel across the mesh; aux streams and text
    assembly stay per-block on the host. Byte-identical to sequential
    decode."""
    mesh = mesh or pmesh.make_mesh()
    f = io.BytesIO(data)
    cfg = container.read_header(f)
    blocks = list(container.iter_blocks(f, cfg))
    if not blocks:
        return b""

    from dataclasses import replace

    from ..ops import streams_jax
    from ..pipeline import (_lane_lengths_matrix, decode_block)
    from ..utils.fastq import serialize_fastq

    # 1. per-block host-side decode of aux streams to recover lengths
    #    (needed for the SEQ/QUAL lane layout) — reuse the sequential
    #    decoder for everything, but intercept SEQ/QUAL via the batch path
    from ..ops.streams_np import build_pos_reset
    from ..pipeline import decode_block_lengths

    W = cfg.lanes
    counts_list, steps_list = [], []
    pay_seq, len_seq, pay_q, len_q, qgeoms = [], [], [], [], []
    pos_list, reset_list = [], []
    for blk in blocks:
        # decode LEN stream only (cheap, aux lanes) to get read lengths —
        # shared format logic with the sequential decoder (no drift)
        lengths = decode_block_lengths(blk, cfg, backend=streams_jax)
        ll = _lane_lengths_matrix(lengths, W)
        counts = ll.sum(axis=0)
        counts_list.append(counts)
        steps = int(counts.max()) if counts.size else 0
        steps_list.append(steps)
        pos, reset = build_pos_reset(ll, steps)
        pos_list.append(pos)
        reset_list.append(reset)
        pay_seq.append(blk.streams["SEQ"].payload)
        len_seq.append(blk.streams["SEQ"].lane_lens)
        pay_q.append(blk.streams["QUAL"].payload)
        len_q.append(blk.streams["QUAL"].lane_lens)
        qgeoms.append(replace(cfg.qual, depth=blk.qual_depth))

    seq_dec = pmesh.decode_stream_blocks("seq", cfg.seq, mesh, pay_seq,
                                         len_seq, counts_list, steps_list,
                                         pos_list, reset_list)
    # qual geometries may differ per block (6/7-bit); group
    groups: dict[object, list[int]] = {}
    for b, g in enumerate(qgeoms):
        groups.setdefault(g, []).append(b)
    qual_dec: list = [None] * len(blocks)
    for g, idxs in groups.items():
        res = pmesh.decode_stream_blocks(
            "qual", g, mesh, [pay_q[b] for b in idxs],
            [len_q[b] for b in idxs], [counts_list[b] for b in idxs],
            [steps_list[b] for b in idxs], [pos_list[b] for b in idxs],
            [reset_list[b] for b in idxs])
        for i, b in enumerate(idxs):
            qual_dec[b] = res[i]

    # 2. finish each block on the host with the precomputed matrices
    class _Precomputed:
        """Backend shim: serves the sharded-decoded SEQ/QUAL matrices and
        delegates aux streams to the sequential device backend."""

        def __init__(self, seq_syms, qual_syms):
            self._served = {"seq": seq_syms, "qual": qual_syms}

        def decode_stream(self, kind, geom, payload, lens, counts,
                          num_steps, pos=None, reset=None):
            if kind in self._served:
                return self._served[kind]
            return streams_jax.decode_stream(kind, geom, payload, lens,
                                             counts, num_steps, pos=pos,
                                             reset=reset)

    parts = []
    for b, blk in enumerate(blocks):
        backend = _Precomputed(seq_dec[b], qual_dec[b])
        parts.append(serialize_fastq(decode_block(blk, cfg,
                                                  backend=backend)))
    return b"".join(parts)
