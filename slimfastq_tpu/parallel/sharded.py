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
    list of (n, minq, qual_depth))."""
    all_jobs = []
    metas = []
    if native.available():
        from ..pipeline_native import encode_block_fast  # noqa: F401
        # reuse the reference stream_jobs via batch slicing for simplicity;
        # the native fast path is used by the sequential API. Sharded host
        # prep can adopt pipeline_native job building in a later round.
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
