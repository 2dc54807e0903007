"""Multi-device block parallelism over a JAX mesh.

The reference is single-threaded with no comm backend (SURVEY.md §2
"Parallelism strategies in the reference: NONE"); scaling here is
*introduced by design*:

  * lane parallelism (intra-chip): W interleaved coder streams — the
    sequence-parallel analogue, implemented inside the stream kernels;
  * block data-parallelism (this module): record-blocks sharded over a 1-D
    ``Mesh(("blocks",))`` with ``shard_map``; every block carries its own
    adaptive model state, so shards need zero communication during coding;
  * ordered gather: per-block payloads are fixed-shape (worst-case padded)
    device buffers; true lengths travel as a [B, W] array. Device->host
    gather preserves block order, and the host writes the container index
    in input order — bit-identical to the sequential path.

Multi-host: ``jax.distributed.initialize`` + the same mesh spanning all
processes; ``multihost_utils.process_allgather`` collects lengths, and each
host slices out its addressable shards (blocks are independent, so hosts
can also write disjoint container shards and merge indexes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ranger_np as R
from ..ops import streams_jax


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("blocks",))


@functools.lru_cache(maxsize=64)
def _build_sharded_encode(kind: str, geom, S: int, W: int, hard: bool,
                          mesh: Mesh):
    sched = streams_jax._build_schedule(kind, geom, S, W)
    run = streams_jax._build_encode(kind, geom, S, W, hard)

    def one_block(syms, poss, resets, counts):
        idx_c, bit_c = sched(syms, poss, resets, counts)
        return run(idx_c, bit_c)

    vrun = jax.vmap(one_block)

    @jax.jit
    def sharded(syms, poss, resets, counts):
        spec = NamedSharding(mesh, P("blocks"))
        syms = jax.lax.with_sharding_constraint(syms, spec)
        ebufs, eptrs, low, emax = vrun(syms, poss, resets, counts)
        return (jax.lax.with_sharding_constraint(ebufs, spec),
                jax.lax.with_sharding_constraint(eptrs, spec),
                low, emax)

    return sharded


@functools.lru_cache(maxsize=64)
def _build_sharded_decode(kind: str, geom, S: int, W: int, Lw: int,
                          mesh: Mesh):
    run = streams_jax._build_decode(kind, geom, S, W, Lw)
    vrun = jax.vmap(run)

    @jax.jit
    def sharded(paywords, lens, acts, poss, resets):
        spec = NamedSharding(mesh, P("blocks"))
        paywords = jax.lax.with_sharding_constraint(paywords, spec)
        syms = vrun(paywords, lens, acts, poss, resets)
        return jax.lax.with_sharding_constraint(syms, spec)

    return sharded


def _pad_blocks(arrs: list[np.ndarray], n: int) -> int:
    """Number of dummy blocks needed so B divides the mesh size."""
    B = len(arrs)
    return (-B) % n


def encode_stream_blocks(kind: str, geom, mesh: Mesh,
                         syms_list: list[np.ndarray],
                         counts_list: list[np.ndarray],
                         pos_list=None, reset_list=None):
    """Encode many blocks' worth of one stream, sharded over the mesh.

    Blocks are grouped by their own pad_steps bucket before batching: the
    lockstep step count is part of the bit format (flush position), so
    batching a short block with longer ones would change its bytes
    (ADVICE.md round-1 medium finding). Within a group every block shares
    pad_steps, so padding is a no-op format-wise. Output is a list of
    (payload, lens) per block, byte-identical to per-block sequential
    encoding (the correctness gate in tests/test_parallel.py).
    """
    B = len(syms_list)
    if B == 0:
        return []
    groups: dict[int, list[int]] = {}
    for b, s in enumerate(syms_list):
        groups.setdefault(R.pad_steps(max(s.shape[0], 1)), []).append(b)
    if len(groups) > 1:
        results: list = [None] * B
        for sp, idxs in groups.items():
            sub = encode_stream_blocks(
                kind, geom, mesh,
                [syms_list[b] for b in idxs],
                [counts_list[b] for b in idxs],
                None if pos_list is None else [pos_list[b] for b in idxs],
                None if reset_list is None else [reset_list[b] for b in idxs])
            for i, b in enumerate(idxs):
                results[b] = sub[i]
        return results
    W = syms_list[0].shape[1]
    S = max((s.shape[0] for s in syms_list), default=0)
    Sp = R.pad_steps(max(S, 1))
    nd = mesh.devices.size
    pad = _pad_blocks(syms_list, nd)
    Bp = B + pad

    syms = np.zeros((Bp, Sp, W), dtype=np.uint32)
    counts = np.zeros((Bp, W), dtype=np.int32)
    poss = np.zeros((Bp, Sp, W), dtype=np.uint32)
    resets = np.zeros((Bp, Sp, W), dtype=np.uint32)
    for b in range(B):
        s = syms_list[b]
        syms[b, : s.shape[0]] = s
        counts[b] = counts_list[b]
        if pos_list is not None and pos_list[b] is not None:
            p = pos_list[b]
            poss[b, : p.shape[0]] = p
        if reset_list is not None and reset_list[b] is not None:
            r = reset_list[b]
            resets[b, : r.shape[0]] = r

    results = None
    for hard in (False, True):
        fn = _build_sharded_encode(kind, geom, Sp, W, hard, mesh)
        ebufs, eptrs, low, emax = fn(jnp.asarray(syms), jnp.asarray(poss),
                                     jnp.asarray(resets),
                                     jnp.asarray(counts))
        CB = streams_jax._chunk_bytes(geom.depth, hard)
        if int(np.asarray(emax).max()) <= CB:
            ebufs = np.asarray(ebufs)
            eptrs = np.asarray(eptrs)
            low = np.asarray(low)
            results = []
            for b in range(B):
                payload, lens = streams_jax._compact_host(
                    ebufs[b], eptrs[b], low[b], counts_list[b], CB)
                results.append((payload, lens))
            return results
    raise AssertionError("encode chunk overflow even with hard buffers")


def decode_stream_blocks(kind: str, geom, mesh: Mesh,
                         payload_list, lens_list, counts_list,
                         steps_list, pos_list=None, reset_list=None):
    """Decode many blocks of one stream, sharded over the mesh."""
    B = len(payload_list)
    if B == 0:
        return []
    W = payload_list[0].shape[0]
    S = max(steps_list)
    Sp = R.pad_steps(max(S, 1))
    Lb = max(max((int(p.shape[1]) for p in payload_list), default=1), 1)
    Lb = ((Lb + 2047) // 2048) * 2048
    Lw = Lb // 4
    nd = mesh.devices.size
    pad = (-B) % nd
    Bp = B + pad
    K = streams_jax._CHUNK_SYMS
    NC = Sp // K

    words = np.zeros((Bp, W * Lw), dtype=np.uint32)
    lens = np.zeros((Bp, W), dtype=np.int32)
    acts = np.zeros((Bp, Sp, W), dtype=np.int32)
    poss = np.zeros((Bp, Sp, W), dtype=np.uint32)
    resets = np.zeros((Bp, Sp, W), dtype=np.uint32)
    for b in range(B):
        p = payload_list[b]
        pay = np.zeros((W, Lb), dtype=np.uint8)
        pay[:, : p.shape[1]] = p
        words[b] = pay.view("<u4").reshape(-1)
        lens[b] = lens_list[b]
        acts[b] = np.arange(Sp)[:, None] < counts_list[b][None, :]
        if pos_list is not None and pos_list[b] is not None:
            q = pos_list[b]
            poss[b, : q.shape[0]] = q
        if reset_list is not None and reset_list[b] is not None:
            r = reset_list[b]
            resets[b, : r.shape[0]] = r

    fn = _build_sharded_decode(kind, geom, Sp, W, Lw, mesh)
    syms = np.asarray(fn(jnp.asarray(words), jnp.asarray(lens),
                         jnp.asarray(acts.reshape(Bp, NC, K, W)),
                         jnp.asarray(poss.reshape(Bp, NC, K, W)),
                         jnp.asarray(resets.reshape(Bp, NC, K, W))))
    out = []
    for b in range(B):
        Sb = steps_list[b]
        o = syms[b, :Sb].astype(np.uint32)
        mask = np.arange(Sb)[:, None] < counts_list[b][None, :]
        out.append(np.where(mask, o, np.uint32(0)))
    return out
