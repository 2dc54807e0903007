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
def _build_sharded_encode(kind: str, geom, S: int, W: int, Bmax: int,
                          mesh: Mesh):
    run = streams_jax._build_encode(kind, geom, S, W, Bmax)
    vrun = jax.vmap(run)

    @jax.jit
    def sharded(syms, actives, poss, resets):
        spec = NamedSharding(mesh, P("blocks"))
        syms = jax.lax.with_sharding_constraint(syms, spec)
        out, ptr = vrun(syms, actives, poss, resets)
        return (jax.lax.with_sharding_constraint(out, spec),
                jax.lax.with_sharding_constraint(ptr, spec))

    return sharded


@functools.lru_cache(maxsize=64)
def _build_sharded_decode(kind: str, geom, S: int, W: int, Lmax: int,
                          mesh: Mesh):
    run = streams_jax._build_decode(kind, geom, S, W, Lmax)
    vrun = jax.vmap(run)

    @jax.jit
    def sharded(payload, lens, actives, poss, resets):
        spec = NamedSharding(mesh, P("blocks"))
        payload = jax.lax.with_sharding_constraint(payload, spec)
        syms = vrun(payload, lens, actives, poss, resets)
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

    Every block is padded to the common lockstep length; output is a list of
    (payload, lens) per block, byte-identical to per-block sequential
    encoding (the correctness gate in tests/test_parallel.py).
    """
    B = len(syms_list)
    if B == 0:
        return []
    W = syms_list[0].shape[1]
    S = max((s.shape[0] for s in syms_list), default=0)
    Sp = streams_jax._pad_steps(max(S, 1))
    nd = mesh.devices.size
    pad = _pad_blocks(syms_list, nd)
    Bp = B + pad

    syms = np.zeros((Bp, Sp, W), dtype=np.uint32)
    actives = np.zeros((Bp, Sp, W), dtype=bool)
    poss = np.zeros((Bp, Sp, W), dtype=np.uint32)
    resets = np.zeros((Bp, Sp, W), dtype=np.uint32)
    for b in range(B):
        s = syms_list[b]
        syms[b, : s.shape[0]] = s
        actives[b] = np.arange(Sp)[:, None] < counts_list[b][None, :]
        if pos_list is not None and pos_list[b] is not None:
            p = pos_list[b]
            poss[b, : p.shape[0]] = p
        if reset_list is not None and reset_list[b] is not None:
            r = reset_list[b]
            resets[b, : r.shape[0]] = r

    Bmax = R.worst_case_bytes(Sp * geom.depth)
    fn = _build_sharded_encode(kind, geom, Sp, W, Bmax, mesh)
    out, ptr = fn(jnp.asarray(syms), jnp.asarray(actives),
                  jnp.asarray(poss), jnp.asarray(resets))
    out = np.asarray(out)
    ptr = np.asarray(ptr).astype(np.int64)
    results = []
    for b in range(B):
        lens = ptr[b]
        maxlen = int(lens.max()) if lens.size else 0
        results.append((out[b, :, :maxlen].copy(), lens))
    return results


def decode_stream_blocks(kind: str, geom, mesh: Mesh,
                         payload_list, lens_list, counts_list,
                         steps_list, pos_list=None, reset_list=None):
    """Decode many blocks of one stream, sharded over the mesh."""
    B = len(payload_list)
    if B == 0:
        return []
    W = payload_list[0].shape[0]
    S = max(steps_list)
    Sp = streams_jax._pad_steps(max(S, 1))
    Lmax = max(max((int(p.shape[1]) for p in payload_list), default=1), 1)
    Lmax = ((Lmax + 2047) // 2048) * 2048
    nd = mesh.devices.size
    pad = (-B) % nd
    Bp = B + pad

    pay = np.zeros((Bp, W, Lmax), dtype=np.uint8)
    lens = np.zeros((Bp, W), dtype=np.int32)
    actives = np.zeros((Bp, Sp, W), dtype=bool)
    poss = np.zeros((Bp, Sp, W), dtype=np.uint32)
    resets = np.zeros((Bp, Sp, W), dtype=np.uint32)
    for b in range(B):
        p = payload_list[b]
        pay[b, :, : p.shape[1]] = p
        lens[b] = lens_list[b]
        actives[b] = np.arange(Sp)[:, None] < counts_list[b][None, :]
        if pos_list is not None and pos_list[b] is not None:
            q = pos_list[b]
            poss[b, : q.shape[0]] = q
        if reset_list is not None and reset_list[b] is not None:
            r = reset_list[b]
            resets[b, : r.shape[0]] = r

    fn = _build_sharded_decode(kind, geom, Sp, W, Lmax, mesh)
    syms = np.asarray(fn(jnp.asarray(pay), jnp.asarray(lens),
                         jnp.asarray(actives), jnp.asarray(poss),
                         jnp.asarray(resets)))
    return [syms[b, : steps_list[b]].astype(np.uint32) for b in range(B)]
