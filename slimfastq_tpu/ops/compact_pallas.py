"""Pallas TPU kernel: on-device compaction of chunked emission buffers.

The encode kernel emits renorm bytes into dense per-chunk buffers
``ebufs [NC, W, CB]`` with per-chunk valid counts ``eptrs [NC, W]``
(streams_jax). Transferring those dense buffers to the host costs ~CB /
avg_bytes x the compressed size; this kernel concatenates each lane's
valid bytes on device instead, so only ~the compressed payload crosses
PCIe (or the dev tunnel).

Technique: per (lane, chunk) the chunk's FIXED CB-byte window is stored at
the lane's running offset. The tail garbage beyond the chunk's valid count
is overwritten by the next chunk's window, which starts exactly at
offset + count — no masking needed; only the final chunk leaves garbage,
which lies beyond the lane's recorded length. Offsets (exclusive prefix
sums of eptrs, computed in XLA) arrive laid out [W8, NC, _LG] through a
per-program SMEM block — NOT whole-array scalar prefetch, which at
production shape (NC=800, W=1024 -> 3.2 MB of int32) exceeds the 1 MB
SMEM and fails to compile on real v5e hardware.

Mosaic constraints honoured (docs/KERNEL_NOTES.md): no vector
gather/scatter — only dynamic-offset block stores into a VMEM-resident
output row; loop data is int32 (u8 relayout is pathological); lanes are
processed in groups of 8 to satisfy block-shape tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LG = 8  # lanes per grid program (sublane tile)


@functools.lru_cache(maxsize=64)
def _build(NC: int, W: int, CB: int, Bmax: int, interpret: bool):
    W8 = W // _LG
    grid = (W8, NC)

    # aligned window: chunk may straddle a 128 boundary; width must itself
    # be a multiple of 128 for tpu.dynamic_rotate
    CBW = ((CB + 127) // 128) * 128 + 128

    def kernel(offs_ref, ebuf_ref, out_ref):
        c = pl.program_id(1)
        for j in range(_LG):
            off = offs_ref[0, c, j]
            aligned = pl.multiple_of((off >> 7) << 7, 128)
            shift = off - aligned
            win = out_ref[0, j, pl.ds(aligned, CBW)]
            chunk = ebuf_ref[0, 0, j, :]
            padded = jnp.concatenate(
                [chunk, jnp.zeros((CBW - CB,), jnp.int32)]).reshape(1, CBW)
            rolled = pltpu.roll(padded, shift, axis=1).reshape(CBW)
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, CBW), 1).reshape(
                CBW)
            mask = (pos >= shift) & (pos < shift + CB)
            out_ref[0, j, pl.ds(aligned, CBW)] = jnp.where(mask, rolled,
                                                           win)

    @jax.jit
    def run(ebufs_i32, offs_gcj):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, NC, _LG), lambda g, c: (g, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, _LG, CB), lambda g, c: (c, g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _LG, Bmax), lambda g, c: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W8, _LG, Bmax), jnp.int32),
            interpret=interpret,
        )(offs_gcj, ebufs_i32)
        return out.reshape(W, Bmax)

    return run


@functools.lru_cache(maxsize=64)
def _build_v2(NC: int, W: int, CB: int, CBp: int, Bmax: int,
              interpret: bool):
    """Double-buffered DMA variant: one grid program per 8-lane group owns
    the whole chunk sequence — 64 programs instead of W/8 * NC, with
    HBM->VMEM chunk fetches overlapped against the placement compute."""
    W8 = W // _LG
    CBW = ((CB + 127) // 128) * 128 + 128

    def kernel(offs_ref, ebuf_hbm, out_ref):
        # ebuf_hbm: [NC * W8, _LG, CB] — single dynamic leading index
        g = pl.program_id(0)

        def body(scratch, sem):
            def get_dma(slot, c):
                return pltpu.make_async_copy(
                    ebuf_hbm.at[c * W8 + g], scratch.at[slot],
                    sem.at[slot])

            get_dma(0, 0).start()

            def loop(c, _):
                slot = c % 2

                @pl.when(c + 1 < NC)
                def _():
                    get_dma((c + 1) % 2, c + 1).start()

                get_dma(slot, c).wait()
                for j in range(_LG):
                    off = offs_ref[0, c, j]
                    aligned = pl.multiple_of((off >> 7) << 7, 128)
                    shift = off - aligned
                    win = out_ref[0, j, pl.ds(aligned, CBW)]
                    chunk = scratch[slot, j, :CB]
                    padded = jnp.concatenate(
                        [chunk, jnp.zeros((CBW - CB,), jnp.int32)]
                    ).reshape(1, CBW)
                    rolled = pltpu.roll(padded, shift, axis=1).reshape(CBW)
                    pos = jax.lax.broadcasted_iota(
                        jnp.int32, (1, CBW), 1).reshape(CBW)
                    mask = (pos >= shift) & (pos < shift + CB)
                    out_ref[0, j, pl.ds(aligned, CBW)] = jnp.where(
                        mask, rolled, win)
                return 0

            jax.lax.fori_loop(0, NC, loop, 0)

        pl.run_scoped(body,
                      scratch=pltpu.VMEM((2, _LG, CBp), jnp.int32),
                      sem=pltpu.SemaphoreType.DMA((2,)))

    @jax.jit
    def run(ebufs_i32, offs_gcj):
        out = pl.pallas_call(
            kernel,
            grid=(W8,),
            in_specs=[
                pl.BlockSpec((1, NC, _LG), lambda g: (g, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec((1, _LG, Bmax), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W8, _LG, Bmax), jnp.int32),
            interpret=interpret,
        )(offs_gcj, ebufs_i32)
        return out.reshape(W, Bmax)

    return run


def compact_device_v2(ebufs, eptrs, Bmax: int):
    """DMA double-buffered on-device compaction (preferred when Bmax rows
    fit VMEM)."""
    NC, W = eptrs.shape
    assert W % _LG == 0
    CB = ebufs.shape[-1] // W if ebufs.ndim == 2 else ebufs.shape[-1]
    eb = ebufs.reshape(NC * (W // _LG), _LG, CB).astype(jnp.int32)
    CBp = ((CB + 127) // 128) * 128  # HBM slices must be tile-aligned
    if CBp != CB:
        eb = jnp.pad(eb, ((0, 0), (0, 0), (0, CBp - CB)))
    totals = jnp.sum(eptrs, axis=0)
    offs = jnp.cumsum(eptrs, axis=0) - eptrs
    offs_gcj = offs.reshape(NC, W // _LG, _LG).transpose(1, 0, 2)
    Bk = Bmax + 512
    interpret = jax.default_backend() != "tpu"
    run = _build_v2(NC, W, CB, CBp, Bk, interpret)
    return run(eb, offs_gcj.astype(jnp.int32)), totals


def compact_device(ebufs, eptrs, Bmax: int):
    """ebufs: [NC, W*CB] or [NC, W, CB] int32-valued bytes; eptrs: [NC, W].
    Returns (payload_i32 [W, Bmax], lane_totals [W])."""
    NC, W = eptrs.shape
    assert W % _LG == 0
    CB = ebufs.shape[-1] // W if ebufs.ndim == 2 else ebufs.shape[-1]
    eb = ebufs.reshape(NC, W // _LG, _LG, CB).astype(jnp.int32)
    totals = jnp.sum(eptrs, axis=0)
    offs = jnp.cumsum(eptrs, axis=0) - eptrs  # exclusive prefix per lane
    offs_gcj = offs.reshape(NC, W // _LG, _LG).transpose(1, 0, 2)
    Bk = Bmax + 512  # slack for the aligned RMW window of the last chunk
    interpret = jax.default_backend() != "tpu"
    run = _build(NC, W, CB, Bk, interpret)
    return run(eb, offs_gcj.astype(jnp.int32)), totals
