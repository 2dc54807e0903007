"""JAX device implementation of the lane-interleaved codec (fast path).

Byte-identical to the NumPy oracle (``streams_np``) — the equivalence suite
in tests/test_jax_equivalence.py is the gate. All coder state is
uint32/int32; no float anywhere (SURVEY.md §7 hard-part (a)).

Performance design (measured on TPU v5e):
  * Random access is fast only on VMEM-resident data; scatters/gathers into
    large HBM buffers cost tens of us per step. Therefore the adaptive
    probability table, coder state, and (on decode) the compressed payload
    are all loop-carried values small enough for XLA to keep in VMEM, and
    all indexing is flat 1-D.
  * ENCODE precomputes the entire (table-index, bit) schedule outside the
    sequential loop: contexts are closed-form functions of shifted symbol
    arrays (no scan), and the tree-node path for a known symbol is
    node_j = (1 << j) | (sym >> (depth - j)). The hot loop is then a pure
    coder: gather p -> range update -> masked renorm -> adaptive update.
  * Byte emission never scatters to HBM: each chunk of K symbol-steps
    writes into a small VMEM buffer, chunks are emitted densely as scan
    outputs, and the host compacts them with one vectorised boolean take
    (np.compress semantics). A per-chunk capacity check triggers a rare
    deterministic retry with a worst-case-sized buffer.
  * DECODE must compute contexts online (they depend on decoded symbols),
    so it carries the small per-kind context state and gathers bytes from
    the VMEM-resident payload.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ranger_np as R

U32 = jnp.uint32
I32 = jnp.int32

TOP = np.uint32(R.TOP)
BOT = np.uint32(R.BOT)
PROB_BITS = R.PROB_BITS
PROB_ONE = R.PROB_ONE
PROB_MIN = R.PROB_MIN
PROB_MAX = R.PROB_MAX
MASK32 = np.uint32(0xFFFFFFFF)

# lockstep step-counts padded to buckets to bound jit recompilation
_STEP_BUCKET = 256
# symbol-steps per emission chunk and optimistic bytes/lane/chunk;
# hard bound is 3 bytes per bit-step (32-bit state, 8-bit renorm)
_CHUNK_SYMS = 8


def _pad_steps(S: int) -> int:
    if S <= 0:
        return 0
    return ((S + _STEP_BUCKET - 1) // _STEP_BUCKET) * _STEP_BUCKET


def _chunk_bytes(depth: int, hard: bool) -> int:
    bits = _CHUNK_SYMS * depth
    return 3 * bits + 8 if hard else max(64, bits + 16)


# ---------------------------------------------------------------------------
# context functions
# ---------------------------------------------------------------------------

def _shift_t(x, n):
    """x[t-n] along the step axis, zero-filled (lane streams start at 0)."""
    if n == 0:
        return x
    z = jnp.zeros((n,) + x.shape[1:], x.dtype)
    return jnp.concatenate([z, x[:-n]], axis=0)


def _seq_offsets(k: int) -> np.ndarray:
    return (((np.uint32(1) << (2 * np.arange(k + 1, dtype=np.uint32)))
             - np.uint32(1)) // np.uint32(3)).astype(np.uint32)


def _ctx_precompute(kind: str, geom, syms, pos, reset):
    """Closed-form [T, W] context streams for the ENCODE path. Must equal
    the oracle's carried-state contexts at every active step."""
    rs = reset.astype(bool)
    if kind == "qual":
        a = jnp.where(rs, U32(0), _shift_t(syms, 1))
        b = jnp.where(rs | _shift_t(reset, 1).astype(bool), U32(0),
                      _shift_t(syms, 2))
        ctx = a
        shift = geom.depth
        if geom.q2_bits:
            ctx = ctx | ((b >> U32(geom.depth - geom.q2_bits)) << U32(shift))
            shift += geom.q2_bits
        if geom.pos_bits:
            posb = jnp.minimum(pos >> U32(geom.pos_shift),
                               U32((1 << geom.pos_bits) - 1))
            ctx = ctx | (posb.astype(U32) << U32(shift))
        return ctx
    if kind == "seq":
        k = geom.order
        h = jnp.zeros_like(syms)
        for j in range(1, k + 1):
            h = h | jnp.where(pos >= U32(j),
                              _shift_t(syms, j) << U32(2 * (j - 1)), U32(0))
        offsets = jnp.asarray(_seq_offsets(k))
        j = jnp.minimum(pos.astype(I32), I32(k))
        return h + offsets[j]
    if kind == "byte":
        return _shift_t(syms, 1) if geom.order else jnp.zeros_like(syms)
    if kind == "flag":
        hb = geom.hist_bits
        h = jnp.zeros_like(syms)
        for j in range(1, hb + 1):
            h = h | (_shift_t(syms, j) << U32(j - 1))
        return h & U32((1 << hb) - 1)
    raise ValueError(kind)


def _ctx_init(kind: str, W: int):
    if kind == "qual":
        return (jnp.zeros(W, U32), jnp.zeros(W, U32))
    return (jnp.zeros(W, U32),)


def _ctx_step(kind: str, geom, cst, pos_t, reset_t):
    """Online (decode) context: mirrors streams_np step_ctx exactly."""
    rs = reset_t.astype(bool)
    if kind == "qual":
        a, b = cst
        a = jnp.where(rs, U32(0), a)
        b = jnp.where(rs, U32(0), b)
        ctx = a
        shift = geom.depth
        if geom.q2_bits:
            ctx = ctx | ((b >> U32(geom.depth - geom.q2_bits)) << U32(shift))
            shift += geom.q2_bits
        if geom.pos_bits:
            posb = jnp.minimum(pos_t >> U32(geom.pos_shift),
                               U32((1 << geom.pos_bits) - 1))
            ctx = ctx | (posb.astype(U32) << U32(shift))
        return ctx, (a, b)
    if kind == "seq":
        (h,) = cst
        h = jnp.where(rs, U32(0), h)
        offsets = jnp.asarray(_seq_offsets(geom.order))
        j = jnp.minimum(pos_t.astype(I32), I32(geom.order))
        return h + offsets[j], (h,)
    if kind == "byte":
        (pb,) = cst
        return (pb if geom.order else jnp.zeros_like(pb)), (pb,)
    if kind == "flag":
        (hist,) = cst
        return hist, (hist,)
    raise ValueError(kind)


def _ctx_advance(kind: str, geom, cst, sym):
    if kind == "qual":
        a, b = cst
        return (sym.astype(U32), a)
    if kind == "seq":
        (h,) = cst
        mask = U32((1 << (2 * geom.order)) - 1)
        return (((h << U32(2)) | sym.astype(U32)) & mask,)
    if kind == "byte":
        return (sym.astype(U32),)
    if kind == "flag":
        (hist,) = cst
        m = U32((1 << geom.hist_bits) - 1)
        return (((hist << U32(1)) | sym.astype(U32)) & m,)
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# adaptive table law (identical to ranger_np.table_update)
# ---------------------------------------------------------------------------

def _table_step(table, idx, bit_b, active, rate):
    """Gather p, then apply the batch-synchronous update. Values stay in
    [PROB_MIN, PROB_MAX] so untouched-entry clamping is a no-op and no dump
    routing is needed."""
    p = jnp.clip(table[idx], PROB_MIN, PROB_MAX).astype(U32)
    p32 = p.astype(I32)
    delta = jnp.where(bit_b, -(p32 >> rate), (I32(PROB_ONE) - p32) >> rate)
    delta = jnp.where(active, delta, I32(0))
    table = table.at[idx].add(delta)
    v = table[idx]
    table = table.at[idx].set(jnp.clip(v, PROB_MIN, PROB_MAX))
    return p, table


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _build_encode(kind: str, geom, S: int, W: int, hard: bool):
    depth, rate = geom.depth, geom.rate
    tsize = geom.table_size
    CB = _chunk_bytes(depth, hard)
    KD = _CHUNK_SYMS * depth
    NC = S // _CHUNK_SYMS
    lane_off = jnp.arange(W, dtype=I32) * CB
    DUMP = W * CB

    def chunk(carry, xs):
        low, rng, table = carry
        idxs, bits, acts = xs
        ebuf = jnp.zeros(W * CB + 1, I32)
        eptr = jnp.zeros(W, I32)

        def bitstep(i, st):
            low, rng, table, ebuf, eptr = st
            idx = idxs[i]
            bit_b = bits[i] != 0
            active = acts[i]
            p, table = _table_step(table, idx, bit_b, active, rate)
            split = (rng >> U32(PROB_BITS)) * p
            is1 = bit_b & active
            is0 = (~bit_b) & active
            low = jnp.where(is1, low + split, low)
            rng = jnp.where(is1, rng - split, jnp.where(is0, split, rng))
            for _ in range(R.RENORM_ITERS):
                agree = ((low ^ (low + rng)) & MASK32) < TOP
                under = rng < BOT
                do = active & (agree | under)
                clampc = do & ~agree
                rng = jnp.where(clampc, (U32(0) - low) & U32(BOT - 1), rng)
                byte = (low >> U32(24)).astype(I32)
                tgt = jnp.where(do & (eptr < CB), lane_off + eptr, DUMP)
                ebuf = ebuf.at[tgt].set(byte)
                eptr = eptr + do.astype(I32)
                low = jnp.where(do, low << U32(8), low)
                rng = jnp.where(do, rng << U32(8), rng)
            return (low, rng, table, ebuf, eptr)

        low, rng, table, ebuf, eptr = jax.lax.fori_loop(
            0, KD, bitstep, (low, rng, table, ebuf, eptr))
        return ((low, rng, table),
                (ebuf[:-1].astype(jnp.uint8).reshape(W, CB), eptr))

    @jax.jit
    def run(syms, actives, poss, resets):
        # -- schedule precompute (vectorised, outside the sequential loop)
        ctx = _ctx_precompute(kind, geom, syms, poss, resets).astype(I32)
        nodes = (1 << depth) - 1
        base = ctx * I32(nodes)
        idx_list, bit_list = [], []
        for j in range(depth):
            node = I32(1 << j) | (syms >> U32(depth - j)).astype(I32)
            idx_list.append(base + node - 1)
            bit_list.append(((syms >> U32(depth - 1 - j)) & U32(1))
                            .astype(jnp.uint8))
        # [T, depth, W] -> [NC, K*depth, W]
        idx_all = jnp.stack(idx_list, axis=1).reshape(NC, KD, W)
        bit_all = jnp.stack(bit_list, axis=1).reshape(NC, KD, W)
        act_all = jnp.repeat(actives, depth, axis=0).reshape(NC, KD, W)

        low = jnp.zeros(W, U32)
        rng = jnp.full(W, 0xFFFFFFFF, U32)
        table = jnp.full(tsize, R.PROB_INIT, I32)
        (low, rng, table), (ebufs, eptrs) = jax.lax.scan(
            chunk, (low, rng, table), (idx_all, bit_all, act_all))
        return ebufs, eptrs, low

    return run


def _compact_host(ebufs, eptrs, low, counts, depth, hard):
    """Host-side compaction: dense chunk buffers -> per-lane byte streams,
    then append the 4 flush bytes per active lane."""
    NC, W, CB = ebufs.shape
    over = eptrs.max(initial=0) > CB
    if over:
        return None, None  # caller retries with hard buffers
    # [W, NC, CB] boolean take preserves (lane, chunk, pos) order
    bufs = np.ascontiguousarray(ebufs.transpose(1, 0, 2))
    ptrs = eptrs.T  # [W, NC]
    mask = np.arange(CB)[None, None, :] < ptrs[:, :, None]
    flat = bufs[mask]
    per_lane = mask.sum(axis=(1, 2))
    act = counts > 0
    lens = per_lane + np.where(act, R.FLUSH_BYTES, 0)
    maxlen = int(lens.max()) if lens.size else 0
    payload = np.zeros((W, maxlen), dtype=np.uint8)
    off = 0
    lowh = np.asarray(low).astype(np.uint64)
    for w in range(W):
        n = int(per_lane[w])
        payload[w, :n] = flat[off: off + n]
        off += n
        if act[w]:
            lw = int(lowh[w])
            for j in range(R.FLUSH_BYTES):
                payload[w, n + j] = (lw >> (24 - 8 * j)) & 0xFF
    return payload, lens.astype(np.int64)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _build_decode(kind: str, geom, S: int, W: int, Lmax: int):
    depth, rate = geom.depth, geom.rate
    tsize = geom.table_size
    lane_off = jnp.arange(W, dtype=I32) * Lmax

    def read_bytes(buf, lens, ptr, do):
        idx = lane_off + jnp.minimum(ptr, I32(Lmax - 1))
        nxt = buf[idx].astype(U32)
        nxt = jnp.where((ptr < lens) & do, nxt, U32(0))
        return nxt, ptr + do.astype(I32)

    def step(carry, xs):
        low, rng, code, ptr, table, cst, buf, lens = carry
        active, pos_t, reset_t = xs
        ctx, cst = _ctx_step(kind, geom, cst, pos_t, reset_t)
        nodes = (1 << depth) - 1
        base = ctx.astype(I32) * I32(nodes)
        node = jnp.ones(W, dtype=I32)
        sym = jnp.zeros(W, U32)
        for _ in range(depth):
            idx = base + node - 1
            p = jnp.clip(table[idx], PROB_MIN, PROB_MAX).astype(U32)
            split = (rng >> U32(PROB_BITS)) * p
            diff = (code - low) & MASK32
            bit = jnp.where(active, (diff >= split).astype(U32), U32(0))
            bit_b = bit != 0
            is1 = bit_b & active
            is0 = (~bit_b) & active
            low = jnp.where(is1, low + split, low)
            rng = jnp.where(is1, rng - split, jnp.where(is0, split, rng))
            for _ in range(R.RENORM_ITERS):
                agree = ((low ^ (low + rng)) & MASK32) < TOP
                under = rng < BOT
                do = active & (agree | under)
                clampc = do & ~agree
                rng = jnp.where(clampc, (U32(0) - low) & U32(BOT - 1), rng)
                nxt, ptr = read_bytes(buf, lens, ptr, do)
                code = jnp.where(do, ((code << U32(8)) | nxt) & MASK32, code)
                low = jnp.where(do, low << U32(8), low)
                rng = jnp.where(do, rng << U32(8), rng)
            p32 = p.astype(I32)
            delta = jnp.where(bit_b, -(p32 >> rate),
                              (I32(PROB_ONE) - p32) >> rate)
            delta = jnp.where(active, delta, I32(0))
            table = table.at[idx].add(delta)
            v = table[idx]
            table = table.at[idx].set(jnp.clip(v, PROB_MIN, PROB_MAX))
            node = 2 * node + bit.astype(I32)
            sym = (sym << U32(1)) | bit
        sym = jnp.where(active, sym, U32(0))
        cst = _ctx_advance(kind, geom, cst, sym)
        return (low, rng, code, ptr, table, cst, buf, lens), sym

    @jax.jit
    def run(payload, lens, actives, poss, resets):
        buf = payload.reshape(-1)
        lens32 = lens.astype(I32)
        low = jnp.zeros(W, U32)
        rng = jnp.full(W, 0xFFFFFFFF, U32)
        ptr = jnp.zeros(W, I32)
        code = jnp.zeros(W, U32)
        ones = jnp.ones(W, bool)
        for _ in range(4):
            nxt, ptr = read_bytes(buf, lens32, ptr, ones)
            code = (code << U32(8)) | nxt
        table = jnp.full(tsize, R.PROB_INIT, I32)
        cst = _ctx_init(kind, W)
        carry = (low, rng, code, ptr, table, cst, buf, lens32)
        carry, syms = jax.lax.scan(step, carry, (actives, poss, resets))
        return syms

    return run


# ---------------------------------------------------------------------------
# public drivers (streams_np-compatible)
# ---------------------------------------------------------------------------

def _prep(S, W, counts, pos, reset, syms=None):
    Sp = _pad_steps(S)
    actives = (np.arange(Sp)[:, None] < np.asarray(counts)[None, :])
    z = np.zeros((Sp, W), dtype=np.uint32)

    def padded(x):
        if x is None:
            return z
        out = np.zeros((Sp, W), dtype=np.uint32)
        out[: x.shape[0]] = x
        return out

    return Sp, actives, padded(pos), padded(reset), padded(syms)


def encode_stream(kind: str, geom, syms: np.ndarray, counts: np.ndarray,
                  pos: np.ndarray | None = None,
                  reset: np.ndarray | None = None):
    S, W = syms.shape
    if S == 0 or not (np.asarray(counts) > 0).any():
        return np.zeros((W, 0), dtype=np.uint8), np.zeros(W, dtype=np.int64)
    Sp, actives, posp, resetp, symsp = _prep(S, W, counts, pos, reset, syms)
    for hard in (False, True):
        run = _build_encode(kind, geom, Sp, W, hard)
        ebufs, eptrs, low = run(jnp.asarray(symsp), jnp.asarray(actives),
                                jnp.asarray(posp), jnp.asarray(resetp))
        payload, lens = _compact_host(np.asarray(ebufs), np.asarray(eptrs),
                                      np.asarray(low), np.asarray(counts),
                                      geom.depth, hard)
        if payload is not None:
            return payload, lens
    raise AssertionError("encode chunk overflow even with hard buffers")


def decode_stream(kind: str, geom, payload: np.ndarray, lens: np.ndarray,
                  counts: np.ndarray, num_steps: int,
                  pos: np.ndarray | None = None,
                  reset: np.ndarray | None = None) -> np.ndarray:
    W = payload.shape[0]
    if num_steps == 0 or not (np.asarray(counts) > 0).any():
        return np.zeros((num_steps, W), dtype=np.uint32)
    Sp, actives, posp, resetp, _ = _prep(num_steps, W, counts, pos, reset)
    Lmax = max(int(payload.shape[1]), 1)
    Lmax = ((Lmax + 2047) // 2048) * 2048
    pay = np.zeros((W, Lmax), dtype=np.uint8)
    pay[:, : payload.shape[1]] = payload
    run = _build_decode(kind, geom, Sp, W, Lmax)
    syms = run(jnp.asarray(pay), jnp.asarray(np.asarray(lens)),
               jnp.asarray(actives), jnp.asarray(posp), jnp.asarray(resetp))
    return np.asarray(syms)[:num_steps].astype(np.uint32)
