"""JAX device implementation of the lane-interleaved codec.

Byte-identical to the NumPy oracle (``streams_np``) by construction: the
same batch-synchronous bit-step law, expressed as a ``lax.scan`` over
lockstep symbol steps under ``jit``. All coder state is uint32/int32 — no
float anywhere (SURVEY.md §7 hard-part (a)).

Structure per scan step (SURVEY.md §3.3, vectorised):
  ctx roll -> table gather -> coder state update -> masked byte emission
  (fixed 4-iteration renorm) -> scatter-add model update + clamp-store.

Determinism of the model update under lane collisions: deltas merge by
addition (commutative); the clamp re-gathers the post-add value, so
duplicate indices store the identical clamped value and scatter order is
irrelevant. Inactive lanes are routed to a dump row/column so they never
race an active lane's write.

The public entry points mirror streams_np exactly so the pipeline can swap
backends:
  encode_stream(kind, geom, syms, counts, pos=None, reset=None)
  decode_stream(kind, geom, payload, lens, counts, num_steps, pos, reset)
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

# pad lockstep step-counts to buckets to bound jit recompilation
_STEP_BUCKET = 256


def _pad_steps(S: int) -> int:
    if S <= 0:
        return 0
    return ((S + _STEP_BUCKET - 1) // _STEP_BUCKET) * _STEP_BUCKET


# ---------------------------------------------------------------------------
# context functions (must mirror streams_np.{Qual,Seq,Byte,Flag}Ctx exactly)
# ---------------------------------------------------------------------------

def _ctx_init(kind: str, geom, W: int):
    if kind == "qual":
        return (jnp.zeros(W, U32), jnp.zeros(W, U32))
    if kind == "seq":
        return (jnp.zeros(W, U32),)
    if kind == "byte":
        return (jnp.zeros(W, U32),)
    if kind == "flag":
        return (jnp.zeros(W, U32),)
    raise ValueError(kind)


def _ctx_step(kind: str, geom, cst, pos_t, reset_t):
    """Returns (ctx, carry_after_reset). Mirrors streams_np step_ctx."""
    rs = reset_t.astype(bool)
    if kind == "qual":
        a, b = cst
        a = jnp.where(rs, U32(0), a)
        b = jnp.where(rs, U32(0), b)
        ctx = a
        shift = geom.depth
        if geom.q2_bits:
            q2q = b >> U32(geom.depth - geom.q2_bits)
            ctx = ctx | (q2q << U32(shift))
            shift += geom.q2_bits
        if geom.pos_bits:
            posb = jnp.minimum(pos_t >> U32(geom.pos_shift),
                               U32((1 << geom.pos_bits) - 1))
            ctx = ctx | (posb.astype(U32) << U32(shift))
        return ctx, (a, b)
    if kind == "seq":
        (h,) = cst
        h = jnp.where(rs, U32(0), h)
        k = geom.order
        offsets = jnp.asarray(
            (((np.uint32(1) << (2 * np.arange(k + 1, dtype=np.uint32)))
              - np.uint32(1)) // np.uint32(3)).astype(np.uint32))
        j = jnp.minimum(pos_t.astype(I32), I32(k))
        return h + offsets[j], (h,)
    if kind == "byte":
        (pb,) = cst
        ctx = pb if geom.order else jnp.zeros_like(pb)
        return ctx, (pb,)
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
# coder primitives
# ---------------------------------------------------------------------------

def _table_gather(table, idx, active):
    idx_s = jnp.where(active, idx, table.shape[0] - 1)
    p = jnp.clip(table[idx_s], PROB_MIN, PROB_MAX).astype(U32)
    return p, idx_s


def _table_update(table, idx_s, p, bit, active, rate):
    p32 = p.astype(I32)
    delta = jnp.where(bit.astype(bool), -(p32 >> rate),
                      (I32(PROB_ONE) - p32) >> rate)
    delta = jnp.where(active, delta, I32(0))
    table = table.at[idx_s].add(delta, mode="drop")
    v = table[idx_s]
    vc = jnp.clip(v, PROB_MIN, PROB_MAX)
    # route inactive lanes to the dump row so duplicate .set stays determinate
    dump = table.shape[0] - 1
    idx_w = jnp.where(active, idx_s, dump)
    return table.at[idx_w].set(jnp.where(active, vc, table[dump]),
                               mode="drop")


def _enc_renorm(low, rng, ptr, out, active, lane_ids, dumpcol):
    for _ in range(R.RENORM_ITERS):
        agree = ((low ^ (low + rng)) & U32(0xFFFFFFFF)) < TOP
        under = rng < BOT
        do = active & (agree | under)
        clamp = do & ~agree
        rng = jnp.where(clamp, (U32(0) - low) & U32(BOT - 1), rng)
        byte = (low >> U32(24)).astype(jnp.uint8)
        wptr = jnp.where(do, ptr, dumpcol)
        out = out.at[lane_ids, wptr].set(byte, mode="drop")
        ptr = ptr + do.astype(I32)
        low = jnp.where(do, low << U32(8), low)
        rng = jnp.where(do, rng << U32(8), rng)
    return low, rng, ptr, out


def _dec_renorm(low, rng, code, ptr, buf, lens, active, lane_ids):
    Lmax = buf.shape[1]
    for _ in range(R.RENORM_ITERS):
        agree = ((low ^ (low + rng)) & U32(0xFFFFFFFF)) < TOP
        under = rng < BOT
        do = active & (agree | under)
        clamp = do & ~agree
        rng = jnp.where(clamp, (U32(0) - low) & U32(BOT - 1), rng)
        idx = jnp.minimum(ptr, I32(Lmax - 1))
        nxt = buf[lane_ids, idx].astype(U32)
        nxt = jnp.where((ptr < lens) & do, nxt, U32(0))
        code = jnp.where(do, (code << U32(8)) | nxt, code)
        ptr = ptr + do.astype(I32)
        low = jnp.where(do, low << U32(8), low)
        rng = jnp.where(do, rng << U32(8), rng)
    return low, rng, code, ptr


# ---------------------------------------------------------------------------
# whole-stream jitted encode / decode
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=128)
def _build_encode(kind: str, geom, S: int, W: int, Bmax: int):
    depth, rate = geom.depth, geom.rate
    tsize = geom.table_size
    lane_ids = jnp.arange(W, dtype=I32)

    def step(carry, xs):
        low, rng, ptr, out, table, cst = carry
        sym, active, pos_t, reset_t = xs
        ctx, cst = _ctx_step(kind, geom, cst, pos_t, reset_t)
        nodes = (1 << depth) - 1
        base = ctx.astype(I32) * I32(nodes)
        node = jnp.ones(W, dtype=I32)
        for i in range(depth - 1, -1, -1):
            bit = (sym >> U32(i)) & U32(1)
            idx = base + node - 1
            p, idx_s = _table_gather(table, idx, active)
            split = (rng >> U32(PROB_BITS)) * p
            is1 = bit.astype(bool) & active
            is0 = (~bit.astype(bool)) & active
            low = jnp.where(is1, low + split, low)
            rng = jnp.where(is1, rng - split, jnp.where(is0, split, rng))
            low, rng, ptr, out = _enc_renorm(low, rng, ptr, out, active,
                                             lane_ids, I32(Bmax))
            table = _table_update(table, idx_s, p, bit, active, rate)
            node = 2 * node + bit.astype(I32)
        cst = _ctx_advance(kind, geom, cst,
                           jnp.where(active, sym, U32(0)))
        return (low, rng, ptr, out, table, cst), None

    @jax.jit
    def run(syms, actives, poss, resets):
        low = jnp.zeros(W, U32)
        rng = jnp.full(W, 0xFFFFFFFF, U32)
        ptr = jnp.zeros(W, I32)
        # +1 dump column for masked writes; +1 dump table row
        out = jnp.zeros((W, Bmax + 1), jnp.uint8)
        table = jnp.full(tsize + 1, R.PROB_INIT, I32)
        cst = _ctx_init(kind, geom, W)
        carry = (low, rng, ptr, out, table, cst)
        carry, _ = jax.lax.scan(step, carry, (syms, actives, poss, resets))
        low, rng, ptr, out, table, cst = carry
        # flush lanes that coded anything (active at step 0 => counts>0)
        flushed = actives[0] if S else jnp.zeros(W, bool)
        for _ in range(R.FLUSH_BYTES):
            byte = (low >> U32(24)).astype(jnp.uint8)
            wptr = jnp.where(flushed, ptr, I32(Bmax))
            out = out.at[lane_ids, wptr].set(byte, mode="drop")
            ptr = ptr + flushed.astype(I32)
            low = low << U32(8)
        return out, ptr

    return run


@functools.lru_cache(maxsize=128)
def _build_decode(kind: str, geom, S: int, W: int, Lmax: int):
    depth, rate = geom.depth, geom.rate
    tsize = geom.table_size
    lane_ids = jnp.arange(W, dtype=I32)

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
            p, idx_s = _table_gather(table, idx, active)
            split = (rng >> U32(PROB_BITS)) * p
            diff = (code - low) & U32(0xFFFFFFFF)
            bit = jnp.where(active, (diff >= split).astype(U32), U32(0))
            is1 = bit.astype(bool) & active
            is0 = (~bit.astype(bool)) & active
            low = jnp.where(is1, low + split, low)
            rng = jnp.where(is1, rng - split, jnp.where(is0, split, rng))
            low, rng, code, ptr = _dec_renorm(low, rng, code, ptr, buf,
                                              lens, active, lane_ids)
            table = _table_update(table, idx_s, p, bit, active, rate)
            node = 2 * node + bit.astype(I32)
            sym = (sym << U32(1)) | bit
        sym = jnp.where(active, sym, U32(0))
        cst = _ctx_advance(kind, geom, cst, sym)
        return (low, rng, code, ptr, table, cst, buf, lens), sym

    @jax.jit
    def run(payload, lens, actives, poss, resets):
        low = jnp.zeros(W, U32)
        rng = jnp.full(W, 0xFFFFFFFF, U32)
        ptr = jnp.zeros(W, I32)
        code = jnp.zeros(W, U32)
        lens32 = lens.astype(I32)
        for _ in range(4):
            idx = jnp.minimum(ptr, I32(Lmax - 1))
            nxt = payload[lane_ids, idx].astype(U32)
            nxt = jnp.where(ptr < lens32, nxt, U32(0))
            code = (code << U32(8)) | nxt
            ptr = ptr + 1
        table = jnp.full(tsize + 1, R.PROB_INIT, I32)
        cst = _ctx_init(kind, geom, W)
        carry = (low, rng, code, ptr, table, cst, payload, lens32)
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
    Bmax = R.worst_case_bytes(Sp * geom.depth)
    run = _build_encode(kind, geom, Sp, W, Bmax)
    out, ptr = run(jnp.asarray(symsp), jnp.asarray(actives),
                   jnp.asarray(posp), jnp.asarray(resetp))
    out = np.asarray(out)[:, :Bmax]
    ptr = np.asarray(ptr).astype(np.int64)
    maxlen = int(ptr.max()) if ptr.size else 0
    return out[:, :maxlen].copy(), ptr


def decode_stream(kind: str, geom, payload: np.ndarray, lens: np.ndarray,
                  counts: np.ndarray, num_steps: int,
                  pos: np.ndarray | None = None,
                  reset: np.ndarray | None = None) -> np.ndarray:
    W = payload.shape[0]
    if num_steps == 0 or not (np.asarray(counts) > 0).any():
        return np.zeros((num_steps, W), dtype=np.uint32)
    Sp, actives, posp, resetp, _ = _prep(num_steps, W, counts, pos, reset)
    # bucket the payload width so jit caches across blocks
    Lmax = max(int(payload.shape[1]), 1)
    Lmax = ((Lmax + 2047) // 2048) * 2048
    pay = np.zeros((W, Lmax), dtype=np.uint8)
    pay[:, : payload.shape[1]] = payload
    run = _build_decode(kind, geom, Sp, W, Lmax)
    syms = run(jnp.asarray(pay), jnp.asarray(np.asarray(lens)),
               jnp.asarray(actives), jnp.asarray(posp), jnp.asarray(resetp))
    return np.asarray(syms)[:num_steps].astype(np.uint32)
