"""Lane-interleaved binary range coder — NumPy oracle (the bit-format spec).

This module is the *normative specification* of the compressed bit format.
Every device implementation (JAX scan in ``ranger_jax.py``, Pallas kernel in
``ranger_pallas.py``) must produce byte-identical output to this oracle.

Design (re-derived TPU-first from the capabilities of Infinidat/slimfastq's
``power_ranger.hpp`` — see SURVEY.md §2; the reference mount was empty, so no
file:line citations are possible, per SURVEY.md §0):

* **Carry-less range coder** (Subbotin lineage, as used by the
  fqzcomp/slimfastq family): 32-bit ``low``/``range`` state, byte-at-a-time
  renormalisation, no carry propagation (the BOT underflow clamp discards a
  negligible sliver of code space instead).
* **Binary decomposition**: every K-symbol alphabet is coded through a
  balanced binary tree of K-1 adaptive node probabilities (12-bit), so the
  hot loop needs **no integer division** and no cumulative-frequency scans —
  this is what makes it map onto the TPU VPU.
* **W interleaved lanes**: the inherently serial coding loop becomes W
  independent streams advanced in lockstep (PAPERS.md, interleaved entropy
  coders). Each lane owns a disjoint subset of the records of a block.
* **Batch-synchronous shared model**: all lanes *read* the probability table
  as it stood before the current bit-step, then all their updates are merged
  with a commutative scatter-ADD followed by a deterministic clamp. Encoder
  and decoder replay the identical schedule, so adaptive state never
  diverges. This replaces slimfastq's strictly-serial count update with a
  deterministic parallel law (SURVEY.md §7 hard-part (c)).

All coder state is unsigned 32-bit integer; no float appears anywhere.
"""

from __future__ import annotations

import numpy as np

# ---- Format constants (frozen: changing any of these changes the bit format)
TOP = np.uint32(1 << 24)  # renormalise while range < TOP can't be decided
BOT = np.uint32(1 << 16)  # underflow threshold
PROB_BITS = 12
PROB_ONE = 1 << PROB_BITS  # 4096
PROB_INIT = PROB_ONE // 2  # 2048
PROB_MIN = 16  # clamp: keeps per-bit cost bounded => bounded output size
PROB_MAX = PROB_ONE - PROB_MIN
RENORM_ITERS = 4  # provably sufficient for 32-bit state, 8-bit renorm
FLUSH_BYTES = 4  # tail bytes emitted per lane at flush
MASK32 = np.uint32(0xFFFFFFFF)

U32 = np.uint32
I32 = np.int32
U8 = np.uint8


def worst_case_bytes(num_bits: int) -> int:
    """Upper bound on bytes one lane can emit for ``num_bits`` bit-steps.

    With p clamped to [PROB_MIN, PROB_MAX], one bit costs at most
    -log2(PROB_MIN/PROB_ONE) = 8 bits of range, i.e. at most one
    renormalisation byte per bit-step (amortised), plus slack for the
    underflow clamp and the flush tail.
    """
    return int(num_bits) + 2 * FLUSH_BYTES + 16


class LaneEncoder:
    """W-lane lockstep binary range encoder (NumPy oracle)."""

    def __init__(self, num_lanes: int, max_bytes: int):
        self.W = int(num_lanes)
        self.low = np.zeros(self.W, dtype=U32)
        self.rng = np.full(self.W, MASK32, dtype=U32)
        self.out = np.zeros((self.W, int(max_bytes)), dtype=U8)
        self.ptr = np.zeros(self.W, dtype=np.int64)

    def _emit_renorm(self, active: np.ndarray) -> None:
        low, rng = self.low, self.rng
        for _ in range(RENORM_ITERS):
            agree = ((low ^ (low + rng)) & MASK32) < TOP
            under = rng < BOT
            do = active & (agree | under)
            # underflow clamp: only when top bytes disagree but range < BOT
            clamp = do & ~agree
            rng = np.where(clamp, (U32(0) - low) & U32(BOT - 1), rng)
            byte = (low >> U32(24)).astype(U8)
            w = np.where(do)[0]
            self.out[w, self.ptr[w]] = byte[w]
            self.ptr += do.astype(np.int64)
            low = np.where(do, (low << U32(8)) & MASK32, low)
            rng = np.where(do, (rng << U32(8)) & MASK32, rng)
        # spec guard: a 5th iteration must never be needed
        agree = ((low ^ (low + rng)) & MASK32) < TOP
        under = rng < BOT
        if np.any(active & (agree | under)):
            raise AssertionError("range-coder renorm exceeded RENORM_ITERS")
        self.low, self.rng = low, rng

    def encode_bits(self, p: np.ndarray, bit: np.ndarray, active: np.ndarray) -> None:
        """Advance every active lane by one binary decision.

        p: uint32[W] probability of bit==0, in [PROB_MIN, PROB_MAX].
        bit: uint32[W] in {0,1}.  active: bool[W].
        """
        split = (self.rng >> U32(PROB_BITS)) * p.astype(U32)
        is1 = bit.astype(bool)
        newlow = np.where(is1, (self.low + split) & MASK32, self.low)
        newrng = np.where(is1, (self.rng - split) & MASK32, split)
        self.low = np.where(active, newlow, self.low)
        self.rng = np.where(active, newrng, self.rng)
        self._emit_renorm(active)

    def flush(self, active: np.ndarray | None = None) -> None:
        """Emit tail bytes. Lanes outside `active` (e.g. lanes that coded
        nothing) emit nothing and keep length 0."""
        if active is None:
            active = np.ones(self.W, dtype=bool)
        w = np.where(active)[0]
        for _ in range(FLUSH_BYTES):
            byte = (self.low >> U32(24)).astype(U8)
            self.out[w, self.ptr[w]] = byte[w]
            self.ptr += active.astype(np.int64)
            self.low = (self.low << U32(8)) & MASK32

    def lane_bytes(self) -> list[bytes]:
        return [self.out[i, : self.ptr[i]].tobytes() for i in range(self.W)]


class LaneDecoder:
    """W-lane lockstep binary range decoder (NumPy oracle)."""

    def __init__(self, payload: np.ndarray, lane_lens: np.ndarray):
        """payload: uint8[W, maxlen] (per-lane byte streams, left-aligned);
        lane_lens: per-lane valid byte counts."""
        self.W = payload.shape[0]
        if payload.shape[1] == 0:  # all-empty lanes: keep indexing valid
            payload = np.zeros((self.W, 1), dtype=U8)
        self.buf = payload
        self.lens = lane_lens.astype(np.int64)
        self.low = np.zeros(self.W, dtype=U32)
        self.rng = np.full(self.W, MASK32, dtype=U32)
        self.ptr = np.zeros(self.W, dtype=np.int64)
        code = np.zeros(self.W, dtype=U32)
        for _ in range(4):
            code = (code << U32(8)) | self._read_bytes(np.ones(self.W, dtype=bool))
        self.code = code

    def _read_bytes(self, do: np.ndarray) -> np.ndarray:
        idx = np.minimum(self.ptr, self.buf.shape[1] - 1)
        byte = self.buf[np.arange(self.W), idx].astype(U32)
        byte = np.where(self.ptr < self.lens, byte, U32(0))
        byte = np.where(do, byte, U32(0))
        self.ptr += do.astype(np.int64)
        return byte

    def decode_bits(self, p: np.ndarray, active: np.ndarray) -> np.ndarray:
        """Decode one binary decision per active lane. Returns uint32[W] bits
        (0 for inactive lanes)."""
        split = (self.rng >> U32(PROB_BITS)) * p.astype(U32)
        diff = (self.code - self.low) & MASK32
        bit = (diff >= split).astype(U32)
        bit = np.where(active, bit, U32(0))
        is1 = bit.astype(bool) & active
        is0 = ~bit.astype(bool) & active
        self.low = np.where(is1, (self.low + split) & MASK32, self.low)
        self.rng = np.where(is1, (self.rng - split) & MASK32, self.rng)
        self.rng = np.where(is0, split, self.rng)
        # renorm
        low, rng, code = self.low, self.rng, self.code
        for _ in range(RENORM_ITERS):
            agree = ((low ^ (low + rng)) & MASK32) < TOP
            under = rng < BOT
            do = active & (agree | under)
            clamp = do & ~agree
            rng = np.where(clamp, (U32(0) - low) & U32(BOT - 1), rng)
            nxt = self._read_bytes(do)
            code = np.where(do, ((code << U32(8)) | nxt) & MASK32, code)
            low = np.where(do, (low << U32(8)) & MASK32, low)
            rng = np.where(do, (rng << U32(8)) & MASK32, rng)
        self.low, self.rng, self.code = low, rng, code
        return bit


# ---------------------------------------------------------------------------
# Adaptive probability table: the shared batch-synchronous model
# ---------------------------------------------------------------------------

def table_init(num_entries: int) -> np.ndarray:
    return np.full(int(num_entries), PROB_INIT, dtype=I32)


def table_read(table: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Clamped read: coding always sees p in [PROB_MIN, PROB_MAX]."""
    return np.clip(table[idx], PROB_MIN, PROB_MAX).astype(U32)


def table_update(table: np.ndarray, idx: np.ndarray, p: np.ndarray,
                 bit: np.ndarray, active: np.ndarray, rate: int) -> None:
    """Batch-synchronous adaptive update (the deterministic parallel law).

    All lanes computed their delta from the same pre-step snapshot ``p``;
    deltas merge by commutative addition, then touched entries are clamped
    (duplicate indices clamp to the identical value, so order is irrelevant).
    """
    p32 = p.astype(I32)
    delta = np.where(bit.astype(bool),
                     -(p32 >> rate),
                     (I32(PROB_ONE) - p32) >> rate)
    delta = np.where(active, delta, I32(0))
    np.add.at(table, idx, delta)
    touched = idx[active]
    table[touched] = np.clip(table[touched], PROB_MIN, PROB_MAX)


# ---------------------------------------------------------------------------
# Symbol-level coding through a balanced binary tree
# ---------------------------------------------------------------------------

def encode_symbols(enc: LaneEncoder, table: np.ndarray, ctx: np.ndarray,
                   sym: np.ndarray, active: np.ndarray, depth: int,
                   rate: int) -> None:
    """Encode one ``depth``-bit symbol per active lane.

    Tree node layout: entry index = ctx * (2**depth - 1) + (node - 1), with
    node starting at 1 and descending node = 2*node + bit, MSB first.
    """
    nodes_per_ctx = (1 << depth) - 1
    base = ctx.astype(np.int64) * nodes_per_ctx
    node = np.ones(ctx.shape[0], dtype=np.int64)
    for i in range(depth - 1, -1, -1):
        bit = ((sym >> U32(i)) & U32(1)).astype(U32)
        idx = base + node - 1
        p = table_read(table, idx)
        enc.encode_bits(p, bit, active)
        table_update(table, idx, p, bit, active, rate)
        node = 2 * node + bit.astype(np.int64)


def decode_symbols(dec: LaneDecoder, table: np.ndarray, ctx: np.ndarray,
                   active: np.ndarray, depth: int, rate: int) -> np.ndarray:
    """Decode one ``depth``-bit symbol per active lane. Returns uint32[W]."""
    nodes_per_ctx = (1 << depth) - 1
    base = ctx.astype(np.int64) * nodes_per_ctx
    node = np.ones(ctx.shape[0], dtype=np.int64)
    sym = np.zeros(ctx.shape[0], dtype=U32)
    for _ in range(depth):
        idx = base + node - 1
        p = table_read(table, idx)
        bit = dec.decode_bits(p, active)
        table_update(table, idx, p, bit, active, rate)
        node = 2 * node + bit.astype(np.int64)
        sym = (sym << U32(1)) | bit
    return np.where(active, sym, U32(0))
