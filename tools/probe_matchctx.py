#!/usr/bin/env python
"""Measured-first probe: would a DEDICATED match-context family for
e-transformed SEQ spans (ctx = last 3 e-symbols, separate table region,
selected by a per-position in-span flag) beat routing e-symbols through
the normal order-k genome contexts (the format v5.0 choice)?

The v5.0 design costs: span-entry context pollution (k junk contexts per
span), post-mismatch pollution (k junk contexts per mismatch), and
dilution of the genome tables with zero-runs. A dedicated family pays
none of those. This probe encodes the SEQ stream both ways (oracle,
encode only — sizes are what matter) on the LZ-favourable corpora.

Usage: JAX_PLATFORMS=cpu python tools/probe_matchctx.py [reads]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from slimfastq_tpu import native  # noqa: E402
from slimfastq_tpu.config import config_for_level  # noqa: E402
from slimfastq_tpu.models import matcher as M  # noqa: E402
from slimfastq_tpu.ops import ranger_np as R  # noqa: E402
from slimfastq_tpu.ops import streams_np  # noqa: E402
from slimfastq_tpu.pipeline import (_scatter_record_symbols,  # noqa: E402
                                    _seq_symbol_layout)
from slimfastq_tpu.utils.synth import corpus  # noqa: E402

U32 = np.uint32


def encode_seq(geom, syms, counts, pos, reset, mflag=None,
               match_bits=0):
    """streams_np.encode_stream specialised for 'seq', with an optional
    dedicated match-context family: positions with mflag=1 use
    ctx = tree_ctx_count + (rolled e-history & (2^match_bits - 1))."""
    S, W = syms.shape
    depth, rate = geom.depth, geom.rate
    tree_ctx = geom.num_ctx
    num_ctx = tree_ctx + (1 << match_bits if match_bits else 0)
    sac_base = num_ctx * 3
    tsize = (num_ctx + 1) * 3
    Sp = R.pad_steps(S)
    table = R.table_init(tsize, sac_base)
    rate_lo = geom.rate_lo
    vtable = (np.zeros(tsize, dtype=np.int32)
              if 0 < rate_lo < rate else None)
    enc = R.LaneEncoder(W, R.worst_case_bytes(Sp * depth))
    ctxer = streams_np.SeqCtx(geom, W)
    z = np.zeros(W, dtype=U32)
    for t in range(Sp):
        active = counts > t
        p_t = pos[t] if t < S else z
        r_t = reset[t] if t < S else z
        ctx = ctxer.step_ctx(t, p_t, r_t)
        if match_bits and t < S and mflag is not None:
            mt = mflag[t].astype(bool)
            mctx = U32(tree_ctx) + (ctxer.h & U32((1 << match_bits) - 1))
            ctx = np.where(mt, mctx, ctx)
        ctx = np.where(active, ctx, U32(num_ctx))
        sym = np.where(active, syms[t], 0).astype(U32) if t < S else z
        R.encode_symbols(enc, table, ctx, sym, depth, rate, sac_base,
                         vtable=vtable, rate_lo=rate_lo)
        ctxer.advance(sym)
    enc.flush()
    lens = np.where(counts > 0, enc.ptr, 0).astype(np.int64)
    return int(lens.sum())


def main() -> None:
    reads = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    for name in ("novaseq", "lowcov", "illumina"):
        if name == "lowcov":
            from slimfastq_tpu.utils.synth import synth_fastq
            data = synth_fastq(reads, read_len=100, seed=0, n_rate=0.0005,
                               genome_size=reads * 200)
        else:
            data = corpus(name, reads, seed=0)
        cfg = config_for_level(4)
        buf = np.frombuffer(data, dtype=np.uint8)
        idx, n = native.fastq_index(data)
        lengths = idx["seq_len"].astype(np.int64)
        W = cfg.lanes
        matches = native.match_find(buf, idx["seq_off"], lengths, 48)

        codes = [M._B2C0[buf[idx["seq_off"][r]:
                             idx["seq_off"][r] + lengths[r]]]
                 for r in range(n)]
        _, scounts, S, pos, reset = _seq_symbol_layout(lengths, W)
        geom = cfg.seq

        for t in M.THRESHOLDS:
            e8 = M.apply_e_transform(codes, matches, t)
            mfl = []
            for r in range(n):
                f = np.zeros(lengths[r], dtype=np.uint8)
                m = matches[r]
                if m is not None and m[3] >= t:
                    lo, hi = M.span_bounds(m[1], m[2], int(lengths[r]),
                                           int(lengths[m[0]]))
                    f[lo:hi] = 1
                mfl.append(f)
            sq_e = _scatter_record_symbols(
                [e.astype(U32) for e in e8], W, S, scounts)
            mfm = _scatter_record_symbols(
                [f.astype(U32) for f in mfl], W, S, scounts)
            base = encode_seq(geom, sq_e, scounts, pos, reset)
            for mb in (4, 6, 8):
                ded = encode_seq(geom, sq_e, scounts, pos, reset,
                                 mflag=mfm, match_bits=mb)
                print(f"{name} t={t}: e-through-genome-ctx {base}  "
                      f"match-ctx[{mb}b] {ded}  win {base-ded:+d} "
                      f"({(base-ded)/base*100:+.2f}%)", flush=True)


if __name__ == "__main__":
    main()
