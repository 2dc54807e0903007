#!/usr/bin/env python
"""Oracle probe: per-entry visit-count adaptation warm-up for the QUAL
stream (round-2 VERDICT #6 design-measured-first step).

Law variant under test: effective rate r_eff = min(rate, rate_lo +
ceil_log2(min(vis, 1024) + 1)) where vis counts prior visits to the
entry — cold entries adapt fast (rate_lo), warm entries at the frozen
rate. Implemented by monkeypatching ranger_np.table_update with a
side visit table; QUAL-only via table-size gating.

Prints sizes for baseline vs rate_lo variants on the small regression
corpora (cold) and a 16k illumina block (warm).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

import slimfastq_tpu.ops.ranger_np as R  # noqa: E402
from slimfastq_tpu.api import encode_fastq  # noqa: E402
from slimfastq_tpu.config import config_for_level  # noqa: E402
from slimfastq_tpu.ops import streams_np  # noqa: E402
from slimfastq_tpu.utils.synth import corpus, synth_fastq  # noqa: E402

ORIG = R.table_update
VT: dict = {}
STATE = {"rate_lo": None, "sizes": set()}


def patched(table, idx, marked, bit, rate, sac_base):
    if STATE["rate_lo"] is None or len(table) not in STATE["sizes"]:
        return ORIG(table, idx, marked, bit, rate, sac_base)
    key = (id(table), len(table))
    vt = VT.get(key)
    if vt is None:
        vt = VT[key] = np.zeros(len(table), np.int64)
    p32 = (marked & R.I32((1 << R.CNT_SHIFT) - 1)).astype(R.I32)
    cnt = (marked >> R.I32(R.CNT_SHIFT)).astype(R.I32)
    p32 = np.clip(p32, R.PROB_MIN, R.PROB_MAX)
    vis = np.minimum(vt[idx], 1024).astype(R.I32)
    lgv = R.ceil_log2_counts(vis + 1)
    r_eff = np.minimum(R.I32(rate), R.I32(STATE["rate_lo"]) + lgv)
    delta = np.where(bit.astype(bool),
                     -(p32 >> r_eff),
                     (R.I32(R.PROB_ONE) - p32) >> r_eff)
    extra = np.maximum(R.ceil_log2_counts(np.maximum(cnt, 1))
                       - R.CAP_LOG2, 0)
    delta = delta >> extra
    real = idx < sac_base
    delta = np.where(real, delta - R.I32(1 << R.CNT_SHIFT), R.I32(0))
    np.add.at(table, idx, delta)
    touched = idx[real]
    table[touched] = np.clip(table[touched], R.PROB_MIN, R.PROB_MAX)
    np.add.at(vt, idx, np.where(real, 1, 0))


R.table_update = patched
# streams_np captured the symbol helpers at import; they call
# R.table_update dynamically (module attribute), so the patch takes.

SPECS = [("illumina", 500), ("novaseq", 500), ("nheavy", 500),
         ("sra", 500)]


def main() -> int:
    datasets = {n: corpus(n, c, seed=1234) for n, c in SPECS}
    datasets["illum16k"] = synth_fastq(16384, read_len=100, seed=0,
                                       var_len=False, n_rate=0.0005)

    def qual_sizes(cfg):
        return {cfg.qual.table_size}

    rows = []
    for rate_lo in (None, 1, 2, 3):
        sizes = {}
        for name, data in datasets.items():
            kw = dict(lanes=32, aux_lanes=8, block_records=256)
            if name == "illum16k":
                kw = dict(lanes=256, aux_lanes=8, block_records=16384)
            cfg = config_for_level(4, **kw)
            STATE["rate_lo"] = rate_lo
            STATE["sizes"] = qual_sizes(cfg)
            VT.clear()
            sizes[name] = len(encode_fastq(data, cfg=cfg,
                                           backend=streams_np,
                                           use_native=False))
        rows.append((rate_lo, sizes))
    names = list(datasets)
    print(f"{'rate_lo':<9}" + "".join(f"{n:>10}" for n in names))
    base = rows[0][1]
    for rate_lo, sizes in rows:
        lbl = "off" if rate_lo is None else str(rate_lo)
        print(f"{lbl:<9}" + "".join(f"{sizes[n]:>10}" for n in names))
        print(f"{'':<9}" + "".join(
            f"{(sizes[n]/base[n]-1)*100:>+9.2f}%" for n in names))
    return 0


if __name__ == "__main__":
    main()
