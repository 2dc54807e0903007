"""Synthetic Illumina-like FASTQ generation for tests and benchmarks
(BASELINE.json configs use e.g. 100k reads at Q40 scale)."""

from __future__ import annotations

import numpy as np


def synth_fastq(num_reads: int, read_len: int = 100, seed: int = 0,
                var_len: bool = False, n_rate: float = 0.001,
                instrument: bytes = b"SIM01", qual_levels: int = 41) -> bytes:
    """Generate FASTQ bytes with realistic structure:
    - IDs: instrument:run:flowcell:lane:tile:x:y with incrementing x/y
    - seq: Markov-ish base composition with occasional N
    - qual: position-degrading phred profile with autocorrelation
    """
    rng = np.random.default_rng(seed)
    out = bytearray()
    tile = 1101
    x = 1000
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for r in range(num_reads):
        L = read_len if not var_len else int(rng.integers(max(1, read_len // 2),
                                                          read_len + 1))
        x += int(rng.integers(1, 4))
        y = 2000 + (r % 997)
        rid = b"%s:23:H7QQQ:1:%d:%d:%d" % (instrument, tile, x, y)
        # sequence: correlated bases
        b_idx = rng.integers(0, 4, size=L)
        rep = rng.random(L) < 0.35
        for i in range(1, L):
            if rep[i]:
                b_idx[i] = b_idx[i - 1]
        seq = bases[b_idx].copy()
        nmask = rng.random(L) < n_rate
        seq[nmask] = ord("N")
        # quality: high at start, drifting down, autocorrelated
        base_q = 38.0 - 8.0 * (np.arange(L) / max(1, L)) ** 2
        noise = np.cumsum(rng.normal(0, 0.8, size=L))
        noise -= np.linspace(0, noise[-1] if L else 0.0, L)
        q = np.clip(base_q + noise, 2, qual_levels - 1).astype(np.uint8)
        q[nmask] = 2
        qual = (q + 33).tobytes()
        out += b"@" + rid + b"\n" + seq.tobytes() + b"\n+\n" + qual + b"\n"
    return bytes(out)
