#!/usr/bin/env python
"""Measured-first probe for a long-range (LZ-class) read-match stream
(round-3 VERDICT missing #3 / next-round #4).

Question: on the LZ-favourable corpora (novaseq: 2x coverage of a small
genome), how much compressed size would a block-local read-match stream
recover? Mechanism probed: for each read, find an earlier read in the
same block covering the same genome span (k-mer seed + extension, both
orientations), emit a per-read descriptor (ref_delta, shift, orient) and
replace the read's 2-bit codes by e = (code - pred) & 3 over the matched
span ("e-transform"). Matched spans become ~p_err-density near-zero runs
the existing order-k context model codes at ~H(p) bits/base; mismatches
need no exception stream (they are just nonzero e symbols). The seq
kernel, layout and schedule are untouched — the transform is host-side.

Decode-order constraint mirrored here: the ref read must sit in an
earlier lane generation (ref < (r // W) * W), so host reconstruction
after the device decode vectorises generation by generation.

Usage: JAX_PLATFORMS=cpu python tools/probe_matches.py [reads] [corpus]
"""

import lzma
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from slimfastq_tpu.api import encode_fastq  # noqa: E402
from slimfastq_tpu.utils.fastq import parse_fastq_bytes  # noqa: E402
from slimfastq_tpu.utils.synth import corpus  # noqa: E402
from slimfastq_tpu.utils.bits import put_svarint, put_varint  # noqa: E402

K = 16
SEED_STRIDE = 8
MAX_CAND = 16
_B2C = np.full(256, 0, dtype=np.uint8)
for _i, _b in enumerate(b"ACGT"):
    _B2C[_b] = _i
_COMP = np.array([3, 2, 1, 0], dtype=np.uint8)
_C2B = np.frombuffer(b"ACGT", dtype=np.uint8)


def _kmers(codes: np.ndarray) -> np.ndarray:
    """All K-length packed k-mers (uint64) of a 2-bit code array."""
    if len(codes) < K:
        return np.empty(0, dtype=np.uint64)
    # rolling pack via cumulative shifts
    v = codes.astype(np.uint64)
    out = np.zeros(len(codes) - K + 1, dtype=np.uint64)
    acc = np.uint64(0)
    for j in range(K):
        acc = (acc << np.uint64(2)) | v[j]
    out[0] = acc
    mask = np.uint64((1 << (2 * K)) - 1)
    for i in range(1, len(out)):
        acc = ((acc << np.uint64(2)) | v[i + K - 1]) & mask
        out[i] = acc
    return out


def probe(name: str, data: bytes, W: int = 1024, level: int = 4,
          min_score: int = 32, mm_penalty: int = 8):
    batch = parse_fastq_bytes(data)
    n = len(batch)
    codes = [_B2C[np.frombuffer(s, dtype=np.uint8)] for s in batch.seqs]
    rcs = [_COMP[c[::-1]] for c in codes]

    index: dict[int, list] = {}

    def add_to_index(lo, hi):
        for r in range(lo, hi):
            for orient, arr in ((0, codes[r]), (1, rcs[r])):
                km = _kmers(arr)
                for p in range(len(km)):   # stride-1: arbitrary shifts
                    lst = index.setdefault(int(km[p]), [])
                    if len(lst) < MAX_CAND:
                        lst.append((r, orient, p))

    t0 = time.perf_counter()
    matched = 0
    matched_bases = 0
    mismatches = 0
    desc_bytes = bytearray()
    total_bases = sum(len(c) for c in codes)
    e_codes = [c.copy() for c in codes]

    for g_lo in range(0, n, W):
        g_hi = min(g_lo + W, n)
        if g_lo > 0:
            for r in range(g_lo, g_hi):
                c = codes[r]
                L = len(c)
                km = _kmers(c)
                best = None  # (span, -mm, ref, orient, shift)
                seen = set()
                for p in range(0, len(km), SEED_STRIDE):
                    for (ref, orient, q) in index.get(int(km[p]), ()):
                        shift = q - p
                        key = (ref, orient, shift)
                        if key in seen:
                            continue
                        seen.add(key)
                        ra = codes[ref] if orient == 0 else rcs[ref]
                        lo = max(0, -shift)
                        hi = min(L, len(ra) - shift)
                        if hi - lo < K:
                            continue
                        mm = int((c[lo:hi] != ra[lo + shift: hi + shift])
                                 .sum())
                        span = hi - lo
                        score = span - mm_penalty * mm
                        if best is None or score > best[0]:
                            best = (score, span, mm, ref, orient, shift)
                if best is not None and best[0] >= min_score:
                    _, span, mm, ref, orient, shift = best
                    matched += 1
                    matched_bases += span
                    mismatches += mm
                    ra = codes[ref] if orient == 0 else rcs[ref]
                    lo = max(0, -shift)
                    hi = min(L, len(ra) - shift)
                    e = e_codes[r]
                    e[lo:hi] = (c[lo:hi] - ra[lo + shift: hi + shift]) & 3
                    # descriptor: varint(rec delta placeholder=1),
                    # varint(r - ref), svarint(shift | orient in sign-ish)
                    put_varint(desc_bytes, 1)
                    put_varint(desc_bytes, r - ref)
                    put_svarint(desc_bytes, shift)
                    desc_bytes.append(orient)
        add_to_index(g_lo, g_hi)
    t_match = time.perf_counter() - t0

    # re-encode with transformed seqs (letters = e symbols; N positions are
    # preserved so SEQX stays identical)
    new_seqs = []
    for r in range(n):
        s = np.frombuffer(batch.seqs[r], dtype=np.uint8).copy()
        good = s != ord("N")
        arr = _C2B[e_codes[r]]
        s[good] = arr[good]
        new_seqs.append(s.tobytes())
    parts = []
    for r in range(n):
        parts += [b"@", batch.ids[r], b"\n", new_seqs[r], b"\n",
                  batch.pluses[r], b"\n", batch.quals[r], b"\n"]
    tdata = b"".join(parts)

    kw = dict(level=level)
    base = len(encode_fastq(data, **kw))
    trans = len(encode_fastq(tdata, **kw))
    xz = len(lzma.compress(data, preset=6))
    desc_cost = len(lzma.compress(bytes(desc_bytes), preset=6)) if \
        desc_bytes else 0
    est = trans + desc_cost

    print(f"corpus={name} min_score={min_score} pen={mm_penalty} "
          f"reads={n} match_time={t_match:.2f}s")
    print(f"  matched: {100*matched/max(n,1):.1f}% reads, "
          f"{100*matched_bases/max(total_bases,1):.1f}% bases, "
          f"mm {mismatches/max(matched_bases,1)*100:.2f}%  "
          f"desc {len(desc_bytes)}B raw ~{desc_cost} xz'd")
    print(f"  sfq -{level}: {base} -> {trans} (+desc: {est})  xz: {xz}  "
          f"ratio {len(data)/base:.3f} -> {len(data)/est:.3f} "
          f"(xz {len(data)/xz:.3f})  win: {100*(base-est)/base:+.2f}%")


if __name__ == "__main__":
    reads = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    scores = [int(s) for s in os.environ.get("SCORES", "32").split(",")]
    names = sys.argv[2:] or ["novaseq", "illumina", "lowcov"]
    for nm in names:
        if nm == "lowcov":
            from slimfastq_tpu.utils.synth import synth_fastq
            d = synth_fastq(reads, read_len=100, seed=0, n_rate=0.0005,
                            genome_size=reads * 200)
        else:
            d = corpus(nm, reads, seed=0)
        for sc in scores:
            probe(nm, d, min_score=sc)
