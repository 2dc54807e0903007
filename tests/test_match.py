"""Format v5 long-range read-match stream (models/matcher.py): matcher
self-consistency, descriptor round trips, oracle/native/sharded container
equality on match-heavy data, and the per-block SEQ order fallback."""

import io

import numpy as np
import pytest

from slimfastq_tpu import container, native
from slimfastq_tpu.api import decode_fastq, encode_fastq
from slimfastq_tpu.config import config_for_level
from slimfastq_tpu.models import matcher as M
from slimfastq_tpu.pipeline import MATCH_USED, QUAL_NODELTA
from slimfastq_tpu.utils.synth import corpus


def _overlapping_codes(n=2600, seed=7):
    """Reads sampled from a small genome (incl. revcomp + errors) so the
    matcher has real cross-read structure to find."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, 4000).astype(np.uint8)
    codes = []
    for _ in range(n):
        s = int(rng.integers(0, 3900))
        L = int(rng.integers(60, 101))
        c = g[s: s + L].copy()
        err = rng.random(L) < 0.003
        c[err] = (c[err] + rng.integers(1, 4, max(err.sum(), 1))[: err.sum()]
                  ) % 4
        if rng.random() < 0.5:
            c = (3 - c[::-1]).astype(np.uint8)
        codes.append(c.astype(np.uint8))
    return codes


def test_matcher_reconstruct_roundtrip():
    codes = _overlapping_codes()
    matches = M.find_matches(codes)
    n_matched = sum(1 for m in matches if m)
    assert n_matched > len(codes) // 4, "matcher finds cross-read structure"
    assert any(m and m[1] == 1 for m in matches), "revcomp matches found"
    for t in M.THRESHOLDS:
        e = M.apply_e_transform(codes, matches, t)
        per_read = [(m[0], m[1], m[2]) if (m and m[3] >= t) else None
                    for m in matches]
        rec = [x.copy() for x in e]
        M.reconstruct(rec, per_read)
        assert all(np.array_equal(a, b) for a, b in zip(rec, codes))


def test_match_lane_streams_roundtrip():
    codes = _overlapping_codes(n=1400, seed=3)
    matches = M.find_matches(codes)
    t = M.THRESHOLDS[0]
    lanes = M.encode_match_lanes(matches, t, len(codes), 8)
    got = {}
    for w, buf in enumerate(lanes):
        for (ordinal, rd, orient, v) in M.parse_match_lane(bytes(buf)):
            r = w + ordinal * 8
            got[r] = (r - rd, orient, v)
    want = {r: (m[0], m[1], m[2]) for r, m in enumerate(matches)
            if m and m[3] >= t}
    assert got == want and want


def test_effective_seq_order_policy():
    assert M.effective_seq_order(11, M.ORDER_FALLBACK_BASES) == 11
    assert M.effective_seq_order(11, M.ORDER_FALLBACK_BASES - 1) == 10
    assert M.effective_seq_order(10, 10) == 10  # never touches order <= 10
    assert M.effective_seq_order(5, 10) == 5


def _match_data(n=1536):
    return corpus("novaseq", n, seed=0)


CFG = dict(lanes=64, aux_lanes=16, block_records=1536)


def _used_match(enc: bytes) -> bool:
    f = io.BytesIO(enc)
    cfg = container.read_header(f)
    return any(blk.flags & MATCH_USED
               for blk in container.iter_blocks(f, cfg))


@pytest.mark.slow
def test_oracle_roundtrip_with_matches():
    data = _match_data()
    enc = encode_fastq(data, level=4, use_native=False, **CFG)
    assert _used_match(enc), "match stream engaged on coverage data"
    assert decode_fastq(enc, use_native=False) == data
    # matches must shrink the container vs match=False
    plain = encode_fastq(data, level=4, use_native=False, match=False,
                         **CFG)
    assert not _used_match(plain)
    assert len(enc) < len(plain)
    assert decode_fastq(plain, use_native=False) == data


@pytest.mark.slow
def test_native_matcher_equals_oracle():
    """C++ match_find reproduces the normative NumPy matcher bit-for-bit
    (selection incl. tie-breaks) — this is what keeps native and oracle
    containers identical."""
    if not native.has_matcher():
        pytest.skip("native matcher unavailable")
    data = _match_data(2048)
    from slimfastq_tpu.utils.fastq import parse_fastq_bytes
    batch = parse_fastq_bytes(data)
    codes = [M._B2C0[np.frombuffer(s, dtype=np.uint8)]
             for s in batch.seqs]
    want = M.find_matches(codes)
    buf = np.frombuffer(data, dtype=np.uint8)
    idx, n = native.fastq_index(data)
    got = native.match_find(buf, idx["seq_off"], idx["seq_len"],
                            min(M.THRESHOLDS))
    assert got == want
    assert sum(1 for m in want if m) > n // 4


def test_native_container_equals_oracle_with_matches():
    if not native.available():
        pytest.skip("native library unavailable")
    data = _match_data()
    enc_o = encode_fastq(data, level=4, use_native=False, **CFG)
    enc_n = encode_fastq(data, level=4, use_native=True, **CFG)
    assert enc_o == enc_n
    assert decode_fastq(enc_n, use_native=True) == data


@pytest.mark.slow
def test_sharded_container_equals_sequential_with_matches():
    from slimfastq_tpu.parallel import mesh as pmesh
    from slimfastq_tpu.parallel.sharded import (decode_fastq_sharded,
                                                encode_fastq_sharded)
    data = corpus("novaseq", 3072, seed=1)
    cfg = config_for_level(4, lanes=64, aux_lanes=16, block_records=1536)
    mesh = pmesh.make_mesh(4)
    seq = encode_fastq(data, cfg=cfg)
    shd = encode_fastq_sharded(data, cfg, mesh)
    assert shd == seq
    assert _used_match(seq)
    assert decode_fastq_sharded(shd, mesh) == data


@pytest.mark.slow
def test_match_adversarial_reads():
    """Adversarial reads riding a match-winning block: exact duplicates
    and reverse complements of cross-chunk reads, N runs inside matched
    spans, reads shorter than one k-mer, and homopolymers — all must
    round-trip bit-exactly on both host paths with MATCH engaged."""
    rng = np.random.default_rng(11)
    g = rng.integers(0, 4, 100_000).astype(np.uint8)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = []
    for r in range(2800):
        k = r % 16
        if r >= 1100 and k == 1:
            s = seqs[r - 1100]                         # exact duplicate
        elif r >= 1100 and k == 2:                     # revcomp duplicate
            prev = np.frombuffer(seqs[r - 1100], dtype=np.uint8)
            code = np.full(len(prev), 0, dtype=np.uint8)
            for i, b in enumerate(b"ACGT"):
                code[prev == b] = i
            s = letters[(3 - code)[::-1]].tobytes()
        elif k == 3:
            st = int(rng.integers(0, 99_900))
            b = letters[g[st: st + 100]].copy()
            b[40:60] = ord("N")                        # N run inside span
            s = b.tobytes()
        elif k == 4:
            s = b"ACGTACGTAC"                          # shorter than K
        elif k == 5:
            s = b"A" * 100                             # homopolymer
        else:
            st = int(rng.integers(0, 99_900))
            s = letters[g[st: st + 100]].tobytes()     # ~2.5x coverage
        seqs.append(s)
    recs = []
    for r, s in enumerate(seqs):
        q = (rng.integers(33, 70, size=len(s))).astype(np.uint8).tobytes()
        recs.append(b"@r%d\n%s\n+\n%s\n" % (r, s, q))
    data = b"".join(recs)
    cfg = dict(level=4, lanes=32, aux_lanes=8, block_records=2800)
    enc_o = encode_fastq(data, use_native=False, **cfg)
    assert _used_match(enc_o)
    assert decode_fastq(enc_o, use_native=False) == data
    if native.available():
        enc_n = encode_fastq(data, use_native=True, **cfg)
        assert enc_n == enc_o
        assert decode_fastq(enc_n, use_native=True) == data


@pytest.mark.slow
def test_match_variable_length_long_reads():
    """Long variable-length reads (kb-scale spans, big shift varints,
    wide quality alphabet) through the match path: the matcher must
    engage, win, and round-trip bit-exactly (native path; the oracle
    matcher is impractically slow at Mb scale)."""
    if not native.has_matcher():
        pytest.skip("native matcher unavailable")
    from slimfastq_tpu.utils.synth import synth_fastq
    data = synth_fastq(1400, read_len=2000, seed=7, var_len=True,
                       n_rate=0.001, qual_levels=90,
                       genome_size=1400 * 1000 // 2)
    cfg = dict(level=4, lanes=64, aux_lanes=16, block_records=1400)
    enc = encode_fastq(data, use_native=True, **cfg)
    assert _used_match(enc)
    plain = encode_fastq(data, use_native=True, match=False, **cfg)
    assert len(enc) < len(plain)
    assert decode_fastq(enc, use_native=True) == data


def _polya_poc_check():
    """Poly-A candidate-flood PoC (round-4 advisor finding): 32 reads
    carry an ISOLATED 16-A run (low scores, so the backward chain walk
    never hits its early break) and a 100bp poly-A read in chunk 2 then
    samples EVERY position (the all-A k-mer is always content-sampled),
    probing 85 positions x 16 chain entries of distinct (ref, v) keys —
    far above the ~L/8 sampling expectation the dedup table used to be
    sized by. Pre-fix, native match_find spun forever in MSeen::add."""
    rng = np.random.default_rng(11)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = []
    for r in range(1024):
        c = rng.integers(0, 4, 100).astype(np.uint8)
        if r % 32 == 0:
            p = int(rng.integers(0, 100 - 16))
            c[p: p + 16] = 0
        seqs.append(letters[c].tobytes())
    seqs.append(b"A" * 100)  # the probing poly-A read (second chunk)
    data = np.frombuffer(b"".join(seqs), dtype=np.uint8)
    seq_len = np.array([len(s) for s in seqs], dtype=np.int64)
    seq_off = np.zeros(len(seqs), dtype=np.int64)
    seq_off[1:] = np.cumsum(seq_len[:-1])
    got = native.match_find(data, seq_off, seq_len, min(M.THRESHOLDS))
    codes = [M._B2C0[np.frombuffer(s, dtype=np.uint8)] for s in seqs]
    want = M.find_matches(codes)
    assert got == want, "native selection diverged from the oracle"


@pytest.mark.slow
def test_match_find_polya_terminates():
    """Regression (round-4 ADVICE high severity): the candidate-dedup set
    is now sized by the ACTUAL sampled-k-mer counts, so low-complexity
    reads cannot overflow it. Runs the PoC in a subprocess so a
    regression fails the test instead of hanging the suite."""
    if not native.has_matcher():
        pytest.skip("native matcher unavailable")
    import os
    import subprocess
    import sys
    here = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "import test_match; test_match._polya_poc_check(); print('OK')"
         % here],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(here))
    assert r.returncode == 0 and "OK" in r.stdout, r.stdout + r.stderr


def test_match_override_without_match_bits_is_ignored():
    """match=True on a geometry without the match-context family
    (match_bits=0, e.g. L3) must be skipped identically on both host
    paths — the flag alone cannot change the format."""
    data = _match_data(1200)
    kw = dict(level=3, match=True, lanes=32, aux_lanes=8,
              block_records=1200)
    a = encode_fastq(data, use_native=False, **kw)
    assert not _used_match(a)
    assert a == encode_fastq(data, level=3, lanes=32, aux_lanes=8,
                             block_records=1200, use_native=False)
    if native.available():
        assert a == encode_fastq(data, use_native=True, **kw)
    assert decode_fastq(a) == data


def test_v5_block_header_flags_roundtrip():
    """flags/seq_order bytes survive the container framing."""
    data = _match_data(600)  # < MATCH_CHUNK records per... one block
    cfg = config_for_level(4, lanes=32, aux_lanes=8, block_records=600)
    enc = encode_fastq(data, cfg=cfg, use_native=False)
    f = io.BytesIO(enc)
    rcfg = container.read_header(f)
    assert rcfg.fmt == 5
    blks = list(container.iter_blocks(f, rcfg))
    # 600 reads x 150bp < ORDER_FALLBACK_BASES: L4 order-11 falls to 10
    # and the qual delta ingredient is dropped (QUAL_NODELTA)
    assert all(b.seq_order == 10 for b in blks)
    assert all(b.flags == QUAL_NODELTA for b in blks)
    # <= MATCH_CHUNK records: chunk 0 can never match
    assert not any(b.flags & MATCH_USED for b in blks)
    assert decode_fastq(enc) == data
