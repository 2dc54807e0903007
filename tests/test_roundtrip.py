"""End-to-end file round-trip tests — the supreme invariant inherited from
slimfastq's sanity target (SURVEY.md §4): decode(encode(x)) == x byte-exact,
per level, plus adversarial inputs."""

import gzip

import numpy as np
import pytest

from slimfastq_tpu.api import decode_fastq, encode_fastq
from slimfastq_tpu.utils.fastq import parse_fastq_bytes, serialize_fastq
from slimfastq_tpu.utils.synth import synth_fastq

SMALL = dict(lanes=32, aux_lanes=8, block_records=256)


def _rt(data: bytes, level: int = 3, **kw):
    kw = {**SMALL, **kw}
    enc = encode_fastq(data, level=level, **kw)
    dec = decode_fastq(enc)
    assert dec == data
    return enc


def test_roundtrip_basic():
    data = synth_fastq(600, read_len=80, seed=2)
    enc = _rt(data)
    assert len(enc) < len(data) // 2


@pytest.mark.parametrize("level", [1, 2, 3, 4])
def test_roundtrip_levels(level):
    data = synth_fastq(400, read_len=70, seed=level, var_len=True,
                       n_rate=0.003)
    _rt(data, level=level)


def test_levels_all_compress():
    # NOTE: deeper levels only win once context tables warm up (large files);
    # on tiny inputs level 1 can be smaller. Size regression across levels is
    # tracked by the bench harness on realistic corpus sizes instead.
    data = synth_fastq(800, read_len=90, seed=9)
    for lv in (1, 3):
        assert len(encode_fastq(data, level=lv, **SMALL)) < len(data) // 2


def test_beats_gzip():
    data = synth_fastq(1500, read_len=100, seed=5)
    enc = encode_fastq(data, level=3, **SMALL)
    assert len(enc) < len(gzip.compress(data, 6))


def test_empty_file():
    assert decode_fastq(encode_fastq(b"", **SMALL)) == b""


def test_single_record():
    data = b"@r1\nACGT\n+\nIIII\n"
    _rt(data)


def test_zero_length_read():
    data = b"@r1\n\n+\n\n@r2\nACGT\n+\nIIII\n"
    _rt(data)


def test_all_n_reads():
    data = b"@r1\nNNNNNNNN\n+\n!!!!!!!!\n@r2\nNNNN\n+\n!!!!\n"
    _rt(data)


def test_all_n_read_costs_constant_exception_bytes():
    """Format v2 codes non-ACGT exceptions as runs: a 200-base N-run costs
    O(1) SEQX bytes, not O(200) (round-1 VERDICT missing #4)."""
    import io
    from slimfastq_tpu import container
    nn = b"@r1\n" + b"N" * 200 + b"\n+\n" + b"I" * 200 + b"\n"
    enc = _rt(nn, level=1)
    f = io.BytesIO(enc)
    cfg = container.read_header(f)
    blk = next(container.iter_blocks(f, cfg))
    assert int(blk.streams["SEQX"].lane_lens.sum()) < 16


def test_n_runs_at_edges():
    data = (b"@r1\nNNACGTNN\n+\nIIIIIIII\n"
            b"@r2\nACNNNNGT\n+\nIIIIIIII\n")
    _rt(data)


def test_lowercase_and_weird_bases():
    data = b"@r1\nacgtRYKM\n+\nIIIIIIII\n"
    _rt(data)


def test_all_same_quality():
    data = b"".join(b"@r%d\nACGTACGT\n+\nIIIIIIII\n" % i for i in range(300))
    enc = _rt(data)
    assert len(enc) < len(data) // 4


def test_max_entropy_quality():
    rng = np.random.default_rng(0)
    recs = []
    for i in range(200):
        q = (rng.integers(0, 64, 50) + 33).astype(np.uint8).tobytes()
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, b"A" * 50, q))
    _rt(b"".join(recs))


def test_wide_quality_alphabet():
    """Quality range > 64 forces the 7-bit tree path."""
    recs = []
    for i in range(100):
        q = bytes(33 + (j * 7 + i) % 90 for j in range(40))
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, b"ACGT" * 10, q))
    _rt(b"".join(recs))


def test_huge_quality_alphabet_depth8():
    """Quality range > 128 must fall back to the 8-bit tree, not silently
    truncate symbols (lossless guarantee — ADVICE.md round-1 high finding)."""
    rng = np.random.default_rng(7)
    recs = []
    for i in range(80):
        # byte values 1..255 excluding newline: range > 128 in every block
        q = rng.integers(1, 256, 30).astype(np.uint8)
        q[q == 10] = 11
        q[0] = 1
        q[1] = 255
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, b"ACG" * 10, q.tobytes()))
    data = b"".join(recs)
    enc = _rt(data)
    # the block must have selected depth 8
    import io
    from slimfastq_tpu import container
    f = io.BytesIO(enc)
    container.read_header(f)
    blk = container.read_block(f)
    assert blk.qual_depth == 8


def test_huge_quality_alphabet_depth8_native():
    from slimfastq_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    recs = []
    for i in range(60):
        q = bytes(((j * 37 + i) % 254) + 1 for j in range(25)).replace(
            b"\n", b"\x0b")
        recs.append(b"@n%d\n%s\n+\n%s\n" % (i, b"ACGTA" * 5, q))
    data = b"".join(recs)
    enc = encode_fastq(data, level=3, use_native=True, **SMALL)
    assert decode_fastq(enc, use_native=True) == data
    assert decode_fastq(enc, use_native=False) == data
    assert encode_fastq(data, level=3, use_native=False, **SMALL) == enc


def test_plus_line_variants():
    data = (b"@r1 x\nACGT\n+\nIIII\n"
            b"@r2 y\nACGT\n+r2 y\nIIII\n"      # id copy
            b"@r3 z\nACGT\n+something else\nIIII\n")
    _rt(data)


def test_variable_lengths_extreme():
    rng = np.random.default_rng(3)
    recs = []
    for i in range(150):
        L = int(rng.integers(0, 200))
        recs.append(b"@v%d\n%s\n+\n%s\n" % (i, (b"ACGTG" * 41)[:L],
                                            (b"HIJKF" * 41)[:L]))
    _rt(b"".join(recs))


def test_multi_block():
    data = synth_fastq(700, read_len=60, seed=4)
    _rt(data, block_records=128)


def test_serialize_parse_inverse():
    data = synth_fastq(50, read_len=30, seed=8)
    assert serialize_fastq(parse_fastq_bytes(data)) == data
