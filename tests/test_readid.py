"""Read-ID tokenizer / delta-model unit tests (SURVEY.md §4 item 1)."""

from slimfastq_tpu.models import readid


def test_tokenize():
    toks = readid.tokenize(b"SIM01:23:H7QQQ:1:1101:1000:2000")
    assert toks[0] == (False, b"SIM")
    assert toks[1] == (True, b"01")
    assert b"".join(t for _, t in toks) == b"SIM01:23:H7QQQ:1:1101:1000:2000"


def test_delta_roundtrip_increment():
    prev = b"SIM:1:1101:1000:2000"
    cur = b"SIM:1:1101:1003:2001"
    d = readid.try_delta(prev, cur)
    assert d == [0, 0, 3, 1]
    assert readid.apply_delta(prev, d) == cur


def test_leading_zero_width_preserved():
    prev = b"run007x"
    cur = b"run008x"
    d = readid.try_delta(prev, cur)
    assert d == [1]
    assert readid.apply_delta(prev, d) == cur


def test_leading_zero_mismatch_is_exception():
    # rendering 10 with width-2 zero pad gives b"10", but cur says b"010"
    assert readid.try_delta(b"t09", b"t010") is None


def test_structure_change_is_exception():
    assert readid.try_delta(b"a:1:2", b"a:1") is None
    assert readid.try_delta(b"a:1", b"b:1") is None


def test_huge_digit_run_opaque():
    big = b"x" + b"9" * 30 + b":1"
    cur = b"x" + b"9" * 30 + b":2"
    d = readid.try_delta(big, cur)
    assert d == [0, 1]
    assert readid.apply_delta(big, d) == cur


def test_encode_decode_record_roundtrip():
    ids = [b"SIM:1:1101:1000:2000", b"SIM:1:1101:1004:2001",
           b"totally different", b"SIM:1:1101:1010:2003"]
    delta, exc = bytearray(), bytearray()
    flags = []
    for i, cur in enumerate(ids):
        prev = ids[i - 1] if i else None
        flags.append(readid.encode_record_id(prev, cur, delta, exc))
    out, dpos, xpos = [], 0, 0
    for i, f in enumerate(flags):
        prev = out[i - 1] if i else None
        rid, dpos, xpos = readid.decode_record_id(prev, f, delta, dpos,
                                                  exc, xpos)
        out.append(rid)
    assert out == ids


def test_delta_bias_roundtrip():
    """Format v3: numeric deltas are stored biased by -Wa so a per-record
    counter advancing by Wa along a lane chain stores zigzag(0)."""
    prev, cur = b"SRR1.100 x", b"SRR1.164 x"   # counter +64
    dl, xl = bytearray(), bytearray()
    flag = readid.encode_record_id(prev, cur, dl, xl, delta_bias=64)
    # token "1" (static): 0-64 -> zigzag(-64)=0x7f; counter 164-100-64=0
    assert flag == 0 and bytes(dl) == b"\x7f\x00"
    got, dp, xp = readid.decode_record_id(prev, 0, bytes(dl), 0, b"", 0,
                                          delta_bias=64)
    assert got == cur


def test_delta_bias_opaque_token_unbiased():
    """Opaque (>MAX_DIGITS) identical digit tokens store a literal 0 the
    decoder ignores — the bias must not corrupt them."""
    big = b"9" * 30
    prev = b"a" + big + b".5"
    cur = b"a" + big + b".13"
    dl, xl = bytearray(), bytearray()
    flag = readid.encode_record_id(prev, cur, dl, xl, delta_bias=8)
    assert flag == 0
    got, _, _ = readid.decode_record_id(prev, 0, bytes(dl), 0, b"", 0,
                                        delta_bias=8)
    assert got == cur


def test_v3_prologue_and_lane_chains_pin():
    """Pin the v3 per-record baseline rule end-to-end: records r < Wa
    delta against r-1 (no absolute heads beyond record 0), records
    r >= Wa against r-Wa."""
    import io
    import numpy as np
    from slimfastq_tpu import api, container
    from slimfastq_tpu.ops import streams_np
    recs = b"".join(b"@r%d\nAC\n+\nII\n" % i for i in range(20))
    enc = api.encode_fastq(recs, level=1, lanes=8, aux_lanes=4,
                           backend=streams_np, use_native=False)
    f = io.BytesIO(enc)
    cfg = container.read_header(f)
    assert cfg.fmt >= 3  # v4 keeps the v3 lane-local baseline rule
    blk = container.read_block(f, cfg.fmt)
    # only record 0 is an absolute ID (varint(2) + b"r0" = 3 raw symbols
    # in the exception stream): every other record delta-chains
    # (prologue r-1 for r<4, lane-local r-4 after)
    assert int(np.asarray(blk.streams["IDX"].sym_counts).sum()) == 3
    assert api.decode_fastq(enc, use_native=False) == recs
