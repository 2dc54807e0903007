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
