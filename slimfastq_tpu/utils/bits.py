"""Small host-side byte utilities: LEB128 varints + zigzag."""

from __future__ import annotations


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def put_varint(out: bytearray, v: int) -> None:
    assert v >= 0
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


MAX_VARINT_BYTES = 10  # bounds any u64; mirrors native/host.cpp get_varint


def get_varint(buf, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    end = len(buf)
    for _ in range(MAX_VARINT_BYTES):
        if pos >= end:
            raise ValueError("truncated varint (corrupt stream)")
        b = int(buf[pos])  # int() guards numpy uint8 buffers: a raw
        pos += 1           # uint8 would wrap in the << shift below
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, pos
        shift += 7
    raise ValueError("overlong varint (corrupt stream)")


def put_svarint(out: bytearray, v: int) -> None:
    put_varint(out, zigzag(v))


def get_svarint(buf, pos: int) -> tuple[int, int]:
    u, pos = get_varint(buf, pos)
    return unzigzag(u), pos
