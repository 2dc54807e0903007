"""Sharded block container — the TPU-native replacement for slimfastq's
single-file multiplexed "filer" (SURVEY.md §2 "Container"): instead of
interleaved per-stream pages in one serial file, the container is a header +
a sequence of independently-decodable record-blocks + a trailing index of
block byte-ranges. Independent blocks are what enable data-parallel device
encode/decode, ordered multi-host gather, and resumable partial output
(SURVEY.md §5 failure detection / checkpoint-resume).

Layout (all little-endian):
  header:  magic 'SFQT' | u16 version | u8 level | u8 flags
           | u32 lanes | u32 aux_lanes | u32 block_records
  block:   u32 crc32(body) | body:
           u32 num_records | u8 minq | u8 qual_depth | u16 reserved
           then per stream (fixed STREAMS order):
             varint-delta u32 array: sym_counts  (omitted for streams whose
               counts are derivable: FLAG/SEQ/QUAL)
             varint-delta u32 array: lane_lens
             lane payload bytes (concatenated, unpadded)
  index:   u64 block_offsets[n_blocks] | u32 n_blocks | magic 'SFQE'

varint-delta array: varint(n), then varint(a[0]), then svarint(a[i]-a[i-1]).
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import BinaryIO, Iterator

import numpy as np

from .config import CodecConfig, config_for_level
from .pipeline import STREAMS, EncodedBlock, EncodedStream
from .utils.bits import get_svarint, get_varint, put_svarint, put_varint

MAGIC = b"SFQT"
END_MAGIC = b"SFQE"
VERSION = 1

# streams whose per-lane symbol counts the decoder can derive (FLAG from
# record count; SEQ/QUAL from decoded read lengths) — not stored
IMPLICIT_COUNTS = frozenset({"FLAG", "SEQ", "QUAL"})


def _write_u32_array(out: bytearray, arr: np.ndarray) -> None:
    put_varint(out, len(arr))
    prev = 0
    for v in arr.tolist():
        put_svarint(out, int(v) - prev)
        prev = int(v)


def _read_u32_array(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    n, pos = get_varint(buf, pos)
    if n > (1 << 20):
        raise ValueError(f"implausible lane-array length {n}")
    arr = np.zeros(n, dtype=np.int64)
    prev = 0
    for i in range(n):
        d, pos = get_svarint(buf, pos)
        prev += d
        arr[i] = prev
    return arr, pos


def write_header(f: BinaryIO, cfg: CodecConfig) -> None:
    f.write(MAGIC)
    f.write(struct.pack("<HBBIII", VERSION, cfg.level, 0,
                        cfg.lanes, cfg.aux_lanes, cfg.block_records))


def read_header(f: BinaryIO) -> CodecConfig:
    magic = f.read(4)
    if magic != MAGIC:
        raise ValueError("not an sfq container (bad magic)")
    version, level, _flags, lanes, aux, blockrec = struct.unpack(
        "<HBBIII", f.read(16))
    if version != VERSION:
        raise ValueError(f"unsupported sfq version {version}")
    return config_for_level(level, lanes=lanes, aux_lanes=aux,
                            block_records=blockrec)


def write_block(f: BinaryIO, blk: EncodedBlock) -> int:
    """Append one encoded block (CRC32-protected); returns its start
    offset."""
    off = f.tell()
    body = io.BytesIO()
    body.write(struct.pack("<IBBH", blk.num_records, blk.minq,
                           blk.qual_depth, 0))
    for name in STREAMS:
        es = blk.streams[name]
        hdr = bytearray()
        if name not in IMPLICIT_COUNTS:
            _write_u32_array(hdr, es.sym_counts)
        _write_u32_array(hdr, es.lane_lens)
        body.write(hdr)
        for w in range(len(es.lane_lens)):
            body.write(es.payload[w, : es.lane_lens[w]].tobytes())
    raw = body.getvalue()
    f.write(struct.pack("<I", zlib.crc32(raw)))
    f.write(raw)
    return off


def _read_block_header(buf: bytes, pos: int):
    """Parse one block from a bytes buffer starting at pos.
    Returns (EncodedBlock-with-None-implicit-counts, end_pos).
    Raises ValueError on CRC mismatch."""
    (crc,) = struct.unpack_from("<I", buf, pos)
    start = pos + 4
    pos = start
    num_records, minq, qual_depth, _ = struct.unpack_from("<IBBH", buf, pos)
    pos += 8
    streams = {}
    for name in STREAMS:
        if name not in IMPLICIT_COUNTS:
            sym_counts, pos = _read_u32_array(buf, pos)
        else:
            sym_counts = None
        lane_lens, pos = _read_u32_array(buf, pos)
        maxlen = int(lane_lens.max()) if len(lane_lens) else 0
        payload = np.zeros((len(lane_lens), maxlen), dtype=np.uint8)
        for w in range(len(lane_lens)):
            L = int(lane_lens[w])
            if L:
                payload[w, :L] = np.frombuffer(buf, dtype=np.uint8,
                                               count=L, offset=pos)
                pos += L
        streams[name] = EncodedStream(sym_counts, lane_lens, payload)
    if zlib.crc32(buf[start:pos]) != crc:
        raise ValueError("block CRC mismatch (corrupt container)")
    return EncodedBlock(num_records, minq, qual_depth, streams), pos


def read_block(f: BinaryIO, end: int | None = None) -> EncodedBlock:
    start = f.tell()
    if end is None:
        f.seek(0, 2)
        end = f.tell()
        f.seek(start)
    buf = f.read(end - start)
    blk, used = _read_block_header(buf, 0)
    f.seek(start + used)
    return blk


def write_index(f: BinaryIO, offsets: list[int]) -> None:
    for off in offsets:
        f.write(struct.pack("<Q", off))
    f.write(struct.pack("<I", len(offsets)))
    f.write(END_MAGIC)


def read_index(f: BinaryIO) -> list[int]:
    f.seek(-8, 2)
    n, magic = struct.unpack("<I4s", f.read(8))
    if magic != END_MAGIC:
        raise ValueError("container truncated (bad end magic); "
                         "use recover_blocks() for partial output")
    f.seek(-(8 + 8 * n), 2)
    offs = list(struct.unpack(f"<{n}Q", f.read(8 * n)))
    f.seek(20)
    return offs


def iter_blocks(f: BinaryIO) -> Iterator[EncodedBlock]:
    offsets = read_index(f)
    f.seek(0, 2)
    end = f.tell()
    f.seek(0)
    buf = f.read(end)
    for off in offsets:
        blk, _ = _read_block_header(buf, off)
        yield blk


class Writer:
    """Streaming, resumable container writer.

    Blocks are appended as they are encoded; the index is written at
    close(). If a run is interrupted, the file has blocks but no index —
    ``Writer.resume(path)`` re-scans it (recover_blocks) and continues
    after the last complete block, which is the checkpoint/resume story
    for large multi-block runs (SURVEY.md §5): block granularity, no
    partial state to reconstruct.
    """

    def __init__(self, f: BinaryIO, cfg: CodecConfig,
                 offsets: list[int] | None = None):
        self.f = f
        self.cfg = cfg
        self.offsets = offsets or []
        self.closed = False

    @classmethod
    def create(cls, path: str, cfg: CodecConfig) -> "Writer":
        f = open(path, "wb")
        write_header(f, cfg)
        return cls(f, cfg)

    @classmethod
    def resume(cls, path: str) -> tuple["Writer", int]:
        """Reopen an interrupted container. Returns (writer,
        records_already_written)."""
        with open(path, "rb") as rf:
            cfg, offsets = recover_blocks(rf)
            done_records = 0
            for off in offsets:
                rf.seek(off + 4)  # skip CRC
                n = int.from_bytes(rf.read(4), "little")
                done_records += n
            end = offsets and _end_of_block(rf, offsets[-1])
        f = open(path, "r+b")
        f.seek(end if offsets else 20)
        f.truncate()
        return cls(f, cfg, offsets), done_records

    def append(self, blk: EncodedBlock) -> None:
        assert not self.closed
        self.offsets.append(write_block(self.f, blk))
        self.f.flush()

    def close(self) -> None:
        if not self.closed:
            write_index(self.f, self.offsets)
            self.f.close()
            self.closed = True


def _end_of_block(f: BinaryIO, off: int) -> int:
    f.seek(0, 2)
    end = f.tell()
    f.seek(0)
    buf = f.read(end)
    _, newpos = _read_block_header(buf, off)
    return newpos


def recover_blocks(f: BinaryIO) -> tuple[CodecConfig, list[int]]:
    """Scan a truncated container (no index) and return offsets of every
    complete block — the resume path for interrupted multi-host runs
    (SURVEY.md §5 checkpoint/resume)."""
    f.seek(0)
    cfg = read_header(f)
    start = f.tell()
    f.seek(0, 2)
    end = f.tell()
    f.seek(0)
    buf = f.read(end)
    offsets = []
    pos = start
    while pos < end:
        try:
            _blk, newpos = _read_block_header(buf, pos)
            if newpos > end:
                break
        except (struct.error, IndexError, ValueError):
            break
        offsets.append(pos)
        pos = newpos
    return cfg, offsets
