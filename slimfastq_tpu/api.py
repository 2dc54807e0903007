"""Top-level encode/decode API over whole FASTQ files."""

from __future__ import annotations

import io
from typing import BinaryIO

from . import container
from .config import CodecConfig, config_for_level
from .pipeline import decode_block, encode_block
from .ops import streams_np
from .utils.fastq import FastqBatch, parse_fastq_bytes, serialize_fastq


def _batch_slice(b: FastqBatch, lo: int, hi: int) -> FastqBatch:
    return FastqBatch(b.ids[lo:hi], b.seqs[lo:hi], b.pluses[lo:hi],
                      b.quals[lo:hi])


def encode_fastq(data: bytes, cfg: CodecConfig | None = None,
                 level: int = 3, backend=streams_np, **overrides) -> bytes:
    cfg = cfg or config_for_level(level, **overrides)
    batch = parse_fastq_bytes(data)
    out = io.BytesIO()
    container.write_header(out, cfg)
    offsets = []
    for lo in range(0, max(len(batch), 1), cfg.block_records):
        blk = encode_block(_batch_slice(batch, lo, lo + cfg.block_records),
                           cfg, backend=backend)
        offsets.append(container.write_block(out, blk))
    container.write_index(out, offsets)
    return out.getvalue()


def decode_fastq(data: bytes, backend=streams_np) -> bytes:
    f = io.BytesIO(data)
    cfg = container.read_header(f)
    parts = []
    for blk in container.iter_blocks(f):
        parts.append(serialize_fastq(decode_block(blk, cfg, backend=backend)))
    return b"".join(parts)


def encode_file(src: str, dst: str, level: int = 3, backend=streams_np,
                **overrides) -> None:
    with open(src, "rb") as f:
        data = f.read()
    with open(dst, "wb") as f:
        f.write(encode_fastq(data, level=level, backend=backend, **overrides))


def decode_file(src: str, dst: str, backend=streams_np) -> None:
    with open(src, "rb") as f:
        data = f.read()
    with open(dst, "wb") as f:
        f.write(decode_fastq(data, backend=backend))
