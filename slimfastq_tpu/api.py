"""Top-level encode/decode API over whole FASTQ files.

Host path selection: the C++/vectorised-NumPy pipeline (pipeline_native)
when the native library is available, else the pure-Python reference
pipeline. Both produce byte-identical containers (tested)."""

from __future__ import annotations

import io
import os
from collections import deque

import numpy as np

from . import container, native
from .config import CodecConfig, config_for_level
from .pipeline import decode_block, encode_block
from .ops import streams_np
from .utils.fastq import FastqBatch, parse_fastq_bytes, serialize_fastq


def _batch_slice(b: FastqBatch, lo: int, hi: int) -> FastqBatch:
    return FastqBatch(b.ids[lo:hi], b.seqs[lo:hi], b.pluses[lo:hi],
                      b.quals[lo:hi])


def _pipe_depth() -> int:
    """Blocks of host work kept in flight ahead of the device in the
    staged encode/decode pipelines (>= 2 overlaps host and device across
    block boundaries; SFQ_PIPE_DEPTH=1 restores the two-stage shape)."""
    return max(1, int(os.environ.get("SFQ_PIPE_DEPTH", "2")))


def _batch_window(cfg: CodecConfig, backend, attr: str) -> int:
    """Blocks per device dispatch in the native encode/decode paths.
    Blocks that underfill the W coder lanes pay fixed per-dispatch cost
    (a 16k-record block runs the 1024-lane kernels 4x underfilled), so
    small blocks batch through the vmapped multi-block kernels
    (streams_jax.*_blocks; round-4 VERDICT next #3). Only engages when
    the backend exposes the batched surface. SFQ_BATCH_BLOCKS=1
    disables, =n forces a window of n."""
    if not hasattr(backend, attr):
        return 1
    env = os.environ.get("SFQ_BATCH_BLOCKS")
    if env:
        return max(1, int(env))
    return max(1, min(8, 65536 // max(cfg.block_records, 1)))


def encode_fastq(data: bytes, cfg: CodecConfig | None = None,
                 level: int = 3, backend=streams_np,
                 use_native: bool | None = None, **overrides) -> bytes:
    cfg = cfg or config_for_level(level, **overrides)
    if use_native is None:
        use_native = native.available()
    out = io.BytesIO()
    container.write_header(out, cfg)
    offsets = []
    if use_native:
        from concurrent.futures import ThreadPoolExecutor
        from .pipeline_native import (encode_prepared_block,
                                      prepare_block_fast)
        buf = np.frombuffer(data, dtype=np.uint8)
        idx, n = native.fastq_index(data)
        ranges = [(lo, min(lo + cfg.block_records, n))
                  for lo in range(0, max(n, 1), cfg.block_records)]
        # three-stage pipeline (prep || device || write): a prep pool
        # keeps up to `depth` blocks of host modelling (C++/NumPy,
        # releases the GIL) in flight ahead of the device; the main
        # thread codes blocks on the (single) device serially; a
        # one-worker writer executor overlaps container framing/CRC/IO
        # with the next block's device work. FIFO submission to the
        # 1-worker writer preserves block order, so the container is
        # byte-identical to the serial path.
        depth = _pipe_depth()
        wb = _batch_window(cfg, backend, "encode_seq_qual_raw_blocks")
        ahead = depth + wb - 1
        with native.pipeline_omp_cap(), \
                ThreadPoolExecutor(max_workers=depth) as prep_ex, \
                ThreadPoolExecutor(max_workers=1) as write_ex:
            pfuts = deque(prep_ex.submit(prepare_block_fast, buf, idx,
                                         *ranges[j], cfg, backend)
                          for j in range(min(ahead, len(ranges))))
            ns = len(pfuts)
            wfuts = []
            done = 0
            while done < len(ranges):
                take = min(wb, len(ranges) - done)
                pres = []
                for _ in range(take):
                    pres.append(pfuts.popleft().result())
                    if ns < len(ranges):
                        pfuts.append(prep_ex.submit(
                            prepare_block_fast, buf, idx, *ranges[ns],
                            cfg, backend))
                        ns += 1
                if take == 1:
                    blks = [encode_prepared_block(pres[0], cfg, backend)]
                else:
                    from .parallel.sharded import \
                        encode_prepared_blocks_sharded
                    blks = encode_prepared_blocks_sharded(
                        pres, cfg, None, dev=backend, backend=backend)
                for blk in blks:
                    wfuts.append(write_ex.submit(container.write_block,
                                                 out, blk))
                done += take
            offsets = [wf.result() for wf in wfuts]
    else:
        batch = parse_fastq_bytes(data)
        for lo in range(0, max(len(batch), 1), cfg.block_records):
            blk = encode_block(_batch_slice(batch, lo,
                                            lo + cfg.block_records),
                               cfg, backend=backend)
            offsets.append(container.write_block(out, blk))
    container.write_index(out, offsets)
    return out.getvalue()


def decode_fastq(data: bytes, backend=streams_np,
                 use_native: bool | None = None) -> bytes:
    f = io.BytesIO(data)
    cfg = container.read_header(f)
    if use_native is None:
        use_native = native.available()
    parts = []
    if use_native:
        from concurrent.futures import ThreadPoolExecutor
        from .pipeline_native import (decode_block_device,
                                      decode_block_finish)
        # three-stage pipeline (read || device || finish): a one-worker
        # reader prefetches block k+1's container bytes while block k is
        # on the device; up to `depth` host finishes (ID chain decode +
        # assembly, release the GIL) run behind the device. Results are
        # collected in submission order. Small blocks decode in windows
        # through the batched multi-block kernels instead
        # (_batch_window).
        depth = _pipe_depth()
        wb = _batch_window(cfg, backend, "decode_seq_qual_raw_blocks")
        with native.pipeline_omp_cap(), \
                ThreadPoolExecutor(max_workers=depth) as fin_ex, \
                ThreadPoolExecutor(max_workers=1) as read_ex:
            gen = container.iter_blocks(f, cfg)
            rfut = read_ex.submit(next, gen, None)
            if wb > 1:
                from .parallel.sharded import decode_blocks_sharded
                blocks = []
                while True:
                    blk = rfut.result()
                    if blk is None:
                        break
                    rfut = read_ex.submit(next, gen, None)
                    blocks.append(blk)
                    if len(blocks) >= wb:
                        parts.extend(decode_blocks_sharded(
                            blocks, cfg, None, dev=backend,
                            backend=backend))
                        blocks = []
                if blocks:
                    parts.extend(decode_blocks_sharded(
                        blocks, cfg, None, dev=backend, backend=backend))
            else:
                futs = deque()
                while True:
                    blk = rfut.result()
                    if blk is None:
                        break
                    rfut = read_ex.submit(next, gen, None)
                    inter = decode_block_device(blk, cfg, backend)
                    futs.append(fin_ex.submit(decode_block_finish, inter,
                                              cfg))
                    while len(futs) > depth:
                        parts.append(futs.popleft().result())
                while futs:
                    parts.append(futs.popleft().result())
    else:
        for blk in container.iter_blocks(f, cfg):
            parts.append(serialize_fastq(decode_block(blk, cfg,
                                                      backend=backend)))
    return b"".join(parts)


def encode_file(src: str, dst: str, level: int = 3, backend=streams_np,
                **overrides) -> None:
    with open(src, "rb") as f:
        data = f.read()
    with open(dst, "wb") as f:
        f.write(encode_fastq(data, level=level, backend=backend, **overrides))


def _record_boundary(chunk: bytes) -> int:
    """Largest prefix of `chunk` ending on a 4-line record boundary."""
    nls = np.flatnonzero(np.frombuffer(chunk, dtype=np.uint8) == 10)
    keep_nl = (len(nls) // 4) * 4
    if keep_nl == 0:
        return 0
    return int(nls[keep_nl - 1]) + 1


def iter_block_ranges_native(src: str, cfg: CodecConfig,
                             chunk_bytes: int = 1 << 28):
    """Yield (buf, idx, lo, hi) record ranges whose block boundaries are
    identical to a whole-file encode, while reading `src` in bounded
    chunks: whole leftover records carry over between chunks as bytes.
    The shared walk under encode_file_streaming and the sharded
    streaming encode (parallel/sharded.py)."""
    carry = b""
    with open(src, "rb") as f:
        while True:
            chunk = carry + f.read(chunk_bytes)
            if not chunk:
                break
            eof = len(chunk) < len(carry) + chunk_bytes
            cut = len(chunk) if eof else _record_boundary(chunk)
            data, carry = chunk[:cut], chunk[cut:]
            if not data:
                if eof:
                    break
                continue
            buf = np.frombuffer(data, dtype=np.uint8)
            idx, n = native.fastq_index(data)
            full = (n // cfg.block_records) * cfg.block_records
            limit = n if eof else full
            for lo in range(0, limit, cfg.block_records):
                yield buf, idx, lo, min(lo + cfg.block_records, limit)
            if limit < n:
                start = int(idx["id_off"][limit]) - 1
                carry = data[start:] + carry
            if eof:
                break


def encode_file_streaming(src: str, dst: str, level: int = 3,
                          backend=streams_np, chunk_bytes: int = 1 << 28,
                          resume: bool = False, **overrides) -> None:
    """Stream a large (100GB-class) FASTQ through the encoder with bounded
    memory: reads chunk_bytes at a time, encodes whole blocks, appends them
    via the resumable container.Writer. With resume=True, continues an
    interrupted output file after its last complete block.

    Output is byte-identical to encode_fastq on the same data as long as
    chunk boundaries land on block_records multiples, which this function
    guarantees by carrying remainder records between chunks.
    """
    cfg = config_for_level(level, **overrides)
    skip_records = 0
    if resume:
        w, skip_records = container.Writer.resume(dst)
        cfg = w.cfg
    else:
        w = container.Writer.create(dst, cfg)
    if native.available():
        # production path: index + native block pipeline over the shared
        # bounded-chunk block walk (block boundaries match the
        # non-streaming encode exactly), staged as prep || device ||
        # append (same three-stage shape as encode_fastq; memory stays
        # bounded at `depth` prepared blocks + one chunk)
        from concurrent.futures import ThreadPoolExecutor
        from .pipeline_native import (encode_prepared_block,
                                      prepare_block_fast)
        depth = _pipe_depth()
        seen = 0
        with native.pipeline_omp_cap(), \
                ThreadPoolExecutor(max_workers=depth) as prep_ex, \
                ThreadPoolExecutor(max_workers=1) as write_ex:
            pfuts: deque = deque()
            wfuts: deque = deque()

            def _code_oldest():
                blk = encode_prepared_block(pfuts.popleft().result(), cfg,
                                            backend)
                wfuts.append(write_ex.submit(w.append, blk))
                while len(wfuts) > 2:   # surface write errors promptly
                    wfuts.popleft().result()
            for buf, idx, lo, hi in iter_block_ranges_native(src, cfg,
                                                             chunk_bytes):
                g_hi = seen + (hi - lo)
                if g_hi > skip_records:  # else: already in resumed output
                    pfuts.append(prep_ex.submit(prepare_block_fast, buf,
                                                idx, lo, hi, cfg, backend))
                    while len(pfuts) >= depth:
                        _code_oldest()
                seen = g_hi
            while pfuts:
                _code_oldest()
            while wfuts:
                wfuts.popleft().result()
        w.close()
        return
    carry = b""                  # partial-record and leftover-record bytes
    batch_carry: FastqBatch | None = None   # non-native fallback carry
    seen = 0
    with open(src, "rb") as f:
        while True:
            chunk = carry + f.read(chunk_bytes)
            if not chunk:
                break
            eof = len(chunk) < len(carry) + chunk_bytes
            cut = len(chunk) if eof else _record_boundary(chunk)
            data, carry = chunk[:cut], chunk[cut:]
            if not data:
                if eof:
                    break
                continue
            batch = parse_fastq_bytes(data)
            if batch_carry is not None:
                batch = FastqBatch(batch_carry.ids + batch.ids,
                                   batch_carry.seqs + batch.seqs,
                                   batch_carry.pluses + batch.pluses,
                                   batch_carry.quals + batch.quals)
            n = len(batch)
            full = (n // cfg.block_records) * cfg.block_records
            limit = n if eof else full
            for lo in range(0, limit, cfg.block_records):
                hi = min(lo + cfg.block_records, limit)
                if seen + hi <= skip_records:
                    continue  # already in the resumed output
                blk = encode_block(_batch_slice(batch, lo, hi), cfg,
                                   backend=backend)
                w.append(blk)
            seen += limit
            batch_carry = _batch_slice(batch, limit, n) if limit < n else None
            if eof:
                break
    if batch_carry is not None and len(batch_carry):
        blk = encode_block(batch_carry, cfg, backend=backend)
        w.append(blk)
    w.close()


def decode_file_streaming(src: str, dst: str, backend=streams_np,
                          use_native: bool | None = None) -> None:
    """Bounded-memory decode of a 100GB-class container: blocks are read
    (seek-based, via the index and the v2 length prefixes), decoded and
    written one at a time, so RSS is bounded by a few blocks regardless of
    container size (SURVEY.md §5 checkpoint/resume scale target)."""
    if use_native is None:
        use_native = native.available()
    with open(src, "rb") as f, open(dst, "wb") as out:
        cfg = container.read_header(f)
        if use_native:
            from concurrent.futures import ThreadPoolExecutor
            from .pipeline_native import (decode_block_device,
                                          decode_block_finish)
            # read || device || finish, bounded at `depth` blocks in
            # flight (same shape as decode_fastq)
            depth = _pipe_depth()
            with native.pipeline_omp_cap(), \
                    ThreadPoolExecutor(max_workers=depth) as fin_ex, \
                    ThreadPoolExecutor(max_workers=1) as read_ex:
                gen = container.iter_blocks(f, cfg)
                rfut = read_ex.submit(next, gen, None)
                futs: deque = deque()
                while True:
                    blk = rfut.result()
                    if blk is None:
                        break
                    rfut = read_ex.submit(next, gen, None)
                    inter = decode_block_device(blk, cfg, backend)
                    futs.append(fin_ex.submit(decode_block_finish, inter,
                                              cfg))
                    while len(futs) > depth:
                        out.write(futs.popleft().result())
                while futs:
                    out.write(futs.popleft().result())
        else:
            for blk in container.iter_blocks(f, cfg):
                out.write(serialize_fastq(decode_block(blk, cfg,
                                                       backend=backend)))


def decode_file(src: str, dst: str, backend=streams_np) -> None:
    decode_file_streaming(src, dst, backend=backend)
