"""Multi-host pod-slice support (BASELINE.json config #5).

Blocks are fully independent (own adaptive state, delta chains reset per
block — see pipeline.py), so the multi-host strategy is embarrassingly
parallel and bit-exactly equal to a single-host run:

1. ``jax.distributed.initialize()`` (one process per host).
2. Every process takes the record ranges of its assigned blocks
   (``process_block_ranges``) and encodes them on its local devices
   (``parallel.sharded`` within the host).
3. Each host writes its blocks to a shard container; host 0 (or any
   later job) merges shards with ``merge_containers`` — a byte-level
   concatenation + index rebuild, no re-encoding.

Failure recovery: a lost host's blocks are just re-encoded anywhere
(SURVEY.md §5); ``container.Writer.resume`` handles partially written
shards.

The merge path and range assignment are fully tested single-process; the
``initialize`` glue requires a real multi-host slice.
"""

from __future__ import annotations

import io

from .. import container


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Thin wrapper over jax.distributed.initialize (no-op if already
    initialised or single-process)."""
    import jax
    if jax.process_count() > 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process / already initialised


def process_block_ranges(total_records: int, block_records: int,
                         num_processes: int, process_id: int
                         ) -> list[tuple[int, int]]:
    """Contiguous round-robin assignment of blocks to processes; every
    block boundary is a multiple of block_records, so per-process encoding
    is bit-identical to the same blocks of a single-process run."""
    n_blocks = max((total_records + block_records - 1) // block_records, 0)
    out = []
    for b in range(process_id, n_blocks, num_processes):
        lo = b * block_records
        hi = min(lo + block_records, total_records)
        out.append((lo, hi))
    return out


def merge_containers(shard_bytes: list[bytes]) -> bytes:
    """Merge per-host shard containers (in block order across the list)
    into one container — byte-level block concatenation + index rebuild.

    All shards must share an identical header (same config/level)."""
    if not shard_bytes:
        raise ValueError("no shards to merge")
    headers = []
    parts = []
    all_offsets = []
    out = io.BytesIO()
    for i, sb in enumerate(shard_bytes):
        f = io.BytesIO(sb)
        cfg = container.read_header(f)
        header_end = f.tell()
        hdr = sb[:header_end]
        headers.append(hdr)
        if hdr != headers[0]:
            raise ValueError("shard headers differ; cannot merge")
        offsets = container.read_index(f)
        if i == 0:
            out.write(hdr)
        for off in offsets:
            f.seek(0, 2)
            end = f.tell()
            blk_end = container._end_of_block(f, off)
            all_offsets.append(out.tell())
            out.write(sb[off:blk_end])
    container.write_index(out, all_offsets)
    return out.getvalue()


def merge_container_files(shard_paths: list[str], out_path: str) -> None:
    shards = []
    for p in shard_paths:
        with open(p, "rb") as f:
            shards.append(f.read())
    merged = merge_containers(shards)
    with open(out_path, "wb") as f:
        f.write(merged)
