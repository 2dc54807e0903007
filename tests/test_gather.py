"""Device-side ordered ragged gather (SURVEY.md §5 comm backend; round-2
VERDICT missing #3): the collective path must (a) actually lower to an
all-gather HLO over the mesh axis and (b) reproduce the host shard-merge
result byte-for-byte, including as the transport for whole container
shards feeding the multihost merge."""

import numpy as np
import pytest

import jax

from slimfastq_tpu.parallel import gather, mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return pmesh.make_mesh(8)


def test_ragged_all_gather_matches_host_concat(mesh8):
    rng = np.random.default_rng(5)
    shards = [rng.integers(0, 256, size=int(n)).astype(np.uint8)
              for n in rng.integers(0, 5000, size=8)]
    shards[3] = np.zeros(0, np.uint8)   # empty shard
    got = gather.ragged_all_gather(mesh8, shards)
    want = b"".join(s.tobytes() for s in shards)
    assert got == want


def test_gather_lowers_to_all_gather_collective(mesh8):
    hlo = gather.gather_hlo(mesh8)
    assert "all-gather" in hlo, hlo[:2000]


def test_container_shards_via_device_gather(mesh8, tmp_path):
    """End-to-end: the multi-host workflow's per-process container shards
    ride the device collective to the writing host, then merge into the
    byte-identical single-process container."""
    from slimfastq_tpu.api import encode_fastq
    from slimfastq_tpu.ops import streams_np
    from slimfastq_tpu.parallel import multihost
    from slimfastq_tpu.utils.synth import synth_fastq
    from slimfastq_tpu.utils.fastq import parse_fastq_bytes, serialize_fastq
    from slimfastq_tpu.api import _batch_slice

    data = synth_fastq(8 * 24 + 9, read_len=30, seed=21, var_len=True)
    batch = parse_fastq_bytes(data)
    BR = 24
    kw = dict(level=1, lanes=8, aux_lanes=4, block_records=BR,
              backend=streams_np, use_native=False)
    shards = []
    for p in range(8):
        ranges = multihost.process_block_ranges(len(batch), BR, 8, p)
        part = b"".join(serialize_fastq(_batch_slice(batch, lo, hi))
                        for lo, hi in ranges)
        shards.append(encode_fastq(part, **kw))
    gathered = gather.ragged_all_gather(mesh8, shards, return_parts=True)
    merged = multihost.merge_containers([p.tobytes() for p in gathered])
    assert merged == encode_fastq(data, **kw)
