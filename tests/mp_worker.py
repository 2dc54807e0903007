"""Worker process for the real multi-process multi-host test
(tests/test_multiprocess.py). Each worker joins the jax.distributed
coordination service (localhost coordinator, CPU backend), encodes its
contiguous block range of the shared input, and writes one shard
container — exactly the documented multi-host workflow in
parallel/multihost.py.
"""

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    src, out = sys.argv[4], sys.argv[5]
    block_records = int(sys.argv[6])

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from slimfastq_tpu.parallel import multihost
    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)
    # Prove real cross-process coordination through the jax.distributed
    # coordination service: every worker publishes a key and blocks until
    # it sees every other worker's key (a barrier via the KV store). This
    # is the strongest check available on a CPU-backend jaxlib without
    # cross-process collectives support.
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    assert client is not None, "jax.distributed did not initialise"
    client.key_value_set(f"sfq_mp_test/w{pid}", "up")
    for q in range(nproc):
        got = client.blocking_key_value_get(f"sfq_mp_test/w{q}", 60000)
        assert got == "up", got

    with open(src, "rb") as f:
        data = f.read()
    from slimfastq_tpu.api import _batch_slice, encode_fastq
    from slimfastq_tpu.ops import streams_jax
    from slimfastq_tpu.utils.fastq import parse_fastq_bytes, serialize_fastq

    batch = parse_fastq_bytes(data)
    ranges = multihost.process_block_ranges(len(batch), block_records,
                                            nproc, pid)
    part = b"".join(serialize_fastq(_batch_slice(batch, lo, hi))
                    for lo, hi in ranges)
    enc = encode_fastq(part, level=1, lanes=8, aux_lanes=4,
                       block_records=block_records, backend=streams_jax,
                       use_native=False)
    with open(out, "wb") as f:
        f.write(enc)
    return 0


if __name__ == "__main__":
    sys.exit(main())
