#!/usr/bin/env python
"""Measure the ordered-gather trade-off (round-3 VERDICT weak #5):
host-side shard merge (parallel/multihost.merge_containers) vs the
device collective path (parallel/gather.ragged_all_gather) on the
8-device virtual CPU mesh, for realistic shard sizes.

The docstring claim in parallel/gather.py ("the collective only wins
when the shards originate ON the devices") is backed by the numbers this
prints; they are recorded in BASELINE.md.

Usage: python tools/gather_tradeoff.py [shard_mb]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402


def main() -> None:
    shard_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    from slimfastq_tpu.api import encode_fastq
    from slimfastq_tpu.parallel import multihost
    from slimfastq_tpu.parallel.gather import ragged_all_gather
    from slimfastq_tpu.parallel import mesh as pmesh
    from slimfastq_tpu.utils.synth import synth_fastq

    D = 8
    mesh = pmesh.make_mesh(D)
    # build D container shards of ~shard_mb each (1 block per shard)
    reads = max(int(shard_mb * 1e6 / 50), 256)
    shards = []
    for d in range(D):
        data = synth_fastq(reads, read_len=100, seed=d)
        shards.append(encode_fastq(data, level=1, block_records=reads,
                                   lanes=256, aux_lanes=32))
    sizes = [len(s) for s in shards]
    print(f"{D} shards, {sum(sizes)/1e6:.1f} MB total "
          f"(~{np.mean(sizes)/1e6:.2f} MB each)")

    def tmin(fn, n=5):
        best = float("inf")
        out = None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_host, merged = tmin(lambda: multihost.merge_containers(shards))
    print(f"host merge_containers:   {t_host*1e3:8.2f} ms "
          f"(zero device memory, one host copy)")

    # collective: payloads placed on the mesh, gathered, trimmed on host.
    # Includes the device_put (the shards start host-resident here — on a
    # pod with device-resident payloads that cost disappears, which is
    # exactly the regime the collective is for).
    t_coll, _ = tmin(lambda: ragged_all_gather(mesh, shards))
    print(f"ragged_all_gather (incl. h2d): {t_coll*1e3:8.2f} ms "
          f"(payload lands replicated on all {D} devices: "
          f"{D*max(sizes)/1e6:.1f} MB device memory)")

    # collective without the h2d (device-resident source): pre-place once
    from jax.sharding import NamedSharding, PartitionSpec as P
    axis = list(mesh.shape.keys())[0]
    lens = np.array([len(s) for s in shards], dtype=np.int32)
    Lp = int(lens.max())
    mat = np.zeros((D, Lp), dtype=np.uint8)
    for d, s in enumerate(shards):
        mat[d, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    x = jax.device_put(mat, NamedSharding(mesh, P(axis, None)))
    ls = jax.device_put(lens, NamedSharding(mesh, P(axis)))

    def gather(x, l):
        return (jax.lax.all_gather(x, axis, tiled=True),
                jax.lax.all_gather(l, axis, tiled=True))
    f = jax.jit(jax.shard_map(gather, mesh=mesh,
                              in_specs=(P(axis, None), P(axis)),
                              out_specs=(P(), P()), check_vma=False))
    f(x, ls)  # compile
    def run():
        pay, ln = f(x, ls)
        pay.block_until_ready()
        return pay, ln
    t_dev, (pay, ln) = tmin(run)
    # host trim+concat of the replicated result
    t_trim, _ = tmin(lambda: b"".join(
        np.asarray(pay)[d, : int(np.asarray(ln)[d])].tobytes()
        for d in range(D)))
    print(f"collective only (device-resident source): {t_dev*1e3:8.2f} ms"
          f" + host trim {t_trim*1e3:.2f} ms")

    # correctness: both orders agree
    coll = ragged_all_gather(mesh, shards)
    assert coll == b"".join(shards)
    print("ordered-gather bytes identical: OK")


if __name__ == "__main__":
    main()
