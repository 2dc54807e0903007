"""Bounded-memory streaming + sharded encode/decode (VERDICT r2 item 4,
SURVEY.md §2 container row: multi-device encode of 100GB-class files).

Asserts: (a) the streaming sharded container is byte-identical to the
sequential whole-file encode, (b) the in-flight prep window is bounded by
window_blocks (the RSS bound — each prepared block holds the only copy of
its raw bytes), (c) resume after a mid-file crash reproduces the
sequential bytes, (d) the streaming sharded decode round-trips.
"""

import numpy as np
import pytest

import jax

from slimfastq_tpu import api, native
from slimfastq_tpu.config import config_for_level
from slimfastq_tpu.parallel import mesh as pmesh
from slimfastq_tpu.parallel import sharded
from slimfastq_tpu.utils.synth import synth_fastq

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="needs the native host library")


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return pmesh.make_mesh(8)


CFG = dict(lanes=64, aux_lanes=16, block_records=256)


@pytest.fixture(scope="module")
def data():
    # 8+ blocks with a ragged tail; N runs + var lengths
    return synth_fastq(256 * 8 + 77, read_len=40, seed=3, var_len=True,
                       n_rate=0.01)


@pytest.fixture(scope="module")
def sequential(data):
    return api.encode_fastq(data, cfg=config_for_level(2, **CFG))


def test_streaming_sharded_encode_bytes_and_window(tmp_path, data,
                                                   sequential, mesh8,
                                                   monkeypatch):
    src = tmp_path / "in.fastq"
    src.write_bytes(data)
    dst = tmp_path / "out.sfq"
    window_sizes = []
    real = sharded.encode_prepared_blocks_sharded

    def spy(pres, cfg, mesh):
        window_sizes.append(len(pres))
        return real(pres, cfg, mesh)

    monkeypatch.setattr(sharded, "encode_prepared_blocks_sharded", spy)
    # tiny chunk_bytes forces record carries across many read chunks
    sharded.encode_file_streaming_sharded(
        str(src), str(dst), level=2, mesh=mesh8, chunk_bytes=1 << 14,
        window_blocks=3, **CFG)
    assert dst.read_bytes() == sequential
    assert window_sizes and max(window_sizes) <= 3, window_sizes


@pytest.mark.slow  # scale coverage; core format suite skips
def test_streaming_sharded_resume(tmp_path, data, sequential, mesh8):
    src = tmp_path / "in.fastq"
    src.write_bytes(data)
    dst = tmp_path / "part.sfq"
    sharded.encode_file_streaming_sharded(
        str(src), str(dst), level=2, mesh=mesh8, window_blocks=2, **CFG)
    whole = dst.read_bytes()
    assert whole == sequential
    # crash simulation: drop the index and the tail of the blocks
    dst.write_bytes(whole[: int(len(whole) * 0.55)])
    sharded.encode_file_streaming_sharded(
        str(src), str(dst), level=2, mesh=mesh8, window_blocks=2,
        resume=True)
    assert dst.read_bytes() == sequential


@pytest.mark.slow  # scale coverage; core format suite skips
def test_streaming_sharded_decode_roundtrip(tmp_path, data, sequential,
                                            mesh8):
    enc = tmp_path / "in.sfq"
    enc.write_bytes(sequential)
    out = tmp_path / "out.fastq"
    sharded.decode_file_streaming_sharded(str(enc), str(out), mesh=mesh8,
                                          window_blocks=3)
    assert out.read_bytes() == data


@pytest.mark.slow  # scale coverage; core format suite skips
def test_cli_streaming_sharded(tmp_path, data, sequential):
    from slimfastq_tpu.cli import main
    src = tmp_path / "in.fastq"
    src.write_bytes(data)
    enc = tmp_path / "o.sfq"
    dec = tmp_path / "o.fastq"
    # CLI default config differs from CFG; assert self-consistency instead
    assert main([str(src), "-o", str(enc), "-2", "-f", "--streaming",
                 "--sharded"]) == 0
    assert main(["-d", str(enc), "-o", str(dec), "-f", "--streaming",
                 "--sharded"]) == 0
    assert dec.read_bytes() == data
    # and the CLI streaming+sharded container equals the plain CLI encode
    enc2 = tmp_path / "p.sfq"
    assert main([str(src), "-o", str(enc2), "-2", "-f"]) == 0
    assert enc.read_bytes() == enc2.read_bytes()
