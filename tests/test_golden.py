"""Golden bit-format tests (SURVEY.md §4 item 1): known inputs must encode
to EXACT checked-in bytes. Any change to a frozen format constant
(ranger_np.py TOP/BOT/PROB_*/RENORM_ITERS/FLUSH_BYTES/STEP_BUCKET/CAP_LOG2/
CNT_SHIFT, the pad-coding rule, the update law, config.py level geometries,
container.py framing) fails here even when round-trip tests still pass —
old containers in the wild would stop decoding.

Fixtures live in tests/data/; golden_v5_l*.sfq pin the current format,
golden_v1.* / golden_v2_l*.sfq / golden_v3_l*.sfq / golden_v4_l*.sfq pin
backward decode compatibility with containers from earlier rounds.
"""

import io
import os

import numpy as np
import pytest

from slimfastq_tpu import container
from slimfastq_tpu.api import decode_fastq, encode_fastq
from slimfastq_tpu.config import config_for_level
from slimfastq_tpu.ops import streams_np

DATA = os.path.join(os.path.dirname(__file__), "data")


def _read(name: str) -> bytes:
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("kind", ["qual", "seq", "byte", "flag"])
def test_stream_payload_golden(kind):
    """Oracle encode of fixed inputs reproduces the checked-in payload
    bytes exactly (pins the range coder, the update law, pad-coding)."""
    z = np.load(os.path.join(DATA, "golden_streams.npz"))
    cfg = config_for_level(2)
    geom = {"qual": cfg.qual, "seq": cfg.seq, "byte": cfg.bytes_,
            "flag": cfg.flags}[kind]
    payload, lens = streams_np.encode_stream(
        kind, geom, z[f"{kind}__syms"], z[f"{kind}__counts"],
        pos=z[f"{kind}__pos"], reset=z[f"{kind}__reset"])
    assert np.array_equal(lens, z[f"{kind}__lens"]), \
        f"{kind}: lane lengths changed — bit format broken"
    assert np.array_equal(payload, z[f"{kind}__payload"]), \
        f"{kind}: payload bytes changed — bit format broken"
    # and the payload still decodes to the original symbols
    S = z[f"{kind}__syms"].shape[0]
    out = streams_np.decode_stream(kind, geom, payload, lens,
                                   z[f"{kind}__counts"], S,
                                   pos=z[f"{kind}__pos"],
                                   reset=z[f"{kind}__reset"])
    mask = np.arange(S)[:, None] < z[f"{kind}__counts"][None, :]
    assert np.array_equal(out[mask], z[f"{kind}__syms"][mask])


@pytest.mark.parametrize("level", [1, 2, 3, 4])
def test_container_golden_per_level(level):
    """Whole-container bytes are pinned per level (container framing +
    every stream's coded bytes)."""
    data = _read("golden_v2.fastq")
    golden = _read(f"golden_v5_l{level}.sfq")
    enc = encode_fastq(data, level=level, lanes=32, aux_lanes=8,
                       block_records=160, use_native=False)
    assert enc == golden, \
        f"level {level} container bytes changed — bit format broken"
    assert decode_fastq(golden) == data


def test_container_golden_native_matches():
    """The native host path reproduces the identical golden container."""
    from slimfastq_tpu import native
    if not native.available():
        pytest.skip("native library unavailable")
    data = _read("golden_v2.fastq")
    enc = encode_fastq(data, level=3, lanes=32, aux_lanes=8,
                       block_records=160, use_native=True)
    assert enc == _read("golden_v5_l3.sfq")


@pytest.mark.parametrize(
    "level", [3] + [pytest.param(lv, marks=pytest.mark.slow)
                    for lv in (1, 2, 4)])
def test_v4_container_still_decodes(level):
    """Round-3-shipped VERSION 4 containers decode bit-exactly at every
    level: v5 minus the MATCH stream and the per-block flag/seq_order
    bytes (always zero in v4 blocks)."""
    old = _read(f"golden_v4_l{level}.sfq")
    f = io.BytesIO(old)
    cfg = container.read_header(f)
    assert cfg.fmt == 4 and cfg.level == level
    ref = _read("golden_v2.fastq")
    assert decode_fastq(old, use_native=False) == ref
    from slimfastq_tpu import native
    if native.available():
        assert decode_fastq(old, use_native=True) == ref


@pytest.mark.parametrize(
    "level", [3] + [pytest.param(lv, marks=pytest.mark.slow)
                    for lv in (1, 2, 4)])
def test_v3_container_still_decodes(level):
    """Round-2-shipped VERSION 3 containers decode bit-exactly at every
    level: v4 framing minus the two warm-up geometry bytes, rate_lo = 0
    (no visit-count warm-up) — a LEVELS-table change must never break
    old containers (their geometry rides the header)."""
    old = _read(f"golden_v3_l{level}.sfq")
    f = io.BytesIO(old)
    cfg = container.read_header(f)
    assert cfg.fmt == 3 and cfg.level == level
    assert cfg.qual.rate_lo == 0 and cfg.seq.rate_lo == 0
    ref = _read("golden_v2.fastq")
    assert decode_fastq(old, use_native=False) == ref
    from slimfastq_tpu import native
    if native.available():
        assert decode_fastq(old, use_native=True) == ref


@pytest.mark.parametrize(
    "level", [3] + [pytest.param(lv, marks=pytest.mark.slow)
                    for lv in (1, 2, 4)])
def test_v2_container_still_decodes(level):
    """Round-2 (VERSION 2) containers decode bit-exactly at every level:
    same framing as v3, but the ID/LEN delta baseline is the globally
    previous record r-1 (serial decode chains) with unbiased deltas."""
    old = _read(f"golden_v2_l{level}.sfq")
    ref = _read("golden_v2.fastq")
    f = io.BytesIO(old)
    cfg = container.read_header(f)
    assert cfg.fmt == 2 and cfg.level == level
    assert decode_fastq(old, use_native=False) == ref
    from slimfastq_tpu import native
    if native.available():
        assert decode_fastq(old, use_native=True) == ref


@pytest.mark.parametrize(
    "level", [3] + [pytest.param(lv, marks=pytest.mark.slow)
                    for lv in (1, 2, 4)])
def test_v1_container_still_decodes(level):
    """Round-1 (VERSION 1) containers decode bit-exactly at EVERY level:
    legacy header, un-prefixed blocks, per-base SEQX exceptions — and the
    frozen LEVELS_V1 geometry table (v1 headers carry only the level byte,
    so evolving the live LEVELS table must not change v1 decoding; a
    LEVELS[4] geometry change silently corrupting v1 L4 decode was a
    round-2 review finding)."""
    name = "golden_v1.sfq" if level == 2 else f"golden_v1_l{level}.sfq"
    old = _read(name)
    ref = _read("golden_v1.fastq")
    f = io.BytesIO(old)
    cfg = container.read_header(f)
    assert cfg.fmt == 1 and cfg.level == level
    from slimfastq_tpu.config import LEVELS_V1
    assert (cfg.qual, cfg.seq) == (LEVELS_V1[level].qual,
                                   LEVELS_V1[level].seq)
    assert decode_fastq(old, use_native=False) == ref
    from slimfastq_tpu import native
    if native.available():
        assert decode_fastq(old, use_native=True) == ref


def test_frozen_constants():
    """The frozen constants themselves (a tripwire that makes an intended
    format change edit this file consciously)."""
    from slimfastq_tpu.ops import ranger_np as R
    assert (int(R.TOP), int(R.BOT)) == (1 << 24, 1 << 16)
    assert (R.PROB_BITS, R.PROB_MIN, R.PROB_MAX) == (12, 16, 4080)
    assert (R.RENORM_ITERS, R.FLUSH_BYTES, R.STEP_BUCKET) == (4, 4, 256)
    assert (R.CAP_LOG2, R.CNT_SHIFT) == (4, 22)
    # VERSION 5 (round 4): long-range read-match stream (MATCH) + the
    # per-block flags/seq_order bytes; the descriptor layout, e-transform
    # and prediction rule are frozen in models/matcher.py's docstring.
    # SAMPLE_MASK is an ENCODER policy knob (decode reads explicit
    # descriptors): round 5 moved it 7 -> 15 measured-first
    # (tools/probe_sample_mask.py; -38% match_find for +0.2% container).
    assert container.VERSION == 5
    from slimfastq_tpu.models import matcher as M
    assert (M.K, M.SAMPLE_MASK, M.MAX_CAND) == (16, 15, 16)
    assert (M.MM_PENALTY, M.MATCH_CHUNK) == (8, 1024)


def test_reencode_with_legacy_cfg_stamps_matching_version():
    """Encoding with a cfg read from an old container must stamp that
    container's stream rules' version, not blindly the current VERSION —
    a header/stream-rule mismatch decoded to silently wrong records
    (round-2 review finding, reproduced before the fix)."""
    from slimfastq_tpu.utils.synth import synth_fastq
    v2 = _read("golden_v2_l3.sfq")
    cfg2 = container.read_header(io.BytesIO(v2))
    assert cfg2.fmt == 2
    d = synth_fastq(200, read_len=40, seed=5, var_len=True)
    enc = encode_fastq(d, cfg=cfg2)
    assert container.read_header(io.BytesIO(enc)).fmt == 2
    assert decode_fastq(enc, use_native=False) == d
    from slimfastq_tpu import native
    if native.available():
        assert decode_fastq(enc, use_native=True) == d
