"""Device-match prepass wiring (compressor <-> ops/match.py): the forced
device shortlist path must keep extraction byte-identical and archive
size within noise of the host-only candidate search (reference schedule:
find_cand_segment_with_one_splitter, agc_compressor.cpp:1630-1808)."""

import os
import tempfile

import numpy as np
import pytest

from agc_tpu.core.compressor import CompressorParams, create_archive, append_archive
from agc_tpu.core.decompressor import Decompressor

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def _wfa(path, name, seq):
    with open(path, "wb") as f:
        f.write(b">" + name.encode() + b"\n")
        f.write(ALPHA[seq].tobytes() + b"\n")


def _mutate(rng, seq, rate=0.002, cut=None):
    m = seq.copy()
    pos = rng.integers(0, len(m), size=max(1, int(len(m) * rate)))
    m[pos] = (m[pos] + rng.integers(1, 4, size=len(pos))) % 4
    if cut:
        m = np.concatenate([m[: cut[0]], m[cut[1] :]])
    return m


@pytest.fixture()
def workload(tmp_path):
    rng = np.random.default_rng(41)
    ref = rng.integers(0, 4, size=500_000, dtype=np.uint8)
    files = [str(tmp_path / "ref.fa")]
    _wfa(files[0], "c1", ref)
    seqs = {}
    for i in range(5):
        # structural cuts shift splitter boundaries so one-splitter
        # searches (the device-ranked case) actually fire
        cut = (60_000 * (i + 1), 60_000 * (i + 1) + 9_000) if i % 2 else None
        m = _mutate(rng, ref, cut=cut)
        p = str(tmp_path / f"s{i}.fa")
        _wfa(p, "c1", m)
        files.append(p)
        seqs[f"s{i}"] = m
    return files, seqs


def _create(files, out, mode, **kw):
    old = os.environ.get("AGC_TPU_DEVICE_MATCH")
    os.environ["AGC_TPU_DEVICE_MATCH"] = mode
    try:
        create_archive(out, files, CompressorParams(segment_size=8_000, **kw))
    finally:
        if old is None:
            os.environ.pop("AGC_TPU_DEVICE_MATCH", None)
        else:
            os.environ["AGC_TPU_DEVICE_MATCH"] = old
    return os.path.getsize(out)


def test_forced_device_match_roundtrips_and_matches_host_size(
    workload, tmp_path
):
    files, seqs = workload
    size_dev = _create(files, str(tmp_path / "dev.agc"), "1")
    size_host = _create(files, str(tmp_path / "host.agc"), "0")
    d = Decompressor(str(tmp_path / "dev.agc"))
    for s, m in seqs.items():
        assert d.get_contig_seq(s, "c1") == ALPHA[m].tobytes()
    d.close()
    # the device ranks, the host decides: near-ties may flip groups, so
    # sizes can differ by a hair but not materially
    assert size_dev <= size_host * 1.02


def test_device_match_append_packed_groups(workload, tmp_path):
    """Appending rehydrates groups packed; the device bank must score
    them 0 (parity: CSegment::estimate, segment.cpp:83-85) without
    unpacking, and the append must still round-trip."""
    files, seqs = workload
    base = str(tmp_path / "base.agc")
    _create(files[:4], base, "1")
    rng = np.random.default_rng(99)
    ref = seqs["s0"]
    extra = _mutate(rng, ref, cut=(50_000, 58_000))
    p = str(tmp_path / "x.fa")
    _wfa(p, "c1", extra)
    out = str(tmp_path / "app.agc")
    old = os.environ.get("AGC_TPU_DEVICE_MATCH")
    os.environ["AGC_TPU_DEVICE_MATCH"] = "1"
    try:
        append_archive(base, out, [p])
    finally:
        if old is None:
            os.environ.pop("AGC_TPU_DEVICE_MATCH", None)
        else:
            os.environ["AGC_TPU_DEVICE_MATCH"] = old
    d = Decompressor(out)
    assert d.get_contig_seq("x", "c1") == ALPHA[extra].tobytes()
    d.close()
