"""Anchor-mode LZ encode: the device-assisted encode path.

The anchor RULE (dense ref slot tables -> strided text probes -> top-32
diagonal set -> greedy run tiling; lz_native.cpp anchor section) is a
pure function of (text, ref), computed identically by the C++ twin
(lz_anchor_diags) and the device kernel (ops/match.py::anchor_diag_sets).
Pinned here: twin identity, V2-decodability, end-to-end archive byte
identity with the device leg on vs off, and compression-size sanity vs
the classic rule. reference grammar: lz_diff.cpp:631-798."""

import os

import numpy as np
import pytest

from agc_tpu.core.lz import LZDiff, decode_v2
from agc_tpu.native import get_lib
from agc_tpu.ops import match as M

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _mutate(rng, seq, rate):
    out = seq.copy()
    pos = rng.integers(0, len(seq), size=max(1, int(len(seq) * rate)))
    out[pos] = (out[pos] + rng.integers(1, 4, size=len(pos))) % 4
    return out


def test_anchor_roundtrip_and_size_parity():
    """Anchor encodes decode back exactly and match classic sizes on
    SNP / indel / N-run / IUPAC / rearranged workloads."""
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, size=60000, dtype=np.uint8)
    mut = _mutate(rng, ref, 0.001)
    cases = {
        "snps": mut,
        "identical": ref.copy(),
        "indel": np.concatenate([mut[:20000], mut[20051:40000], mut[39987:]]),
        "nrun": np.concatenate([mut[:1000], np.full(400, 4, np.uint8), mut[1400:]]),
        "iupac": np.concatenate([mut[:5000], rng.integers(5, 16, 10).astype(np.uint8), mut[5010:]]),
        "rearranged": _mutate(rng, np.concatenate([ref[30000:], ref[:30000]]), 0.0005),
        "unrelated": rng.integers(0, 4, size=60000, dtype=np.uint8),
    }
    lz = LZDiff(20)
    lz.prepare(ref.tobytes())
    for tag, t in cases.items():
        d = lz.encode_anchor(t.tobytes())
        assert d is not None, tag
        back = ref.tobytes() if not d else decode_v2(ref.tobytes(), d, 20)
        assert back == t.tobytes(), tag
        dc = lz.encode(t.tobytes())
        # anchor and classic land within 5% of each other on these
        # structured inputs (measured equal on all but pathological data)
        assert len(d) <= max(len(dc) * 1.05, len(dc) + 8), (
            tag, len(d), len(dc),
        )


def test_anchor_device_diag_sets_equal_host_twin():
    rng = np.random.default_rng(1)
    refs = {}
    bank = M.AnchorCodeBank()
    texts, gids = [], []
    for trial in range(10):
        m = int(rng.integers(60, 50000))
        ref = rng.integers(0, 5, size=m, dtype=np.uint8)
        refs[trial] = ref
        t = _mutate(rng, ref, 0.005)
        if trial % 3 == 1:  # indel
            cut = m // 2
            t = np.concatenate([t[:cut], t[cut + 33:]])
        texts.append(t.tobytes())
        gids.append(trial)
    tabs = M.anchor_diag_sets(
        texts, gids, bank, lambda g: refs[g].tobytes(), 17
    )
    checked = 0
    for txt, gid, tab in zip(texts, gids, tabs):
        lz = LZDiff(20)
        lz.prepare(refs[gid].tobytes())
        host = lz.anchor_diags_host(txt)
        assert (tab is None) == (host is None), gid
        if tab is None:
            continue
        assert np.array_equal(host, tab), (gid, host[:6], tab[:6])
        assert lz.encode_anchor(txt, tables=tab) == lz.encode_anchor(txt)
        checked += 1
    assert checked >= 8


def test_anchor_fuzz_roundtrip():
    rng = np.random.default_rng(2)
    for trial in range(120):
        n = int(rng.integers(30, 4000))
        ref = rng.integers(0, 5, size=n, dtype=np.uint8)
        t = ref.copy()
        for _ in range(int(rng.integers(0, 4))):
            a, b = sorted(rng.integers(0, len(t), size=2))
            if rng.random() < 0.5:
                t = np.concatenate([t[:a], t[b:]])
            else:
                t = np.concatenate([t[:b], t[a:b], t[b:]])
        if len(t) == 0:
            continue
        p = rng.integers(0, len(t), size=max(1, len(t) // 100))
        t[p] = rng.integers(0, 16, size=len(p))
        lz = LZDiff(20)
        lz.prepare(ref.tobytes())
        d = lz.encode_anchor(t.tobytes())
        if d is None:
            continue
        back = ref.tobytes() if not d else decode_v2(ref.tobytes(), d, 20)
        assert back == t.tobytes(), trial


def _write_fasta(path, name, seq):
    alpha = np.frombuffer(b"ACGTN", dtype=np.uint8)
    body = alpha[seq].tobytes()
    with open(path, "wb") as f:
        f.write(b">" + name + b"\n")
        for i in range(0, len(body), 70):
            f.write(body[i : i + 70] + b"\n")


def _make_collection(tmp_path, rng):
    ref = rng.integers(0, 4, size=400_000, dtype=np.uint8)
    files = [str(tmp_path / "ref.fa")]
    _write_fasta(files[0], b"chr1", ref)
    for i in range(3):
        mut = _mutate(rng, ref, 0.001)
        cut = int(rng.integers(1000, len(mut) - 1000))
        mut = np.concatenate([mut[:cut], mut[cut + 37:]])
        if i == 1:
            mut[5000:5300] = 4  # N run
        p = str(tmp_path / f"s{i}.fa")
        _write_fasta(p, b"chr1", mut)
        files.append(p)
    return files


def test_anchor_create_device_on_off_byte_identical(tmp_path, monkeypatch):
    """The engine knob (AGC_TPU_DEVICE_LZ) must never change archive
    bytes; the mode knob may. Extraction must round-trip either way."""
    from agc_tpu.core.compressor import CompressorParams, create_archive
    from agc_tpu.core.decompressor import Decompressor

    rng = np.random.default_rng(3)
    files = _make_collection(tmp_path, rng)

    monkeypatch.setenv("AGC_TPU_DEVICE_LZ", "1")
    a_dev = str(tmp_path / "dev.agc")
    create_archive(a_dev, files, CompressorParams(lz_mode="anchor"))
    monkeypatch.setenv("AGC_TPU_DEVICE_LZ", "0")
    a_host = str(tmp_path / "host.agc")
    create_archive(a_host, files, CompressorParams(lz_mode="anchor"))
    # logical stream equality: the async writer's PHYSICAL part order is
    # scheduler-dependent (as is the reference's), so raw-byte equality
    # across two creates is flaky by construction
    from tests.test_kmer_ops import _stream_contents

    assert _stream_contents(a_dev) == _stream_contents(a_host)

    d = Decompressor(a_dev)
    for f in files:
        raw = open(f, "rb").read().split(b"\n", 1)[1].replace(b"\n", b"")
        name = os.path.basename(f).rsplit(".", 1)[0]
        assert d.get_contig_seq(name, "chr1") == raw, f
    d.close()

    # classic-mode archive of the same inputs: sizes within 3%
    a_classic = str(tmp_path / "classic.agc")
    create_archive(a_classic, files, CompressorParams())
    sz_a, sz_c = os.path.getsize(a_dev), os.path.getsize(a_classic)
    assert sz_a <= sz_c * 1.03, (sz_a, sz_c)
