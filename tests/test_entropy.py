"""Entropy stage (lane-interleaved rANS): the three implementations
(numpy spec / native C++ / device XLA) must emit byte-identical blobs,
and every blob must round-trip through every decoder.

reference context: the zstd stage this replaces in the tpu-rans profile
is pinned at segment.h:252-254 and collection_v3.cpp:163/192/246.
"""

from __future__ import annotations

import numpy as np
import pytest

from agc_tpu.core import entropy as E
from agc_tpu.ops import device_rans as D


def _cases():
    rng = np.random.default_rng(7)
    return [
        b"",
        b"Z",
        b"ACGT" * 64,
        bytes(rng.integers(0, 256, 10_000, dtype=np.uint8)),  # raw escape
        bytes(rng.integers(0, 4, 200_000, dtype=np.uint8)),
        bytes(np.repeat(np.arange(5, dtype=np.uint8), 30_000)),
        b"\x00" * 70_000,
        bytes(rng.integers(0, 16, 1023, dtype=np.uint8)),  # 1-lane tier
        bytes(rng.integers(0, 16, 1024, dtype=np.uint8)),  # 64-lane tier
        bytes(rng.integers(0, 16, 63, dtype=np.uint8)),
    ]


@pytest.mark.parametrize("i", range(10))
def test_three_way_blob_equality_and_roundtrip(i):
    d = _cases()[i]
    blobs = {
        "np": E.compress_np(d),
        "native": E.compress(d),
        "device": D.compress_device(d),
    }
    assert blobs["np"] == blobs["native"] == blobs["device"]
    blob = blobs["np"]
    assert E.decompress_np(blob) == d
    assert E.decompress(blob, len(d)) == d
    assert D.decompress_device(blob) == d


def test_tolerates_trailing_bytes():
    d = b"ACGTACGT" * 500
    blob = E.compress(d) + b"\x99\x99trailing"
    assert E.decompress(blob, len(d)) == d
    assert E.decompress_np(blob) == d


def test_expected_size_mismatch_raises():
    blob = E.compress(b"ACGT" * 100)
    with pytest.raises(ValueError):
        E.decompress(blob, 17)


def test_quantize_freqs_invariants():
    rng = np.random.default_rng(3)
    for _ in range(50):
        k = int(rng.integers(1, 256))
        counts = np.zeros(256, dtype=np.int64)
        syms = rng.choice(256, size=k, replace=False)
        counts[syms] = rng.integers(1, 1_000_000, size=k)
        q = E.quantize_freqs(counts)
        assert int(q.sum()) == E.PROB_SCALE
        assert (q[counts > 0] >= 1).all()
        assert (q[counts == 0] == 0).all()


def test_fuzz_roundtrip_all_paths():
    rng = np.random.default_rng(11)
    for _ in range(25):
        n = int(rng.integers(0, 40_000))
        alpha = int(rng.integers(1, 257))
        d = bytes(rng.integers(0, alpha, n, dtype=np.uint16).astype(np.uint8))
        b1 = E.compress(d)
        assert b1 == E.compress_np(d)
        assert E.decompress(b1, n) == d
        assert E.decompress_np(b1) == d


def test_device_matches_on_fuzz():
    rng = np.random.default_rng(13)
    for _ in range(6):
        n = int(rng.integers(1, 30_000))
        d = bytes(rng.integers(0, 30, n, dtype=np.uint8))
        assert D.compress_device(d) == E.compress(d)
        assert D.decompress_device(E.compress(d)) == d
