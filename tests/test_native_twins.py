"""Native (C++) fast paths vs their numpy spec twins.

Every native routine with a numpy twin must be byte-identical to it —
the twin IS the spec (same policy as the rANS coder and the device
match kernels). Covers the run-structured FASTA preprocess with fused
IUPAC validation and the one-call ref-payload probe + tuples repack
(reference: segment.h:73-169, 218-255; agc_compressor.cpp:907-951)."""

import numpy as np
import pytest

from agc_tpu.core import segment as S
from agc_tpu.core.genome_io import CNV_ASCII, preprocess_raw_contig
from agc_tpu.native import get_lib

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _numpy_ref_payload(data: bytes):
    """The pre-native ref_payload (core/segment.py history): the spec."""
    arr = np.frombuffer(data[:8192], dtype=np.uint8)
    best_frac = 0.0
    acgt = arr < 4
    for lag in range(4, 32):
        if lag >= len(arr):
            break
        cnt = int(np.count_nonzero(arr[:-lag] == arr[lag:]))
        cur = int(np.count_nonzero(acgt[:-lag]))
        frac = cnt / cur if cur else 0.0
        if frac > best_frac:
            best_frac = frac
            if best_frac >= 0.5:
                break
    if best_frac < 0.5:
        return S.bytes2tuples(data), 13, 1
    return data, 19, 0


def test_ref_payload_matches_numpy_twin():
    rng = np.random.default_rng(0)
    cases = []
    for n in (1, 2, 3, 5, 17, 8191, 8192, 8193, 60000):
        cases.append(rng.integers(0, 4, size=n, dtype=np.uint8).tobytes())
        cases.append(rng.integers(0, 6, size=n, dtype=np.uint8).tobytes())
        cases.append(rng.integers(0, 16, size=n, dtype=np.uint8).tobytes())
        x = rng.integers(0, 4, size=n, dtype=np.uint8)
        cases.append(np.tile(x[: max(1, n // 7)], 8)[:n].tobytes())
    cases.append(np.full(100, 30, dtype=np.uint8).tobytes())  # passthrough
    for i, d in enumerate(cases):
        got = S.ref_payload(d)
        want = _numpy_ref_payload(d)
        assert got == want, (i, len(d))
    # round-trips through the decoder too
    for d in cases:
        payload, _level, marker = S.ref_payload(d)
        if marker == 1:
            assert S.tuples2bytes(payload) == d


def test_preprocess_matches_numpy_and_validates():
    rng = np.random.default_rng(1)
    alpha = np.frombuffer(b"ACGTNacgtnRYKM", dtype=np.uint8)
    for n in (0, 1, 7, 80, 81, 1000, 100_000):
        seq = alpha[rng.integers(0, len(alpha), size=n)]
        body = bytearray()
        for r in range(0, n, 60):
            body += seq[r : r + 60].tobytes() + b"\n"
        raw = np.frombuffer(bytes(body), dtype=np.uint8)
        got = preprocess_raw_contig(raw)
        want = CNV_ASCII[raw[raw >= 64]]
        assert np.array_equal(got, want), n
    # fused validity check reports symbol + position like the numpy path
    with pytest.raises(ValueError, match=r"'Z' at position 6"):
        preprocess_raw_contig(
            np.frombuffer(b"ACGT\nACZT\n", dtype=np.uint8), "c1"
        )


def test_lz_large_reference_int64_index_roundtrip():
    """References past the u32-entry bound (padded > 0xFFFFFF bytes)
    take the int64 index branch (the dual table mirrors the reference's
    ht16/ht32 split, lz_diff.cpp:146); encode/decode must round-trip
    and estimate must track encode on both sides of the threshold."""
    from agc_tpu.core.lz import LZDiff, decode_v2

    rng = np.random.default_rng(12)
    for n in (0xFFFF00, 0x1100000):  # just under / over the u32 bound
        ref = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
        text = bytearray(ref)
        for p in range(0, n, 97_001):  # sprinkle SNPs
            text[p] = (text[p] + 1) % 4
        text = bytes(text[: n - 1234])  # structural tail change
        lz = LZDiff(20)
        lz.prepare(ref)
        enc = lz.encode(text)
        assert decode_v2(ref, enc, 20) == text
        est = lz.estimate(text, 1 << 60)
        assert est == len(enc)
