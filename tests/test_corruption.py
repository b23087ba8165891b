"""Corrupted-archive robustness: truncations, bit flips, and zeroed
windows must surface as clean Python exceptions — never native memory
errors. (The reference tool segfaults on several of these; its only
guard is the "Corrupted archive!" length check,
agc_decompressor_lib.cpp:264.)

The native LZ decoders return a distinct corrupt code when a token
stream walks outside the reference (bounds-checked positions, underflow-
safe length checks, digit-overflow guards) — regression-pinned here by
running many corruptions in-process: an unhardened decoder aborts the
whole test run, which is exactly the signal.
"""

from __future__ import annotations

import random

import pytest

from agc_tpu.core.compressor import CompressorParams, create_archive
from agc_tpu.core.decompressor import Decompressor
from util import make_collection


@pytest.fixture(scope="module")
def archive_bytes(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corrupt")
    files = make_collection(tmp, n_samples=2, contig_lens=(9000,))
    archive = str(tmp / "a.agc")
    create_archive(
        archive,
        [p for _, p in files],
        CompressorParams(segment_size=1000, kmer_length=17),
    )
    return open(archive, "rb").read()


@pytest.mark.parametrize("mode", ["truncate", "bitflip", "zero_window"])
def test_corruptions_raise_cleanly(archive_bytes, tmp_path, mode):
    # fixed literal seeds: hash(str) is randomized per interpreter
    # (PYTHONHASHSEED), which would make failing trials unreproducible
    rng = random.Random({"truncate": 101, "bitflip": 202, "zero_window": 303}[mode])
    bad_path = str(tmp_path / "bad.agc")
    for _ in range(60):
        b = bytearray(archive_bytes)
        if mode == "truncate":
            b = b[: rng.randrange(1, len(b))]
        elif mode == "bitflip":
            p = rng.randrange(len(b))
            b[p] ^= 1 << rng.randrange(8)
        else:
            p = rng.randrange(len(b))
            ln = rng.randrange(1, 64)
            b[p : p + ln] = bytes(min(ln, len(b) - p))
        with open(bad_path, "wb") as f:
            f.write(bytes(b))
        try:
            d = Decompressor(bad_path)
            for s in d.list_samples():
                for c in d.list_contigs(s):
                    d.get_contig_seq(s, c)
            d.close()
        except Exception:
            # any Python exception is acceptable; a native abort is not
            # (it would kill this process and fail the run loudly)
            pass


def test_corrupt_delta_token_streams():
    """Directly drive the LZ decoders with hostile token streams."""
    from agc_tpu.core.lz import decode_v1, decode_v2

    ref = bytes(range(4)) * 1000
    hostile = [
        b"999999999.",              # match far outside the reference
        b"-999999999.",             # negative underflow
        b"0,99999999.",             # length beyond the reference end
        b"5" * 40 + b".",           # digit-parse overflow
        b"\x1e" + b"9" * 30 + b"\x04",  # N-run length overflow
        b"\x00\x01\x02",            # strays outside the grammar
    ]
    for enc in hostile:
        for dec in (decode_v2, decode_v1):
            with pytest.raises((ValueError, IndexError)):
                dec(ref, enc, 20)
    # V2 only: '!' copies from the reference at pred_pos (V1 treats '!'
    # as a plain literal, so it cannot run off the reference)
    with pytest.raises((ValueError, IndexError)):
        decode_v2(ref, b"!" * 5000, 20)


def test_petabyte_nrun_claim_rejected_without_allocation():
    """An N-run claiming ~1e15 bytes passes the digit-overflow guard but
    must be rejected by the output-size ceiling — NOT attempted as an
    allocation (previously the grow-and-retry loop quadrupled toward it)."""
    from agc_tpu.core.lz import (
        _decode_v1_py,
        _decode_v2_py,
        decode_v1,
        decode_v2,
    )

    ref = bytes(range(4)) * 100
    hostile = b"\x1e" + b"9" * 15 + b"\x04"  # v = 1e15 - 1 < 2^50
    for dec in (decode_v2, decode_v1, _decode_v2_py, _decode_v1_py):
        with pytest.raises(ValueError):
            dec(ref, hostile, 20)


def test_python_fallback_rejects_grammar_strays():
    """The pure-Python decoders must reject stray bytes like the native
    ones do (previously b'\\x00.' decoded to silent garbage)."""
    from agc_tpu.core.lz import _decode_v1_py, _decode_v2_py

    ref = bytes(range(4)) * 100
    for enc in (b"\x00.", b"\x00\x01\x02", b"-,5."):
        for dec in (_decode_v2_py, _decode_v1_py):
            with pytest.raises((ValueError, IndexError)):
                dec(ref, enc, 20)


def test_legitimate_large_nrun_regrows_exactly():
    """A genuine multi-megabyte N-run exceeds the initial native decode
    buffer; the -(needed) contract must regrow once and round-trip."""
    from agc_tpu.core.lz import LZDiff, decode_v2

    n_run = 6 * (1 << 20)
    seq = bytes([0, 1, 2, 3] * 300) + bytes([4]) * n_run + bytes([3, 2, 1, 0] * 300)
    ref = bytes([0, 1, 2, 3] * 300) + bytes([3, 2, 1, 0] * 300)
    lz = LZDiff(min_match_len=20)
    lz.prepare(ref)
    enc = lz.encode(seq)
    assert decode_v2(ref, enc, 20) == seq


def test_corrupt_params_stream_rejected(archive_bytes, tmp_path):
    """A zeroed params stream must raise, not divide by zero later."""
    from agc_tpu.core.archive import ArchiveReader, ArchiveWriter

    src = str(tmp_path / "src.agc")
    with open(src, "wb") as f:
        f.write(archive_bytes)
    r = ArchiveReader(src, prefetch=True)
    out = str(tmp_path / "zeroed.agc")
    w = ArchiveWriter(out)
    for name in r.stream_names():
        w.register_stream(name)
        for i in range(r.n_parts(name)):
            data, meta = r.get_part(name, i)
            if name == "params":
                data = bytes(len(data))
            w.add_part(name, data, meta)
    w.close()
    r.close()
    with pytest.raises(ValueError):
        Decompressor(out)


def test_hostile_rans_headers_rejected():
    """Targeted hostile rANS blobs (native decoder): a frequency table
    whose uint32 cumsum wraps back to 4096 must not drive the slot-table
    fill past its end (heap corruption), and a raw-escape size varint
    with bit 63 set must not slip past the bounds checks as a negative
    int64 (multi-exabyte memcpy)."""
    from agc_tpu.core.entropy import MAGIC, _RAW_FLAG, decompress

    def varint(v):
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    # freq-wrap blob: F[0]=8192, F[1]=2^32-4096, rest 0 -> uint32 cumsum
    # C[2] wraps to 4096 and the total check alone would pass
    blob = bytearray([MAGIC, 0]) + varint(100)
    blob += varint(8192) + varint((1 << 32) - 4096)
    blob += varint(0) * 254
    blob += varint(1) * 8 + b"\x00" * 32  # plausible lane tail
    with pytest.raises(ValueError):
        decompress(bytes(blob))

    # raw-escape with n >= 2^63 (negative as int64)
    blob2 = bytes([MAGIC, _RAW_FLAG]) + varint(1 << 63) + b"x" * 8
    with pytest.raises(ValueError):
        decompress(blob2)

    # overlong varint (>10 continuation bytes would shift >= 64: UB guard)
    blob3 = bytes([MAGIC, 0]) + b"\x80" * 12
    with pytest.raises(ValueError):
        decompress(blob3)
