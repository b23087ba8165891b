"""Archive container round-trip + reading the reference-produced fixture."""

import os

import pytest

from agc_tpu.core.archive import ArchiveReader, ArchiveWriter
from agc_tpu.core.codecs import (
    dec_be_varint,
    dec_prefix_varint,
    enc_be_varint,
    enc_prefix_varint,
    int_to_base64,
    murmur64,
    zigzag_decode_pred,
    zigzag_encode_pred,
)


def test_be_varint_roundtrip():
    for x in [0, 1, 127, 128, 255, 256, 65535, 1 << 20, (1 << 56) - 3, (1 << 63)]:
        buf = enc_be_varint(x)
        val, pos = dec_be_varint(buf, 0)
        assert val == x and pos == len(buf)


def test_prefix_varint_roundtrip():
    vals = [0, 1, 127, 128, 200, 16511, 16512, 100000, 2113663, 2113664,
            270549119, 270549120, 4294967295]
    for x in vals:
        out = bytearray()
        enc_prefix_varint(out, x)
        val, pos = dec_prefix_varint(out, 0)
        assert val == x and pos == len(out), x


def test_zigzag_pred():
    for prev in [0, 1, 5, 100, 60031]:
        for cur in [0, 1, 2, 50, 99, 100, 101, 200, 60031, 120063, 200000]:
            enc = zigzag_encode_pred(cur, prev)
            assert zigzag_decode_pred(enc, prev) == cur, (cur, prev)


def test_base64_names():
    assert int_to_base64(0) == "0"
    assert int_to_base64(10) == "A"
    assert int_to_base64(63) == "#"
    assert int_to_base64(64) == "01"
    assert int_to_base64(16) == "G"


def test_murmur64():
    # finalizer fixed-point sanity: stable known value
    assert murmur64(0) == 0
    assert murmur64(1) == 12994781566227106604


def test_archive_roundtrip(tmp_path):
    path = str(tmp_path / "t.agc")
    w = ArchiveWriter(path)
    w.add_part("alpha", b"hello", 5)
    w.add_part("beta", b"", 0)
    w.add_part_buffered("alpha", b"world" * 100, 500)
    w.add_part("gamma-with-long-name", bytes(range(256)), (1 << 40) + 7)
    w.flush_buffers()
    w.close()

    r = ArchiveReader(path)
    assert set(r.stream_names()) == {"alpha", "beta", "gamma-with-long-name"}
    assert r.n_parts("alpha") == 2
    assert r.get_part("alpha", 0) == (b"hello", 5)
    assert r.get_part("alpha", 1) == (b"world" * 100, 500)
    assert r.get_part("beta", 0) == (b"", 0)
    assert r.get_part("gamma-with-long-name", 0) == (bytes(range(256)), (1 << 40) + 7)
    # out-of-range part id
    assert r.get_part("alpha", 2) is None
    r.close()


def test_read_reference_fixture(toy_dir):
    path = os.path.join(toy_dir, "toy_ex.agc")
    if not os.path.exists(path):
        pytest.skip("reference fixture unavailable")
    r = ArchiveReader(path)
    names = r.stream_names()
    assert "file_type_info" in names
    assert "params" in names
    assert "collection-samples" in names
    r.close()


def test_corrupted_archive_errors(tmp_path):
    """Truncated or garbage archives must raise clean errors, not crash
    (reference: 'Corrupted archive!' handling)."""
    import pytest

    from agc_tpu.core.decompressor import Decompressor

    bad = tmp_path / "garbage.agc"
    bad.write_bytes(b"not an archive at all")
    with pytest.raises((ValueError, KeyError, IndexError)):
        Decompressor(str(bad))

    tiny = tmp_path / "tiny.agc"
    tiny.write_bytes(b"\x00" * 4)
    with pytest.raises(ValueError):
        Decompressor(str(tiny))

    # valid archive truncated in the middle
    import random as _random

    from agc_tpu.core.compressor import CompressorParams, create_archive
    from util import make_collection

    files = make_collection(tmp_path, rng=_random.Random(9), n_samples=1,
                            contig_lens=(5000,))
    ok = tmp_path / "ok.agc"
    params = CompressorParams()
    params.segment_size = 1000
    create_archive(str(ok), [p for _, p in files], params)
    data = ok.read_bytes()
    cut = tmp_path / "cut.agc"
    cut.write_bytes(data[: len(data) // 2])
    with pytest.raises((ValueError, KeyError, IndexError)):
        d = Decompressor(str(cut))
        d.get_contig_seq(files[0][0], "c1")


def test_v3_collection_streams_are_ids_0_1_2(tmp_path):
    """The reference's append resolves collection-samples/-contigs/-details
    in the INPUT archive by the ids it registered in its OUTPUT archive
    ("in and out ids for collection-* must be the same!",
    collection_v3.cpp:48-61); any other layout segfaults it. Pin the trio
    to stream ids 0/1/2 on both create and append outputs."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from util import make_collection
    from agc_tpu.core.compressor import (
        CompressorParams,
        append_archive,
        create_archive,
    )

    trio = ["collection-samples", "collection-contigs", "collection-details"]
    small = CompressorParams(
        kmer_length=17, segment_size=1000, pack_cardinality=10, min_match_len=15
    )
    files = make_collection(tmp_path, n_samples=2)
    base = str(tmp_path / "b.agc")
    create_archive(base, [p for _, p in files[:2]], small)
    r = ArchiveReader(base)
    assert r.stream_names()[:3] == trio
    r.close()
    ext = str(tmp_path / "e.agc")
    append_archive(base, ext, [files[2][1]], small)
    r = ArchiveReader(ext)
    assert r.stream_names()[:3] == trio
    r.close()
