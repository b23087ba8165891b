"""Streaming (-s) extraction: byte-identical with the batch path
(reference CI exercises -p -s; .github/workflows/self-hosted-toy.yml)."""

import filecmp
import os

import pytest

from agc_tpu.core.compressor import CompressorParams, create_archive
from agc_tpu.core.decompressor import Decompressor

from util import make_collection


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    files = make_collection(tmp)
    path = str(tmp / "g.agc")
    create_archive(
        path,
        [p for _, p in files],
        CompressorParams(
            kmer_length=17, segment_size=1000, pack_cardinality=10, min_match_len=15
        ),
    )
    return path, files


def test_streaming_equals_batch_getset(archive, tmp_path):
    path, files = archive
    d = Decompressor(path)
    for sample, src in files:
        batch = str(tmp_path / f"b_{sample}.fa")
        stream = str(tmp_path / f"s_{sample}.fa")
        d.get_sample_file(batch, [sample], line_length=70)
        d.get_streaming(stream, sample_names=[sample], line_length=70)
        assert filecmp.cmp(batch, stream, shallow=False), sample
        assert filecmp.cmp(stream, src, shallow=False), sample
    d.close()


def test_streaming_getctg_range(archive, tmp_path):
    path, files = archive
    d = Decompressor(path)
    full = d.get_contig_seq("s0", "c1")
    out = str(tmp_path / "rng.fa")
    d.get_streaming(out, contig_queries=["c1@s0:100-250"], line_length=70)
    with open(out, "rb") as f:
        lines = f.read().splitlines()
    assert lines[0] == b">c1:100-250"
    body = b"".join(lines[1:])
    assert body == full[100:251]
    d.close()


def test_streaming_no_prefetch(archive, tmp_path):
    path, files = archive
    d = Decompressor(path, prefetch=False)
    out = str(tmp_path / "np_s0.fa")
    d.get_streaming(out, sample_names=["s0"], line_length=70)
    assert filecmp.cmp(out, files[1][1], shallow=False)
    d.close()


def test_streaming_gzip(archive, tmp_path):
    import gzip

    path, files = archive
    d = Decompressor(path)
    out = str(tmp_path / "s0.fa.gz")
    d.get_streaming(out, sample_names=["s0"], line_length=70, gzip_level=5)
    with gzip.open(out, "rb") as f:
        got = f.read()
    with open(files[1][1], "rb") as f:
        assert got == f.read()
    d.close()
