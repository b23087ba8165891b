"""Cross-tool interoperability: archives must round-trip BETWEEN tools.

The strongest format-compatibility guarantee we can test: the reference
binary (built from /root/reference) creates archives our readers must
extract byte-identically, and our archives must extract byte-identically
through the reference binary — including append chains started by one
tool and continued by the other (the reference's append re-opens and
re-serializes everything: agc_compressor.cpp:2330, collection_v3.cpp:48).

Skipped when the reference binary is absent ($AGC_REF_BIN, default
/tmp/refbuild/bin/agc).
"""

import filecmp
import os
import random
import subprocess

import pytest

from agc_tpu.core.compressor import (
    CompressorParams,
    append_archive,
    create_archive,
)
from agc_tpu.core.decompressor import Decompressor

from util import mutate, random_seq, write_fa

REF_BIN = os.environ.get("AGC_REF_BIN", "/tmp/refbuild/bin/agc")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_BIN), reason="reference binary not available"
)


def _ref(*args: str) -> None:
    # the available reference build is ASAN-instrumented; its known leaks
    # (determine_splitters queues) would turn every exit into rc=1
    env = dict(os.environ, ASAN_OPTIONS="detect_leaks=0")
    subprocess.run([REF_BIN, *args], check=True, capture_output=True, env=env)


def _make_inputs(tmp_path, with_divergent=False, seed=71):
    """ref + 2 resequenced samples (+1 divergent for adaptive legs).

    Inputs are written at line length 80 so the reference getcol output
    (default -l 80) is file-identical to the inputs.
    """
    rng = random.Random(seed)
    base = [random_seq(rng, 12000), random_seq(rng, 8000)]
    files = []
    names = ["ref", "s0", "s1"] + (["div"] if with_divergent else [])
    for name in names:
        if name == "ref":
            contigs = [(f"c{i + 1}", s) for i, s in enumerate(base)]
        elif name == "div":
            contigs = [("cd1", random_seq(rng, 9000))]
        else:
            contigs = [
                (f"c{i + 1}", mutate(rng, s, 60, 8)) for i, s in enumerate(base)
            ]
        p = str(tmp_path / f"{name}.fa")
        write_fa(p, contigs, line=80)
        files.append((name, p))
    return files


def _ref_extract_compare(archive, files, tmp_path, tag):
    out = tmp_path / f"refout_{tag}"
    out.mkdir()
    _ref("getcol", "-o", str(out), archive)
    for sample, path in files:
        got = os.path.join(str(out), f"{sample}.fa")
        assert filecmp.cmp(got, path, shallow=False), (tag, sample)


def _our_extract_compare(archive, files, tmp_path, tag):
    d = Decompressor(archive)
    assert sorted(d.list_samples()) == sorted(s for s, _ in files)
    for sample, path in files:
        out = str(tmp_path / f"out_{tag}_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=80)
        assert filecmp.cmp(out, path, shallow=False), (tag, sample)
    d.close()


PARAM_MATRIX = [
    # (tag, CompressorParams kwargs, reference CLI flags, divergent sample)
    ("small", dict(kmer_length=17, segment_size=1000, min_match_len=15,
                   pack_cardinality=10),
     ["-k", "17", "-s", "1000", "-l", "15", "-b", "10"], False),
    ("adaptive", dict(kmer_length=21, segment_size=2000, min_match_len=17,
                      pack_cardinality=3, adaptive_compression=True),
     ["-k", "21", "-s", "2000", "-l", "17", "-b", "3", "-a"], True),
    ("fallback", dict(kmer_length=17, segment_size=1000, min_match_len=15,
                      pack_cardinality=10, fallback_frac=0.01),
     ["-k", "17", "-s", "1000", "-l", "15", "-b", "10", "-f", "0.01"], True),
]


@pytest.mark.parametrize("tag,kwargs,flags,divergent", PARAM_MATRIX)
def test_ours_created_reference_extracts(tmp_path, tag, kwargs, flags, divergent):
    files = _make_inputs(tmp_path, with_divergent=divergent)
    archive = str(tmp_path / "ours.agc")
    create_archive(archive, [p for _, p in files], CompressorParams(**kwargs))
    _ref_extract_compare(archive, files, tmp_path, tag)


@pytest.mark.parametrize("tag,kwargs,flags,divergent", PARAM_MATRIX)
def test_reference_created_we_extract(tmp_path, tag, kwargs, flags, divergent):
    files = _make_inputs(tmp_path, with_divergent=divergent)
    archive = str(tmp_path / "ref.agc")
    _ref("create", *flags, "-o", archive, *[p for _, p in files])
    _our_extract_compare(archive, files, tmp_path, tag)


def test_ours_created_reference_appends(tmp_path):
    """We create; the reference binary appends; both tools read the result."""
    files = _make_inputs(tmp_path)
    params = CompressorParams(
        kmer_length=17, segment_size=1000, min_match_len=15, pack_cardinality=10
    )
    base = str(tmp_path / "base.agc")
    create_archive(base, [files[0][1], files[1][1]], params)
    final = str(tmp_path / "refapp.agc")
    _ref("append", "-o", final, base, files[2][1])
    _ref_extract_compare(final, files, tmp_path, "refapp")
    _our_extract_compare(final, files, tmp_path, "refapp")


def test_reference_created_we_append(tmp_path):
    """The reference creates; we append; both tools read the result."""
    files = _make_inputs(tmp_path)
    base = str(tmp_path / "base.agc")
    _ref("create", "-k", "17", "-s", "1000", "-l", "15", "-b", "10",
         "-o", base, files[0][1], files[1][1])
    final = str(tmp_path / "oursapp.agc")
    append_archive(base, final, [files[2][1]])
    _ref_extract_compare(final, files, tmp_path, "oursapp")
    _our_extract_compare(final, files, tmp_path, "oursapp")


def test_alternating_append_chain(tmp_path):
    """create(ref) -> ref-append(s0) -> our-append(s1) -> ref reads all."""
    files = _make_inputs(tmp_path)
    params = CompressorParams(
        kmer_length=17, segment_size=1000, min_match_len=15, pack_cardinality=10
    )
    a0 = str(tmp_path / "a0.agc")
    create_archive(a0, [files[0][1]], params)
    a1 = str(tmp_path / "a1.agc")
    _ref("append", "-o", a1, a0, files[1][1])
    a2 = str(tmp_path / "a2.agc")
    append_archive(a1, a2, [files[2][1]])
    _ref_extract_compare(a2, files, tmp_path, "chain")
    _our_extract_compare(a2, files, tmp_path, "chain")
