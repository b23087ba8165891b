"""Scaled-down versions of the BASELINE.json driver configs:

- "SARS-CoV-2 1k-genome collection, adaptive mode, small k/segment"
- "E. coli 100-assembly collection with append of 10 new genomes"

Sizes are reduced to keep CI fast; the parameter shapes (adaptive, small
k/segment, many samples, append batch) match the configs.
"""

import filecmp
import os
import random

import pytest

from agc_tpu.core.compressor import (
    CompressorParams,
    append_archive,
    create_archive,
)
from agc_tpu.core.decompressor import Decompressor

from util import mutate, random_seq, write_fa


def test_sars_like_adaptive_collection(tmp_path):
    """60 viral-sized genomes (~3 kb), two divergent clades, adaptive."""
    rng = random.Random(101)
    cladeA = random_seq(rng, 3000)
    cladeB = random_seq(rng, 3000)  # unrelated: needs adaptive splitters
    files = []
    for i in range(60):
        base = cladeA if i % 2 == 0 else cladeB
        seq = mutate(rng, base, subs=12, indels=2)
        p = str(tmp_path / f"g{i:03d}.fa")
        write_fa(p, [(f"genome_{i}", seq)])
        files.append((f"g{i:03d}", p))

    params = CompressorParams(
        kmer_length=17,
        segment_size=100,
        pack_cardinality=10,
        min_match_len=15,
        adaptive_compression=True,
    )
    archive = str(tmp_path / "sars.agc")
    create_archive(archive, [p for _, p in files], params)

    d = Decompressor(archive)
    assert d.get_no_samples() == 60
    for sample, path in files[::7] + [files[-1]]:
        out = str(tmp_path / f"o_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), sample
    d.close()
    # collection must be much smaller than the raw input
    total = sum(os.path.getsize(p) for _, p in files)
    assert os.path.getsize(archive) < total / 2


def test_ecoli_like_create_plus_append(tmp_path):
    """20 bacterial-like assemblies + append of 5 more."""
    rng = random.Random(202)
    base = random_seq(rng, 40000)
    files = []
    for i in range(25):
        seq = mutate(rng, base, subs=80, indels=10)
        p = str(tmp_path / f"asm{i:02d}.fa")
        write_fa(p, [(f"chromosome asm{i}", seq)])
        files.append((f"asm{i:02d}", p))

    params = CompressorParams(
        kmer_length=21,
        segment_size=1000,
        pack_cardinality=8,
        min_match_len=17,
    )
    base_archive = str(tmp_path / "ecoli.agc")
    create_archive(base_archive, [p for _, p in files[:20]], params)

    ext = str(tmp_path / "ecoli_ext.agc")
    append_archive(base_archive, ext, [p for _, p in files[20:]], params)

    d = Decompressor(ext)
    assert d.get_no_samples() == 25
    for sample, path in files[::6] + files[20:]:
        out = str(tmp_path / f"e_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), sample
    # append must reuse existing groups: delta growth only
    grow = os.path.getsize(ext) - os.path.getsize(base_archive)
    assert grow < 5 * os.path.getsize(files[0][1]) / 4
    d.close()
