"""Randomized round-trip fuzzing: random parameter combinations x random
collections (IUPAC symbols, N runs, tiny and odd-sized contigs) must all
extract byte-identically. Mirrors the reference CI's param-stress matrix
with randomized inputs on top."""

import filecmp
import random

import pytest

from agc_tpu.core.compressor import CompressorParams, create_archive
from agc_tpu.core.decompressor import Decompressor

from util import write_fa

ALPHABET = "ACGT" * 12 + "N" * 3 + "RYSWKM"


def _random_contig(rng: random.Random, n: int) -> str:
    s = [rng.choice(ALPHABET) for _ in range(n)]
    # sprinkle N runs (the codec has a dedicated N-run token)
    for _ in range(max(1, n // 5000)):
        p = rng.randrange(n)
        ln = rng.randrange(1, 60)
        for i in range(p, min(n, p + ln)):
            s[i] = "N"
    return "".join(s)


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_fuzz_roundtrip(tmp_path, seed):
    rng = random.Random(seed)
    k = rng.choice([17, 21, 27, 31, 32])
    seg = rng.choice([150, 700, 2300])
    mml = rng.choice([15, 20, 28])
    adaptive = rng.random() < 0.5
    profile = rng.choice(["zstd", "tpu-rans"])
    n_samples = rng.randrange(2, 5)

    base_lens = [rng.randrange(40, 9000) for _ in range(rng.randrange(1, 4))]
    bases = [_random_contig(rng, n) for n in base_lens]
    files = []
    for si in range(n_samples):
        contigs = []
        for ci, b in enumerate(bases):
            s = list(b)
            for _ in range(len(s) // 50):
                s[rng.randrange(len(s))] = rng.choice("ACGT")
            if rng.random() < 0.3 and len(s) > 100:  # structural edit
                p = rng.randrange(len(s) - 50)
                del s[p : p + rng.randrange(1, 40)]
            contigs.append((f"ctg{ci} extra words", "".join(s)))
        if si == 0 and rng.random() < 0.5:
            contigs.append(("tiny", _random_contig(rng, rng.randrange(1, 40))))
        path = str(tmp_path / f"s{si}.fa")
        write_fa(path, contigs, line=rng.choice([60, 70, 80]))
        files.append((f"s{si}", path))

    params = CompressorParams()
    params.kmer_length = k
    params.segment_size = seg
    params.min_match_len = mml
    params.adaptive_compression = adaptive
    params.profile = profile
    archive = str(tmp_path / "fuzz.agc")
    create_archive(archive, [p for _, p in files], params)

    d = Decompressor(archive)
    for sample, path in files:
        out = str(tmp_path / f"out_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        with open(path) as f_in:
            want = f_in.read().replace("\n", "")
        with open(out) as f_out:
            got = f_out.read().replace("\n", "")
        assert got == want, (seed, sample, k, seg, mml, adaptive, profile)
    d.close()


@pytest.mark.parametrize("seed", [51, 55, 58])
def test_fuzz_fallback_append(tmp_path, seed):
    """Fallback minimizers (+/- adaptive) with an append chain."""
    import filecmp

    from agc_tpu.core.compressor import append_archive

    rng = random.Random(seed)
    base = "".join(rng.choice("ACGT") for _ in range(rng.randrange(8000, 20000)))

    def _mut(s):
        out = list(s)
        for _ in range(len(out) // 60):
            out[rng.randrange(len(out))] = rng.choice("ACGT")
        return "".join(out)

    files = []
    for si in range(3):
        p = str(tmp_path / f"s{si}.fa")
        seq = _mut(base) if si else base
        extra = (
            [("novel", "".join(rng.choice("ACGT") for _ in range(3000)))]
            if rng.random() < 0.4
            else []
        )
        write_fa(p, [("c1", seq)] + extra)
        files.append((f"s{si}", p))
    params = CompressorParams()
    params.segment_size = rng.choice([500, 1500])
    params.fallback_frac = rng.choice([0.01, 0.03])
    params.adaptive_compression = rng.random() < 0.5
    arc = str(tmp_path / "f.agc")
    create_archive(arc, [p for _, p in files], params)
    p3 = str(tmp_path / "s3.fa")
    write_fa(p3, [("c1", _mut(base))])
    arc2 = str(tmp_path / "f2.agc")
    append_archive(arc, arc2, [p3], params)
    d = Decompressor(arc2)
    for sample, path in files + [("s3", p3)]:
        out = str(tmp_path / f"o_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), (seed, sample)
    d.close()
