"""End-to-end compression benchmark (driver contract: prints ONE JSON line).

Measures create-archive throughput (bases/s) on a deterministic synthetic
collection: one reference genome + mutated resequenced samples — the same
shape of workload as the reference tool's headline benchmark (HPP
haplotype collections; BASELINE.md). Baseline: the reference's published
aggregate compression throughput of ~400 Mbases/s on a 32-thread
Threadripper 3990X (reference README.md:12-13).

Round-trip correctness is asserted on a sampled contig before reporting.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

BASELINE_BASES_PER_S = 400e6

REF_MB = int(os.environ.get("AGC_TPU_BENCH_REF_MB", "16"))
N_SAMPLES = int(os.environ.get("AGC_TPU_BENCH_SAMPLES", "7"))
# Archive profile: "tpu-rans" is this framework's native profile (the
# headline number; same container layout, parts coded by the
# lane-interleaved rANS stage — on this box ALSO the fastest host path:
# the native coder measures ~3x zstd-13/17 on real part mixes, see
# DESIGN.md §7). "zstd" is the reference-compatible parity profile;
# its numbers live in tools/ratio_compare.py runs, where archives are
# compared against the reference binary's.
PROFILE = os.environ.get("AGC_TPU_BENCH_PROFILE", "tpu-rans")


def _make_seq(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(0, 4, size=n, dtype=np.uint8)


def _mutate(rng: np.random.Generator, seq: np.ndarray) -> np.ndarray:
    """SNPs (~0.1%) + a handful of structural indels, vectorized."""
    out = seq.copy()
    n_sub = max(1, len(seq) // 1000)
    pos = rng.integers(0, len(seq), size=n_sub)
    out[pos] = (out[pos] + rng.integers(1, 4, size=n_sub)) % 4
    # indels: splice out / duplicate small windows
    pieces = []
    cur = 0
    for _ in range(8):
        cut = int(rng.integers(cur + 1, cur + len(seq) // 8))
        if cut >= len(out) - 1:
            break
        pieces.append(out[cur:cut])
        if rng.random() < 0.5:
            cut += int(rng.integers(1, 50))  # deletion
        else:
            pieces.append(out[cut : cut + int(rng.integers(1, 50))])  # dup
        cur = min(cut, len(out))
    pieces.append(out[cur:])
    return np.concatenate(pieces)


_ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def _write_fasta(path: str, name: str, seq: np.ndarray) -> None:
    ascii_seq = _ALPHA[seq]
    line = 80
    n_lines = (len(ascii_seq) + line - 1) // line
    padded = np.full(n_lines * line, ord(" "), dtype=np.uint8)
    padded[: len(ascii_seq)] = ascii_seq
    mat = padded.reshape(n_lines, line)
    with_nl = np.concatenate(
        [mat, np.full((n_lines, 1), ord("\n"), dtype=np.uint8)], axis=1
    )
    body = with_nl.reshape(-1).tobytes().replace(b" ", b"")
    with open(path, "wb") as f:
        f.write(b">" + name.encode() + b"\n")
        f.write(body)


def main() -> None:
    from agc_tpu.core.compressor import CompressorParams, create_archive
    from agc_tpu.core.decompressor import Decompressor

    rng = np.random.default_rng(20260816)
    tmp = tempfile.mkdtemp(prefix="agc_tpu_bench_")

    ref = _make_seq(rng, REF_MB << 20)
    files = [os.path.join(tmp, "ref.fa")]
    _write_fasta(files[0], "chr1", ref)
    total_bases = len(ref)
    for i in range(N_SAMPLES):
        mut = _mutate(rng, ref)
        p = os.path.join(tmp, f"s{i}.fa")
        _write_fasta(p, "chr1", mut)
        files.append(p)
        total_bases += len(mut)

    # -- warmup: identical workload, so every kernel shape is compiled
    #    (and lands in the persistent cache) before the measured run
    t0 = time.time()
    create_archive(os.path.join(tmp, "warm.agc"), files, CompressorParams(profile=PROFILE))
    print(f"# warmup (incl. compiles): {time.time() - t0:.2f}s", file=sys.stderr)

    # -- measured runs: MINIMUM of 5 (timeit's rationale: the workload is
    #    deterministic, so all variance is interference — here the shared
    #    remote tunnel drifts 2-4x between phases; the fastest run is the
    #    best estimate of the code's actual speed). All runs printed for
    #    transparency.
    archive = os.path.join(tmp, "bench.agc")
    times = []
    for _ in range(5):
        t0 = time.time()
        create_archive(archive, files, CompressorParams(profile=PROFILE))
        times.append(time.time() - t0)
    dt = min(times)
    print(f"# runs: {['%.2f' % t for t in times]}", file=sys.stderr)

    # correctness spot check: extract one sample, compare
    d = Decompressor(archive)
    got = d.get_contig_seq(f"s{N_SAMPLES - 1}", "chr1")
    d.close()
    raw = open(files[-1], "rb").read().split(b"\n", 1)[1].replace(b"\n", b"")
    assert got == raw, "round-trip mismatch in benchmark"

    value = total_bases / dt
    archive_size = os.path.getsize(archive)
    result = {
        "metric": "create_bases_per_s",
        "value": round(value, 1),
        "unit": "bases/s",
        "vs_baseline": round(value / BASELINE_BASES_PER_S, 4),
    }
    print(json.dumps(result))
    print(
        f"# {total_bases} bases in {dt:.2f}s; archive {archive_size} bytes "
        f"(ratio {total_bases / archive_size:.1f}:1)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
