"""End-to-end compression benchmark (driver contract: prints ONE JSON line).

Measures create-archive throughput (bases/s) on a deterministic synthetic
collection shaped like the reference tool's headline workload (HPP
haplotype collections, reference README.md:10-13): one reference genome
built from REPEAT FAMILIES plus unique backbone (real assemblies'
duplication structure is what loads the matcher and gives AGC its 200:1
headline ratio — a uniform-random reference exercises neither), and
resequenced samples mutated from it (SNPs + indels).

Baseline: the reference's published aggregate compression throughput of
~400 Mbases/s on a 32-thread Threadripper 3990X (reference README.md:12-13).

Capture protocol (round-4): WARM UNTIL CONVERGED — the remote-tunneled
chip behind this box drifts 5-15x between sessions, and round-3's capture
caught a still-warming tail (runs 21.2->3.7 s, monotonically declining).
Warmup repeats until two consecutive runs agree within 15% (cap 6), then
5 measured runs are taken; min is reported (the workload is
deterministic, so all variance is interference). The scan pipeline
itself hedges device scans to an exact native host scan when the link is
degraded (ops/kmers.py ScanBatcher), so a bad-tunnel session degrades to
the host floor instead of the tunnel's floor.

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
# plain: round-1..3's uniform-random reference (kept for comparison runs)
STRUCTURE = os.environ.get("AGC_TPU_BENCH_STRUCTURE", "repeats")


def _make_seq(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(0, 4, size=n, dtype=np.uint8)


def _make_structured_ref(rng: np.random.Generator, n: int) -> np.ndarray:
    """Reference with repeat families: ~40% of the sequence is copies of
    a library of repeat units (0.5-8 kb) at ~1% divergence, interleaved
    with unique backbone. This is the duplication structure of real
    assemblies (segmental duplications, mobile elements) that loads the
    matcher's candidate searches — a uniform-random reference has no
    duplicated k-mers, so splitter discovery sees only singletons."""
    lib = [
        _make_seq(rng, int(rng.integers(500, 8000)))
        for _ in range(48)
    ]
    pieces = []
    total = 0
    while total < n:
        if rng.random() < 0.45:
            unit = lib[int(rng.integers(len(lib)))]
            copy = unit.copy()
            n_sub = max(1, len(copy) // 100)  # ~1% divergence per copy
            pos = rng.integers(0, len(copy), size=n_sub)
            copy[pos] = (copy[pos] + rng.integers(1, 4, size=n_sub)) % 4
            pieces.append(copy)
            total += len(copy)
        else:
            m = int(rng.integers(2000, 20000))
            pieces.append(_make_seq(rng, m))
            total += m
    return np.concatenate(pieces)[:n]


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

    if STRUCTURE == "plain":
        ref = _make_seq(rng, REF_MB << 20)
    else:
        ref = _make_structured_ref(rng, REF_MB << 20)
    files = [os.path.join(tmp, "ref.fa")]
    _write_fasta(files[0], "chr1", ref)
    total_bases = len(ref)
    for i in range(N_SAMPLES):
        mut = _mutate(rng, ref)
        p = os.path.join(tmp, f"s{i}.fa")
        _write_fasta(p, "chr1", mut)
        files.append(p)
        total_bases += len(mut)

    def one_run(path: str) -> float:
        t0 = time.time()
        create_archive(path, files, CompressorParams(profile=PROFILE))
        return time.time() - t0

    # -- warmup UNTIL CONVERGED: identical workload, so every kernel
    #    shape compiles (and lands in the persistent cache) on the first
    #    pass; further passes warm device/link state. Stop when two
    #    consecutive runs agree within 15% (cap 6 runs) — round-3's
    #    capture took its "measured" runs while still on the warming
    #    slope (21.2 -> 3.7 s declining across all 5).
    warm = []
    for i in range(6):
        warm.append(one_run(os.path.join(tmp, "warm.agc")))
        print(
            f"# warmup {i}: {warm[-1]:.2f}s"
            + (" (incl. compiles)" if i == 0 else ""),
            file=sys.stderr,
        )
        if (
            len(warm) >= 2
            and max(warm[-2:]) <= min(warm[-2:]) * 1.15
        ):
            break

    # -- measured runs: MINIMUM of 5 (timeit's rationale: the workload is
    #    deterministic, so all variance is interference — here the shared
    #    remote tunnel drifts between phases; the fastest run is the best
    #    estimate of the code's actual speed). All runs printed for
    #    transparency.
    archive = os.path.join(tmp, "bench.agc")
    from agc_tpu.ops import kmers as _km

    dev0 = _km.SCAN_STATS.get("device_syms", 0)
    host0 = _km.SCAN_STATS.get("host_syms", 0)
    times = [one_run(archive) for _ in range(5)]
    dt = min(times)
    print(f"# runs: {['%.2f' % t for t in times]}", file=sys.stderr)
    print(
        f"# spread max/min: {max(times) / min(times):.2f}", file=sys.stderr
    )
    # device-utilization over the measured window (the MFU analogue):
    # achieved device scan syms/s vs the measured ~40 Gsym/s chip
    # ceiling, plus the engine split and the link state the adaptive
    # machinery saw — so a host-pinned capture is self-documenting
    du = _km.device_util(sum(times))
    dev_d = du["device_syms"] - dev0
    host_d = du["host_syms"] - host0
    share = dev_d / max(1, dev_d + host_d)
    ach = dev_d / sum(times)
    rtt = du["link_rtt_s"]
    print(
        f"# device_util: scan {ach / 1e6:.1f} Msym/s ="
        f" {ach / du['ceiling_syms_per_s'] * 100:.3f}% of"
        f" {du['ceiling_syms_per_s'] / 1e9:.0f} Gsym/s ceiling;"
        f" device share {share * 100:.1f}% of scanned symbols;"
        f" link_rtt {rtt * 1e3:.1f} ms;"
        if rtt is not None
        else f"# device_util: scan {ach / 1e6:.1f} Msym/s; device share"
        f" {share * 100:.1f}%; link_rtt unprobed (degraded/pinned);",
        file=sys.stderr,
    )
    print(
        f"# engine state: degraded={_km.link_degraded()}"
        f" flush_quantum={_km.ScanBatcher._auto_flush_symbols() >> 20} MB"
        f" hedges={_km.SCAN_STATS['hedges']}"
        f" probe_bar={_km.SCAN_STATS['probe_bar']}",
        file=sys.stderr,
    )

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
        # the MFU analogue: device scan syms/s over the measured window
        # as a fraction of the ~40 Gsym/s chip ceiling (0 = host-pinned)
        "device_util": round(ach / du["ceiling_syms_per_s"], 6),
    }
    print(json.dumps(result))
    print(
        f"# {total_bases} bases in {dt:.2f}s; archive {archive_size} bytes "
        f"(ratio {total_bases / archive_size:.1f}:1)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
    # hard exit: on a wedged tunnel a daemon transfer thread can be
    # stuck inside runtime C++; normal interpreter teardown then aborts
    # ("FATAL: exception not rethrown") AFTER the result line - and the
    # driver records the exit code. Everything is printed and flushed.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
