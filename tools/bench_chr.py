"""Chr-scale create benchmark: 1 reference + N resequenced samples of
one REF_MB-sized contig each (BASELINE.md's "chr-scale" row; the
wide-candidate regime VERDICT round-2 item 3 asks to measure with the
device matcher engaged).

Usage:
    python tools/bench_chr.py [--ref-mb 64] [--samples 2] [--runs 2]
                              [--profile tpu-rans] [--snp-rate 0.001]
                              [--indels 8]

Device-match A/B is driven by the caller's environment:
    AGC_TPU_DEVICE_MATCH=0     host-only candidate estimation
    AGC_TPU_DEVICE_MATCH=auto  gate on AGC_TPU_MATCH_MIN_SYMS (default)
    AGC_TPU_DEVICE_MATCH=1     force every search through the device

Prints per-run wall + the StageTimers report of the LAST run (so the
device_match stage time and the host-side match_contig wall are visible
side by side).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _make_seq, _write_fasta  # noqa: E402


def _mutate(rng, seq, snp_rate, n_indels):
    out = seq.copy()
    n_sub = max(1, int(len(seq) * snp_rate))
    pos = rng.integers(0, len(seq), size=n_sub)
    out[pos] = (out[pos] + rng.integers(1, 4, size=n_sub)) % 4
    if n_indels <= 0:  # SNP-only workload: --indels 0
        return out
    pieces = []
    cur = 0
    for _ in range(n_indels):
        cut = int(rng.integers(cur + 1, cur + max(2, len(seq) // n_indels)))
        if cut >= len(out) - 1:
            break
        pieces.append(out[cur:cut])
        if rng.random() < 0.5:
            cut += int(rng.integers(1, 50))
        else:
            pieces.append(out[cut : cut + int(rng.integers(1, 50))])
        cur = min(cut, len(out))
    pieces.append(out[cur:])
    return np.concatenate(pieces)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-mb", type=int, default=64)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--profile", default="tpu-rans")
    ap.add_argument("--snp-rate", type=float, default=0.001)
    ap.add_argument("--indels", type=int, default=8)
    args = ap.parse_args()

    from agc_tpu.core.compressor import CompressorParams, create_archive

    rng = np.random.default_rng(20260820)
    tmp = tempfile.mkdtemp(prefix="agc_tpu_chr_")
    ref = _make_seq(rng, args.ref_mb << 20)
    files = [os.path.join(tmp, "ref.fa")]
    _write_fasta(files[0], "chr1", ref)
    total = len(ref)
    for i in range(args.samples):
        mut = _mutate(rng, ref, args.snp_rate, args.indels)
        p = os.path.join(tmp, f"s{i}.fa")
        _write_fasta(p, "chr1", mut)
        files.append(p)
        total += len(mut)

    print(
        f"# chr-scale: {args.samples + 1} x {args.ref_mb} MB, "
        f"snp={args.snp_rate} indels={args.indels} "
        f"profile={args.profile} "
        f"AGC_TPU_DEVICE_MATCH={os.environ.get('AGC_TPU_DEVICE_MATCH', 'auto')}",
        file=sys.stderr,
    )
    params = CompressorParams(profile=args.profile, verbosity=1)
    best = None
    for r in range(args.runs):
        t0 = time.time()
        create_archive(os.path.join(tmp, f"a{r}.agc"), files, params)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(
            f"# run {r}: {dt:.2f}s  ({total / dt / 1e6:.1f} Mbases/s)",
            file=sys.stderr,
        )
    print(
        f"RESULT {total / best / 1e6:.1f} Mbases/s best "
        f"({total} bases in {best:.2f}s)"
    )


if __name__ == "__main__":
    main()
