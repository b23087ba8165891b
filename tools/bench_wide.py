"""Wide-candidate create benchmark: rearranged samples grow every
splitter's terminator list, so contig-end one-splitter searches sweep
many candidate groups — the regime the batched device estimate kernel
(ops/match.py) targets (VERDICT round-2 item 3's "wide-candidate
synthetic"; reference: find_cand_segment_with_one_splitter,
agc_compressor.cpp:1630-1808).

Each sample is a block permutation of the reference: contigs are runs
of a few ~segment-sized blocks in shuffled order. Every junction inside
a contig registers a new (S_i, S_j) group (missing-middle path), and
every contig HEAD/TAIL runs a one-splitter search whose candidate list
is that splitter's accumulated terminator set.

Usage:
    python tools/bench_wide.py [--ref-mb 8] [--samples 20] [--runs 2]
                               [--blocks-per-contig 4] [--profile tpu-rans]

A/B via env:  AGC_TPU_DEVICE_MATCH=0 | auto | 1
              AGC_TPU_MATCH_MIN_SYMS=<gate, default 24M>
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _make_seq  # noqa: E402

_ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def _write_multi_fasta(path: str, contigs: list[tuple[str, np.ndarray]]):
    with open(path, "wb") as f:
        for name, seq in contigs:
            ascii_seq = _ALPHA[seq]
            f.write(b">" + name.encode() + b"\n")
            line = 80
            for i in range(0, len(ascii_seq), line):
                f.write(ascii_seq[i : i + line].tobytes() + b"\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-mb", type=int, default=8)
    ap.add_argument("--samples", type=int, default=20)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--blocks-per-contig", type=int, default=4)
    ap.add_argument("--block-kb", type=int, default=100)
    ap.add_argument("--snp-rate", type=float, default=0.0005)
    ap.add_argument("--profile", default="tpu-rans")
    args = ap.parse_args()

    from agc_tpu.core.compressor import CompressorParams, create_archive

    rng = np.random.default_rng(20260821)
    tmp = tempfile.mkdtemp(prefix="agc_tpu_wide_")
    ref = _make_seq(rng, args.ref_mb << 20)
    files = [os.path.join(tmp, "ref.fa")]
    _write_multi_fasta(files[0], [("chr1", ref)])
    total = len(ref)

    block = args.block_kb << 10
    n_blocks = len(ref) // block
    for i in range(args.samples):
        order = rng.permutation(n_blocks)
        contigs = []
        bpc = args.blocks_per_contig
        for c in range(0, n_blocks, bpc):
            take = order[c : c + bpc]
            seq = np.concatenate([ref[b * block : (b + 1) * block] for b in take])
            # sprinkle SNPs so members aren't byte-identical to the blocks
            n_sub = max(1, int(len(seq) * args.snp_rate))
            pos = rng.integers(0, len(seq), size=n_sub)
            seq = seq.copy()
            seq[pos] = (seq[pos] + rng.integers(1, 4, size=n_sub)) % 4
            contigs.append((f"ctg{c // bpc}", seq))
            total += len(seq)
        p = os.path.join(tmp, f"s{i}.fa")
        _write_multi_fasta(p, contigs)
        files.append(p)

    print(
        f"# wide-candidate: ref {args.ref_mb} MB + {args.samples} samples of "
        f"{n_blocks}x{args.block_kb}kb shuffled blocks "
        f"({args.blocks_per_contig}/contig) profile={args.profile} "
        f"AGC_TPU_DEVICE_MATCH={os.environ.get('AGC_TPU_DEVICE_MATCH', 'auto')} "
        f"MIN_SYMS={os.environ.get('AGC_TPU_MATCH_MIN_SYMS', '(24M)')}",
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
