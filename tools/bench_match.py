"""Microbench: candidate-search estimates, host exact walk vs device
batched kernel (ops/match.py) + host exact of the shortlist only.

Shapes a chr-scale one-splitter search (reference:
find_cand_segment_with_one_splitter, agc_compressor.cpp:1630-1808):
a batch of segments, each ranked against C candidate group references.
The host path runs C bound-pruned exact walks per segment (what the
reference does per worker thread); the device path ranks all
(segment, candidate) pairs in one dispatch and exact-walks only the
shortlist.

Usage: python tools/bench_match.py [--segs N] [--cands C] [--seg-kb K]
Env: JAX_PLATFORMS=cpu to force the CPU backend (default: real device).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segs", type=int, default=64)
    ap.add_argument("--cands", type=int, default=24)
    ap.add_argument("--seg-kb", type=int, default=60)
    ap.add_argument("--mml", type=int, default=20)
    args = ap.parse_args()

    from agc_tpu.core.lz import LZDiff
    from agc_tpu.ops import match as M

    rng = np.random.default_rng(20260818)
    seg_len = args.seg_kb * 1000
    key_len = args.mml - 3

    # candidate group references: drifted variants of a few base
    # sequences (so estimates are informative, not uniform)
    bases = [rng.integers(0, 4, size=seg_len, dtype=np.uint8)
             for _ in range(4)]
    refs = {}
    for gid in range(args.cands):
        b = bases[gid % len(bases)].copy()
        pos = rng.integers(0, seg_len, size=seg_len // 100)
        b[pos] = (b[pos] + rng.integers(1, 4, size=len(pos))) % 4
        refs[gid] = b

    # segments: near one of the refs each
    segs = []
    for i in range(args.segs):
        src = refs[int(rng.integers(0, args.cands))].copy()
        pos = rng.integers(0, seg_len, size=seg_len // 500)
        src[pos] = (src[pos] + rng.integers(1, 4, size=len(pos))) % 4
        segs.append(src)

    pair_syms = args.segs * args.cands * seg_len

    # -- host path: exact walks with shrinking bound, like the matcher
    lzs = {g: LZDiff(min_match_len=args.mml) for g in refs}
    for g, lz in lzs.items():
        lz.prepare(refs[g].tobytes())
    host_choice = []
    t0 = time.time()
    for s in segs:
        sb = s.tobytes()
        bound = len(s) - 16
        best, best_g = bound, -1
        for g in range(args.cands):
            e = lzs[g].estimate(sb, bound)
            if e and e < best:
                best, best_g = e, g
            if e and e < bound:
                bound = e
        host_choice.append(best_g)
    host_dt = time.time() - t0

    # -- device path: one batched ranking dispatch + shortlist exacts
    bank = M.RefBank(key_len)
    cands = [(g, False) for g in range(args.cands)]

    def run_device():
        queries = [M.MatchQuery(s, cands) for s in segs]
        M.estimate_batch(queries, bank, lambda g: refs[g].tobytes())
        out = []
        n_exact = 0
        for s, q in zip(segs, queries):
            keep = M.shortlist(q.ests, margin=0.15, extra=1)
            sb = s.tobytes()
            bound = len(s) - 16
            best, best_g = bound, -1
            for gi in keep:
                g = cands[gi][0]
                e = lzs[g].estimate(sb, bound)
                n_exact += 1
                if e and e < best:
                    best, best_g = e, g
                if e and e < bound:
                    bound = e
            out.append(best_g)
        return out, n_exact

    run_device()  # warmup: kernel compiles + bank build
    t0 = time.time()
    dev_choice, n_exact = run_device()
    dev_dt = time.time() - t0

    agree = sum(a == b for a, b in zip(host_choice, dev_choice))
    print(
        f"pairs: {args.segs}x{args.cands} x {seg_len} syms "
        f"({pair_syms / 1e6:.0f} Mpair-syms)"
    )
    print(f"host exact sweep : {host_dt:.3f}s  "
          f"({pair_syms / host_dt / 1e6:.0f} Mpair-syms/s)")
    print(f"device + shortlist: {dev_dt:.3f}s  "
          f"({pair_syms / dev_dt / 1e6:.0f} Mpair-syms/s), "
          f"{n_exact}/{args.segs * args.cands} host walks left")
    print(f"choice agreement : {agree}/{args.segs} "
          f"(speedup {host_dt / dev_dt:.2f}x)")


if __name__ == "__main__":
    main()
