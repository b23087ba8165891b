#!/usr/bin/env python3
"""Multi-shard create scaling measurement (round-4 verdict item 6).

Wall-clocks `create --shards N` (thread or process workers) for N in
--shards-list on a structured workload, with the phase split (boot /
shard compute / merge, and the merge's matching-replay share) from
AGC_TPU_SHARD_TIMINGS. One sanity note belongs next to every number:
THIS box has a single CPU core, so process shards timeshare one core —
the interesting outputs here are (a) the phase anatomy, (b) the merge
ceiling (serial writer share), (c) archive-size stability, not absolute
speedup. On a real pod each shard owns a host.

Usage:
  python tools/bench_shards.py --mbase 500 --samples 8 --shards-list 1,2,4
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _make_structured_ref, _mutate, _write_fasta  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbase", type=float, default=500)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--shards-list", default="1,2,4")
    ap.add_argument("--worker", default="process",
                    choices=("process", "thread"))
    ap.add_argument("--profile", default="tpu-rans")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="agc_shards_")
    rng = np.random.default_rng(20260820)
    per = int(args.mbase * 1e6) // args.samples
    ref = _make_structured_ref(rng, per)
    files = [os.path.join(tmp, "ref.fa")]
    _write_fasta(files[0], "chr1", ref)
    total = len(ref)
    for i in range(1, args.samples):
        m = _mutate(rng, ref)
        p = os.path.join(tmp, f"s{i}.fa")
        _write_fasta(p, "chr1", m)
        files.append(p)
        total += len(m)
    print(f"# workload {total / 1e6:.0f} Mbase, {args.samples} samples",
          file=sys.stderr)

    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""),
               AGC_TPU_SHARD_TIMINGS="1")
    rows = []
    for n in [int(x) for x in args.shards_list.split(",")]:
        out = os.path.join(tmp, f"sh{n}.agc")
        cmd = [sys.executable, "-m", "agc_tpu.cli.main", "create",
               "-o", out, "--profile", args.profile,
               "--shards", str(n), "--shard-workers", args.worker, *files]
        t0 = time.time()
        p = subprocess.run(cmd, env=env, capture_output=True, text=True)
        wall = time.time() - t0
        assert p.returncode == 0, p.stderr[-2000:]
        timing = {}
        for line in p.stderr.splitlines():
            if line.startswith("AGC_TPU_SHARD_TIMINGS "):
                timing = json.loads(line.split(" ", 1)[1])
        row = {
            "shards": n,
            "worker": args.worker,
            "wall_s": round(wall, 1),
            "mbases_per_s": round(total / wall / 1e6, 1),
            "archive_bytes": os.path.getsize(out),
            **timing,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["archive_bytes"]
    for r in rows:
        r["size_vs_1shard"] = round(r["archive_bytes"] / base, 4)
    print("# table:")
    for r in rows:
        print("# " + json.dumps(r))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
