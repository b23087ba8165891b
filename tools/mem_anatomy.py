#!/usr/bin/env python3
"""RSS timeline of a create/getcol run (round-4 verdict item: memory
parity at scale — peak RSS ours 7.8 GB vs reference 4.3 GB at 5 Gbase).

Generates (or reuses --data-dir) a structured collection, runs the
requested command in a child, polls /proc/<pid>/status VmRSS at 10 Hz,
and prints a compact timeline plus the peak. The child's stderr (stage
timers at -v 2) is teed to <out>.stderr for correlation.

Usage:
  python tools/mem_anatomy.py --gbase 2 --samples 4 --contigs 25 \
      --data-dir /tmp/agc_mem2g create
  python tools/mem_anatomy.py --data-dir /tmp/agc_mem2g getcol
  python tools/mem_anatomy.py --data-dir /tmp/agc_mem2g --ref-bin \
      /tmp/refbuild/bin/agc create   # reference binary, same data
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scale import gen_collection  # noqa: E402


def poll_run(cmd, env, stderr_path):
    t0 = time.time()
    with open(stderr_path, "wb") as ef:
        p = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                             stderr=ef)
        samples = []  # (t, rss_mb)
        status = f"/proc/{p.pid}/status"
        peak = 0
        while p.poll() is None:
            try:
                with open(status) as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            rss = int(line.split()[1]) // 1024
                            samples.append((time.time() - t0, rss))
                            peak = max(peak, rss)
                            break
            except OSError:
                pass
            time.sleep(0.1)
    return time.time() - t0, peak, samples, p.returncode


def timeline(samples, step=1.0):
    """One line per `step` seconds: max RSS within the bucket."""
    out = []
    if not samples:
        return out
    cur, hi = 0.0, 0
    for t, r in samples:
        while t >= cur + step:
            out.append((cur, hi))
            cur += step
            hi = 0
        hi = max(hi, r)
    out.append((cur, hi))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["create", "getcol"])
    ap.add_argument("--gbase", type=float, default=2.0)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--contigs", type=int, default=25)
    ap.add_argument("--profile", default="zstd")
    ap.add_argument("--data-dir", default="/tmp/agc_mem")
    ap.add_argument("--ref-bin", default=None,
                    help="run the reference binary instead of ours")
    ap.add_argument("--step", type=float, default=1.0)
    args = ap.parse_args()

    d = args.data_dir
    manifest = os.path.join(d, "manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            m = json.load(f)
        files, total = m["files"], m["total"]
    else:
        os.makedirs(d, exist_ok=True)
        files, total = gen_collection(
            d, int(args.gbase * 1e9), args.samples, args.contigs)
        with open(manifest, "w") as f:
            json.dump({"files": files, "total": total}, f)
        print(f"generated {total/1e9:.2f} Gbase into {d}", flush=True)

    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    tag = "ref" if args.ref_bin else "ours"
    arc = os.path.join(d, f"{tag}.agc")
    if args.ref_bin:
        base = [args.ref_bin]
        create = base + ["create", "-o", arc, "-t", "1", *files]
        getcol = base + ["getcol", "-o", os.path.join(d, "out_ref"), arc]
    else:
        base = [sys.executable, "-m", "agc_tpu.cli.main"]
        create = base + ["create", "-o", arc, "-v", "2",
                         "--profile", args.profile, *files]
        getcol = base + ["getcol", "-o", os.path.join(d, "out_ours"),
                         "-v", "2", arc]
    if args.mode == "getcol":
        os.makedirs(os.path.join(d, f"out_{tag}"), exist_ok=True)
        cmd = getcol
    else:
        cmd = create
    err = os.path.join(d, f"{tag}_{args.mode}.stderr")
    wall, peak, samples, rc = poll_run(cmd, env, err)
    print(f"# {tag} {args.mode}: wall {wall:.1f} s  peak RSS {peak} MB  "
          f"rc={rc}  ({total/wall/1e6:.1f} Mbases/s)", flush=True)
    for t, r in timeline(samples, args.step):
        bar = "#" * int(r / 200)
        print(f"{t:6.0f}s {r:6d} MB {bar}")
    if rc != 0:
        sys.stderr.write(open(err).read()[-2000:])
        sys.exit(1)


if __name__ == "__main__":
    main()
