#!/usr/bin/env python3
"""Scale benchmark: structured multi-Gbase collections, ours vs the
reference binary on the same box/core (round-4 verdict items 4+5).

Generates an HPP-like collection (repeat-family reference assembly split
into contigs + resequenced samples with SNPs/indels), then measures:

- create wall + peak RSS (ours, per profile; reference binary)
- archive sizes
- full-collection extraction (getcol) wall for both tools
- cross-tool extraction equality (reference binary reads our archive)
- optional append chain (append N extra samples, re-extract)

Every create/extract runs in a SUBPROCESS so peak RSS is isolated
(/proc-independent: resource.getrusage of the child tree).

Usage:
  python tools/bench_scale.py --gbase 1.07 --samples 8 --contigs 8
  python tools/bench_scale.py --gbase 5 --samples 10 --contigs 25 \
      --append 2 --profile tpu-rans --keep
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

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def write_multi_fasta(path: str, contigs: list[tuple[str, np.ndarray]]):
    with open(path, "wb") as f:
        for name, seq in contigs:
            body = ALPHA[seq]
            f.write(b">" + name.encode() + b"\n")
            n = len(body)
            line = 80
            n_lines = (n + line - 1) // line
            padded = np.full(n_lines * line, 0, dtype=np.uint8)
            padded[:n] = body
            mat = padded.reshape(n_lines, line)
            out = np.concatenate(
                [mat, np.full((n_lines, 1), ord("\n"), np.uint8)], axis=1
            ).reshape(-1)
            # drop pad zeros of the last line
            tail_pad = n_lines * line - n
            if tail_pad:
                out = np.concatenate([out[: -tail_pad - 1], out[-1:]])
            f.write(out.tobytes())


def gen_collection(tmp: str, total_bases: int, n_samples: int,
                   n_contigs: int, seed: int = 20260820):
    """Reference sample + (n_samples-1) resequenced samples, each split
    into n_contigs contigs. Returns (files, total_written_bases)."""
    rng = np.random.default_rng(seed)
    per_sample = total_bases // n_samples
    t0 = time.time()
    ref = _make_structured_ref(rng, per_sample)
    bounds = np.linspace(0, len(ref), n_contigs + 1).astype(np.int64)
    files = []
    total = 0

    def emit(si: int, seq: np.ndarray):
        nonlocal total
        name = "ref" if si == 0 else f"s{si}"
        path = os.path.join(tmp, f"{name}.fa")
        contigs = [
            (f"chr{ci + 1}", seq[bounds[ci]: bounds[ci + 1]])
            for ci in range(n_contigs)
        ]
        write_multi_fasta(path, contigs)
        files.append(path)
        total += len(seq)

    emit(0, ref)
    for si in range(1, n_samples):
        emit(si, _mutate(rng, ref))
    print(f"# generated {total / 1e9:.2f} Gbase in {time.time() - t0:.0f}s",
          file=sys.stderr)
    return files, total


def run_child(cmd: list[str], env=None) -> tuple[float, int, int]:
    """Run cmd; returns (wall_s, peak_rss_mb, returncode). Peak RSS is
    THIS child's own VmHWM (polled from /proc — getrusage(CHILDREN) is a
    monotone high-water over every previous child, which would let the
    first big create mask all later legs)."""
    t0 = time.time()
    p = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    peak_kb = 0
    status = f"/proc/{p.pid}/status"
    while p.poll() is None:
        try:
            with open(status) as f:
                for line in f:
                    if line.startswith("VmHWM:"):
                        peak_kb = max(peak_kb, int(line.split()[1]))
                        break
        except OSError:
            pass
        time.sleep(0.2)
    wall = time.time() - t0
    return wall, peak_kb // 1024, p.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbase", type=float, default=1.07)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--contigs", type=int, default=8)
    ap.add_argument("--profile", default="tpu-rans")
    ap.add_argument("--append", type=int, default=0,
                    help="extra samples appended after create")
    ap.add_argument("--ref-bin", default=os.environ.get(
        "AGC_REF_BIN", "/tmp/refbuild/bin/agc"))
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-getcol", action="store_true")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--runs", type=int, default=1,
                    help="create repetitions (first may pay compiles)")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="agc_scale_", dir="/tmp")
    # --gbase names the CREATE volume; appended samples are extra
    total_target = int(args.gbase * 1e9)
    n_total = args.samples + args.append
    files, total = gen_collection(
        tmp, total_target * n_total // args.samples, n_total, args.contigs
    )
    create_files = files[: args.samples]
    append_files = files[args.samples:]
    create_bases = total * args.samples // n_total

    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    ours = [sys.executable, "-m", "agc_tpu.cli.main"]
    rows = []

    our_archive = os.path.join(tmp, "ours.agc")
    for r in range(args.runs):
        wall, rss, rc = run_child(
            ours + ["create", "-o", our_archive,
                    "--profile", args.profile, *create_files], env)
        assert rc == 0, "our create failed"
        rows.append({
            "leg": f"create ours ({args.profile}) run{r}",
            "wall_s": round(wall, 1),
            "mbases_per_s": round(create_bases / wall / 1e6, 1),
            "peak_rss_mb": rss,
            "archive_bytes": os.path.getsize(our_archive),
        })
        print(json.dumps(rows[-1]), flush=True)

    if args.append:
        cur = our_archive
        t0 = time.time()
        for i, f in enumerate(append_files):
            nxt = os.path.join(tmp, f"ours_app{i}.agc")
            # profile is inherited from the source archive on append
            wall, rss, rc = run_child(
                ours + ["append", cur, "-o", nxt, f], env)
            assert rc == 0, "our append failed"
            cur = nxt
        rows.append({
            "leg": f"append ours x{args.append}",
            "wall_s": round(time.time() - t0, 1),
            "archive_bytes": os.path.getsize(cur),
        })
        print(json.dumps(rows[-1]), flush=True)

    if not args.skip_getcol:
        outdir = os.path.join(tmp, "out_ours")
        os.makedirs(outdir, exist_ok=True)
        wall, rss, rc = run_child(
            ours + ["getcol", "-o", outdir, our_archive], env)
        assert rc == 0, "our getcol failed"
        rows.append({
            "leg": "getcol ours",
            "wall_s": round(wall, 1),
            "mbases_per_s": round(create_bases / wall / 1e6, 1),
            "peak_rss_mb": rss,
        })
        print(json.dumps(rows[-1]), flush=True)

    if not args.skip_ref and os.path.exists(args.ref_bin):
        ref_env = dict(env, ASAN_OPTIONS="detect_leaks=0")
        ref_archive = os.path.join(tmp, "ref.agc")
        wall, rss, rc = run_child(
            [args.ref_bin, "create", "-o", ref_archive, *create_files],
            ref_env)
        assert rc == 0, "reference create failed"
        rows.append({
            "leg": "create reference-binary",
            "wall_s": round(wall, 1),
            "mbases_per_s": round(create_bases / wall / 1e6, 1),
            "peak_rss_mb": rss,
            "archive_bytes": os.path.getsize(ref_archive),
        })
        print(json.dumps(rows[-1]), flush=True)

        if not args.skip_getcol:
            outdir = os.path.join(tmp, "out_ref")
            os.makedirs(outdir, exist_ok=True)
            wall, rss, rc = run_child(
                [args.ref_bin, "getcol", "-o", outdir + "/", ref_archive],
                ref_env)
            rows.append({
                "leg": "getcol reference-binary (own archive)",
                "wall_s": round(wall, 1),
                "mbases_per_s": round(create_bases / wall / 1e6, 1),
                "rc": rc,
            })
            print(json.dumps(rows[-1]), flush=True)

        # cross-tool: the reference binary extracts ONE sample from OUR
        # archive; equality vs the input proves at-scale compatibility.
        # (zstd profile only: tpu-rans parts need our reader.)
        if args.profile == "zstd":
            s = f"s{args.samples - 1}"
            got_fa = os.path.join(tmp, "xref_got.fa")
            t0 = time.time()
            with open(got_fa, "wb") as fh:
                p = subprocess.run([args.ref_bin, "getset", our_archive, s],
                                   env=ref_env, stdout=fh,
                                   stderr=subprocess.DEVNULL)
            wall = time.time() - t0
            ok = p.returncode == 0
            if ok:
                import hashlib

                def body(path):
                    h = hashlib.sha256()
                    with open(path, "rb") as f:
                        for line in f:
                            if not line.startswith(b">"):
                                h.update(line.rstrip(b"\n"))
                    return h.hexdigest()

                ok = body(got_fa) == body(os.path.join(tmp, s + ".fa"))
            rows.append({"leg": "reference reads our archive",
                         "equal": bool(ok), "wall_s": round(wall, 1)})
            print(json.dumps(rows[-1]), flush=True)

    print("# table:")
    for r in rows:
        print("# " + json.dumps(r))
    if not args.keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
