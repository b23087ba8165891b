#!/bin/bash
# Hardware validation pass (run when the TPU tunnel is healthy):
#  1. CLI end-to-end roundtrip on a fresh shape (SNPs/indels/N-runs)
#  2. bench.py on the default (zstd) profile  -> the comparable number
#  3. bench.py on the tpu-rans profile        -> the TPU-native profile number
# Usage: bash tools/hw_validate.sh [workdir]
set -u
D=${1:-$(mktemp -d)}
cd "$D" || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
echo "== workdir $D"

python - <<'PYEOF'
import random
random.seed(7)
def write_fa(path, name, seq):
    with open(path, 'w') as f:
        f.write(f">{name}\n")
        for i in range(0, len(seq), 80):
            f.write(seq[i:i+80] + "\n")
ref = ''.join(random.choice('ACGT') for _ in range(200000))
write_fa('ref.fa', 'chr1', ref)
s = list(ref)
for _ in range(300):
    p = random.randrange(len(s)); s[p] = random.choice('ACGT')
s[50000:50000] = list('ACGTACGT')
s[120000:120020] = list('N'*20)
write_fa('s1.fa', 'chr1', ''.join(s))
PYEOF

echo "== create (cold compiles may take minutes on a fresh shape)"
timeout 1800 python -m agc_tpu.cli.main create -o test.agc ref.fa s1.fa -v 2 || exit 1
timeout 300 python -m agc_tpu.cli.main getctg test.agc chr1@s1 > got.fa || exit 1
python - <<'PYEOF' || exit 1
def body(p):
    return ''.join(l.strip() for l in open(p) if not l.startswith('>'))
assert body('got.fa') == body('s1.fa'), "roundtrip mismatch"
print("roundtrip byte-identical")
PYEOF
timeout 300 python -m agc_tpu.cli.main getctg test.agc chr1@s1:1000-1099 | head -2
echo "== bench (zstd profile)"
(cd /root/repo && timeout 3000 python bench.py)
echo "== bench (tpu-rans profile)"
(cd /root/repo && AGC_TPU_BENCH_PROFILE=tpu-rans timeout 3000 python bench.py)

echo "== getcol extraction rate (host path; JAX untouched after open)"
python - <<'PYEOF'
import os, time, sys
sys.path.insert(0, "/root/repo")
from agc_tpu.core.decompressor import Decompressor
d = Decompressor("test.agc")
samples = d.list_samples()
os.makedirs("out", exist_ok=True)
for s in samples:  # warm
    d.get_sample_file(f"out/{s}.fa", [s], line_length=80)
total = sum(os.path.getsize(f"out/{s}.fa") for s in samples)
best = min(
    (lambda t0: [d.get_sample_file(f"out/{s}.fa", [s], line_length=80)
                 for s in samples] and time.time() - t0)(time.time())
    for _ in range(3)
)
print(f"getcol: {total/best/1e6:.0f} MB/s ({total} B in {best:.3f}s)")
d.close()
PYEOF
