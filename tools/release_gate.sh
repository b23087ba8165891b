#!/usr/bin/env bash
# Release gate: the reference's CI toy matrix as ONE command.
#
# Encodes the semantics of /root/reference/.github/workflows/main.yml
# (toy create/list/get matrix, -c and -a -c modes, append chains,
# adaptive append chains) plus the self-hosted param-stress run
# (-a -b 50000 -k 17 -l 15 -s 1000; linux-self-hosted.yml:95) against
# THIS implementation's CLI. Every extraction is checked with cmp
# against the original FASTA or a hand-built golden file, exactly like
# the reference's workflows.
#
# Cross-tool legs run when AGC_REF_BIN points at a reference binary
# (build one with tools/build_reference.sh): the reference must read
# archives we create, and we must read the committed toy_ex.agc.
#
# Usage: tools/release_gate.sh            # gate the working tree
#        AGC_REF_BIN=/tmp/refbuild/bin/agc tools/release_gate.sh
set -euo pipefail

REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
AGC=${AGC_TPU_BIN:-"python3 -m agc_tpu.cli.main"}

# Self-sufficient cross-tool legs (reference CI parity: main.yml always
# has the reference binary): when AGC_REF_BIN is unset/absent, build it
# from /root/reference via build_reference.sh rather than silently
# downgrading coverage. Failure to build only skips the cross legs.
if [[ -z "${AGC_REF_BIN:-}" || ! -x "${AGC_REF_BIN:-}" ]]; then
  DEFAULT_REF_BIN=${REFBUILD_DIR:-/tmp/refbuild}/bin/agc
  if [[ ! -x "$DEFAULT_REF_BIN" ]]; then
    echo "-- building reference binary (tools/build_reference.sh)"
    "$REPO/tools/build_reference.sh" >/dev/null 2>&1 || true
  fi
  [[ -x "$DEFAULT_REF_BIN" ]] && export AGC_REF_BIN="$DEFAULT_REF_BIN"
fi
TOY_SRC=${AGC_TOY_DIR:-/root/reference/toy_ex}
WORK=$(mktemp -d /tmp/agc_gate_XXXXXX)
trap 'rm -rf "$WORK"' EXIT

cp "$TOY_SRC"/ref.fa "$TOY_SRC"/a.fa "$TOY_SRC"/b.fa "$TOY_SRC"/c.fa \
   "$TOY_SRC"/ref2.fa "$TOY_SRC"/toy_ex.agc "$WORK"/
cd "$WORK"

PASS=0
step() { echo "-- $1"; PASS=$((PASS + 1)); }
agc() { $AGC "$@"; }

# ---------------------------------------------------------------- CREATE
step "create"
agc create -o toy.agc ref.fa a.fa b.fa c.fa

step "create (+gz)"
gzip -kf a.fa b.fa c.fa ref.fa
agc create -d -o t1.agc a.fa.gz a.fa 2>/dev/null || true  # duplicate pair warns
agc create -o t2.agc b.fa.gz b.fa 2>/dev/null || true
agc create -t 3 -d -o toygz.agc ref.fa.gz a.fa.gz b.fa.gz c.fa.gz

step "listref"
echo -n "ref" > rr
agc listref toy_ex.agc > r
cmp r rr

step "listset"
printf "a\nb\nc\nref\n" > list
agc listset toy.agc > list_dec
cmp list list_dec

step "listctg"
printf "a\n   chr1a\n   chr3a\n" > list
agc listctg toy.agc a > list_dec
cmp list list_dec

step "getset"
for s in a b c ref; do
  agc getset toy.agc $s > ${s}_dec.fa
  cmp $s.fa ${s}_dec.fa
done

step "getset -g (+gz)"
agc getset -g 9 toygz.agc a > a_dec.fa.gz
gzip -df a_dec.fa.gz
agc getset -g 6 toy.agc b > b_dec.fa.gz
gzip -df b_dec.fa.gz
agc getset toygz.agc c > c_dec.fa
agc getset -g 2 toy.agc ref > ref_dec.fa.gz
gzip -df ref_dec.fa.gz
cmp a.fa a_dec.fa; cmp b.fa b_dec.fa; cmp c.fa c_dec.fa; cmp ref.fa ref_dec.fa

step "getcol"
mkdir -p getcol
agc getcol -o getcol toy.agc
for s in a b c ref; do cmp $s.fa getcol/$s.fa; done

step "getctg"
head -n 2 a.fa > chr1a.fa
agc getctg toy.agc chr1a > chr1a_dec.fa
cmp chr1a.fa chr1a_dec.fa
tail -n 2 b.fa > t.fa
agc getctg toy.agc t > t_dec.fa
cmp t.fa t_dec.fa
head -n 2 ref.fa > ref-chr1.fa
agc getctg toy.agc chr1@ref > ref-chr1_dec.fa
cmp ref-chr1.fa ref-chr1_dec.fa
printf ">chr1:3-10\nTAGCTAGC\n" > ctg.fa
agc getctg toy.agc chr1@ref:3-10 > ctg_dec.fa
cmp ctg.fa ctg_dec.fa
printf ">chr3a:1-3\nGTT\n" > ctg.fa
agc getctg toy.agc chr3a:1-3 > ctg_dec.fa
cmp ctg.fa ctg_dec.fa
printf ">g h i 21:3-4\nAG\n" > ctg.fa
agc getctg toy.agc g:3-4 > ctg_dec.fa
cmp ctg.fa ctg_dec.fa

# --------------------------------------------------------------- CREATE-C
step "create -c and -a -c"
agc create -c -o toyc.agc ref2.fa c.fa
agc create -a -c ref2.fa b.fa > toy2.agc

step "listset -c"
printf "1\n2\n3\nchr1\n" > list
agc listset toyc.agc > list_dec
cmp list list_dec
printf "c\nchr1\ng\nt\n" > list
agc listset toy2.agc > list_dec
cmp list list_dec

step "getset -c"
agc getset toyc.agc chr1 > chr1_dec.fa
agc getset toyc.agc 1 > 1_dec.fa
agc getset toyc.agc 2 > 2_dec.fa
agc getset toyc.agc 3 > 3_dec.fa
head -n 2 c.fa > 1.fa
head -n 4 c.fa | tail -n 2 > 2.fa
tail -n 2 c.fa > 3.fa
cmp 1.fa 1_dec.fa; cmp 2.fa 2_dec.fa; cmp 3.fa 3_dec.fa
cmp ref2.fa chr1_dec.fa
agc getset toy2.agc chr1 > chr1_dec.fa
cmp ref2.fa chr1_dec.fa
agc getset toy2.agc c > c2_dec.fa
agc getset toy2.agc g > g_dec.fa
agc getset toy2.agc t > t2_dec.fa
sed -n '3p;4p' < b.fa > g.fa
sed -n '5p;6p' < b.fa > c2.fa
sed -n '7p;8p' < b.fa > t2.fa
cmp g.fa g_dec.fa; cmp c2.fa c2_dec.fa; cmp t2.fa t2_dec.fa

step "getcol -c"
rm -rf getcolc; mkdir getcolc
agc getcol -o getcolc toyc.agc
cmp 1.fa getcolc/1.fa; cmp 2.fa getcolc/2.fa; cmp 3.fa getcolc/3.fa
cmp ref2.fa getcolc/chr1.fa
rm -rf getcolc; mkdir getcolc
agc getcol -o getcolc toy2.agc
cmp c2.fa getcolc/c.fa; cmp t2.fa getcolc/t.fa; cmp g.fa getcolc/g.fa
cmp ref2.fa getcolc/chr1.fa

step "getctg -c"
agc getctg toyc.agc chr1 > chr1_dec.fa
cmp ref2.fa chr1_dec.fa
printf ">chr1:3-7\nTAGCT\n" > ctg.fa
agc getctg toyc.agc chr1:3-7 > ctg_dec.fa
cmp ctg.fa ctg_dec.fa
printf ">3:3-10\nTCCCGGGA\n" > ctg.fa
agc getctg toyc.agc 3:3-10 > ctg_dec.fa
cmp ctg.fa ctg_dec.fa
printf ">g h i 21:3-4\nAG\n" > ctg.fa
agc getctg toy2.agc g:3-4 > ctg_dec.fa
cmp ctg.fa ctg_dec.fa

# ----------------------------------------------------------------- APPEND
append_chain() {  # $1 = extra create/append flags label ("" or "-a")
  local FLAGS=$1 TAG=$2
  agc create $FLAGS -o tmp0.agc ref.fa
  agc append $FLAGS tmp0.agc a.fa > tmp1.agc
  agc append $FLAGS tmp1.agc b.fa > tmp2.agc
  agc append $FLAGS tmp2.agc c.fa > toy_app.agc
  for s in a b c ref; do
    agc getset toy_app.agc $s > ${s}_dec.fa
    cmp $s.fa ${s}_dec.fa
  done
  printf "a\nb\nc\nref\n" > list
  agc listset toy_app.agc > list_dec
  cmp list list_dec
  printf "a\n   chr1a\n   chr3a\n" > list
  agc listctg toy_app.agc a > list_dec
  cmp list list_dec
  rm -rf getcol$TAG; mkdir getcol$TAG
  agc getcol -o getcol$TAG toy_app.agc
  for s in a b c ref; do cmp $s.fa getcol$TAG/$s.fa; done
  head -n 2 a.fa > chr1a.fa
  agc getctg toy_app.agc chr1a > chr1a_dec.fa
  cmp chr1a.fa chr1a_dec.fa
  printf ">chr1:3-10\nTAGCTAGC\n" > ctg.fa
  agc getctg toy_app.agc chr1@ref:3-10 > ctg_dec.fa
  cmp ctg.fa ctg_dec.fa
  printf ">chr3a:1-3\nGTT\n" > ctg.fa
  agc getctg toy_app.agc chr3a:1-3 > ctg_dec.fa
  cmp ctg.fa ctg_dec.fa
}
step "append chain"
append_chain "" a
step "adaptive append chain"
append_chain "-a" aa

# ----------------------------------------------------------- PARAM STRESS
step "param stress (-a -b 50000 -k 17 -l 15 -s 1000)"
agc create -a -b 50000 -k 17 -l 15 -s 1000 -o stress.agc ref.fa a.fa b.fa c.fa
rm -rf getcols; mkdir getcols
agc getcol -o getcols stress.agc
for s in a b c ref; do cmp $s.fa getcols/$s.fa; done

step "param stress (-b 1000000000 -k 32 -l 32 -s 1000000)"
agc create -b 1000000000 -k 32 -l 32 -s 1000000 -o stress2.agc ref.fa a.fa b.fa c.fa
rm -rf getcols; mkdir getcols
agc getcol -o getcols stress2.agc
for s in a b c ref; do cmp $s.fa getcols/$s.fa; done

# ------------------------------------------------------------- CROSS-TOOL
if [[ -n "${AGC_REF_BIN:-}" && -x "${AGC_REF_BIN:-}" ]]; then
  step "cross-tool: reference binary reads our archives"
  for arch in toy.agc toy_app.agc; do
    for s in a b c ref; do
      "$AGC_REF_BIN" getset $arch $s > ${s}_ref_dec.fa
      cmp $s.fa ${s}_ref_dec.fa
    done
  done
  step "cross-tool: we read the committed reference archive"
  agc getset toy_ex.agc ref > ref_xdec.fa
  "$AGC_REF_BIN" getset toy_ex.agc ref > ref_xref.fa
  cmp ref_xdec.fa ref_xref.fa
  step "cross-tool: reference appends onto our archive"
  "$AGC_REF_BIN" append tmp0.agc a.fa > xapp.agc
  "$AGC_REF_BIN" getset xapp.agc a > a_xdec.fa
  cmp a.fa a_xdec.fa
else
  echo "-- (cross-tool legs skipped: AGC_REF_BIN not set)"
fi

echo "RELEASE GATE: ALL $PASS STEPS OK"
