"""Batched device LZ-estimate kernels over an HBM-resident group-reference
bank — the TPU answer to the reference's serial candidate estimator.

The reference ranks candidate groups for a segment by running a serial
byte-level greedy walk per (segment, candidate) pair under a shrinking
pruning bound (CLZDiff::Estimate, reference:
src/common/lz_diff.cpp:839-946, driven from
find_cand_segment_with_one_splitter, agc_compressor.cpp:1630-1808, and
find_cand_segment_using_fallback_minimizers, :1812-1963). That walk is
hash-probe + byte-extend at every position: the exact shape of program a
TPU cannot run, and the exact shape of *decision* it does not need —
candidate search is a RANKING problem, and only the winner's tokens are
ever emitted.

TPU rethink (SURVEY.md §7 step 7 "estimate-with-bound"):

- every group reference keeps a device-resident index: its LZ seed keys
  (``key_len = min_match_len - 3`` 2-bit-coded symbols, sampled every
  ``hashing_step = 4`` positions — the same sampled index the host
  encoder probes, lz_diff.cpp:16-25) co-sorted with their positions
  (:class:`RefBank`, the "HBM-resident reference segment dictionary");
- a batch of segments is uploaded once (nibble-packed) and its seed keys
  for BOTH orientations are computed on device by the same log-doubling
  ladder the scan kernels use (O(log key_len) vector steps);
- every (segment-orientation, candidate) pair is estimated at once:
  sorted-join of segment keys against the candidate's key index
  (searchsorted — gather-light, O(n log m)), seed coverage painted with
  a shifted-cumsum window OR (no scatter), covered runs and their
  diagonal jumps costed with the token grammar's digit lengths, and the
  uncovered ACGT positions counted as literals;
- the host exact-estimates only the short list that survives the device
  ranking (ties within a margin), so the final choice matches the
  host-only path whenever the true argmin is not decisively separated —
  the device removes the O(candidates) serial walks, not the decision.

The estimate is approximate BY DESIGN (coverage model, not a replayed
walk); :func:`shortlist` keeps candidate *choice* host-exact.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .kmers import (
    SENTINEL,
    _dir_halves,
    _revcomp_u64,
    _unpack4_dev,
    pack4_np,
)

HASHING_STEP = 4  # reference: lz_diff.h:38-42 (USE_SPARSE_HT)
_MIN_SEG_BUCKET = 1 << 12
_MIN_REF_KEY_BUCKET = 1 << 10

_U64 = jnp.uint64


def _pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


# ---------------------------------------------------------------------------
# key construction (device)
# ---------------------------------------------------------------------------


def _start_keys(codes: jnp.ndarray, key_len: int):
    """Unshifted 2-bit seed keys at every window START (the host
    encoder's get_code, reference lz_diff.h:58-120): key[j] packs
    codes[j..j+key_len) with the first symbol highest. Invalid (any
    symbol > 3 or window out of bounds) -> SENTINEL."""
    dlo, dhi, valid_end = _dir_halves(codes, key_len)
    dir_end = (dhi.astype(_U64) << _U64(32)) | dlo.astype(_U64)
    kl = key_len
    # shift end-aligned -> start-aligned
    pad_u = jnp.full(kl - 1, SENTINEL, dtype=_U64)
    pad_b = jnp.zeros(kl - 1, dtype=bool)
    keys = jnp.concatenate([dir_end[kl - 1 :], pad_u])
    valid = jnp.concatenate([valid_end[kl - 1 :], pad_b])
    return jnp.where(valid, keys, SENTINEL), valid


@partial(jax.jit, static_argnames=("key_len",))
def _seg_rows_kernel(packed: jnp.ndarray, lens: jnp.ndarray, key_len: int):
    """(S, b/2) nibble-packed segment batch -> per-orientation seed keys
    + symbol classes.

    Returns (keys, acgt, isn), each (2S, b): row 2i is segment i in
    direct orientation, row 2i+1 its reverse complement (keys computed
    on device from the dir ladder via the complement-of-pair-reverse
    identity — the host never materializes the RC segment for
    estimation)."""

    def one(packed_row, n):
        codes = _unpack4_dev(packed_row)
        b = codes.shape[0]
        keys, valid = _start_keys(codes, key_len)
        acgt = codes <= 3
        # nibble packing collapses every symbol > 3 to 15; treat all of
        # them as N for costing (IUPAC codes are rare and cost ~the same)
        isn = (codes > 3) & (jnp.arange(b) < n)
        # rc keys: key at start j of the RC segment is the revcomp of the
        # dir key at start (n - key_len - j)
        f = keys[::-1]
        fv = valid[::-1]
        shift = b - 1 - n + key_len  # left-roll amount (traced)
        rf = jnp.roll(f, -shift)
        rfv = jnp.roll(fv, -shift)
        rkeys = jnp.where(rfv, _revcomp_u64(rf, key_len), SENTINEL)
        rc_ok = jnp.arange(b) <= n - key_len
        rkeys = jnp.where(rc_ok, rkeys, SENTINEL)
        facgt = jnp.roll(acgt[::-1], -(b - n))
        fisn = jnp.roll(isn[::-1], -(b - n))
        return keys, acgt, isn, rkeys, facgt, fisn

    keys, acgt, isn, rkeys, racgt, risn = jax.vmap(one)(packed, lens)
    out_keys = jnp.stack([keys, rkeys], axis=1).reshape(-1, packed.shape[1] * 2)
    out_acgt = jnp.stack([acgt, racgt], axis=1).reshape(out_keys.shape)
    out_isn = jnp.stack([isn, risn], axis=1).reshape(out_keys.shape)
    return out_keys, out_acgt, out_isn


@partial(jax.jit, static_argnames=("key_len",))
def _ref_index_kernel(packed: jnp.ndarray, key_len: int):
    """Nibble-packed reference -> (sorted seed keys, co-sorted positions)
    sampled every HASHING_STEP positions (the device twin of the host
    encoder's make_index, reference lz_diff.cpp:117-146). Invalid keys
    sort to the end as SENTINEL."""
    codes = _unpack4_dev(packed)
    keys, _ = _start_keys(codes, key_len)
    sk = keys[::HASHING_STEP]
    pos = jnp.arange(sk.shape[0], dtype=jnp.int32) * HASHING_STEP
    # num_keys=2: equal seed keys keep ascending positions, so a 'left'
    # searchsorted always lands on the smallest position (deterministic
    # and identical to the numpy twin)
    sk, sp = jax.lax.sort((sk, pos), num_keys=2)
    return sk, sp


def _digits(x: jnp.ndarray) -> jnp.ndarray:
    """ASCII digit count of a non-negative int32 (the token grammar
    spells positions/lengths in decimal; reference lz_diff.h:131-149)."""
    d = jnp.int32(1)
    for t in (10, 100, 1000, 10_000, 100_000, 1_000_000, 10_000_000):
        d = d + (x >= t).astype(jnp.int32)
    return d


@partial(jax.jit, static_argnames=("key_len", "mml"))
def _estimate_kernel(
    keys: jnp.ndarray,   # (Q, b) u64 per-orientation seed keys
    acgt: jnp.ndarray,   # (Q, b) bool
    isn: jnp.ndarray,    # (Q, b) bool
    rows: jnp.ndarray,   # (P,) i32: query row per pair
    sk: jnp.ndarray,     # (P, m) u64 sorted candidate keys
    sp: jnp.ndarray,     # (P, m) i32 co-sorted positions
    key_len: int,
    mml: int,
):
    """Approximate token-stream cost for each (segment-row, candidate)
    pair: literals = uncovered ACGT positions, matches = covered runs
    costed by their diagonal jump + average length field, N-runs ~4."""
    del mml
    m = sk.shape[1]
    b = keys.shape[1]

    def one(row, skc, spc):
        q = keys[row]
        a = acgt[row]
        nn = isn[row]
        idx = jnp.minimum(jnp.searchsorted(skc, q), m - 1)
        hit = (skc[idx] == q) & (q != SENTINEL)
        rpos = jnp.where(hit, spc[idx], jnp.int32(0))
        # coverage: hit at i covers [i, i + key_len)
        c = jnp.cumsum(hit.astype(jnp.int32))
        c_shift = jnp.concatenate(
            [jnp.zeros(key_len, jnp.int32), c[:-key_len]]
        )
        covered = (c - c_shift) > 0
        prev_cov = jnp.concatenate([jnp.zeros(1, bool), covered[:-1]])
        run_start = covered & ~prev_cov
        # diagonal at each run start (a run start is always a hit)
        diag = rpos - jnp.arange(b, dtype=jnp.int32)
        ridx = jnp.where(run_start, jnp.arange(b, dtype=jnp.int32), -1)
        last = jax.lax.associative_scan(jnp.maximum, ridx)
        prev_start = jnp.concatenate([jnp.full(1, -1, jnp.int32), last[:-1]])
        prev_diag = jnp.where(
            prev_start >= 0, diag[jnp.maximum(prev_start, 0)], 0
        )
        dd = jnp.abs(diag - prev_diag)
        # match token ~ digits(|dpos|) + sign + ',' + len-field + '.'
        run_cost = _digits(dd) + 4
        match_cost = jnp.sum(jnp.where(run_start, run_cost, 0))
        literals = jnp.sum((a & ~covered).astype(jnp.int32))
        prev_n = jnp.concatenate([jnp.zeros(1, bool), nn[:-1]])
        nrun_cost = 4 * jnp.sum((nn & ~prev_n).astype(jnp.int32))
        return literals + match_cost + nrun_cost

    return jax.vmap(one)(rows, sk, sp)


# ---------------------------------------------------------------------------
# host-side twin (the spec; used by tests and as the no-device fallback)
# ---------------------------------------------------------------------------


def estimate_np(
    seg_codes: np.ndarray, ref_codes: np.ndarray, key_len: int
) -> int:
    """Numpy twin of one (segment, candidate) device estimate (direct
    orientation). Byte-identical to the kernel on the same inputs."""
    n = len(seg_codes)
    if n < key_len:
        return int(np.count_nonzero(seg_codes <= 3))
    # ref index
    r = ref_codes.astype(np.uint64)
    rn = len(r)
    rkeys = {}
    for j in range(0, rn - key_len + 1, HASHING_STEP):
        w = ref_codes[j : j + key_len]
        if np.any(w > 3):
            continue
        x = 0
        for s in w.tolist():
            x = (x << 2) | int(s)
        if x not in rkeys:
            rkeys[x] = j
        else:
            rkeys[x] = min(rkeys[x], j)
    hit = np.zeros(n, dtype=bool)
    rpos = np.zeros(n, dtype=np.int64)
    for i in range(0, n - key_len + 1):
        w = seg_codes[i : i + key_len]
        if np.any(w > 3):
            continue
        x = 0
        for s in w.tolist():
            x = (x << 2) | int(s)
        j = rkeys.get(x)
        if j is not None:
            hit[i] = True
            rpos[i] = j
    c = np.cumsum(hit.astype(np.int64))
    c_shift = np.concatenate([np.zeros(key_len, np.int64), c[:-key_len]])
    covered = (c - c_shift) > 0
    prev_cov = np.concatenate([[False], covered[:-1]])
    run_start = covered & ~prev_cov
    diag = rpos - np.arange(n)
    cost = 0
    prev_diag = 0
    for i in np.flatnonzero(run_start).tolist():
        dd = abs(int(diag[i]) - prev_diag)
        cost += len(str(dd)) + 4
        prev_diag = int(diag[i])
    cost += int(np.count_nonzero((seg_codes <= 3) & ~covered))
    nmask = seg_codes > 3
    prev_n = np.concatenate([[False], nmask[:-1]])
    cost += 4 * int(np.count_nonzero(nmask & ~prev_n))
    return int(cost)


# ---------------------------------------------------------------------------
# HBM-resident reference bank
# ---------------------------------------------------------------------------


class RefBank:
    """Device-resident dictionary of group-reference seed indexes.

    One entry per group id: (sorted seed keys, co-sorted positions) on
    device, built by :func:`_ref_index_kernel` from a single upload of
    the reference codes. LRU-evicted to ``budget_bytes`` (HBM is the
    constraint; v5e has 16 GB/chip). The reference's analogue is each
    CSegment's in-RAM LZ hash table (segment.h:27-70) — here the bank
    is the persistent, device-side half of that state."""

    def __init__(self, key_len: int, budget_bytes: int | None = None):
        self.key_len = key_len
        self.budget = budget_bytes or int(
            os.environ.get("AGC_TPU_MATCH_BANK_BYTES", str(2 << 30))
        )
        self._entries: OrderedDict[int, tuple] = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._entries)

    def get(self, gid: int, codes_provider):
        """Return (sk, sp, m_bucket) for group ``gid``, building the
        index from ``codes_provider()`` (numeric reference codes) on
        first use. Returns None when the provider has no codes."""
        with self._lock:
            e = self._entries.get(gid)
            if e is not None:
                self._entries.move_to_end(gid)
                return e
        codes = codes_provider()
        if codes is None or len(codes) < self.key_len + HASHING_STEP:
            return None
        arr = np.frombuffer(bytes(codes), dtype=np.uint8)
        b = _pow2(len(arr), _MIN_REF_KEY_BUCKET * 2)
        padded = np.full(b, 255, dtype=np.uint8)
        padded[: len(arr)] = arr
        packed = jnp.asarray(pack4_np(padded))
        sk, sp = _ref_index_kernel(packed, self.key_len)
        nbytes = int(sk.size) * 12
        with self._lock:
            if gid in self._entries:  # lost a race; keep the first
                self._entries.move_to_end(gid)
                return self._entries[gid]
            self._entries[gid] = (sk, sp, int(sk.shape[0]))
            self._bytes += nbytes
            while self._bytes > self.budget and len(self._entries) > 1:
                _, (osk, _osp, _m) = self._entries.popitem(last=False)
                self._bytes -= int(osk.size) * 12
        return self._entries[gid]

    def drop(self, gid: int) -> None:
        with self._lock:
            e = self._entries.pop(gid, None)
            if e is not None:
                self._bytes -= int(e[0].size) * 12


# ---------------------------------------------------------------------------
# batched estimation driver
# ---------------------------------------------------------------------------


class MatchQuery:
    """One segment's candidate search: ``codes`` (numeric, direct
    orientation) and ``cands`` = [(gid, use_rc), ...]. ``ests`` is
    filled by :func:`estimate_batch` in candidate order (np.int32)."""

    __slots__ = ("codes", "cands", "ests", "tag")

    def __init__(self, codes: np.ndarray, cands, tag=None):
        self.codes = codes
        self.cands = list(cands)
        self.ests: np.ndarray | None = None
        self.tag = tag


def estimate_batch(queries: list[MatchQuery], bank: RefBank, ref_codes_of):
    """Estimate every (query, candidate) pair on device in bucketed
    dispatches; fills ``q.ests`` in-place. Pairs whose group reference
    is unavailable (still packed from appending) get estimate 0 — the
    same zero the host path reports for packed groups
    (reference: CSegment::estimate, segment.cpp:83-85)."""
    live = [q for q in queries if q.cands]
    if not live:
        return
    key_len = bank.key_len
    seg_b = _pow2(max(len(q.codes) for q in live), _MIN_SEG_BUCKET)
    s_bucket = _pow2(len(live), 1)
    mat = np.full((s_bucket, seg_b), 255, dtype=np.uint8)
    lens = np.zeros(s_bucket, dtype=np.int32)
    for i, q in enumerate(live):
        mat[i, : len(q.codes)] = q.codes
        lens[i] = len(q.codes)
    packed = jnp.asarray(pack4_np(mat.reshape(-1)).reshape(s_bucket, seg_b // 2))
    keys, acgt, isn = _seg_rows_kernel(packed, jnp.asarray(lens), key_len)

    # gather pairs, grouped by the candidate index's bucket size
    by_bucket: dict[int, list] = {}
    for qi, q in enumerate(live):
        q.ests = np.zeros(len(q.cands), dtype=np.int64)
        for ci, (gid, use_rc) in enumerate(q.cands):
            entry = bank.get(gid, lambda g=gid: ref_codes_of(g))
            if entry is None:
                continue
            sk, sp, m = entry
            by_bucket.setdefault(m, []).append(
                (qi * 2 + (1 if use_rc else 0), sk, sp, q, ci)
            )
    for m, items in by_bucket.items():
        p_bucket = _pow2(len(items), 1)
        rows = np.zeros(p_bucket, dtype=np.int32)
        sks = []
        sps = []
        for j, (row, sk, sp, _q, _ci) in enumerate(items):
            rows[j] = row
            sks.append(sk)
            sps.append(sp)
        pad = p_bucket - len(items)
        if pad:
            sks.extend([sks[-1]] * pad)
            sps.extend([sps[-1]] * pad)
        ests = _estimate_kernel(
            keys, acgt, isn,
            jnp.asarray(rows), jnp.stack(sks), jnp.stack(sps),
            key_len, 0,
        )
        ests = np.asarray(ests)
        for j, (_row, _sk, _sp, q, ci) in enumerate(items):
            q.ests[ci] = int(ests[j])


def shortlist(ests: np.ndarray, margin: float, extra: int) -> list[int]:
    """Candidate indices the host must exact-estimate: everything within
    ``margin`` of the device minimum, plus the next ``extra`` best — the
    device ranks, the host decides (ratio parity with the host-only
    path whenever the true argmin is inside the list)."""
    if not len(ests):
        return []
    order = np.argsort(ests, kind="stable")
    best = int(ests[order[0]])
    cut = best * (1.0 + margin) + 32
    window = [int(i) for i in order if ests[i] <= cut]
    tail = [int(i) for i in order if ests[i] > cut][: max(0, extra)]
    return window + tail
