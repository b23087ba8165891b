"""Rolling canonical k-mer kernels.

TPU-first replacements for the reference's per-thread rolling CKmer loops
(reference: src/core/kmer.h, agc_compressor.cpp:636-660, 707-760,
1997-2051): every position's canonical k-mer is computed in one vectorized
pass over the contig chunk instead of a serial rolling loop.

K-mer value convention matches the reference exactly so splitter sets are
interchangeable with reference archives: the canonical code is
min(dir, rc) where

    dir = (sum_j w[j] * 4^(k-1-j)) << (64 - 2k)     (kmer.h insert_canonical)
    rc  = (sum_j (3-w[j]) * 4^j)   << (64 - 2k)

for window w[0..k-1]. All kernels return *left-aligned* u64 codes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import agc_tpu.ops  # noqa: F401  (ensures x64 config side effect)


def _shift_for(k: int) -> int:
    return 64 - 2 * k


def _kmer_halves(codes: jnp.ndarray, k: int):
    """Per-position k-mer codes as native 32-bit halves.

    The TPU VPU has 32-bit lanes; uint64 arithmetic is emulated as pairs,
    so the rolling window sums are computed directly in u32 halves:

        dir = sum_j w[j] * 4^(k-1-j)   ->  (dhi, dlo)   (unshifted)
        rc  = sum_j (3-w[j]) * 4^j     ->  (rhi, rlo)

    for window w[0..k-1] ending at each position. Returns
    (dlo, dhi, rlo, rhi, valid); halves are garbage where ~valid.
    """
    n = codes.shape[0]
    sym = jnp.where(codes > 3, jnp.uint32(0), codes.astype(jnp.uint32))
    c_pad = jnp.concatenate([jnp.zeros(k - 1, dtype=jnp.uint32), sym])
    dlo = jnp.zeros(n, dtype=jnp.uint32)
    dhi = jnp.zeros(n, dtype=jnp.uint32)
    rlo = jnp.zeros(n, dtype=jnp.uint32)
    rhi = jnp.zeros(n, dtype=jnp.uint32)
    three = jnp.uint32(3)
    for j in range(k):
        # w[j] of the window ending at i is codes[i-k+1+j] = c_pad[i+j]
        s = jax.lax.dynamic_slice(c_pad, (j,), (n,))
        comp = three - s
        m = k - 1 - j
        if m < 16:
            dlo = dlo + (s << jnp.uint32(2 * m))
        else:
            dhi = dhi + (s << jnp.uint32(2 * (m - 16)))
        if j < 16:
            rlo = rlo + (comp << jnp.uint32(2 * j))
        else:
            rhi = rhi + (comp << jnp.uint32(2 * (j - 16)))
    inv = (codes > 3).astype(jnp.int32)
    csum = jnp.cumsum(inv)
    if n >= k:
        csum_shift = jnp.concatenate([jnp.zeros(k, dtype=jnp.int32), csum[:-k]])
    else:
        csum_shift = jnp.zeros(n, jnp.int32)
    idx = jnp.arange(n)
    valid = ((csum - csum_shift) == 0) & (idx >= k - 1)
    return dlo, dhi, rlo, rhi, valid


def _halves_to_u64(hi: jnp.ndarray, lo: jnp.ndarray, k: int) -> jnp.ndarray:
    """(hi, lo) u32 halves of an unshifted code -> left-aligned u64."""
    return (
        (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    ) << jnp.uint64(_shift_for(k))


def _kmer_core(codes: jnp.ndarray, k: int):
    """Shared body: per-position (udir, urc, valid), left-aligned u64."""
    dlo, dhi, rlo, rhi, valid = _kmer_halves(codes, k)
    return (
        _halves_to_u64(dhi, dlo, k),
        _halves_to_u64(rhi, rlo, k),
        valid,
    )


@partial(jax.jit, static_argnums=(1,))
def contig_kmers_dir_rc(codes: jnp.ndarray, k: int):
    """Per-position (udir, urc, valid) — both orientations, for cut-point
    k-mer bookkeeping (the matcher needs orientation, kmer.h:545-560)."""
    return _kmer_core(codes, k)


@partial(jax.jit, static_argnums=(1,))
def contig_kmers_dir_rc_with_membership(codes, k, sorted_set):
    udir, urc, valid = _kmer_core(codes, k)
    canon = jnp.minimum(udir, urc)
    idx = jnp.searchsorted(sorted_set, canon)
    idx_c = jnp.clip(idx, 0, max(sorted_set.shape[0] - 1, 0))
    member = valid & (sorted_set[idx_c] == canon)
    return udir, urc, valid, member


@partial(jax.jit, static_argnums=(1,))
def contig_kmers(codes: jnp.ndarray, k: int):
    """Per-position canonical k-mers of a numeric contig chunk.

    Args:
        codes: uint8[N] numeric symbols (0..3 bases, >3 = non-ACGT).
        k: k-mer length (17..32).

    Returns:
        canon: uint64[N]; canon[i] is the left-aligned canonical code of the
            k-mer *ending* at position i (valid only where ``valid``).
        valid: bool[N]; window is fully in-bounds and ACGT-only.
        dir_oriented: bool[N]; dir <= rc (reference: kmer.h:545-551).
    """
    udir, urc, valid = _kmer_core(codes, k)
    canon = jnp.minimum(udir, urc)
    dir_oriented = udir <= urc
    return canon, valid, dir_oriented


@partial(jax.jit, static_argnums=(1,))
def contig_kmers_with_membership(codes, k, sorted_set):
    """contig_kmers + sorted-set membership in one compiled graph.

    ``sorted_set``: ascending uint64[M] table (splitters or singleton
    candidates). Returns (canon, valid, dir_oriented, member: bool[N]).
    Replaces the reference's bloom+hash splitter probe
    (agc_compressor.cpp:2012-2015) with a device binary search.
    """
    canon, valid, dir_oriented = contig_kmers(codes, k)
    idx = jnp.searchsorted(sorted_set, canon)
    idx_c = jnp.clip(idx, 0, max(sorted_set.shape[0] - 1, 0))
    member = valid & (sorted_set.shape[0] > 0) & (sorted_set[idx_c] == canon)
    return canon, valid, dir_oriented, member


SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------------------
# 2-bit packed transfer: 4 bases/byte + 1 invalid-bit/base (0.375 B/base on
# the host->device link instead of 1 B/base). The device unpacks in-kernel.
# ---------------------------------------------------------------------------


def pack_codes(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side pack of numeric symbols: (packed u8[N/4], invalid u8[N/8]).

    ``codes`` length must be a multiple of 8 (bucket sizes always are).
    Invalid symbols (>3) are packed as 0 with their invalid bit set.
    """
    n = len(codes)
    inv = codes > 3
    sym = np.where(inv, 0, codes).astype(np.uint8)
    q = sym.reshape(n // 4, 4)
    packed = q[:, 0] | (q[:, 1] << 2) | (q[:, 2] << 4) | (q[:, 3] << 6)
    invbits = np.packbits(inv, bitorder="little")
    return packed, invbits


def _unpack_codes_dev(packed: jnp.ndarray, invbits: jnp.ndarray) -> jnp.ndarray:
    """In-kernel unpack: u8[N/4] + u8[N/8] -> u8[N] (invalid -> 255)."""
    n4 = packed.shape[0]
    shifts = jnp.array([0, 2, 4, 6], dtype=jnp.uint8)
    sym = (packed[:, None] >> shifts[None, :]) & jnp.uint8(3)
    sym = sym.reshape(n4 * 4)
    bit = jnp.arange(8, dtype=jnp.uint8)
    inv = (invbits[:, None] >> bit[None, :]) & jnp.uint8(1)
    inv = inv.reshape(invbits.shape[0] * 8).astype(bool)
    return jnp.where(inv, jnp.uint8(255), sym)


@partial(jax.jit, static_argnums=(2,))
def canon_kmers_packed_window(packed, invbits, k, lo, hi):
    """Packed-transfer variant of canon_kmers_chunk_window."""
    codes = _unpack_codes_dev(packed, invbits)
    udir, urc, valid = _kmer_core(codes, k)
    canon = jnp.minimum(udir, urc)
    idx = jnp.arange(codes.shape[0])
    keep = valid & (idx >= lo) & (idx < hi)
    return jnp.where(keep, canon, SENTINEL)


def _scan_compact_body(packed, invbits, k, tlo, thi, cap: int):
    """Membership scan against a small table, gather-free.

    TPU gathers serialize (a searchsorted over N positions costs ~N*log T
    scalar cycles), so membership is a broadcast compare-all against the
    (tiny) splitter table on the VPU, and hit positions are extracted with
    top_k instead of nonzero's scatter. Output is ONE u32 vector:

        [count, pos[cap] (ascending, leading fills = 0xFFFFFFFF),
         dlo[cap], dhi[cap], rlo[cap], rhi[cap]]

    where the halves are the unshifted dir/rc codes at the hit positions
    (host reassembles left-aligned u64; see _decode_scan_vec).
    """
    codes = _unpack_codes_dev(packed, invbits)
    n = codes.shape[0]
    dlo, dhi, rlo, rhi, valid = _kmer_halves(codes, k)
    dir_le = (dhi < rhi) | ((dhi == rhi) & (dlo <= rlo))
    clo = jnp.where(dir_le, dlo, rlo)
    chi = jnp.where(dir_le, dhi, rhi)
    member = valid & jnp.any(
        (clo[:, None] == tlo[None, :]) & (chi[:, None] == thi[None, :]),
        axis=1,
    )
    count = jnp.sum(member.astype(jnp.int32))
    iota = jnp.arange(n, dtype=jnp.int32)
    desc = jax.lax.top_k(jnp.where(member, iota, -1), cap)[0]
    pos = desc[::-1]  # ascending; -1 fills lead
    safe = jnp.clip(pos, 0, n - 1)
    return jnp.concatenate(
        [
            count[None].astype(jnp.uint32),
            pos.astype(jnp.uint32),
            dlo[safe],
            dhi[safe],
            rlo[safe],
            rhi[safe],
        ]
    )


@partial(jax.jit, static_argnums=(2, 5))
def scan_chunk_compact_packed(packed, invbits, k, tlo, thi, cap: int):
    """Packed-transfer scan: one small u32 vector per chunk round-trip."""
    return _scan_compact_body(packed, invbits, k, tlo, thi, cap)


def _decode_scan_vec(vec: np.ndarray, cap: int, k: int):
    """Host decode of a _scan_compact_body vector ->
    (count, pos i64[H], udir u64[H], urc u64[H])."""
    count = int(vec[0])
    cnt = min(count, cap)
    sl = slice(cap - cnt, cap)
    pos = vec[1 : 1 + cap][sl].astype(np.int64)
    dlo = vec[1 + cap : 1 + 2 * cap][sl].astype(np.uint64)
    dhi = vec[1 + 2 * cap : 1 + 3 * cap][sl].astype(np.uint64)
    rlo = vec[1 + 3 * cap : 1 + 4 * cap][sl].astype(np.uint64)
    rhi = vec[1 + 4 * cap : 1 + 5 * cap][sl].astype(np.uint64)
    shift = np.uint64(_shift_for(k))
    udir = ((dhi << np.uint64(32)) | dlo) << shift
    urc = ((rhi << np.uint64(32)) | rlo) << shift
    return count, pos, udir, urc


def make_scan_table(sorted_u64, k: int):
    """Build the device membership table from sorted left-aligned u64
    splitter codes: a pair of u32 half arrays (unshifted), sentinel-padded
    to a power of two (min 128) so kernel shapes stay bucketed.

    Returns (tlo, thi, k) or None for an empty set.
    """
    arr = np.asarray(sorted_u64, dtype=np.uint64)
    if arr.size == 0:
        return None
    u = arr >> np.uint64(_shift_for(k))
    b = 128
    while b < arr.size:
        b <<= 1
    tlo = np.full(b, 0xFFFFFFFF, dtype=np.uint32)
    thi = np.full(b, 0xFFFFFFFF, dtype=np.uint32)
    tlo[: arr.size] = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    thi[: arr.size] = (u >> np.uint64(32)).astype(np.uint32)
    return (jnp.asarray(tlo), jnp.asarray(thi), k)


_POS_INF = np.uint64(0x7FFFFFFFFFFFFFFF)


_GREEDY_W = 2048  # probe window length for the greedy chain


@partial(jax.jit, static_argnums=(2, 4, 5))
def splitter_greedy_kernel(packed, invbits, k, table, seg_size: int, cap: int, t0=0):
    """Whole-contig greedy splitter emission on device.

    Device analogue of the reference's sequential find_splitters_in_contig
    walk (agc_compressor.cpp:762-825). The candidate table is large
    (~one entry per reference base), so a full-contig membership scan
    would cost n*log T serialized gathers. Hits against the singleton
    table are DENSE (most genome k-mers are unique), so the greedy
    'emit one splitter every >= seg_size bases' chain instead probes only
    a _GREEDY_W-wide window per emission: searchsorted over W positions,
    first hit emitted, jump seg_size. Total gathers ~ (n/seg_size)*W*log T
    instead of n*log T.

    Returns one u64 vector:
        [count, pos[cap], kmer[cap], tail_pos, tail_kmer]
    where tail_* is the rightmost hit of the whole contig (the
    rightmost-candidate fallback, agc_compressor.cpp:817-824), found by
    probing windows backward from the end; tail_pos = 2^63-1 when absent.
    """
    codes = _unpack_codes_dev(packed, invbits)
    n = codes.shape[0]
    dlo, dhi, rlo, rhi, valid = _kmer_halves(codes, k)
    dir_le = (dhi < rhi) | ((dhi == rhi) & (dlo <= rlo))
    canon = _halves_to_u64(
        jnp.where(dir_le, dhi, rhi), jnp.where(dir_le, dlo, rlo), k
    )
    canon = jnp.where(valid, canon, SENTINEL)
    W = _GREEDY_W
    canon_pad = jnp.concatenate([canon, jnp.full(W, SENTINEL, dtype=jnp.uint64)])
    T = max(table.shape[0], 1)

    def probe(off):
        """Hit mask + codes for window [off, off+W) (off: i64 >= 0)."""
        w = jax.lax.dynamic_slice(canon_pad, (off,), (W,))
        ix = jnp.clip(jnp.searchsorted(table, w), 0, T - 1)
        return (table[ix] == w) & (w != SENTINEL), w

    out_pos = jnp.full(cap, _POS_INF, dtype=jnp.uint64)
    out_kmer = jnp.zeros(cap, dtype=jnp.uint64)

    def cond(state):
        t, count, _, _ = state
        return (t < n) & (count < cap)

    def body(state):
        t, count, out_pos, out_kmer = state
        hit, w = probe(t)
        found = jnp.any(hit)
        p_rel = jnp.argmax(hit).astype(jnp.int64)
        p = t + p_rel
        out_pos = jnp.where(
            found, out_pos.at[count].set(p.astype(jnp.uint64)), out_pos
        )
        out_kmer = jnp.where(found, out_kmer.at[count].set(w[p_rel]), out_kmer)
        count = count + jnp.where(found, 1, 0)
        t = jnp.where(found, p + seg_size, t + W)
        return t, count, out_pos, out_kmer

    _, count, out_pos, out_kmer = jax.lax.while_loop(
        cond, body, (jnp.asarray(t0, jnp.int64), jnp.int64(0), out_pos, out_kmer)
    )

    # rightmost hit: backward windows from the end (dense hits -> 1 probe)
    def tail_cond(state):
        s, best = state
        return (best < 0) & (s > -W)

    def tail_body(state):
        s, _ = state
        off = jnp.maximum(s, jnp.int64(0))
        hit, _ = probe(off)
        found = jnp.any(hit)
        r_rel = jnp.int64(W - 1) - jnp.argmax(hit[::-1]).astype(jnp.int64)
        best = jnp.where(found, off + r_rel, jnp.int64(-1))
        return s - W, best

    _, best = jax.lax.while_loop(
        tail_cond, tail_body, (jnp.int64(n - W), jnp.int64(-1))
    )
    tail_pos = jnp.where(best >= 0, best.astype(jnp.uint64), _POS_INF)
    tail_kmer = canon[jnp.clip(best, 0, n - 1)]

    return jnp.concatenate(
        [
            count.astype(jnp.uint64)[None],
            out_pos,
            out_kmer,
            tail_pos[None],
            tail_kmer[None],
        ]
    )


MAX_WHOLE_CONTIG = 1 << 25  # whole-contig greedy bucket ceiling (32 Mbase)


def find_splitter_emissions(contig_codes: np.ndarray, k: int, table, seg_size: int):
    """Greedy splitter emissions for one contig: returns
    (positions i64[E], kmers u64[E], tail_pos or None, tail_kmer).

    One device dispatch for contigs up to MAX_WHOLE_CONTIG; larger contigs
    run the jump chain across sequential whole-bucket dispatches with the
    emission state carried on host.
    """
    n = len(contig_codes)
    if n < k:
        return np.empty(0, np.int64), np.empty(0, np.uint64), None, 0
    if n <= MAX_WHOLE_CONTIG:
        b = _MIN_BUCKET
        while b < n:
            b <<= 1
        padded = np.full(b, _PAD_SYMBOL, dtype=np.uint8)
        padded[:n] = contig_codes
        packed, invbits = pack_codes(padded)
        cap = b // seg_size + 2
        vec = np.asarray(
            splitter_greedy_kernel(
                jnp.asarray(packed), jnp.asarray(invbits), k, table, seg_size, cap
            )
        )
        count = int(vec[0])
        pos = vec[1 : 1 + cap][:count].astype(np.int64)
        kmers = vec[1 + cap : 1 + 2 * cap][:count].astype(np.uint64)
        tail_pos = int(vec[1 + 2 * cap])
        tail_kmer = np.uint64(vec[2 + 2 * cap])
        if tail_pos >= n:
            return pos, kmers, None, 0
        return pos, kmers, tail_pos, tail_kmer
    # huge contig: sequential whole-bucket dispatches; the jump-chain state
    # (next allowed emission position) is carried on the host between them
    positions: list[int] = []
    kmers: list[int] = []
    tail_pos = None
    tail_kmer = np.uint64(0)
    e = None  # last emission (global)
    start = 0
    while start < n:
        lo = max(0, start - (k - 1))
        end = min(lo + MAX_WHOLE_CONTIG, n)
        sub = np.ascontiguousarray(contig_codes[lo:end])
        b = _MIN_BUCKET
        while b < len(sub):
            b <<= 1
        padded = np.full(b, _PAD_SYMBOL, dtype=np.uint8)
        padded[: len(sub)] = sub
        packed, invbits = pack_codes(padded)
        cap = b // seg_size + 2
        # chain start within this chunk (global carry -> local coordinates)
        t_global = start if e is None else e + seg_size
        t0 = max(t_global - lo, 0)
        vec = np.asarray(
            splitter_greedy_kernel(
                jnp.asarray(packed), jnp.asarray(invbits), k, table,
                seg_size, cap, t0,
            )
        )
        count = int(vec[0])
        p_loc = vec[1 : 1 + cap][:count].astype(np.int64) + lo
        k_loc = vec[1 + cap : 1 + 2 * cap][:count].astype(np.uint64)
        for pp, kk in zip(p_loc.tolist(), k_loc.tolist()):
            if pp >= end:  # emission in the next chunk's territory: redo there
                break
            positions.append(pp)
            kmers.append(np.uint64(kk))
            e = pp
        t_chunk_tail = int(vec[1 + 2 * cap])
        if t_chunk_tail < len(sub) and t_chunk_tail + lo >= start:
            tail_pos = t_chunk_tail + lo
            tail_kmer = np.uint64(vec[2 + 2 * cap])
        start = end
    pos_arr = np.asarray(positions, dtype=np.int64)
    kmer_arr = np.asarray(kmers, dtype=np.uint64)
    return pos_arr, kmer_arr, tail_pos, tail_kmer


@partial(jax.jit, static_argnums=(1,))
def canon_kmers_chunk(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Canonical k-mers with invalid windows replaced by the all-ones
    sentinel (which is never a canonical code). Device-resident building
    block for the splitter-candidate pipeline."""
    udir, urc, valid = _kmer_core(codes, k)
    canon = jnp.minimum(udir, urc)
    return jnp.where(valid, canon, SENTINEL)


@partial(jax.jit, static_argnums=(1,))
def canon_kmers_chunk_window(codes, k, lo, hi):
    """canon_kmers_chunk with positions outside [lo, hi) masked to the
    sentinel (lo/hi traced scalars -> no extra compiled shapes). Used to
    drop chunk-overlap duplicates when pooling k-mers across chunks."""
    udir, urc, valid = _kmer_core(codes, k)
    canon = jnp.minimum(udir, urc)
    idx = jnp.arange(codes.shape[0])
    keep = valid & (idx >= lo) & (idx < hi)
    return jnp.where(keep, canon, SENTINEL)


def collect_kmers_device(contig_codes: np.ndarray, k: int) -> list:
    """Upload a contig and return its canonical k-mers as device-resident
    chunk arrays (sentinel-masked); nothing is transferred back."""
    n = len(contig_codes)
    out = []
    if n < k:
        return out
    start = 0
    while start < n:
        lo = max(0, start - (k - 1))
        end = min(lo + CHUNK, n)
        padded, real = _padded(np.ascontiguousarray(contig_codes[lo:end]))
        keep_from = start - lo
        packed, invbits = pack_codes(padded)
        out.append(
            canon_kmers_packed_window(
                jnp.asarray(packed), jnp.asarray(invbits), k, keep_from, real
            )
        )
        start = end
    return out


@jax.jit
def candidate_tables(kmers: jnp.ndarray):
    """Sort the k-mer pool and split into singleton / duplicated tables.

    Device analogue of RadixSortMSD + remove_non_singletons
    (reference: agc_compressor.cpp:490, 664-705). Returns
    (singletons_sorted_with_sentinel_tail u64[N], n_singletons,
     duplicated_sorted_with_sentinel_tail u64[N], n_duplicated);
    sentinel-padded so shapes stay static -- membership searches treat the
    sentinel tail as misses.
    """
    x = jnp.sort(kmers)
    n = x.shape[0]
    ne_prev = jnp.concatenate([jnp.ones(1, dtype=bool), x[1:] != x[:-1]])
    ne_next = jnp.concatenate([x[:-1] != x[1:], jnp.ones(1, dtype=bool)])
    not_sent = x != SENTINEL
    singleton = ne_prev & ne_next & not_sent
    first_dup = ne_prev & ~ne_next & not_sent
    singles = jnp.sort(jnp.where(singleton, x, SENTINEL))
    dups = jnp.sort(jnp.where(first_dup, x, SENTINEL))
    return (
        singles,
        jnp.sum(singleton.astype(jnp.int32)),
        dups,
        jnp.sum(first_dup.astype(jnp.int32)),
    )


@jax.jit
def sort_kmers(kmers: jnp.ndarray) -> jnp.ndarray:
    """Device sort of a k-mer array (replaces raduls::RadixSortMSD;
    reference: agc_compressor.cpp:490)."""
    return jnp.sort(kmers)


@jax.jit
def singleton_filter(sorted_kmers: jnp.ndarray):
    """Mask of elements occurring exactly once in a sorted array
    (reference: remove_non_singletons, agc_compressor.cpp:664-705)."""
    x = sorted_kmers
    n = x.shape[0]
    if n == 0:
        return jnp.zeros(0, dtype=bool), jnp.zeros(0, dtype=bool)
    ne_prev = jnp.concatenate([jnp.ones(1, dtype=bool), x[1:] != x[:-1]])
    ne_next = jnp.concatenate([x[:-1] != x[1:], jnp.ones(1, dtype=bool)])
    singleton = ne_prev & ne_next
    first_of_dup = ne_prev & ~ne_next
    return singleton, first_of_dup


# ---------------------------------------------------------------------------
# host-side helpers around the kernels
# ---------------------------------------------------------------------------

# Positions per device dispatch. Large chunks amortize per-dispatch RPC
# overhead (dominant on remote-tunneled chips; still material on PCIe).
CHUNK = 4 << 20
_MIN_BUCKET = 1 << 12
_PAD_SYMBOL = 255  # invalid -> windows touching padding are masked out


def _bucket_size(n: int) -> int:
    """Round up to a power-of-two bucket to bound the number of compiled
    kernel shapes (remote TPU compilation is expensive; distinct shapes
    would otherwise trigger a compile per contig length)."""
    b = _MIN_BUCKET
    while b < n:
        b <<= 1
    return min(b, CHUNK)


def _padded(chunk: np.ndarray) -> tuple[np.ndarray, int]:
    n = len(chunk)
    b = _bucket_size(n)
    if b == n:
        return chunk, n
    out = np.full(b, _PAD_SYMBOL, dtype=np.uint8)
    out[:n] = chunk
    return out, n


def collect_kmers(contig_codes: np.ndarray, k: int) -> np.ndarray:
    """All valid canonical k-mers of a contig (host array in, host array out).

    Chunked with (k-1) overlap so chunk boundaries don't lose windows
    (mirrors the reference's contig_part_size chunking with k-1 overlap;
    agc_compressor.cpp:462-469).
    """
    n = len(contig_codes)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    out = []
    start = 0
    while start < n:
        lo = max(0, start - (k - 1))
        end = min(lo + CHUNK, n)
        padded, real = _padded(np.ascontiguousarray(contig_codes[lo:end]))
        canon, valid, _ = contig_kmers(jnp.asarray(padded), k)
        # only keep windows ending inside [start, end)
        valid = np.asarray(valid)[:real]
        canon = np.asarray(canon)[:real]
        keep_from = start - lo
        out.append(canon[keep_from:][valid[keep_from:]])
        start = end
    return np.concatenate(out) if out else np.empty(0, dtype=np.uint64)


def scan_contig(
    contig_codes: np.ndarray, k: int, sorted_set: np.ndarray
):
    """Per-position (canon, udir, urc, valid, member) for a whole contig,
    chunked through the device kernel. Returns host numpy arrays."""
    n = len(contig_codes)
    canon = np.empty(n, dtype=np.uint64)
    udir = np.empty(n, dtype=np.uint64)
    urc = np.empty(n, dtype=np.uint64)
    valid = np.zeros(n, dtype=bool)
    member = np.zeros(n, dtype=bool)
    empty_table = len(sorted_set) == 0
    table = jnp.asarray(_padded_table(sorted_set)) if not empty_table else None
    start = 0
    while start < n:
        lo = max(0, start - (k - 1))
        end = min(lo + CHUNK, n)
        padded, real = _padded(np.ascontiguousarray(contig_codes[lo:end]))
        chunk = jnp.asarray(padded)
        if empty_table:
            cd, cr, v = contig_kmers_dir_rc(chunk, k)
            m = np.zeros(real, dtype=bool)
        else:
            cd, cr, v, m = contig_kmers_dir_rc_with_membership(chunk, k, table)
            m = np.asarray(m)[:real]
        keep_from = start - lo
        cd = np.asarray(cd)[:real]
        cr = np.asarray(cr)[:real]
        udir[start:end] = cd[keep_from:]
        urc[start:end] = cr[keep_from:]
        canon[start:end] = np.minimum(cd, cr)[keep_from:]
        valid[start:end] = np.asarray(v)[:real][keep_from:]
        member[start:end] = m[keep_from:]
        start = end
    return canon, udir, urc, valid, member


_SCAN_CAP = 512


@partial(jax.jit, static_argnums=(2, 5))
def scan_batch_compact_packed(packed, invbits, k, tlo, thi, cap: int):
    """Batched scan: B contigs per dispatch (amortizes per-dispatch RPC
    overhead for many-small-contig collections). packed: u8[B, n/4],
    invbits: u8[B, n/8]; returns u32[B, 1 + 5*cap] rows in
    _scan_compact_body layout."""

    def one(p, i):
        return _scan_compact_body(p, i, k, tlo, thi, cap)

    return jax.vmap(one)(packed, invbits)


_BATCH_ROWS = (1, 2, 4, 8, 16, 32)


class ScanBatcher:
    """Groups small-contig scans into batched dispatches.

    add() buffers items; flush() dispatches one kernel per (bucket, up to
    32 rows) group and resolves each item's token to (vec, row, cap).
    Items larger than CHUNK fall back to the chunked single-contig path.

    ``table`` is a make_scan_table() tuple (or None for no splitters).
    """

    def __init__(self, k: int, table):
        self.k = k
        self.table = table
        self._buf: list[tuple[dict, np.ndarray]] = []

    def add(self, codes: np.ndarray):
        """Returns a token dict resolved at flush time."""
        token = {"kind": "batch", "n": len(codes), "k": self.k}
        if len(codes) < self.k or self.table is None:
            token["kind"] = "empty"
            return token
        if len(codes) > CHUNK:
            token["kind"] = "single"
            token["inner"] = submit_scan_hits(codes, self.k, self.table)
            return token
        self._buf.append((token, codes))
        return token

    def flush(self) -> None:
        if not self._buf:
            return
        tlo, thi, _ = self.table
        by_bucket: dict[int, list] = {}
        for token, codes in self._buf:
            b = _bucket_size(len(codes))
            by_bucket.setdefault(b, []).append((token, codes))
        self._buf = []
        for b, items in by_bucket.items():
            for start in range(0, len(items), _BATCH_ROWS[-1]):
                group = items[start : start + _BATCH_ROWS[-1]]
                rows = 1
                for r in _BATCH_ROWS:
                    if r >= len(group):
                        rows = r
                        break
                packed = np.zeros((rows, b // 4), dtype=np.uint8)
                invbits = np.full((rows, b // 8), 0xFF, dtype=np.uint8)
                for row, (token, codes) in enumerate(group):
                    buf = np.full(b, _PAD_SYMBOL, dtype=np.uint8)
                    buf[: len(codes)] = codes
                    p, iv = pack_codes(buf)
                    packed[row] = p
                    invbits[row] = iv
                cap = min(_SCAN_CAP, b)
                out = scan_batch_compact_packed(
                    jnp.asarray(packed), jnp.asarray(invbits), self.k,
                    tlo, thi, cap,
                )
                for row, (token, codes) in enumerate(group):
                    token["out"] = out
                    token["row"] = row
                    token["cap"] = cap
                    token["packed"] = packed[row]
                    token["invbits"] = invbits[row]
                    token["bucket"] = b

    def collect(self, token):
        """Resolve a token to (pos, udir, urc)."""
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.uint64),
        )
        if token["kind"] == "empty":
            return empty
        if token["kind"] == "single":
            return collect_scan_hits(token["inner"])
        if "out" not in token:
            self.flush()
        tlo, thi, _ = self.table
        vec = np.asarray(token["out"][token["row"]])
        cap = token["cap"]
        count, pos, udir, urc = _decode_scan_vec(vec, cap, self.k)
        if count > cap and cap < token["bucket"]:
            # rare cap overflow: retry at the next power-of-two >= count
            cap = 1 << int(np.ceil(np.log2(count)))
            cap = min(cap, token["bucket"])
            vec = np.asarray(
                scan_chunk_compact_packed(
                    jnp.asarray(token["packed"]),
                    jnp.asarray(token["invbits"]),
                    self.k,
                    tlo,
                    thi,
                    cap,
                )
            )
            count, pos, udir, urc = _decode_scan_vec(vec, cap, self.k)
        n = token["n"]
        m = pos < n
        return pos[m], udir[m], urc[m]


def submit_scan_hits(contig_codes: np.ndarray, k: int, table):
    """Asynchronously dispatch splitter-hit scans for a whole contig.

    ``table`` is a make_scan_table() tuple. Returns an opaque token for
    collect_scan_hits. JAX queues the dispatches; nothing blocks here, so
    scans for many contigs can be in flight at once (hides the
    host<->device round-trip latency of a remote-tunneled chip)."""
    n = len(contig_codes)
    pending = []
    if n < k or table is None:
        return (pending, k, table)
    tlo, thi, _ = table
    start = 0
    while start < n:
        lo = max(0, start - (k - 1))
        end = min(lo + CHUNK, n)
        padded, real = _padded(np.ascontiguousarray(contig_codes[lo:end]))
        packed, invbits = pack_codes(padded)
        packed = jnp.asarray(packed)
        invbits = jnp.asarray(invbits)
        out = scan_chunk_compact_packed(packed, invbits, k, tlo, thi, _SCAN_CAP)
        pending.append((out, packed, invbits, start, lo, real, len(padded)))
        start = end
    return (pending, k, table)


def collect_scan_hits(token):
    """Block on a submit_scan_hits token; returns (pos, udir, urc)."""
    pending, k, table = token
    all_pos = []
    all_dir = []
    all_rc = []
    for out, packed, invbits, start, lo, real, padded_len in pending:
        vec = np.asarray(out)  # single transfer
        cap = _SCAN_CAP
        count, pos, udir, urc = _decode_scan_vec(vec, cap, k)
        if count > cap and cap < padded_len:
            # rare overflow: retry at the next power-of-two >= count
            tlo, thi, _ = table
            cap = min(1 << int(np.ceil(np.log2(count))), padded_len)
            vec = np.asarray(
                scan_chunk_compact_packed(packed, invbits, k, tlo, thi, cap)
            )
            count, pos, udir, urc = _decode_scan_vec(vec, cap, k)
        keep_from = start - lo
        m = (pos >= keep_from) & (pos < real)
        all_pos.append(pos[m] - keep_from + start)
        all_dir.append(udir[m])
        all_rc.append(urc[m])
    if not all_pos:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.uint64),
        )
    return (
        np.concatenate(all_pos),
        np.concatenate(all_dir),
        np.concatenate(all_rc),
    )


def scan_contig_hits(contig_codes: np.ndarray, k: int, sorted_set):
    """Positions + (udir, urc) of all splitter hits in a contig.

    ``sorted_set``: host np.uint64 sorted codes, or a make_scan_table()
    tuple. Minimal-transfer path: uploads packed codes, downloads one
    compact vector per chunk. Returns (pos i64[H] ascending, udir u64[H],
    urc u64[H]).
    """
    n = len(contig_codes)
    if isinstance(sorted_set, np.ndarray):
        table = make_scan_table(sorted_set, k)
    else:
        table = sorted_set  # make_scan_table tuple or None
    if n < k or table is None:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.uint64),
            np.empty(0, dtype=np.uint64),
        )
    return collect_scan_hits(submit_scan_hits(contig_codes, k, table))


def _padded_table(sorted_set: np.ndarray) -> np.ndarray:
    """Pad the sorted membership table to a power-of-two length with the
    all-ones sentinel (never a canonical k-mer: the canonical code is
    min(dir, rc) and the two orientations cannot both be all-T).

    Minimum 16K entries so small splitter sets of different sizes share
    one compiled kernel shape (binary-search cost is logarithmic)."""
    n = len(sorted_set)
    b = 1 << 14
    while b < n:
        b <<= 1
    if b == n:
        return sorted_set
    out = np.full(b, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    out[:n] = sorted_set
    return out
