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


def _kmer_core(codes: jnp.ndarray, k: int):
    """Shared body: per-position (udir, urc, valid)."""
    n = codes.shape[0]
    c = codes.astype(jnp.uint64)
    inv = (codes > 3).astype(jnp.int32)
    c_pad = jnp.concatenate([jnp.zeros(k - 1, dtype=jnp.uint64), c])
    udir = jnp.zeros(n, dtype=jnp.uint64)
    urc = jnp.zeros(n, dtype=jnp.uint64)
    three = jnp.uint64(3)
    for j in range(k):
        shifted = jax.lax.dynamic_slice(c_pad, (k - 1 - j,), (n,))
        udir = udir + (shifted << jnp.uint64(2 * j))
        urc = urc + ((three - shifted) << jnp.uint64(2 * (k - 1 - j)))
    shift = jnp.uint64(_shift_for(k))
    udir <<= shift
    urc <<= shift
    csum = jnp.cumsum(inv)
    if n >= k:
        csum_shift = jnp.concatenate([jnp.zeros(k, dtype=jnp.int32), csum[:-k]])
    else:
        csum_shift = jnp.zeros(n, jnp.int32)
    window_invalid = csum - csum_shift
    idx = jnp.arange(n)
    valid = (window_invalid == 0) & (idx >= k - 1)
    return udir, urc, valid


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

CHUNK = 1 << 20  # positions per device dispatch
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
        end = min(start + CHUNK, n)
        lo = max(0, start - (k - 1))
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
        end = min(start + CHUNK, n)
        lo = max(0, start - (k - 1))
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


def _padded_table(sorted_set: np.ndarray) -> np.ndarray:
    """Pad the sorted membership table to a power-of-two length with the
    all-ones sentinel (never a canonical k-mer: the canonical code is
    min(dir, rc) and the two orientations cannot both be all-T)."""
    n = len(sorted_set)
    b = 8
    while b < n:
        b <<= 1
    if b == n:
        return sorted_set
    out = np.full(b, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    out[:n] = sorted_set
    return out
