"""Pallas TPU kernel for the rolling k-mer core.

The XLA path (`kmers._kmer_core`) computes the k-step shifted-add chain in
uint64, which the TPU emulates with 32-bit pairs. This kernel computes the
two 32-bit halves natively on the VPU:

    dir = sum_{j=0..k-1} c[i-j] * 4^j            (left-aligned later)
    lo  = sum_{j=0..15}   c[i-j] << 2j           (exactly 32 bits)
    hi  = sum_{j=16..k-1} c[i-j] << 2(j-16)
    rc  = sum_{j} (3-c[i-j]) * 4^(k-1-j)  ->  (rhi, rlo) likewise

The chunk lives in VMEM as an (R, 128) tile grid; the j-shifted reads are
static in-kernel slices of a (k-1)-padded copy, so every add is an aligned
(8,128) VPU op. Output halves are reassembled (or compared pairwise) by
the caller.

Status: validated prototype, NOT wired into the scan path — the Mosaic
build in this toolchain lacks a dynamic_slice lowering for the shifted
reads (NotImplementedError at compile time on real TPU), and the XLA
log-doubling core (kmers._dir_halves) already runs at a small fraction
of the scan budget. Kept for when the toolchain catches up; interpret
mode keeps it correct on CPU (tests/test_pallas_kmers.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import agc_tpu.ops  # noqa: F401

LANE = 128
SUBLANE = 8
TILE = LANE * SUBLANE  # 1024 symbols per (8,128) tile


def _kmer_halves_kernel(k: int, pad: int, codes_ref, dlo_ref, dhi_ref,
                        rlo_ref, rhi_ref):
    """codes_ref: uint32[(pad + N) // LANE, LANE] with ``pad`` leading
    sentinel symbols; outputs are uint32[N // LANE, LANE]."""
    c = codes_ref[:]  # (rows, LANE) uint32
    rows = c.shape[0]
    n_rows = dlo_ref.shape[0]
    flat = c.reshape(rows * LANE)

    dlo = jnp.zeros(n_rows * LANE, dtype=jnp.uint32)
    dhi = jnp.zeros(n_rows * LANE, dtype=jnp.uint32)
    rlo = jnp.zeros(n_rows * LANE, dtype=jnp.uint32)
    rhi = jnp.zeros(n_rows * LANE, dtype=jnp.uint32)
    three = jnp.uint32(3)

    for j in range(k):
        # c[i - j] for output positions i in [0, N): slice the padded copy
        start = pad - j
        shifted = jax.lax.dynamic_slice(flat, (start,), (n_rows * LANE,))
        sym = shifted & three  # invalid symbols are masked by the caller
        comp = three - sym
        if j < 16:
            dlo = dlo + (sym << jnp.uint32(2 * j))
        else:
            dhi = dhi + (sym << jnp.uint32(2 * (j - 16)))
        m = k - 1 - j
        if m < 16:
            rlo = rlo + (comp << jnp.uint32(2 * m))
        else:
            rhi = rhi + (comp << jnp.uint32(2 * (m - 16)))

    dlo_ref[:] = dlo.reshape(n_rows, LANE)
    dhi_ref[:] = dhi.reshape(n_rows, LANE)
    rlo_ref[:] = rlo.reshape(n_rows, LANE)
    rhi_ref[:] = rhi.reshape(n_rows, LANE)


@partial(jax.jit, static_argnums=(1, 2))
def kmer_halves_pallas(codes: jnp.ndarray, k: int, interpret: bool = False):
    """32-bit-lane k-mer halves via Pallas.

    codes: uint8[N], N a multiple of 1024 (bucketed upstream).
    Returns (dlo, dhi, rlo, rhi): uint32[N] where
        udir_unshifted = dhi * 2^32 + dlo, urc_unshifted = rhi * 2^32 + rlo
    for the window ending at each position (validity handled by caller).
    """
    n = codes.shape[0]
    assert n % TILE == 0, "pad chunks to multiples of 1024"
    pad = 128  # >= k - 1, keeps slices lane-aligned
    c32 = codes.astype(jnp.uint32)
    padded = jnp.concatenate([jnp.zeros(pad, dtype=jnp.uint32), c32])
    rows = (n + pad) // LANE
    grid_codes = padded.reshape(rows, LANE)

    out_shape = jax.ShapeDtypeStruct((n // LANE, LANE), jnp.uint32)
    dlo, dhi, rlo, rhi = pl.pallas_call(
        partial(_kmer_halves_kernel, k, pad),
        out_shape=(out_shape, out_shape, out_shape, out_shape),
        interpret=interpret,
    )(grid_codes)
    return (
        dlo.reshape(n),
        dhi.reshape(n),
        rlo.reshape(n),
        rhi.reshape(n),
    )


def kmer_core_via_pallas(codes: jnp.ndarray, k: int, interpret: bool = False):
    """Drop-in (udir, urc, valid) u64 left-aligned results using the
    Pallas halves kernel; numerically identical to kmers._kmer_core."""
    n = codes.shape[0]
    dlo, dhi, rlo, rhi = kmer_halves_pallas(codes, k, interpret)
    shift = jnp.uint64(64 - 2 * k)
    udir = ((dhi.astype(jnp.uint64) << jnp.uint64(32)) | dlo.astype(jnp.uint64)) << shift
    urc = ((rhi.astype(jnp.uint64) << jnp.uint64(32)) | rlo.astype(jnp.uint64)) << shift
    inv = (codes > 3).astype(jnp.int32)
    csum = jnp.cumsum(inv)
    if n >= k:
        csum_shift = jnp.concatenate([jnp.zeros(k, dtype=jnp.int32), csum[:-k]])
    else:
        csum_shift = jnp.zeros(n, jnp.int32)
    idx = jnp.arange(n)
    valid = ((csum - csum_shift) == 0) & (idx >= k - 1)
    return udir, urc, valid
