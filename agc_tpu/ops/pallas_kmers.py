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

Status — DEMOTED BY MEASUREMENT (round 3), kept as a validated
alternative for future toolchains:

- the single-block variant (chunks up to BLOCK_ROWS*LANE = 64K symbols)
  compiles AND matches the XLA core bit-exactly on real TPU hardware —
  the shifted reads are expressed as lane-rotates + seam selects, which
  Mosaic lowers (it rejects lane-unaligned slice+concat and has no
  dynamic_slice or 1D vector ops in this toolchain);
- measured head-to-head on the real chip (64K chunk, warm, 20 reps):
  Pallas 56.4 ms vs XLA log-doubling core 25.9 ms per dispatch — BOTH
  are dispatch-round-trip-bound through the remote tunnel, and the
  Pallas call costs an extra round trip, so wiring it into the ≤64K
  path would make every small-contig scan ~2x slower while the ≥64K
  production path (4 MB chunks) cannot use it at all: any GRID
  invocation of this body crashes this image's remote Mosaic compiler
  (tpu_compile helper exit 1);
- the scan path therefore stays on the XLA core (kmers._dir_halves),
  whose u64-emulation cost this kernel was written to remove — that
  cost is a small fraction of the scan budget, far below one link
  round trip.

tests/test_pallas_kmers.py cross-checks both variants in interpret mode
so the kernel stays correct for the day the toolchain accepts grids.
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


def _accumulate_halves(k, cur, prev, dlo_ref, dhi_ref, rlo_ref, rhi_ref):
    """Shared accumulation: cur[r, l] = symbol at output position r*LANE+l,
    prev = the same block shifted one row earlier (for the lane seam)."""
    n_rows = dlo_ref.shape[0]
    dlo = jnp.zeros((n_rows, LANE), dtype=jnp.uint32)
    dhi = jnp.zeros((n_rows, LANE), dtype=jnp.uint32)
    rlo = jnp.zeros((n_rows, LANE), dtype=jnp.uint32)
    rhi = jnp.zeros((n_rows, LANE), dtype=jnp.uint32)
    three = jnp.uint32(3)

    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, LANE), 1)
    for j in range(k):
        # c[i - j] over the lane-major layout: lane-rotate the current and
        # previous row blocks and select at the seam. (Mosaic lowers
        # jnp.roll/iota/where; it rejects lane-unaligned slices+concat and
        # has no dynamic_slice or 1D vector ops in this toolchain.)
        if j == 0:
            sh = cur
        else:
            sh = jnp.where(
                lane < j, jnp.roll(prev, j, axis=1), jnp.roll(cur, j, axis=1)
            )
        sym = sh & three  # invalid symbols are masked by the caller
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

    dlo_ref[:] = dlo
    dhi_ref[:] = dhi
    rlo_ref[:] = rlo
    rhi_ref[:] = rhi


def _kmer_halves_kernel(k: int, pad: int, codes_ref, dlo_ref, dhi_ref,
                        rlo_ref, rhi_ref):
    """Single-block variant: codes_ref is uint32[(pad + N) // LANE, LANE]
    with ``pad`` leading sentinel symbols; outputs uint32[N // LANE, LANE]."""
    c = codes_ref[:]
    n_rows = dlo_ref.shape[0]
    pad_rows = pad // LANE
    cur = c[pad_rows : pad_rows + n_rows, :]
    prev = c[pad_rows - 1 : pad_rows - 1 + n_rows, :]
    _accumulate_halves(k, cur, prev, dlo_ref, dhi_ref, rlo_ref, rhi_ref)


def _kmer_halves_grid_kernel(k: int, prev_ref, cur_ref, dlo_ref, dhi_ref,
                             rlo_ref, rhi_ref):
    """Grid variant: cur_ref is this step's (BLOCK_ROWS, LANE) block,
    prev_ref the preceding block (only its last row — the halo — is used);
    the first grid step's prev block is the zero pad block."""
    cur = cur_ref[:]
    br = cur.shape[0]
    prevblk = prev_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (br, LANE), 0)
    prev = jnp.where(
        row == 0, jnp.roll(prevblk, 1, axis=0), jnp.roll(cur, 1, axis=0)
    )
    _accumulate_halves(k, cur, prev, dlo_ref, dhi_ref, rlo_ref, rhi_ref)


BLOCK_ROWS = 512  # 64K symbols per grid step (~2.3 MB resident in VMEM)


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
    c32 = codes.astype(jnp.uint32)
    n_rows = n // LANE
    out_shape = jax.ShapeDtypeStruct((n_rows, LANE), jnp.uint32)

    if n_rows <= BLOCK_ROWS:
        # single block (plus one pad row for the lane seam)
        pad = LANE
        padded = jnp.concatenate([jnp.zeros(pad, dtype=jnp.uint32), c32])
        grid_codes = padded.reshape(n_rows + 1, LANE)
        dlo, dhi, rlo, rhi = pl.pallas_call(
            partial(_kmer_halves_kernel, k, pad),
            out_shape=(out_shape, out_shape, out_shape, out_shape),
            interpret=interpret,
        )(grid_codes)
    else:
        # grid over BLOCK_ROWS-row blocks; the array is re-passed with a
        # one-block offset so each step also sees its predecessor (halo).
        # VMEM stays bounded and the pipeline double-buffers the DMA.
        assert n_rows % BLOCK_ROWS == 0, "bucket big chunks to 64K multiples"
        padded = jnp.concatenate(
            [jnp.zeros(BLOCK_ROWS * LANE, dtype=jnp.uint32), c32]
        ).reshape(n_rows + BLOCK_ROWS, LANE)
        n_blocks = n_rows // BLOCK_ROWS
        spec_prev = pl.BlockSpec((BLOCK_ROWS, LANE), lambda i: (i, 0))
        spec_cur = pl.BlockSpec((BLOCK_ROWS, LANE), lambda i: (i + 1, 0))
        spec_out = pl.BlockSpec((BLOCK_ROWS, LANE), lambda i: (i, 0))
        dlo, dhi, rlo, rhi = pl.pallas_call(
            partial(_kmer_halves_grid_kernel, k),
            grid=(n_blocks,),
            in_specs=[spec_prev, spec_cur],
            out_specs=(spec_out, spec_out, spec_out, spec_out),
            out_shape=(out_shape, out_shape, out_shape, out_shape),
            interpret=interpret,
        )(padded, padded)
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
