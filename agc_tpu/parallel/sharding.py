"""Multi-device compression step: data-parallel contig scanning with
collective splitter synchronization.

The reference is single-host multithreaded (SURVEY.md section 2.6); the
TPU build replaces the worker pool + in-band token protocol
(reference: agc_compressor.cpp:1093-1272) with an SPMD schedule over a
``jax.sharding.Mesh``:

- contig chunks are sharded over the ``d`` (data) mesh axis;
- the splitter k-mer table is replicated (it is small: ~1 entry per
  segment_size bases of the reference genome);
- per-chunk scans are embarrassingly parallel (the rolling-kmer kernel in
  ops/kmers.py);
- new-splitter discovery (adaptive mode) and new-group registration are
  synchronized with ``all_gather`` at batch barriers -- the direct analogue
  of the reference's ``new_splitters``/``registration`` tokens
  (agc_compressor.cpp:1114-1237);
- statistics are combined with ``psum``.

Per-host archive assembly gathers group blocks to host 0 (DCN/ICI), which
owns the single output archive.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import agc_tpu.ops  # noqa: F401  (x64)
from ..ops.kmers import _kmer_core


def make_mesh(devices=None, axis: str = "d") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


@partial(jax.jit, static_argnums=(2,))
def _scan_batch(chunks: jnp.ndarray, table: jnp.ndarray, k: int):
    """Batched per-chunk scan: canonical k-mers + membership + cut count.

    chunks: uint8[B, N] numeric symbols (255-padded).
    table: uint64[M] sorted splitter table (replicated).
    Returns (canon u64[B,N], valid bool[B,N], member bool[B,N]).
    """

    def one(chunk):
        udir, urc, valid = _kmer_core(chunk, k)
        canon = jnp.minimum(udir, urc)
        idx = jnp.searchsorted(table, canon)
        idx_c = jnp.clip(idx, 0, max(table.shape[0] - 1, 0))
        member = valid & (table[idx_c] == canon)
        return canon, valid, member

    return jax.vmap(one)(chunks)


def make_compression_step(mesh: Mesh, k: int, axis: str = "d"):
    """Build the jitted multi-device compression step.

    The step consumes a [B, N] batch of contig chunks sharded over ``axis``
    and a replicated splitter table; it returns the per-position scan
    results (sharded), the all-gathered new-splitter candidates of the
    round, and psum'd batch statistics.
    """

    chunk_sharding = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(), P()),
        check_vma=False,
    )
    def step(chunks, table, local_new_splitters):
        canon, valid, member = _scan_batch(chunks, table, k)
        # registration barrier: gather every device's newly discovered
        # splitters (adaptive mode) -- mirrors the reference's new_splitters
        # token merge (agc_compressor.cpp:1187-1237)
        gathered = jax.lax.all_gather(
            local_new_splitters, axis, axis=0, tiled=True
        )
        n_cuts = jax.lax.psum(jnp.sum(member), axis)
        return canon, member, gathered, n_cuts

    return jax.jit(step), chunk_sharding, repl


def shard_chunks(mesh: Mesh, chunks: np.ndarray, axis: str = "d"):
    """Place a [B, N] chunk batch sharded over the mesh axis."""
    return jax.device_put(chunks, NamedSharding(mesh, P(axis, None)))
