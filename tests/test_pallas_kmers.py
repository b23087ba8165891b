"""Pallas k-mer kernel vs the XLA reference core (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from agc_tpu.ops.kmers import _kmer_core
from agc_tpu.ops.pallas_kmers import kmer_core_via_pallas


@pytest.mark.parametrize("k", [17, 31, 32])
def test_pallas_matches_xla_core(k):
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=4096, dtype=np.uint8)
    codes[rng.integers(0, len(codes), 20)] = 4  # invalid symbols
    u1, r1, v1 = (np.asarray(x) for x in _kmer_core(jnp.asarray(codes), k))
    u2, r2, v2 = (
        np.asarray(x)
        for x in kmer_core_via_pallas(jnp.asarray(codes), k, interpret=True)
    )
    assert np.array_equal(v1, v2)
    assert np.array_equal(u1[v1], u2[v2])
    assert np.array_equal(r1[v1], r2[v2])


def test_pallas_grid_variant_matches_xla_core():
    """Multi-block (gridded) variant with the halo block (interpret mode;
    the single-block path is exercised by the parametrized test above)."""
    import jax.numpy as jnp
    import numpy as np

    from agc_tpu.ops.kmers import _kmer_core
    from agc_tpu.ops.pallas_kmers import BLOCK_ROWS, LANE, kmer_core_via_pallas

    n = 2 * BLOCK_ROWS * LANE  # two grid steps
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 5, size=n, dtype=np.uint8)  # incl. invalid 4s
    udir, urc, valid = (
        np.asarray(x)
        for x in kmer_core_via_pallas(jnp.asarray(codes), 23, interpret=True)
    )
    u2, r2, v2 = (np.asarray(x) for x in _kmer_core(jnp.asarray(codes), 23))
    assert (valid == v2).all()
    assert (udir[v2] == u2[v2]).all()
    assert (urc[v2] == r2[v2]).all()
