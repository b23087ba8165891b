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
