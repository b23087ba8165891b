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


def test_scan_fused_interpret_matches_xla():
    """Fused Pallas scan (ladder + mix + membership) must produce the
    exact member mask and dir halves of the XLA scan path (interpret
    mode; hardware parity verified on the real chip in round 4)."""
    import jax
    import jax.numpy as jnp

    from agc_tpu.ops import kmers as K
    from agc_tpu.ops.pallas_kmers import scan_fused_pallas

    rng = np.random.default_rng(3)
    n = 4096
    codes = rng.integers(0, 4, n).astype(np.uint8)
    codes[100:140] = 9
    k = 21
    ud, ur, valid = K.dir_rc_kmers_np(codes, k)
    pick = np.unique(np.minimum(ud, ur)[valid][::37])
    table = K.make_scan_table(np.sort(pick), k)
    dlo, dhi, member = scan_fused_pallas(
        jnp.asarray(codes), k, table.tlo, True
    )
    dl2, dh2, v2 = jax.jit(lambda c: K._dir_halves(c, k))(jnp.asarray(codes))
    mix2 = np.asarray(dl2) ^ np.asarray(dh2)
    m2 = np.asarray(v2) & np.isin(mix2, np.asarray(table.tlo))
    assert np.array_equal(np.asarray(member), m2)
    hit = np.flatnonzero(m2)
    assert np.array_equal(np.asarray(dlo)[hit], np.asarray(dl2)[hit])
    assert np.array_equal(np.asarray(dhi)[hit], np.asarray(dh2)[hit])


def test_member_mix_interpret():
    """Membership-only Pallas kernel == np.isin on the mix values."""
    import jax.numpy as jnp

    from agc_tpu.ops.pallas_kmers import member_mix_pallas

    rng = np.random.default_rng(5)
    mix = rng.integers(0, 1 << 16, 2048, dtype=np.int64).astype(np.uint32)
    tbl = np.unique(
        np.concatenate([mix[::71], rng.integers(0, 1 << 16, 100)
                        .astype(np.uint32)])
    )
    pad = np.full(128, 0xDEADBEEF, dtype=np.uint32)
    pad[: len(tbl)] = tbl[:128]
    got = np.asarray(member_mix_pallas(jnp.asarray(mix), jnp.asarray(pad),
                                       True))
    want = np.isin(mix, pad)
    assert np.array_equal(got, want)
