"""Device batched LZ-estimate kernels (ops/match.py): twin identity,
ranking fidelity vs the exact host estimator, and RefBank behavior."""

import numpy as np
import pytest

from agc_tpu.ops import match as M
from agc_tpu.core.lz import LZDiff


def _rand_seq(rng, n):
    return rng.integers(0, 4, size=n, dtype=np.uint8)


def _mutate(rng, seq, rate):
    out = seq.copy()
    n_sub = max(1, int(len(seq) * rate))
    pos = rng.integers(0, len(seq), size=n_sub)
    out[pos] = (out[pos] + rng.integers(1, 4, size=n_sub)) % 4
    return out


def _rc(seq):
    out = seq[::-1].copy()
    m = out < 4
    out[m] = 3 - out[m]
    return out


def _device_est(seg, ref, key_len, use_rc=False):
    bank = M.RefBank(key_len)
    q = M.MatchQuery(seg, [(7, use_rc)])
    M.estimate_batch([q], bank, lambda gid: ref.tobytes())
    return int(q.ests[0])


def test_device_estimate_matches_numpy_twin():
    rng = np.random.default_rng(0)
    key_len = 17
    for trial in range(4):
        ref = _rand_seq(rng, 3000 + 117 * trial)
        seg = _mutate(rng, ref, 0.01)
        if trial == 2:  # sprinkle Ns
            seg[100:130] = 4
        if trial == 3:
            seg = seg[200:2500]
        dev = _device_est(seg, ref, key_len)
        twin = M.estimate_np(seg, ref, key_len)
        assert dev == twin, (trial, dev, twin)


def test_rc_orientation_matches_direct_of_rc():
    rng = np.random.default_rng(1)
    key_len = 17
    ref = _rand_seq(rng, 2500)
    seg = _mutate(rng, ref, 0.005)
    via_rc_flag = _device_est(seg, ref, key_len, use_rc=True)
    direct_of_rc = _device_est(_rc(seg), ref, key_len, use_rc=False)
    assert via_rc_flag == direct_of_rc


def test_ranking_matches_exact_estimator():
    """The device ranking must agree with the exact host walk
    (reference: lz_diff.cpp:839-946) on clearly-separated candidates,
    and near-ties must land inside the shortlist window."""
    rng = np.random.default_rng(2)
    key_len = 17
    base = _rand_seq(rng, 20000)
    seg = _mutate(rng, base, 0.002)
    cands = [
        _mutate(rng, base, 0.001),          # very close
        _mutate(rng, base, 0.02),           # worse
        _rand_seq(rng, 20000),              # unrelated
        np.concatenate([base[10000:], base[:10000]]),  # rearranged
    ]
    bank = M.RefBank(key_len)
    refs = {i: c for i, c in enumerate(cands)}
    q = M.MatchQuery(seg, [(i, False) for i in range(len(cands))])
    M.estimate_batch([q], bank, lambda gid: refs[gid].tobytes())

    exact = []
    for c in cands:
        lz = LZDiff(min_match_len=20)
        lz.prepare(c.tobytes())
        exact.append(lz.estimate(seg.tobytes()))
    assert int(np.argmin(q.ests)) == int(np.argmin(exact))
    # the unrelated candidate must be decisively worst on device too
    assert q.ests[2] == max(q.ests)
    keep = M.shortlist(q.ests, margin=0.25, extra=1)
    assert int(np.argmin(exact)) in keep


def test_batch_multiple_queries_and_bucket_mix():
    rng = np.random.default_rng(3)
    key_len = 17
    refs = {
        0: _rand_seq(rng, 1800),
        1: _rand_seq(rng, 9000),   # different index bucket
    }
    bank = M.RefBank(key_len)
    queries = []
    expected = []
    for i in range(3):
        src = refs[i % 2]
        seg = _mutate(rng, src, 0.01)
        queries.append(M.MatchQuery(seg, [(0, False), (1, False)]))
        expected.append(i % 2)
    M.estimate_batch(queries, bank, lambda gid: refs[gid].tobytes())
    for q, want in zip(queries, expected):
        assert int(np.argmin(q.ests)) == want
        twin = [
            M.estimate_np(q.codes, refs[g], key_len) for g, _ in q.cands
        ]
        assert q.ests.tolist() == twin


def test_refbank_eviction_and_reuse():
    rng = np.random.default_rng(4)
    bank = M.RefBank(17, budget_bytes=80_000)
    refs = {i: _rand_seq(rng, 4000) for i in range(12)}
    for i in range(12):
        assert bank.get(i, lambda g=i: refs[g].tobytes()) is not None
    assert len(bank) < 12  # evicted under budget
    # re-fetch of an evicted entry rebuilds it
    assert bank.get(0, lambda: refs[0].tobytes()) is not None
    # short/None refs are refused
    assert bank.get(99, lambda: None) is None
    assert bank.get(98, lambda: b"\x00" * 4) is None


def test_refbank_eviction_under_estimate_pressure():
    """Estimates stay correct while the bank budget forces evictions of
    consolidated-bucket rows mid-stream: every batch's results must
    equal the numpy twin even when earlier groups (and their bucket
    matrices) were dropped and rebuilt between dispatches."""
    rng = np.random.default_rng(7)
    key_len = 17
    # sized so ~3 entries fit: every new group evicts an older one and
    # invalidates its consolidated bucket
    bank = M.RefBank(key_len, budget_bytes=150_000)
    refs = {i: _rand_seq(rng, 4000) for i in range(10)}
    for round_no in range(3):
        for lo in range(0, 10, 2):
            gids = [lo, lo + 1]
            seg = _mutate(rng, refs[lo], 0.01)
            q = M.MatchQuery(seg, [(g, False) for g in gids])
            M.estimate_batch([q], bank, lambda g: refs[g].tobytes())
            twin = [M.estimate_np(seg, refs[g], key_len) for g in gids]
            assert q.ests.tolist() == twin, (round_no, lo)
    assert len(bank) < 10  # budget actually forced evictions


def test_refbank_duplicate_gids_one_row():
    """Duplicate gids in one estimate call (many queries sharing a
    candidate group) must consolidate to a single bank row."""
    rng = np.random.default_rng(8)
    key_len = 17
    ref = _rand_seq(rng, 3000)
    bank = M.RefBank(key_len)
    queries = [
        M.MatchQuery(_mutate(rng, ref, 0.01), [(5, False)])
        for _ in range(6)
    ]
    M.estimate_batch(queries, bank, lambda g: ref.tobytes())
    m, _row = bank._row_of[5]
    assert len(bank._built[m][2]) == 1  # one consolidated row, not six
    for q in queries:
        assert int(q.ests[0]) == M.estimate_np(q.codes, ref, key_len)


def test_probe_stride_validation(monkeypatch):
    monkeypatch.setenv("AGC_TPU_MATCH_STRIDE", "6")
    with pytest.raises(ValueError):
        M.probe_stride()
    monkeypatch.setenv("AGC_TPU_MATCH_STRIDE", "20")
    with pytest.raises(ValueError):
        M.probe_stride(key_len=17)
    monkeypatch.setenv("AGC_TPU_MATCH_STRIDE", "8")
    assert M.probe_stride(key_len=17) == 8


def test_split_point_matches_numpy_twin():
    """Device missing-middle split argmin == the numpy twin, and lands
    near the true boundary of a left-ref/right-ref chimera."""
    rng = np.random.default_rng(6)
    key_len = 17
    left = _rand_seq(rng, 4000)
    right = _rand_seq(rng, 4000)
    for o1_rc, o2_rc in [(False, False), (True, False), (False, True)]:
        seg = np.concatenate([_mutate(rng, left, 0.005)[:3000],
                              _mutate(rng, right, 0.005)[:3000]])
        # bank refs are stored in the group's own orientation; the seg's
        # dir prefix matches ref1 after RC when o1_rc
        bank = M.RefBank(key_len)
        refs = {1: _rc(left) if o1_rc else left,
                2: _rc(right) if o2_rc else right}
        dev = M.split_point_device(
            seg, bank, 1, o1_rc, 2, o2_rc,
            lambda g: refs[g].tobytes(),
        )
        twin = M.split_point_np(
            seg, refs[1], o1_rc, refs[2], o2_rc, key_len
        )
        assert dev == twin, (o1_rc, o2_rc, dev, twin)
        assert abs(dev - 3000) < 200, (o1_rc, o2_rc, dev)


def test_packed_group_scores_zero():
    """Unavailable reference codes (packed group from appending) must
    estimate as 0 — the host path's CSegment::estimate parity
    (reference: segment.cpp:83-85)."""
    rng = np.random.default_rng(5)
    seg = _rand_seq(rng, 2000)
    bank = M.RefBank(17)
    q = M.MatchQuery(seg, [(0, False)])
    M.estimate_batch([q], bank, lambda gid: None)
    assert q.ests[0] == 0
