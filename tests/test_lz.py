"""LZ-diff codec: grammar round-trips and estimate consistency."""

import random

import numpy as np
import pytest

from agc_tpu.core.lz import LZDiff, decode_v2
from agc_tpu.core.segment import bytes2tuples, tuples2bytes


def _random_seq(rng, n, alphabet=4):
    return bytes(rng.randrange(alphabet) for _ in range(n))


def _mutate(rng, seq, n_subs=10, n_indel=3):
    s = bytearray(seq)
    for _ in range(n_subs):
        i = rng.randrange(len(s))
        s[i] = rng.randrange(4)
    for _ in range(n_indel):
        i = rng.randrange(len(s))
        if rng.random() < 0.5:
            del s[i : i + rng.randrange(1, 5)]
        else:
            s[i:i] = _random_seq(rng, rng.randrange(1, 5))
    return bytes(s)


@pytest.mark.parametrize("mml", [15, 20, 32])
def test_encode_decode_roundtrip(mml):
    rng = random.Random(42)
    ref = _random_seq(rng, 3000)
    lz = LZDiff(mml)
    lz.prepare(ref)
    for trial in range(5):
        text = _mutate(rng, ref)
        enc = lz.encode(text)
        dec = decode_v2(ref, enc, mml)
        assert dec == text, f"mml={mml} trial={trial}"


def test_identical_is_empty():
    rng = random.Random(7)
    ref = _random_seq(rng, 500)
    lz = LZDiff(20)
    lz.prepare(ref)
    assert lz.encode(ref) == b""
    assert lz.estimate(ref) == 0


def test_nrun_roundtrip():
    rng = random.Random(3)
    ref = _random_seq(rng, 1000)
    lz = LZDiff(20)
    lz.prepare(ref)
    text = ref[:100] + bytes([4] * 50) + ref[100:300] + bytes([4] * 3) + ref[300:]
    enc = lz.encode(text)
    assert decode_v2(ref, enc, 20) == text
    assert 0x1E in enc  # N-run token used for the long run


def test_unrelated_sequences():
    rng = random.Random(9)
    ref = _random_seq(rng, 400)
    lz = LZDiff(20)
    lz.prepare(ref)
    text = _random_seq(rng, 350)
    enc = lz.encode(text)
    assert decode_v2(ref, enc, 20) == text


def test_iupac_symbols():
    """Symbols 5..15 (IUPAC codes) must round-trip as literals."""
    rng = random.Random(5)
    ref = _random_seq(rng, 600)
    lz = LZDiff(20)
    lz.prepare(ref)
    text = ref[:200] + bytes([5, 11, 15, 14, 9]) + ref[200:]
    enc = lz.encode(text)
    assert decode_v2(ref, enc, 20) == text


def test_estimate_matches_encoded_size():
    rng = random.Random(11)
    ref = _random_seq(rng, 2000)
    lz = LZDiff(20)
    lz.prepare(ref)
    for _ in range(3):
        text = _mutate(rng, ref)
        enc = lz.encode(text)
        est = lz.estimate(text)
        assert est == len(enc)


def test_estimate_bound_early_exit():
    rng = random.Random(13)
    ref = _random_seq(rng, 1000)
    lz = LZDiff(20)
    lz.prepare(ref)
    text = _random_seq(rng, 1000)  # unrelated -> large cost
    est = lz.estimate(text, bound=10)
    assert est > 10  # early exit returns cost above the bound


def test_coding_cost_vector_sums():
    rng = random.Random(17)
    ref = _random_seq(rng, 1500)
    lz = LZDiff(20)
    lz.prepare(ref)
    text = _mutate(rng, ref)
    pref = lz.get_coding_cost_vector(text, True)
    suff = lz.get_coding_cost_vector(text, False)
    assert len(pref) == len(text) == len(suff)
    assert pref.sum() == suff.sum()


def test_tuples_roundtrip():
    rng = random.Random(19)
    for alphabet, n in [(4, 1000), (6, 999), (16, 998), (31, 97), (4, 7)]:
        data = bytes(rng.randrange(alphabet) for _ in range(n))
        t = bytes2tuples(data)
        assert tuples2bytes(t) == data, (alphabet, n)
        if alphabet <= 16:
            assert len(t) < len(data)


def test_match_to_end_token():
    """A match running to the end of both sequences omits the length."""
    rng = random.Random(23)
    ref = _random_seq(rng, 800)
    lz = LZDiff(20)
    lz.prepare(ref)
    text = bytes([(ref[0] + 1) % 4]) + ref[1:]  # one substitution at start
    enc = lz.encode(text)
    assert decode_v2(ref, enc, 20) == text
    assert enc.endswith(b".")


def test_native_split_point_matches_numpy():
    """lz_split_point (fused native missing-middle search) must pick the
    same split position as the numpy cost-vector combination for every
    flag combination (reference: agc_compressor.cpp:1502-1627)."""
    import numpy as np

    from agc_tpu.core.lz import LZDiff
    from agc_tpu.native import get_lib

    lib = get_lib()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    n = 5000
    left = rng.integers(0, 4, size=n, dtype=np.uint8)
    right = rng.integers(0, 4, size=n, dtype=np.uint8)
    # text: left half matches ref1, right half matches ref2 (with noise)
    text = np.concatenate([left[: n // 2], right[n // 2 :]])
    snp = rng.integers(0, n, size=12)
    text[snp] = (text[snp] + 1) % 4
    rc = (3 - text)[::-1].copy()

    lz1 = LZDiff(20)
    lz1.prepare(left.tobytes())
    lz2 = LZDiff(20)
    lz2.prepare(right.tobytes())

    tb, rb = text.tobytes(), rc.tobytes()

    def numpy_best(pc1_dir, mode2_dir):
        if pc1_dir:
            v1 = np.frombuffer(
                lz1.get_coding_cost_vector(tb, True), dtype=np.uint32
            )
            v1 = np.cumsum(v1.astype(np.int64))
        else:
            v1 = lz1.get_coding_cost_vector(rb, False)[::-1]
            v1 = np.cumsum(v1.astype(np.int64))
        if mode2_dir:
            v2 = lz2.get_coding_cost_vector(tb, False).astype(np.int64)
            v2 = np.cumsum(v2[::-1])[::-1]
        else:
            v2 = lz2.get_coding_cost_vector(rb, True).astype(np.int64)
            v2 = np.cumsum(v2)[::-1]
        return int(np.argmin(v1 + v2))

    for pc1_dir in (True, False):
        for mode2_dir in (True, False):
            want = numpy_best(pc1_dir, mode2_dir)
            t1, pc1, rev1 = (tb, 1, 0) if pc1_dir else (rb, 0, 1)
            t2, mode2 = (tb, 0) if mode2_dir else (rb, 1)
            got = int(
                lib.lz_split_point(
                    lz1._ctx, t1, pc1, rev1, lz2._ctx, t2, mode2, n
                )
            )
            assert got == want, (pc1_dir, mode2_dir, got, want)


def test_estimate_matches_encoded_size_v1_grammar():
    """V1 always spells out ',len' even for a match running to both ends;
    estimate must count it (previously it applied the V2-only
    match-to-end discount and undercounted)."""
    rng = random.Random(29)
    ref = _random_seq(rng, 2000)
    lz = LZDiff(20, v1_grammar=True)
    lz.prepare(ref)
    # a suffix-identical text guarantees a final match to both ends
    texts = [_mutate(rng, ref) for _ in range(3)]
    texts.append(ref[:50] + ref)  # prefix dup, tail = whole ref
    for text in texts:
        enc = lz.encode(text)
        est = lz.estimate(text)
        assert est == len(enc), (len(enc), est)
