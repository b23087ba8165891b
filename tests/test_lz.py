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
