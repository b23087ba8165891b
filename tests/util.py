"""Shared helpers for synthesizing FASTA collections in tests."""

import random


def write_fa(path, contigs, line=70):
    with open(path, "w") as f:
        for name, seq in contigs:
            f.write(f">{name}\n")
            for i in range(0, len(seq), line):
                f.write(seq[i : i + line] + "\n")


def random_seq(rng: random.Random, n: int, alphabet="ACGT") -> str:
    return "".join(rng.choice(alphabet) for _ in range(n))


def mutate(rng: random.Random, seq: str, subs=100, indels=10) -> str:
    s = list(seq)
    for _ in range(subs):
        i = rng.randrange(len(s))
        s[i] = rng.choice("ACGT")
    for _ in range(indels):
        i = rng.randrange(len(s))
        if rng.random() < 0.5:
            del s[i : i + rng.randrange(1, 10)]
        else:
            s[i:i] = rng.choice("ACGT") * rng.randrange(1, 10)
    return "".join(s)


def make_collection(tmp_path, rng=None, n_samples=3, contig_lens=(60000, 40000)):
    """Reference + n mutated samples; returns list of (sample, path)."""
    rng = rng or random.Random(42)
    base = [random_seq(rng, n) for n in contig_lens]
    ref = str(tmp_path / "ref.fa")
    write_fa(ref, [(f"c{i + 1}", s) for i, s in enumerate(base)])
    files = [("ref", ref)]
    for si in range(n_samples):
        p = str(tmp_path / f"s{si}.fa")
        write_fa(
            p,
            [(f"c{i + 1}", mutate(rng, s, 200, 20)) for i, s in enumerate(base)],
        )
        files.append((f"s{si}", p))
    return files
