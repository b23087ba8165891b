"""Multi-process create via jax.distributed (CPU + gloo collectives).

Each worker is one OS process running the exact code a pod host would:
jax.distributed.initialize, collective splitter discovery (all_to_all
k-mer range partition + all_gather table replication), shard
compression, KV-store rendezvous, writer-host merge.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from util import mutate, random_seq, write_fa


@pytest.fixture(scope="module")
def collection(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jaxdist")
    rng = random.Random(4242)
    # multi-contig reference so discovery really is contig-sharded
    base = {
        "c1": random_seq(rng, 60_000),
        "c2": random_seq(rng, 40_000),
        "c3": random_seq(rng, 25_000),
    }
    files = [str(tmp / "ref.fa")]
    write_fa(files[0], list(base.items()))
    bodies = {"ref": dict(base)}
    for i in range(5):
        s = {c: mutate(rng, seq, subs=len(seq) // 1000) for c, seq in base.items()}
        p = str(tmp / f"s{i}.fa")
        write_fa(p, list(s.items()))
        files.append(p)
        bodies[f"s{i}"] = s
    return tmp, files, bodies


def _extract_all(archive, bodies):
    from agc_tpu.core.decompressor import Decompressor

    d = Decompressor(str(archive))
    try:
        assert sorted(d.list_samples()) == sorted(bodies)
        for sample, contigs in bodies.items():
            for cname, seq in contigs.items():
                got = d.get_contig_seq(sample, cname)
                assert got == seq.encode(), (sample, cname)
    finally:
        d.close()


@pytest.mark.parametrize("n_procs", [2, 3])
def test_jaxdist_create_extracts_identically(collection, n_procs, tmp_path):
    tmp, files, bodies = collection
    from agc_tpu.core.compressor import CompressorParams
    from agc_tpu.parallel.jaxdist import create_archive_jaxdist

    out = tmp_path / f"dist{n_procs}.agc"
    params = CompressorParams(segment_size=5000)
    create_archive_jaxdist(str(out), files, params, n_procs=n_procs)
    _extract_all(out, bodies)


def _archive_splitters(path) -> set:
    from agc_tpu.core.archive import ArchiveReader

    r = ArchiveReader(str(path))
    try:
        data, _n = r.get_part("splitters", 0)
        return set(int(x) for x in np.frombuffer(data, dtype="<u8"))
    finally:
        r.close()


def test_jaxdist_matches_single_host_splitters(collection, tmp_path):
    """The collective discovery (range-partitioned singleton filter +
    contig-sharded greedy) must reproduce the single-host splitter set."""
    tmp, files, bodies = collection
    from agc_tpu.core.compressor import CompressorParams, create_archive
    from agc_tpu.parallel.jaxdist import create_archive_jaxdist

    params = CompressorParams(segment_size=5000)
    plain = tmp_path / "plain.agc"
    create_archive(str(plain), files, params)

    dist = tmp_path / "dist2.agc"
    create_archive_jaxdist(str(dist), files, params, n_procs=2)

    assert _archive_splitters(dist) == _archive_splitters(plain)


def test_jaxdist_fallback_matches_plain_create(tmp_path):
    """-f: the collective discovery's fallback records (collected by the
    shared greedy walk, exchanged with the same padded all_gather) must
    reproduce single-host grouping — a 1-process distributed create is
    stream-identical to a plain create with -f."""
    from agc_tpu.core.archive import ArchiveReader
    from agc_tpu.core.compressor import CompressorParams, create_archive
    from agc_tpu.parallel.jaxdist import create_archive_jaxdist

    rng = random.Random(5)
    base = random_seq(rng, 30000)
    ref = str(tmp_path / "r.fa")
    write_fa(ref, [("c1", base)])
    s0 = str(tmp_path / "s0.fa")
    write_fa(s0, [("c1", mutate(rng, base[5000:25000], 50, 5))])
    params = CompressorParams(
        kmer_length=17, segment_size=1000, pack_cardinality=10,
        min_match_len=15, fallback_frac=0.05,
    )

    def contents(path):
        r = ArchiveReader(str(path))
        out = {
            sn: [r.get_part(sn, i) for i in range(r.n_parts(sn))]
            for sn in r.stream_names()
        }
        r.close()
        return out

    plain = tmp_path / "p.agc"
    create_archive(str(plain), [ref, s0], params)
    dist = tmp_path / "d1.agc"
    create_archive_jaxdist(str(dist), [ref, s0], params, n_procs=1)
    assert contents(plain) == contents(dist)
