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


@pytest.mark.parametrize("n_procs", [2, 3, 4])
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


def _adaptive_fixture(tmp_path):
    """Reference + two samples each carrying a contig with NO reference
    k-mers (adaptive promotion required); s1's novel contig is a lightly
    mutated copy of s0's, so s0's promoted splitters must segment it --
    but only if the new splitters actually crossed shards."""
    rng = random.Random(77)
    base = random_seq(rng, 24000)
    novel = random_seq(rng, 8000)
    ref = str(tmp_path / "aref.fa")
    write_fa(ref, [("c1", base)])
    s0 = str(tmp_path / "as0.fa")
    write_fa(s0, [("c1", mutate(rng, base, 30, 3)), ("nv", novel)])
    s1 = str(tmp_path / "as1.fa")
    write_fa(s1, [("c1", mutate(rng, base, 25, 2)),
                  ("nv", mutate(rng, novel, subs=8))])
    from agc_tpu.core.compressor import CompressorParams

    params = CompressorParams(
        kmer_length=17, segment_size=1000, pack_cardinality=10,
        min_match_len=15, adaptive_compression=True,
    )
    return [ref, s0, s1], params


def test_jaxdist_adaptive_single_proc_matches_plain_create(tmp_path):
    """-a at 1 process follows the plain-create schedule exactly: the
    archive is stream-identical."""
    from agc_tpu.core.archive import ArchiveReader
    from agc_tpu.core.compressor import create_archive
    from agc_tpu.parallel.jaxdist import create_archive_jaxdist

    files, params = _adaptive_fixture(tmp_path)

    def contents(path):
        r = ArchiveReader(str(path))
        out = {
            sn: [r.get_part(sn, i) for i in range(r.n_parts(sn))]
            for sn in r.stream_names()
        }
        r.close()
        return out

    plain = tmp_path / "ap.agc"
    create_archive(str(plain), files, params)
    dist = tmp_path / "ad1.agc"
    create_archive_jaxdist(str(dist), files, params, n_procs=1)
    assert contents(plain) == contents(dist)


def test_jaxdist_adaptive_exchange_crosses_shards(tmp_path):
    """-a at 2 processes: the per-barrier all_gather must carry s0's
    promoted splitters (shard 1, round 0) to shard 0 before it compresses
    s1 (round 1). When it does, s1's novel contig is segmented by the
    exchanged table and promotes nothing, so the archive's splitter set
    equals the single-host one; round-trip extraction stays exact."""
    from agc_tpu.core.compressor import create_archive
    from agc_tpu.core.decompressor import Decompressor
    from agc_tpu.parallel.jaxdist import create_archive_jaxdist

    files, params = _adaptive_fixture(tmp_path)
    plain = tmp_path / "ap2.agc"
    create_archive(str(plain), files, params)
    dist = tmp_path / "ad2.agc"
    create_archive_jaxdist(str(dist), files, params, n_procs=2)
    assert _archive_splitters(dist) == _archive_splitters(plain)

    import filecmp

    d = Decompressor(str(dist))
    for sample, path in zip(("aref", "as0", "as1"), files):
        out = str(tmp_path / f"ad2_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), sample
    d.close()


def test_jaxdist_chunked_exchange_identical(collection, tmp_path, monkeypatch):
    """A tiny exchange budget forces the k-mer pool merge into many
    value-range chunk rounds; the archive must be stream-identical to the
    unchunked 2-process run (chunks are value-disjoint and value-ordered,
    so the reduced tables are equal)."""
    tmp, files, bodies = collection
    from agc_tpu.core.archive import ArchiveReader
    from agc_tpu.core.compressor import CompressorParams
    from agc_tpu.parallel.jaxdist import create_archive_jaxdist

    params = CompressorParams(segment_size=5000)
    plain = tmp_path / "unchunked.agc"
    create_archive_jaxdist(str(plain), files, params, n_procs=2)

    monkeypatch.setenv("AGC_TPU_DIST_EXCHANGE_BUDGET", str(64 << 10))
    chunked = tmp_path / "chunked.agc"
    create_archive_jaxdist(str(chunked), files, params, n_procs=2)

    def contents(path):
        r = ArchiveReader(str(path))
        try:
            return {
                sn: [r.get_part(sn, i) for i in range(r.n_parts(sn))]
                for sn in r.stream_names()
            }
        finally:
            r.close()

    assert contents(plain) == contents(chunked)


def test_jaxdist_four_procs_adaptive_and_fallback(collection, tmp_path):
    """4 processes with -a AND -f together: the per-barrier splitter
    all_gather and the fallback-record exchange must both cross all four
    shards; extraction stays exact and the splitter set matches the
    single-host create."""
    tmp, files, bodies = collection
    from agc_tpu.core.compressor import CompressorParams, create_archive
    from agc_tpu.parallel.jaxdist import create_archive_jaxdist

    params = CompressorParams(
        segment_size=5000, adaptive_compression=True, fallback_frac=0.01
    )
    plain = tmp_path / "plain_af.agc"
    create_archive(str(plain), files, params)
    out = tmp_path / "dist4_af.agc"
    create_archive_jaxdist(str(out), files, params, n_procs=4)
    _extract_all(out, bodies)
    assert _archive_splitters(out) == _archive_splitters(plain)
