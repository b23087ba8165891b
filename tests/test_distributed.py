"""Sharded (multi-host) create: extraction must be byte-identical for any
shard count (BASELINE.json config: N>=2 hosts with collective merge)."""

import filecmp

import pytest

from agc_tpu.core.compressor import CompressorParams
from agc_tpu.core.decompressor import Decompressor
from agc_tpu.parallel.distributed import create_archive_sharded

from util import make_collection

PARAMS = CompressorParams(
    kmer_length=17, segment_size=1000, pack_cardinality=2, min_match_len=15
)


@pytest.mark.parametrize("n_shards", [1, 2, 3])
def test_sharded_create_roundtrip(tmp_path, n_shards):
    files = make_collection(tmp_path, n_samples=4, contig_lens=(30000, 12000))
    archive = str(tmp_path / f"sh{n_shards}.agc")
    create_archive_sharded(
        archive, [p for _, p in files], PARAMS, n_shards=n_shards
    )
    d = Decompressor(archive)
    assert sorted(d.list_samples()) == sorted(s for s, _ in files)
    for sample, path in files:
        out = str(tmp_path / f"out{n_shards}_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), (n_shards, sample)
    d.close()


def test_shard_count_invariant_extraction(tmp_path):
    files = make_collection(tmp_path, n_samples=3, contig_lens=(20000,))
    outs = []
    for n in (1, 3):
        archive = str(tmp_path / f"inv{n}.agc")
        create_archive_sharded(archive, [p for _, p in files], PARAMS, n_shards=n)
        d = Decompressor(archive)
        text = []
        for sample, _ in files:
            text.append(d.get_contig_seq(sample, "c1"))
        outs.append(text)
        d.close()
    assert outs[0] == outs[1]


def test_cli_create_shards(tmp_path):
    """agc-tpu create --shards N produces a normal, fully-extractable
    archive through the CLI driver."""
    from agc_tpu.cli.main import main as cli_main

    files = make_collection(tmp_path, n_samples=3, contig_lens=(15000,))
    archive = str(tmp_path / "cli_sharded.agc")
    rc = cli_main(
        ["create", "-o", archive, *[p for _, p in files], "--shards", "2", "-s", "1000"]
    )
    assert rc == 0
    d = Decompressor(archive)
    for sample, path in files:
        out = str(tmp_path / f"cli_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), sample
    d.close()


def test_process_workers_match_threads(tmp_path):
    """worker="process" (the multi-host execution shape: separate
    runtimes, shard results shipped by value) must produce an archive
    whose extraction matches the thread-sharded one byte for byte."""
    files = make_collection(tmp_path, n_samples=3, contig_lens=(12000,))
    a_thr = str(tmp_path / "thr.agc")
    a_proc = str(tmp_path / "proc.agc")
    create_archive_sharded(a_thr, [p for _, p in files], PARAMS, n_shards=2)
    create_archive_sharded(
        a_proc, [p for _, p in files], PARAMS, n_shards=2, worker="process"
    )
    dt, dp = Decompressor(a_thr), Decompressor(a_proc)
    for sample, _ in files:
        assert dt.get_contig_seq(sample, "c1") == dp.get_contig_seq(sample, "c1")
    dt.close()
    dp.close()


def test_sharded_fallback_records_reach_shards(tmp_path):
    """-f (fallback minimizers): the boot discovery's fallback records
    must reach every shard with plain-create timing (the reference merges
    them at the first registration barrier, agc_compressor.cpp:1126).
    With one shard this makes the sharded archive byte-identical to a
    plain create, stream for stream; with several shards grouping may
    legitimately differ (each shard's group dictionary evolves
    independently) but extraction stays byte-identical."""
    import random

    from agc_tpu.core.archive import ArchiveReader
    from agc_tpu.core.compressor import create_archive
    from util import mutate, random_seq, write_fa

    rng = random.Random(5)
    base = random_seq(rng, 30000)
    ref = str(tmp_path / "r.fa")
    write_fa(ref, [("c1", base)])
    s0 = str(tmp_path / "s0.fa")
    write_fa(s0, [("c1", mutate(rng, base[5000:25000], 50, 5))])
    s1 = str(tmp_path / "s1.fa")
    write_fa(s1, [("c1", mutate(rng, base[3000:28000], 60, 6))])
    params = CompressorParams(
        kmer_length=17, segment_size=1000, pack_cardinality=10,
        min_match_len=15, fallback_frac=0.05,
    )

    def contents(path):
        r = ArchiveReader(path)
        out = {
            sn: [r.get_part(sn, i) for i in range(r.n_parts(sn))]
            for sn in r.stream_names()
        }
        r.close()
        return out

    plain = str(tmp_path / "p.agc")
    create_archive(plain, [ref, s0, s1], params)
    sh1 = str(tmp_path / "1.agc")
    create_archive_sharded(sh1, [ref, s0, s1], params, n_shards=1)
    assert contents(plain) == contents(sh1)

    sh3 = str(tmp_path / "3.agc")
    create_archive_sharded(sh3, [ref, s0, s1], params, n_shards=3)
    d = Decompressor(sh3)
    for sample, path in [("r", ref), ("s0", s0), ("s1", s1)]:
        out = str(tmp_path / f"fb3_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), sample
    d.close()


def test_jaxdist_rejects_concatenated_mode(tmp_path):
    """The pod path's in-band barriers follow the plain -c contig-block
    schedule, which lockstep workers cannot reproduce — jaxdist must
    reject -c explicitly, not diverge silently. (create_archive_sharded
    DOES support plain -c via global-stream replay at the writer:
    test_sharded_concatenated_byte_identical.)"""
    from agc_tpu.parallel.jaxdist import run_worker

    params = CompressorParams(concatenated_genomes=True)
    with pytest.raises(NotImplementedError):
        run_worker(0, 1, "127.0.0.1:1", str(tmp_path / "x.agc"),
                   ["nope.fa"], params)


def _adaptive_fixture(tmp_path):
    """Reference + two samples each carrying a contig with NO reference
    k-mers (novel sequence >= segment_size): compressing them requires
    adaptive new-splitter promotion. s1's novel contig is a lightly
    mutated copy of s0's, so splitters promoted from s0 should segment it."""
    import random

    from util import mutate, random_seq, write_fa

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
    params = CompressorParams(
        kmer_length=17, segment_size=1000, pack_cardinality=10,
        min_match_len=15, adaptive_compression=True,
    )
    return [ref, s0, s1], params


def _stream_contents(path):
    from agc_tpu.core.archive import ArchiveReader

    r = ArchiveReader(str(path))
    out = {
        sn: [r.get_part(sn, i) for i in range(r.n_parts(sn))]
        for sn in r.stream_names()
    }
    r.close()
    return out


def test_sharded_adaptive_create(tmp_path):
    """Adaptive (-a) sharded create: one shard is stream-identical to a
    plain adaptive create; several shards (shard-local splitter growth)
    still extract byte-identically."""
    from agc_tpu.core.compressor import create_archive

    files, params = _adaptive_fixture(tmp_path)
    plain = str(tmp_path / "ap.agc")
    create_archive(plain, files, params)
    sh1 = str(tmp_path / "a1.agc")
    create_archive_sharded(sh1, files, params, n_shards=1)
    assert _stream_contents(plain) == _stream_contents(sh1)

    sh3 = str(tmp_path / "a3.agc")
    create_archive_sharded(sh3, files, params, n_shards=3)
    d = Decompressor(sh3)
    for sample, path in zip(("aref", "as0", "as1"), files):
        out = str(tmp_path / f"a3_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), sample
    d.close()


def test_sharded_adaptive_process_workers_match_threads(tmp_path):
    """Shard-local adaptive growth is deterministic for a given shard
    count, so thread and process workers must agree stream for stream."""
    files, params = _adaptive_fixture(tmp_path)
    a_thr = str(tmp_path / "at.agc")
    a_proc = str(tmp_path / "apx.agc")
    create_archive_sharded(a_thr, files, params, n_shards=2)
    create_archive_sharded(a_proc, files, params, n_shards=2, worker="process")
    assert _stream_contents(a_thr) == _stream_contents(a_proc)


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_fuzz_sharded_matches_plain(tmp_path, seed):
    """Randomized params x random collections: a sharded create must stay
    shard-count-invariant AND extraction-equal to the plain create."""
    import random

    from agc_tpu.core.archive import ArchiveReader
    from agc_tpu.core.compressor import create_archive

    rng = random.Random(seed)
    params = CompressorParams(
        kmer_length=rng.choice([17, 23, 31]),
        segment_size=rng.choice([500, 1500, 4000]),
        pack_cardinality=rng.choice([2, 3, 50]),
        min_match_len=rng.choice([15, 20]),
        adaptive_compression=rng.random() < 0.4,
        fallback_frac=rng.choice([0.0, 0.03]),
        profile=rng.choice(["zstd", "tpu-rans"]),
    )
    n_contigs = rng.randrange(1, 4)
    lens = tuple(rng.randrange(3000, 25000) for _ in range(n_contigs))
    files = make_collection(
        tmp_path, n_samples=rng.randrange(3, 6), contig_lens=lens
    )
    plain = str(tmp_path / "plain.agc")
    create_archive(plain, [p for _, p in files], params)
    n_shards = rng.randrange(2, 4)
    sharded = str(tmp_path / "sharded.agc")
    create_archive_sharded(
        sharded, [p for _, p in files], params, n_shards=n_shards
    )
    dp, ds = Decompressor(plain), Decompressor(sharded)
    try:
        assert sorted(dp.list_samples()) == sorted(ds.list_samples())
        for s in dp.list_samples():
            for c in dp.list_contigs(s):
                assert dp.get_contig_seq(s, c) == ds.get_contig_seq(s, c), (
                    seed, s, c, params,
                )
    finally:
        dp.close()
        ds.close()


def test_mesh_create_byte_identical_to_single_chip(tmp_path):
    """mesh_create_archive (every membership scan as the mesh-sharded
    SPMD program over the 8 virtual devices) must produce BYTE-IDENTICAL
    archives to the plain single-chip create, and extract exactly."""
    import jax

    from agc_tpu.core.compressor import create_archive
    from agc_tpu.parallel.sharding import make_mesh, mesh_create_archive

    files = make_collection(tmp_path, n_samples=3, contig_lens=(30000, 9000))
    paths = [p for _, p in files]
    plain = str(tmp_path / "plain.agc")
    create_archive(plain, paths, PARAMS)
    meshed = str(tmp_path / "mesh.agc")
    mesh_create_archive(
        meshed, paths, PARAMS, mesh=make_mesh(jax.devices()), chunk_len=8192
    )
    # content identity, not raw-file identity: the PHYSICAL part order
    # depends on the async store worker's interleaving with the barrier
    # flushes (the reference's own AddPartBuffered layout is scheduler-
    # dependent the same way); the format's random access contract is
    # the footer-indexed stream/part CONTENT, which must match exactly
    from agc_tpu.core.archive import ArchiveReader

    ra, rb = ArchiveReader(plain), ArchiveReader(meshed)
    assert set(ra.stream_names()) == set(rb.stream_names())
    for n in ra.stream_names():
        assert ra.n_parts(n) == rb.n_parts(n), n
        for i in range(ra.n_parts(n)):
            assert ra.get_part(n, i) == rb.get_part(n, i), (n, i)
    ra.close()
    rb.close()
    d = Decompressor(meshed)
    for sample, path in files:
        out = str(tmp_path / f"mesh_out_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), sample
    d.close()


def test_shard_count_archive_growth_bounded(tmp_path):
    """N-shard archives must stay within 2% of the 1-shard size: the
    merge dedups same-splitter-pair groups across shards (one surviving
    reference per pair; duplicate shards' members re-encode as LZ
    deltas against it). Guards the one-reference-per-group invariant
    under sharding (reference: segment.cpp:34-80)."""
    import os

    files = make_collection(tmp_path, n_samples=8, contig_lens=(30000, 12000))
    paths = [p for _, p in files]
    sizes = {}
    for n_shards in (1, 2, 4, 8):
        archive = str(tmp_path / f"g{n_shards}.agc")
        create_archive_sharded(archive, paths, PARAMS, n_shards=n_shards)
        sizes[n_shards] = os.path.getsize(archive)
        # extraction must stay exact after the dedup
        d = Decompressor(archive)
        sample, path = files[-1]
        out = str(tmp_path / f"gx{n_shards}.fa")
        d.get_sample_file(out, [sample], line_length=70)
        assert filecmp.cmp(out, path, shallow=False), n_shards
        d.close()
    for n_shards in (2, 4, 8):
        assert sizes[n_shards] <= sizes[1] * 1.02, sizes


def test_sharded_concatenated_byte_identical(tmp_path):
    """-c sharding: the merge replays the GLOBAL contig stream with the
    plain create's contig-block barrier schedule, so any shard count is
    byte-identical to the plain (single-host) -c archive."""
    from agc_tpu.core.compressor import create_archive

    # pack_cardinality=3 with 2-contig files: -c contig blocks SPAN file
    # boundaries (the capture must key segments by the contig's own
    # file, not the ingestion cursor — a cursor-keyed capture silently
    # dropped the earlier file's segments)
    params = CompressorParams(
        kmer_length=17, segment_size=1000, pack_cardinality=3,
        min_match_len=15, concatenated_genomes=True,
    )
    # contig names unique across files (-c: every contig is a sample)
    files = []
    import numpy as np
    from util import write_fa

    rng = np.random.default_rng(42)
    base = rng.integers(0, 4, 30000, dtype=np.uint8)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(5):
        seq = base.copy()
        idx = rng.choice(len(seq), 60, replace=False)
        seq[idx] = (seq[idx] + 1 + rng.integers(0, 3, 60)) % 4
        txt = alpha[seq].tobytes().decode()
        p = str(tmp_path / f"g{i}.fa")
        write_fa(p, [(f"ctg{i}a", txt[:18000]), (f"ctg{i}b", txt[18000:])])
        files.append(p)

    def stream_content(path):
        """{stream: [(part bytes, meta), ...]} — the archive's logical
        content. Async barrier stores make the PHYSICAL part layout
        timing-dependent (parts land at whichever flush they catch) in
        plain and sharded creates alike, so equality is asserted at the
        stream level, which is what readers consume."""
        from agc_tpu.core.archive import ArchiveReader

        r = ArchiveReader(path)
        out = {
            s: [r.get_part(s, i) for i in range(r.n_parts(s))]
            for s in r.stream_names()
        }
        r.close()
        return out

    plain = str(tmp_path / "plain_c.agc")
    create_archive(plain, files, params)
    want = stream_content(plain)
    for n in (1, 2, 3):
        arc = str(tmp_path / f"c_sh{n}.agc")
        create_archive_sharded(arc, files, params, n_shards=n)
        got = stream_content(arc)
        assert got == want, f"sharded -c diverges from plain -c at n={n}"

    # and the -c archive extracts: every contig is its own sample
    d = Decompressor(plain)
    names = d.list_samples()
    assert "ctg0a" in names and "ctg4b" in names
    d.close()


def test_sharded_concatenated_rejects_adaptive(tmp_path):
    params = CompressorParams(
        kmer_length=17, segment_size=1000, pack_cardinality=2,
        min_match_len=15, concatenated_genomes=True,
        adaptive_compression=True,
    )
    files = make_collection(tmp_path, n_samples=2, contig_lens=(4000,))
    with pytest.raises(NotImplementedError):
        create_archive_sharded(
            str(tmp_path / "x.agc"), [p for _, p in files], params,
            n_shards=2,
        )


def test_delta_hint_hash_verification(tmp_path):
    """SegmentWriter.add must ignore a shipped delta whose ref_hash does
    not match the group's actual reference (the safety property that
    makes shard-side delta shipping a pure optimization), and must
    produce identical results when the hash does match."""
    import hashlib

    import numpy as np

    from agc_tpu.core.archive import ArchiveWriter
    from agc_tpu.core.lz import LZDiff
    from agc_tpu.core.segment import SegmentWriter

    rng = np.random.default_rng(9)
    ref = rng.integers(0, 4, 5000, dtype=np.uint8).tobytes()
    mem = bytearray(ref)
    for p in rng.choice(5000, 12, replace=False):
        mem[p] = (mem[p] + 1) % 4
    mem = bytes(mem)

    def build(hint):
        w = ArchiveWriter(str(tmp_path / "t.agc"))
        sw = SegmentWriter("xAA", w, 50, 20, 3000)
        sw.add(ref)
        gid = sw.add(mem, delta_hint=hint)
        packed = list(sw.v_lzp)
        w.close()
        return gid, packed

    base_gid, base_pack = build(None)

    lz = LZDiff(20)
    lz.prepare(ref)
    good_delta = lz.encode(mem)
    good_hash = hashlib.blake2b(ref, digest_size=16).digest()

    # correct hint: same placement, same delta bytes
    gid, pack = build((good_delta, good_hash))
    assert (gid, pack) == (base_gid, base_pack)

    # wrong hash: garbage delta MUST be ignored (writer re-encodes)
    gid, pack = build((b"\x00garbage", b"x" * 16))
    assert (gid, pack) == (base_gid, base_pack)

    # right hash, different-but-valid delta bytes would be used verbatim
    # (pure-function contract holds only for honestly computed deltas);
    # the hash gate is what keeps stale/misrouted hints out
    gid, pack = build((good_delta, hashlib.blake2b(b"other", digest_size=16).digest()))
    assert (gid, pack) == (base_gid, base_pack)


def test_sharded_concatenated_duplicate_basenames(tmp_path):
    """-c with two input files sharing a BASENAME (dir1/x.fa, dir2/x.fa):
    captures are keyed by file path, so both files' contigs must reach
    the archive (a sample-name-keyed capture silently dropped one)."""
    import numpy as np

    from agc_tpu.core.compressor import create_archive
    from util import write_fa

    rng = np.random.default_rng(8)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    files = []
    for i, sub in enumerate(("d1", "d2", "d3")):
        (tmp_path / sub).mkdir()
        seq = alpha[rng.integers(0, 4, 20000)].tobytes().decode()
        p = str(tmp_path / sub / "x.fa")
        write_fa(p, [(f"uctg{i}", seq)])
        files.append(p)
    params = CompressorParams(
        kmer_length=17, segment_size=1000, pack_cardinality=2,
        min_match_len=15, concatenated_genomes=True,
    )
    plain = str(tmp_path / "p.agc")
    create_archive(plain, files, params)
    arc = str(tmp_path / "s.agc")
    create_archive_sharded(arc, files, params, n_shards=2)
    dp, ds = Decompressor(plain), Decompressor(arc)
    assert sorted(ds.list_samples()) == sorted(dp.list_samples()) == [
        "uctg0", "uctg1", "uctg2"
    ]
    for cid in ("uctg0", "uctg1", "uctg2"):
        assert ds.get_contig_seq(cid, cid) == dp.get_contig_seq(cid, cid)
    dp.close()
    ds.close()
