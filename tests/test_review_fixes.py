"""Regressions for the round-1 code-review findings (collection /
archive / decompressor)."""

import random

import pytest

from agc_tpu.core.compressor import CompressorParams, create_archive
from agc_tpu.core.decompressor import Decompressor

from util import random_seq, write_fa

SMALL = CompressorParams(
    kmer_length=17, segment_size=1000, pack_cardinality=10, min_match_len=15
)


def _mk(tmp_path, contigs_by_sample):
    files = []
    for name, contigs in contigs_by_sample:
        p = str(tmp_path / f"{name}.fa")
        write_fa(p, contigs, line=80)
        files.append(p)
    return files


def test_threaded_getcol_shares_one_batch_load(tmp_path):
    """getcol -t N loads collection batches from worker threads; the
    lazy loader must be locked (previously two threads could interleave
    contig-list appends for samples of the same batch)."""
    rng = random.Random(3)
    base = random_seq(rng, 6000)
    samples = [("ref", [("c1", base), ("c2", random_seq(rng, 3000))])]
    for i in range(6):
        samples.append((f"s{i}", [("c1", base), ("c2", random_seq(rng, 3000))]))
    files = _mk(tmp_path, samples)
    archive = str(tmp_path / "t.agc")
    create_archive(archive, files, SMALL)

    for trial in range(3):
        out = tmp_path / f"o{trial}"
        out.mkdir()
        d = Decompressor(archive)
        assert d.get_collection_files(str(out), no_threads=4)
        d.close()
        for name, contigs in samples:
            body = open(out / f"{name}.fa").read()
            headers = [l[1:] for l in body.split("\n") if l.startswith(">")]
            assert headers == [c for c, _ in contigs], (trial, name)


def test_hostile_sample_name_cannot_escape_out_dir(tmp_path):
    """A doctored collection-samples stream with a path-traversal sample
    name must fail cleanly, not write outside the output directory."""
    files = _mk(tmp_path, [("ref", [("c1", random_seq(random.Random(5), 4000))])])
    archive = str(tmp_path / "a.agc")
    create_archive(archive, files, SMALL)

    # rewrite the collection-samples part with a hostile name
    from agc_tpu.core.archive import ArchiveReader, ArchiveWriter
    from agc_tpu.core.codecs import enc_prefix_varint
    from agc_tpu.core.segment import part_compress

    r = ArchiveReader(archive, prefetch=True)
    bad = str(tmp_path / "bad.agc")
    w = ArchiveWriter(bad)
    evil = b"../../evil"
    for name in r.stream_names():
        w.register_stream(name)
        for i in range(r.n_parts(name)):
            data, meta = r.get_part(name, i)
            if name == "collection-samples":
                raw = bytearray()
                enc_prefix_varint(raw, 1)
                raw.extend(evil + b"\x00")
                data, meta = part_compress(bytes(raw), 19), len(raw)
            w.add_part(name, data, meta)
    w.close()
    r.close()

    out = tmp_path / "out"
    out.mkdir()
    d = Decompressor(bad)
    with pytest.raises(ValueError, match="unsafe sample name"):
        d.get_collection_files(str(out))
    d.close()
    assert not (tmp_path / "evil.fa").exists()
    assert list(out.iterdir()) == []


def test_non_ascii_contig_name_roundtrips_or_refuses(tmp_path):
    """Names with bytes >= 0x80 collide with the v3 name-delta markers.
    A lone such name (raw form, token count differs from prev) must
    round-trip; a pair that the delta coder would mis-decode must be a
    clean refusal at create time (the reference silently corrupts it)."""
    rng = random.Random(11)
    # safe: single non-ASCII name per sample
    files = _mk(tmp_path, [("ref", [("chrα", random_seq(rng, 4000))])])
    archive = str(tmp_path / "ok.agc")
    create_archive(archive, files, SMALL)
    d = Decompressor(archive)
    assert d.list_contigs("ref") == ["chrα"]
    assert len(d.get_contig_seq("ref", "chrα")) == 4000
    d.close()

    # unsafe: equal token count and byte length -> delta coder territory
    files = _mk(
        tmp_path,
        [("r2", [("chrα", random_seq(rng, 3000)),
                 ("chrβ", random_seq(rng, 3000))])],
    )
    with pytest.raises(ValueError, match="cannot be stored losslessly"):
        create_archive(str(tmp_path / "bad2.agc"), files, SMALL)


def test_duplicate_contig_name_skipped_not_corrupted(tmp_path, capsys):
    """Two contigs with the same name in one sample: the second is
    refused (error printed) and the FIRST extracts intact. The reference
    tool accepts both and corrupts the extraction."""
    a = random_seq(random.Random(7), 3000)
    b = random_seq(random.Random(8), 3000)
    p = str(tmp_path / "dup.fa")
    write_fa(p, [("dup", a), ("dup", b)], line=80)
    archive = str(tmp_path / "dup.agc")
    create_archive(archive, [p], SMALL)
    # the error goes to stderr: in stdout-archive mode (no -o) stdout IS
    # the archive byte stream
    assert "already in the archive" in capsys.readouterr().err
    d = Decompressor(archive)
    assert d.list_contigs("dup") == ["dup"]
    assert d.get_contig_seq("dup", "dup").decode() == a
    d.close()


def test_line_length_zero_batch_path_emits_valid_fasta(tmp_path):
    """line_length=0 (unwrapped) must still newline-terminate each body
    so headers do not glue onto sequence lines."""
    rng = random.Random(9)
    files = _mk(
        tmp_path,
        [("ref", [("c1", random_seq(rng, 2000)), ("c2", random_seq(rng, 1500))])],
    )
    archive = str(tmp_path / "z.agc")
    create_archive(archive, files, SMALL)
    d = Decompressor(archive)
    out = str(tmp_path / "flat.fa")
    d.get_sample_file(out, ["ref"], line_length=0)
    d.close()
    lines = open(out).read().splitlines()
    # exactly: header, full body, header, full body
    assert len(lines) == 4
    assert lines[0] == ">c1" and lines[2] == ">c2"
    assert len(lines[1]) == 2000 and len(lines[3]) == 1500


def test_streaming_ranged_query_matches_batch_path(tmp_path):
    """getctg -s with a narrow late range must equal the batch path's
    result (and not decode pre-range segments; previously it also decoded
    one segment past the range)."""
    rng = random.Random(13)
    seq = random_seq(rng, 30000)
    files = _mk(tmp_path, [("ref", [("c1", seq)])])
    archive = str(tmp_path / "r.agc")
    create_archive(archive, files, SMALL)
    d = Decompressor(archive)
    got_batch = d.get_contig_seq("ref", "c1", 25000, 25099).decode()
    out = str(tmp_path / "stream.fa")
    d.get_streaming(out, contig_queries=["c1@ref:25000-25099"], line_length=80)
    d.close()
    body = "".join(
        l for l in open(out).read().splitlines() if not l.startswith(">")
    )
    assert body == got_batch == seq[25000:25100]


def test_shared_short_name_contigs_both_kept(tmp_path):
    """Contigs sharing only the first word ("chr1 a" / "chr1 b") are both
    stored and batch-extract intact (the reference keeps them too);
    short-name queries resolve to the first, as in the reference."""
    a = random_seq(random.Random(21), 2500)
    b = random_seq(random.Random(22), 2500)
    p = str(tmp_path / "sn.fa")
    write_fa(p, [("chr1 assembly=A", a), ("chr1 assembly=B", b)], line=80)
    archive = str(tmp_path / "sn.agc")
    create_archive(archive, [p], SMALL)
    d = Decompressor(archive)
    assert d.list_contigs("sn") == ["chr1 assembly=A", "chr1 assembly=B"]
    out = str(tmp_path / "sn_out.fa")
    d.get_sample_file(out, ["sn"], line_length=80)
    import filecmp

    assert filecmp.cmp(out, p, shallow=False)
    assert d.get_contig_seq("sn", "chr1").decode() == a  # first match wins
    d.close()


def test_non_iupac_symbol_refused_at_create(tmp_path):
    """A non-IUPAC letter ('E') or high byte cannot be represented in an
    LZ delta (literal grammar spans codes 0..20 and the catch-all code is
    30): the reference tool writes such input silently and CRASHES
    extracting it (verified heap overflow under ASan). We refuse at
    create with a clean error naming the symbol and contig."""
    rng = random.Random(41)
    base = random_seq(rng, 4000)
    bad = base[:2000] + "E" + base[2001:]
    ref = str(tmp_path / "r.fa")
    s1 = str(tmp_path / "s.fa")
    write_fa(ref, [("c1", base)])
    write_fa(s1, [("c1", bad)])
    with pytest.raises(ValueError, match="IUPAC"):
        create_archive(str(tmp_path / "x.agc"), [ref, s1], SMALL)


def test_corrupt_tuples_marker_and_rans_blob_fail_cleanly():
    """Hostile tuples parts and rANS blobs raise clean ValueErrors in
    every implementation (the numpy spec decoder previously leaked
    IndexError/OverflowError)."""
    from agc_tpu.core.entropy import compress, decompress, decompress_np
    from agc_tpu.core.segment import tuples2bytes

    for data in (b"", b"\x00", b"\x50\x00", b"ab\x23"):
        with pytest.raises(ValueError):
            tuples2bytes(data)

    blob = bytearray(compress(b"ACGT" * 500))
    for hostile in (
        bytes(blob[:3]),                      # truncated varint header
        bytes(blob[:1]) + b"\x80" * 12,       # varint runs off the end
        bytes(blob[:-5]),                     # truncated payload
    ):
        for dec in (decompress,):
            with pytest.raises(ValueError):
                dec(hostile)
    # size header disagreeing with part metadata: both decoders refuse
    with pytest.raises(ValueError):
        decompress(bytes(blob), expected_size=9)
    with pytest.raises(ValueError):
        decompress_np(bytes(blob), expected_size=9)

    # the numpy-fallback wrapper (native lib absent) must convert raw
    # IndexError/OverflowError into the same clean ValueError
    import agc_tpu.core.entropy as E

    orig = E._native
    E._native = lambda: None
    try:
        for hostile in (
            bytes(blob[:3]),
            bytes(blob[:1]) + b"\x80" * 12,
            bytes(blob[:-5]),
        ):
            with pytest.raises(ValueError):
                E.decompress(hostile)
    finally:
        E._native = orig


def test_stdout_archive_mode_not_polluted_by_diagnostics(tmp_path):
    """create with no -o streams the archive to stdout; the duplicate-pair
    error must go to stderr (previously it landed in the archive bytes)."""
    import subprocess
    import sys

    rng = random.Random(77)
    p1 = str(tmp_path / "a.fa")
    write_fa(p1, [("c1", random_seq(rng, 3000))], line=80)
    p2 = str(tmp_path / "b.fa")
    write_fa(p2, [("c1", random_seq(rng, 2500))], line=80)
    p2dup = str(tmp_path / "b_dup.fa")
    write_fa(p2dup, [("c1", "ACGT" * 300)], line=80)  # same stem-name trick
    import shutil

    shutil.copy(p2, str(tmp_path / "bcopy"))
    env = dict(
        __import__("os").environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo"
    )
    r = subprocess.run(
        [sys.executable, "-m", "agc_tpu.cli.main", "create",
         "-k", "17", "-s", "1000", "-l", "15", p1, p2, p2],
        capture_output=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-400:]
    out_archive = str(tmp_path / "streamed.agc")
    open(out_archive, "wb").write(r.stdout)
    d = Decompressor(out_archive)
    assert sorted(d.list_samples()) == ["a", "b"]
    d.close()


def test_failed_create_removes_partial_archive(tmp_path):
    """A refused create (non-IUPAC symbol) must not leave a footerless
    partial archive at the output path."""
    rng = random.Random(79)
    ref = str(tmp_path / "r.fa")
    write_fa(ref, [("c1", random_seq(rng, 3000))])
    bad = str(tmp_path / "b.fa")
    write_fa(bad, [("c1", "ACGTE" * 200)])
    out = str(tmp_path / "part.agc")
    with pytest.raises(ValueError):
        create_archive(out, [ref, bad], SMALL)
    import os

    assert not os.path.exists(out)


def test_sharded_archive_pins_collection_stream_ids(tmp_path):
    """Sharded creates must register collection-samples/contigs/details
    as stream ids 0/1/2 exactly like plain creates: the reference tool's
    append resolves them by id and segfaults on any other layout
    (collection_v3.cpp:48-61). Previously _merge_shards registered them
    lazily AFTER every group stream."""
    from agc_tpu.core.archive import ArchiveReader
    from agc_tpu.parallel.distributed import create_archive_sharded

    rng = random.Random(31)
    base = random_seq(rng, 8000)
    files = _mk(
        tmp_path,
        [("ref", [("c1", base)]),
         ("s0", [("c1", base[:4000] + base[4200:])]),
         ("s1", [("c1", base[100:])])],
    )
    archive = str(tmp_path / "sh.agc")
    create_archive_sharded(archive, files, SMALL, n_shards=2)
    r = ArchiveReader(archive)
    assert r.stream_names()[:3] == [
        "collection-samples", "collection-contigs", "collection-details",
    ]
    r.close()

    # and the reference binary can APPEND to it (the id-order segfault
    # was exactly here)
    import os as _os
    import subprocess

    ref_bin = _os.environ.get("AGC_REF_BIN", "/tmp/refbuild/bin/agc")
    if _os.path.exists(ref_bin):
        s2 = str(tmp_path / "s2.fa")
        write_fa(s2, [("c1", base[:7000])], line=80)
        out2 = str(tmp_path / "app.agc")
        env = dict(_os.environ, ASAN_OPTIONS="detect_leaks=0")
        subprocess.run(
            [ref_bin, "append", "-o", out2, archive, s2],
            check=True, capture_output=True, env=env,
        )
        d = Decompressor(out2)
        assert sorted(d.list_samples()) == ["ref", "s0", "s1", "s2"]
        d.close()


def test_failed_sharded_create_removes_partial_archive(tmp_path):
    """Same no-partial-archive policy as plain create."""
    import os as _os

    from agc_tpu.parallel.distributed import create_archive_sharded

    rng = random.Random(33)
    ref = str(tmp_path / "r.fa")
    write_fa(ref, [("c1", random_seq(rng, 4000))])
    bad = str(tmp_path / "b.fa")
    write_fa(bad, [("c1", "ACGTE" * 300)])  # non-IUPAC symbol -> refusal
    out = str(tmp_path / "p.agc")
    with pytest.raises(ValueError):
        create_archive_sharded(out, [ref, bad], SMALL, n_shards=2)
    assert not _os.path.exists(out)
    assert not _os.path.exists(out + ".tmp0")


def test_check_subcommand(tmp_path, capsys):
    """agc-tpu check: full decode verification passes on a good archive
    (both profiles) and fails with rc 1 on a corrupted one."""
    from agc_tpu.cli.main import main as cli_main

    rng = random.Random(53)
    base = random_seq(rng, 8000)
    files = _mk(
        tmp_path,
        [("ref", [("c1", base)]), ("s0", [("c1", base[:4000] + base[4200:])])],
    )
    archive = str(tmp_path / "ok.agc")
    create_archive(archive, files, SMALL)
    assert cli_main(["check", archive]) == 0
    assert "Archive OK" in capsys.readouterr().err
    assert cli_main(["check", "-q", archive]) == 0
    capsys.readouterr()

    orig = open(archive, "rb").read()
    bad = str(tmp_path / "bad.agc")
    # zero windows at several offsets; at least one must break a part
    # (check verifies decode success + length, so corruption landing in
    # slack space can legitimately pass)
    failures = 0
    for frac in (8, 5, 3, 2):
        data = bytearray(orig)
        mid = len(data) // frac
        data[mid : mid + 200] = bytes(200)
        open(bad, "wb").write(bytes(data))
        if cli_main(["check", bad]) == 1:
            failures += 1
    err = capsys.readouterr().err
    assert failures > 0 and "FAIL" in err


def test_daemon_pool_contract():
    """DaemonPool (the wedge-safe executor behind the scan transfer
    pools): futures resolve, exceptions mirror, shutdown drains as a
    barrier and the pool stays usable, stop() ends workers."""
    from agc_tpu.ops.kmers import DaemonPool

    p = DaemonPool(2, "t-pool")
    assert p.submit(lambda: 41 + 1).result(timeout=5) == 42

    def boom():
        raise ValueError("x")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        p.submit(boom).result(timeout=5)
    p.shutdown(wait=True)  # drain barrier, pool still usable
    assert p.submit(lambda: "ok").result(timeout=5) == "ok"
    p.stop(timeout=5)
    for t in p._threads:
        assert not t.is_alive()
