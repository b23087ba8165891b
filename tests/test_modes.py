"""Fallback minimizers (-f), adaptive append, and stress parameters
(the reference CI's stress matrix: -a -b 50000 -k 17 -l 15 -s 1000;
.github/workflows/linux-self-hosted.yml)."""

import filecmp
import os
import random

from agc_tpu.core.compressor import (
    CompressorParams,
    append_archive,
    create_archive,
)
from agc_tpu.core.decompressor import Decompressor

from util import make_collection, mutate, random_seq, write_fa


def _check(archive, files, tmp_path, line=70):
    d = Decompressor(archive)
    for sample, path in files:
        out = str(tmp_path / f"chk_{sample}.fa")
        d.get_sample_file(out, [sample], line_length=line)
        assert filecmp.cmp(out, path, shallow=False), sample
    d.close()


def test_fallback_minimizers(tmp_path):
    rng = random.Random(5)
    base = random_seq(rng, 30000)
    ref = str(tmp_path / "r.fa")
    write_fa(ref, [("c1", base)])
    # sample whose contig shares sequence but no splitter alignment at the
    # ends (reversed piece + inner chunk): fallback voting should find homes
    s0 = str(tmp_path / "s.fa")
    inner = mutate(rng, base[5000:25000], 50, 5)
    write_fa(s0, [("c1", inner)])
    params = CompressorParams(
        kmer_length=17,
        segment_size=1000,
        pack_cardinality=10,
        min_match_len=15,
        fallback_frac=0.05,
    )
    archive = str(tmp_path / "fb.agc")
    create_archive(archive, [ref, s0], params)
    _check(archive, [("r", ref), ("s", s0)], tmp_path)


def test_adaptive_append(tmp_path):
    rng = random.Random(9)
    files = make_collection(tmp_path, rng=rng, n_samples=1, contig_lens=(30000,))
    params = CompressorParams(
        kmer_length=17,
        segment_size=1000,
        pack_cardinality=10,
        min_match_len=15,
        adaptive_compression=True,
    )
    base = str(tmp_path / "b.agc")
    create_archive(base, [p for _, p in files], params)
    # append a sample with novel sequence: adaptive append must re-count
    # reference k-mers from the archive and admit new splitters
    alien = str(tmp_path / "alien.fa")
    alien_seq = random_seq(rng, 20000)
    write_fa(alien, [("z", alien_seq)])
    ext = str(tmp_path / "e.agc")
    append_archive(base, ext, [alien], params)
    files.append(("alien", alien))
    _check(ext, files, tmp_path)
    # the alien sample got its own groups: second alien-like sample reuses them
    alien2 = str(tmp_path / "alien2.fa")
    write_fa(alien2, [("z", mutate(rng, alien_seq, 30, 3))])
    ext2 = str(tmp_path / "e2.agc")
    append_archive(ext, ext2, [alien2], params)
    files.append(("alien2", alien2))
    _check(ext2, files, tmp_path)
    # delta coding must have kicked in for alien2
    sz1 = os.path.getsize(ext)
    sz2 = os.path.getsize(ext2)
    assert sz2 - sz1 < 4000, "alien2 should be delta-coded against alien"


def test_stress_params(tmp_path):
    rng = random.Random(13)
    files = make_collection(
        tmp_path, rng=rng, n_samples=2, contig_lens=(15000, 9000)
    )
    params = CompressorParams(
        kmer_length=17,
        segment_size=100,  # minimum allowed
        pack_cardinality=1,
        min_match_len=15,
        adaptive_compression=True,
    )
    archive = str(tmp_path / "stress.agc")
    create_archive(archive, [p for _, p in files], params)
    _check(archive, files, tmp_path)


def test_duplicate_sample_rejected(tmp_path):
    files = make_collection(tmp_path, n_samples=1, contig_lens=(5000,))
    archive = str(tmp_path / "d.agc")
    params = CompressorParams(
        kmer_length=17, segment_size=1000, pack_cardinality=5, min_match_len=15
    )
    # same file listed twice: de-duplicated by sanitize (reference:
    # application.cpp:587-603)
    create_archive(archive, [files[0][1], files[1][1], files[1][1]], params)
    d = Decompressor(archive)
    assert sorted(d.list_samples()) == ["ref", "s0"]
    d.close()


def test_gzipped_inputs(tmp_path):
    """Gzipped FASTA inputs (the reference CI's create-from-gz matrix;
    reference: genome_io gz stream wrappers)."""
    import gzip

    rng = random.Random(11)
    base = random_seq(rng, 20000)
    plain = str(tmp_path / "ref.fa")
    write_fa(plain, [("c1", base)])
    gz = str(tmp_path / "s0.fa.gz")
    body = open(plain, "rb").read().replace(b">c1", b">c1")
    with gzip.open(gz, "wb") as f:
        f.write(b">c1\n")
        mut = mutate(rng, base)
        for i in range(0, len(mut), 70):
            f.write(mut[i : i + 70].encode() + b"\n")
    archive = str(tmp_path / "gz.agc")
    p = CompressorParams()
    p.segment_size = 2000
    create_archive(archive, [plain, gz], p)
    d = Decompressor(archive)
    assert sorted(d.list_samples()) == ["ref", "s0"]
    got = d.get_contig_seq("s0", "c1").decode()
    assert got == mut
    d.close()


def test_append_chain_three_steps(tmp_path):
    """create ref -> append a -> append b -> append c, extraction checked
    at the end (the reference CI's append chain)."""
    rng = random.Random(12)
    base = random_seq(rng, 25000)
    files = []
    for name in ("ref", "a", "b", "c"):
        p = str(tmp_path / f"{name}.fa")
        write_fa(p, [("c1", base if name == "ref" else mutate(rng, base))])
        files.append((name, p))
    params = CompressorParams()
    params.segment_size = 2000
    arcs = [str(tmp_path / f"step{i}.agc") for i in range(4)]
    create_archive(arcs[0], [files[0][1]], params)
    for i, (name, path) in enumerate(files[1:], start=1):
        append_archive(arcs[i - 1], arcs[i], [path], params)
    _check(arcs[3], files, tmp_path)
    # equivalent one-shot create also extracts identically
    one = str(tmp_path / "one.agc")
    create_archive(one, [p for _, p in files], params)
    _check(one, files, tmp_path)


def test_concatenated_append(tmp_path):
    """append -c: every contig of the appended file becomes its own
    sample, resuming the partial contig batch of the existing archive
    (reference: AddSampleFiles, agc_compressor.cpp:2155-2156, where
    cnt_contigs_in_sample restarts at processed_samples %
    pack_cardinality)."""
    rng = random.Random(21)
    base = random_seq(rng, 9000)
    ref = str(tmp_path / "ref.fa")
    write_fa(ref, [("base", base)])
    batch1 = [(f"g{i}", mutate(rng, base, subs=8, indels=1)) for i in range(3)]
    batch2 = [(f"h{i}", mutate(rng, base, subs=8, indels=1)) for i in range(5)]
    f1 = str(tmp_path / "b1.fa")
    f2 = str(tmp_path / "b2.fa")
    write_fa(f1, batch1)
    write_fa(f2, batch2)
    params = CompressorParams(
        kmer_length=17,
        segment_size=2000,
        min_match_len=15,
        pack_cardinality=2,  # appended contigs straddle batch boundaries
        concatenated_genomes=True,
    )
    a1 = str(tmp_path / "step1.agc")
    a2 = str(tmp_path / "step2.agc")
    create_archive(a1, [ref, f1], params)
    append_archive(a1, a2, [f2], params)
    d = Decompressor(a2)
    want = ["base"] + [n for n, _ in batch1 + batch2]
    assert sorted(d.list_samples()) == sorted(want)
    for name, seq in batch1 + batch2:
        assert d.get_contig_seq(name, name).decode() == seq
    d.close()


def test_append_tolerates_spurious_empty_batch(tmp_path):
    """The reference tool's -c create appends an EMPTY duplicate metadata
    batch when the contig count lands exactly on a batch boundary
    (agc_compressor.cpp:2240-2248 re-fires the barrier store :1153-1154
    after eviction).  Appending must drop that spurious trailing part
    instead of copying it verbatim (the reference's own append,
    collection_v3.cpp:97-104, copies it and shifts every later batch)."""
    from agc_tpu.core.archive import ArchiveReader, ArchiveWriter
    from agc_tpu.core.collection import CollectionV3

    rng = random.Random(31)
    base = random_seq(rng, 9000)
    ref = str(tmp_path / "ref.fa")
    write_fa(ref, [("base", base)])
    b1 = [(f"g{i}", mutate(rng, base, subs=8)) for i in range(3)]
    f1 = str(tmp_path / "b1.fa")
    write_fa(f1, b1)
    params = CompressorParams(
        kmer_length=17,
        segment_size=2000,
        min_match_len=15,
        pack_cardinality=2,
        concatenated_genomes=True,
    )
    clean = str(tmp_path / "clean.agc")
    create_archive(clean, [ref, f1], params)  # 4 samples = 2 full batches

    # fabricate the reference tool's buggy output: same archive plus one
    # empty trailing batch part in collection-contigs/-details
    buggy = str(tmp_path / "buggy.agc")
    r = ArchiveReader(clean)
    w = ArchiveWriter(buggy)
    for s in r.stream_names():
        w.register_stream(s)
        for i in range(r.n_parts(s)):
            data, meta = r.get_part(s, i)
            w.add_part(s, data, meta)
    r.close()
    scratch = CollectionV3(
        batch_size=2, segment_size=2000, kmer_length=17
    )
    scratch.register_sample_contig("", "pad0")
    scratch.register_sample_contig("", "pad1")
    for s in scratch.samples:
        s.contigs = []  # evicted, like the reference at the second store
    scratch.store_contig_batch(w, 0, 2)
    w.flush_buffers()
    w.close()

    b2 = [(f"h{i}", mutate(rng, base, subs=8)) for i in range(5)]
    f2 = str(tmp_path / "b2.fa")
    write_fa(f2, b2)
    out = str(tmp_path / "out.agc")
    append_archive(buggy, out, [f2], params)
    d = Decompressor(out)
    for name, seq in b1 + b2:
        assert d.get_contig_seq(name, name).decode() == seq, name
    d.close()


def test_py_agc_api_shim(tmp_path):
    """Smoke test mirroring the reference's py_agc_test.py
    (reference: src/py_agc_api/py_agc_test.py)."""
    from agc_tpu import py_agc_api

    rng = random.Random(13)
    base = random_seq(rng, 15000)
    files = make_collection(tmp_path, rng=rng, n_samples=2,
                            contig_lens=(15000,))
    archive = str(tmp_path / "pyapi.agc")
    params = CompressorParams()
    params.segment_size = 2000
    create_archive(archive, [p for _, p in files], params)

    agc = py_agc_api.CAGCFile()
    assert agc.Open(archive, True)
    assert agc.NSample() == len(files)
    samples = py_agc_api.StringVector()
    agc.ListSample(samples)
    assert sorted(samples) == sorted(s for s, _ in files)
    s0 = files[0][0]
    ctgs = py_agc_api.StringVector()
    agc.ListCtg(s0, ctgs)
    assert len(ctgs) == agc.NCtg(s0) > 0
    name = f"{ctgs[0]}@{s0}"
    ln = agc.GetCtgLen(name)
    seq = agc.GetCtgSeq(name, 0, ln - 1)
    assert len(seq) == ln
    ref_name = agc.GetReferenceSample()
    assert ref_name == files[0][0]
    agc.Close()


def test_adaptive_delta_scan_across_samples(tmp_path):
    """Splitters discovered from sample 1's novel sequence must cut the
    SAME novel sequence in later samples even though their scans were
    dispatched speculatively against the older table (the delta-scan
    union in Compressor._merge_delta_hits)."""
    rng = random.Random(21)
    ref_seq = random_seq(rng, 20000)
    novel = random_seq(rng, 15000)  # absent from the reference
    files = []
    p = str(tmp_path / "ref.fa")
    write_fa(p, [("c1", ref_seq)])
    files.append(("ref", p))
    q = str(tmp_path / "s0.fa")
    write_fa(q, [("c1", mutate(rng, ref_seq)), ("novel", novel)])
    files.append(("s0", q))
    for i in range(1, 6):
        r = str(tmp_path / f"s{i}.fa")
        write_fa(r, [("c1", mutate(rng, ref_seq)), ("novel", mutate(rng, novel))])
        files.append((f"s{i}", r))
    params = CompressorParams()
    params.adaptive_compression = True
    params.segment_size = 1500
    archive = str(tmp_path / "delta.agc")
    create_archive(archive, [f for _, f in files], params)
    _check(archive, files, tmp_path)
    # the novel contigs must share groups (delta hits found): storing six
    # ~15 kb novel contigs must cost far less than raw 2-bit coding
    d = Decompressor(archive)
    import os as _os

    assert _os.path.getsize(archive) < 20000 + 6 * 15000 // 4
    d.close()


def test_k32_boundary_create(tmp_path):
    """k=32 uses the full 64-bit code space (shift 0): the halves math,
    revcomp mask, and table prefilter must hold at the boundary."""
    rng = random.Random(31)
    files = make_collection(tmp_path, rng=rng, n_samples=2,
                            contig_lens=(12000,))
    params = CompressorParams()
    params.kmer_length = 32
    params.segment_size = 1000
    archive = str(tmp_path / "k32.agc")
    create_archive(archive, [p for _, p in files], params)
    _check(archive, files, tmp_path)


def test_cli_input_list(tmp_path):
    """-i file-of-filenames (reference: create -i)."""
    from agc_tpu.cli.main import main as cli_main

    files = make_collection(tmp_path, n_samples=2, contig_lens=(8000,))
    lst = tmp_path / "inputs.txt"
    lst.write_text("\n".join(p for _, p in files) + "\n")
    archive = str(tmp_path / "fromlist.agc")
    rc = cli_main(["create", "-o", archive, "-i", str(lst), "-s", "1000"])
    assert rc == 0
    d = Decompressor(archive)
    assert sorted(d.list_samples()) == sorted(s for s, _ in files)
    d.close()


def test_missing_input_skipped(tmp_path, capsys):
    """Unopenable inputs warn and are skipped
    (reference: agc_compressor.cpp:2165-2168)."""
    files = make_collection(tmp_path, n_samples=1, contig_lens=(6000,))
    params = CompressorParams()
    params.segment_size = 1000
    archive = str(tmp_path / "skip.agc")
    inputs = [p for _, p in files] + [str(tmp_path / "nope.fa")]
    create_archive(archive, inputs, params)
    d = Decompressor(archive)
    assert sorted(d.list_samples()) == sorted(s for s, _ in files)
    d.close()


def test_packed_group_costs_mirror_reference(tmp_path):
    """A group rehydrated by appending_init stays PACKED until a member
    is added; while packed, estimate() returns 0 and get_coding_cost()
    yields NO costs (reference: CSegment segment.cpp:85,103 — ref_size is
    set only by unpack), so the append-mode missing-middle search bails /
    splits at 0 instead of paying the unpack (agc_compressor.cpp:
    1605-1608)."""
    from agc_tpu.core.compressor import Compressor, NO_RAW_GROUPS

    files = make_collection(tmp_path, n_samples=2, contig_lens=(20000,))
    params = CompressorParams(segment_size=1000, kmer_length=17)
    archive = str(tmp_path / "packed.agc")
    create_archive(archive, [p for _, p in files], params)

    out = str(tmp_path / "packed2.agc")
    comp = Compressor(out, CompressorParams(), in_path=archive)
    try:
        gid = next(
            g for g in range(NO_RAW_GROUPS, comp.no_segments)
            if comp.v_segments[g] is not None
            and comp.v_segments[g]._packed_ref is not None
        )
        seg = comp.v_segments[gid]
        assert seg.get_ref_size() == 0  # packed: size unknown
        assert seg.estimate(b"\x00\x01\x02\x03" * 50, 1000) == 0
        assert len(seg.get_coding_cost(b"\x00\x01\x02\x03" * 50, True)) == 0
        assert seg._packed_ref is not None  # still packed: no unpack paid
        # adding a member unpacks and restores real behavior
        seg.add(b"\x00\x01\x02\x03" * 50)
        assert seg.get_ref_size() > 0
        assert len(seg.get_coding_cost(b"\x00\x01\x02\x03" * 50, True)) > 0
    finally:
        comp.writer.close()


def test_rerank_near_ties_rules():
    """Fallback near-tie re-rank (pack cohesion): dominance-qualified
    member-count preference; see compressor.rerank_near_ties."""
    from agc_tpu.core.compressor import rerank_near_ties

    A, B, C = (1, 2), (3, 4), (5, 6)
    # a dominant family within the 1% window pulls the member over
    assert rerank_near_ties([(1000, 1, A), (1005, 10, B)]) == (1005, 10, B)
    # non-dominant membership advantage (5 vs 3) stays with the argmin
    assert rerank_near_ties([(1000, 3, A), (1001, 5, B)]) == (1000, 3, A)
    # outside the window: exact argmin wins even against a dominant group
    assert rerank_near_ties([(1000, 1, A), (1100, 10, B)]) == (1000, 1, A)
    # equal estimates tie-break deterministically by smaller pair
    assert rerank_near_ties([(1000, 1, B), (1000, 1, A)]) == (1000, 1, A)
    # zero-member argmin (group whose ref is pending) vs a 2-member group
    assert rerank_near_ties([(1000, 0, A), (1002, 2, B)]) == (1002, 2, B)
    # singleton input is the identity
    assert rerank_near_ties([(500, 4, C)]) == (500, 4, C)
