"""tpu-rans archive profile: create / extract / append / convert.

The profile swaps zstd frames for the lane-interleaved rANS stage
(core/entropy.py) inside the unchanged container layout; frames are
self-identifying, so every reader path (Python decompressor, C API)
serves both profiles. Conversion (core/convert.py) transcodes parts
losslessly in both directions.
"""

from __future__ import annotations

import random

import pytest

from agc_tpu.core.compressor import CompressorParams, append_archive, create_archive
from agc_tpu.core.convert import convert_archive
from agc_tpu.core.decompressor import Decompressor
from util import mutate, random_seq, write_fa


@pytest.fixture(scope="module")
def collection(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("profile")
    rng = random.Random(99)
    base = {"c1": random_seq(rng, 50_000), "c2": random_seq(rng, 30_000)}
    files = [str(tmp / "ref.fa")]
    write_fa(files[0], list(base.items()))
    bodies = {"ref": dict(base)}
    for i in range(3):
        s = {c: mutate(rng, seq, subs=len(seq) // 800) for c, seq in base.items()}
        p = str(tmp / f"s{i}.fa")
        write_fa(p, list(s.items()))
        files.append(p)
        bodies[f"s{i}"] = s
    return tmp, files, bodies


def _check_extract(archive, bodies):
    d = Decompressor(str(archive))
    try:
        assert sorted(d.list_samples()) == sorted(bodies)
        for sample, contigs in bodies.items():
            for cname, seq in contigs.items():
                assert d.get_contig_seq(sample, cname) == seq.encode()
        return dict(d.file_type_info)
    finally:
        d.close()


def _stream_dump(path):
    from agc_tpu.core.archive import ArchiveReader

    r = ArchiveReader(str(path), prefetch=True)
    try:
        return {
            name: [r.get_part(name, i) for i in range(r.n_parts(name))]
            for name in r.stream_names()
        }
    finally:
        r.close()


def test_create_extract_tpu_rans(collection, tmp_path):
    tmp, files, bodies = collection
    out = tmp_path / "rans.agc"
    create_archive(str(out), files, CompressorParams(profile="tpu-rans"))
    fti = _check_extract(out, bodies)
    assert fti.get("compression-profile") == "tpu-rans"


def test_append_continues_profile(collection, tmp_path):
    tmp, files, bodies = collection
    rng = random.Random(5)
    extra = {c: mutate(rng, s, subs=40) for c, s in bodies["ref"].items()}
    extra_fa = str(tmp_path / "s9.fa")
    write_fa(extra_fa, list(extra.items()))

    base = tmp_path / "base.agc"
    create_archive(str(base), files, CompressorParams(profile="tpu-rans"))
    out = tmp_path / "app.agc"
    # append params do NOT request the profile: it must be inherited
    append_archive(str(base), str(out), [extra_fa], CompressorParams())
    fti = _check_extract(out, {**bodies, "s9": extra})
    assert fti.get("compression-profile") == "tpu-rans"


def test_convert_roundtrip_stream_identical(collection, tmp_path):
    """zstd -> tpu-rans -> zstd returns the ORIGINAL archive stream-for-
    stream (zstd at a pinned level is deterministic, and conversion
    preserves part order, metadata, and raw fallbacks)."""
    tmp, files, bodies = collection
    a = tmp_path / "a.agc"
    create_archive(str(a), files, CompressorParams())
    b = tmp_path / "b.agc"
    convert_archive(str(a), str(b), "tpu-rans")
    fti = _check_extract(b, bodies)
    assert fti.get("compression-profile") == "tpu-rans"
    c = tmp_path / "c.agc"
    convert_archive(str(b), str(c), "zstd")
    _check_extract(c, bodies)
    assert _stream_dump(a) == _stream_dump(c)


def test_convert_matches_direct_create(collection, tmp_path):
    """Converting a tpu-rans archive to zstd gives the same streams as a
    direct zstd-profile create of the same inputs."""
    tmp, files, bodies = collection
    direct = tmp_path / "direct.agc"
    create_archive(str(direct), files, CompressorParams())
    rans = tmp_path / "rans.agc"
    create_archive(str(rans), files, CompressorParams(profile="tpu-rans"))
    conv = tmp_path / "conv.agc"
    convert_archive(str(rans), str(conv), "zstd")
    assert _stream_dump(direct) == _stream_dump(conv)


def test_c_api_reads_tpu_rans(collection, tmp_path):
    tmp, files, bodies = collection
    out = tmp_path / "rans_capi.agc"
    create_archive(str(out), files, CompressorParams(profile="tpu-rans"))

    import ctypes

    from agc_tpu.native import get_capi

    lib = get_capi()
    if lib is None:
        pytest.skip("no native toolchain")
    h = lib.agc_open(str(out).encode(), 1)
    assert h
    try:
        n = lib.agc_n_sample(h)
        assert n == len(bodies)
        ln = lib.agc_get_ctg_len(h, b"ref", b"c1")
        assert ln == len(bodies["ref"]["c1"])
        buf = ctypes.create_string_buffer(ln + 1)
        got = lib.agc_get_ctg_seq(h, b"ref", b"c1", 0, -1, buf)
        assert got == ln
        assert buf.value.decode() == bodies["ref"]["c1"]
    finally:
        lib.agc_close(h)


def test_legacy_archive_conversion_rejected(tmp_path):
    with pytest.raises(Exception):
        convert_archive("/nonexistent.agc", str(tmp_path / "x.agc"), "tpu-rans")


def test_cli_profile_and_convert(collection, tmp_path, capsys):
    from agc_tpu.cli.main import main as cli_main

    tmp, files, bodies = collection
    out = str(tmp_path / "cli.agc")
    rc = cli_main(["create", "-o", out, "--profile", "tpu-rans", *files])
    assert rc == 0
    conv = str(tmp_path / "cli_z.agc")
    rc = cli_main(["convert", out, conv, "--profile", "zstd"])
    assert rc == 0
    _check_extract(conv, bodies)
    rc = cli_main(["info", out])
    assert rc == 0
    assert "tpu-rans" in capsys.readouterr().err  # info prints to stderr


def test_sharded_create_carries_profile(collection, tmp_path):
    """Sharded create must write collection streams and the profile tag
    in the requested profile (regression: _merge_shards built its own
    collection/file_type_info and silently dropped tpu-rans); a 1-shard
    sharded create stays stream-identical to a plain create."""
    from agc_tpu.parallel.distributed import create_archive_sharded

    tmp, files, bodies = collection
    plain = tmp_path / "plain_rans.agc"
    create_archive(str(plain), files, CompressorParams(profile="tpu-rans"))
    sharded = tmp_path / "sharded_rans.agc"
    create_archive_sharded(
        str(sharded), files, CompressorParams(profile="tpu-rans"), n_shards=1
    )
    fti = _check_extract(sharded, bodies)
    assert fti.get("compression-profile") == "tpu-rans"
    assert _stream_dump(plain) == _stream_dump(sharded)

    two = tmp_path / "sharded2_rans.agc"
    create_archive_sharded(
        str(two), files, CompressorParams(profile="tpu-rans"), n_shards=2
    )
    fti = _check_extract(two, bodies)
    assert fti.get("compression-profile") == "tpu-rans"


def test_batched_device_entropy_archive_identical(collection, tmp_path, monkeypatch):
    """The production tpu-rans store path defers parts to an
    EntropyBatcher and rANS-codes them in batched device dispatches
    (ops/device_rans.encode_batch). Forcing the device route vs the host
    route must produce stream-identical archives (same parts in the same
    order with the same metadata; physical offsets may shift with async
    store timing) — the dispatch is purely a perf decision."""
    tmp, files, bodies = collection

    monkeypatch.setenv("AGC_TPU_RANS_DEVICE", "1")
    dev = tmp_path / "dev.agc"
    create_archive(str(dev), files, CompressorParams(profile="tpu-rans"))
    monkeypatch.setenv("AGC_TPU_RANS_DEVICE", "0")
    host = tmp_path / "host.agc"
    create_archive(str(host), files, CompressorParams(profile="tpu-rans"))

    assert _stream_dump(dev) == _stream_dump(host)
    _check_extract(dev, bodies)


def test_batched_entropy_append(collection, tmp_path, monkeypatch):
    """Append inherits the tpu-rans profile and therefore the deferred
    batcher; the appended archive must extract and stay stream-identical
    between device-forced and host-forced runs."""
    tmp, files, bodies = collection
    rng = random.Random(17)
    extra = {c: mutate(rng, s, subs=25) for c, s in bodies["ref"].items()}
    extra_fa = str(tmp_path / "sb.fa")
    write_fa(extra_fa, list(extra.items()))
    base = tmp_path / "b_base.agc"
    create_archive(str(base), files, CompressorParams(profile="tpu-rans"))

    outs = []
    for force in ("1", "0"):
        monkeypatch.setenv("AGC_TPU_RANS_DEVICE", force)
        out = tmp_path / f"b_app{force}.agc"
        append_archive(str(base), str(out), [extra_fa], CompressorParams())
        outs.append(out)
    assert _stream_dump(outs[0]) == _stream_dump(outs[1])
    _check_extract(outs[0], {**bodies, "sb": extra})


def test_append_does_not_mutate_caller_params(collection, tmp_path):
    """Compressor copies its params: append overwrites k/profile from the
    input archive, and that must not leak into the caller's object."""
    tmp, files, bodies = collection
    base = tmp_path / "zstd_base.agc"
    params = CompressorParams(profile="tpu-rans")
    create_archive(str(base), files, params)
    rng = random.Random(6)
    extra = {c: mutate(rng, s, subs=30) for c, s in bodies["ref"].items()}
    extra_fa = str(tmp_path / "sx.fa")
    write_fa(extra_fa, list(extra.items()))
    out = tmp_path / "app2.agc"
    shared = CompressorParams(profile="tpu-rans", kmer_length=21)
    zbase = tmp_path / "plain_zstd.agc"
    create_archive(str(zbase), files, CompressorParams())
    append_archive(str(zbase), str(out), [extra_fa], shared)
    # the append inherited zstd/k=31 internally, but the caller's object
    # must be untouched
    assert shared.profile == "tpu-rans"
    assert shared.kmer_length == 21
