"""Compression example: build an archive from FASTA files, then verify a
round-trip extraction."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from agc_tpu.core.compressor import CompressorParams, create_archive
from agc_tpu.core.decompressor import Decompressor


def main(fasta_files: list[str]) -> None:
    out = tempfile.mktemp(suffix=".agc")
    create_archive(out, fasta_files, CompressorParams())
    with Decompressor(out) as d:
        print("archive:", out)
        print("samples:", d.list_samples())
        ref = d.get_reference_sample()
        for ctg in d.list_contigs(ref) or []:
            print(f"  {ref}/{ctg}: {d.get_contig_length(ref, ctg)} bp")


if __name__ == "__main__":
    files = sys.argv[1:] or [
        f"/root/reference/toy_ex/{s}.fa" for s in ("ref", "a", "b", "c")
    ]
    main(files)
