"""API client example (the analogue of the reference's
src/examples/example-agc-lib-cpp.cpp): open an archive, enumerate
samples/contigs, fetch one sequence and a range."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from agc_tpu import AGCFile


def main(archive: str) -> None:
    with AGCFile(archive) as f:
        print("reference sample:", f.GetReferenceSample())
        print("no. samples:", f.NSample())
        for sample in f.ListSample():
            print(f"  {sample} ({f.NCtg(sample)} contigs)")
            for ctg in f.ListCtg(sample)[:3]:
                length = f.GetCtgLen(sample, ctg)
                head = f.GetCtgSeq(sample, ctg, 0, min(59, length - 1))
                print(f"    {ctg} len={length} head={head[:60]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/toy_ex/toy_ex.agc")
