"""Filter candidate reads by ids aligned in an external SAM
(reference ExtractBamHits.pl)."""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from ..io.reads import read_seq_file


def extract_sam_hits(sam_path: str, fq_path: str, out=sys.stdout) -> int:
    ids = set()
    with open(sam_path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            cols = line.split("\t")
            if len(cols) > 2 and cols[2] != "*":
                ids.add(cols[0])
    n = 0
    for rec in read_seq_file(fq_path):
        if rec.id in ids:
            n += 1
            if rec.qual is None:
                out.write(f">{rec.id}\n{rec.seq}\n")
            else:
                out.write(f"@{rec.id}\n{rec.seq}\n+\n{rec.qual}\n")
    return n


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        description="keep candidate reads aligned in an external SAM")
    ap.add_argument("sam")
    ap.add_argument("fq")
    args = ap.parse_args(argv)
    extract_sam_hits(args.sam, args.fq)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
