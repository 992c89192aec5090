"""Cell-barcode correction against a whitelist.

Behavior contract (reference BarcodeCorrector.hpp): whitelist entries are
seeded with count 1; a background pass over (up to 2M) observed barcodes
increments counts of whitelisted barcodes; correction of a non-whitelist
barcode tries every 1-Hamming neighbor, picking the highest count and
breaking ties by the lowest base quality at the mismatch position.
"""

from __future__ import annotations

from typing import Iterable, Optional

from ..constants import revcomp_str


def format_barcode(raw: str, start: int, end: int, revcomp: bool) -> str:
    if start == 0 and end == -1 and not revcomp:
        return raw
    e = len(raw) - 1 if end == -1 else end
    sub = raw[start:e + 1]
    return revcomp_str(sub) if revcomp else sub


class BarcodeCorrector:
    def __init__(self):
        self.counts: dict = {}

    def set_whitelist(self, path: str) -> None:
        with open(path) as f:
            for tok in f.read().split():
                if all(c in "ACGT" for c in tok):
                    self.counts[tok] = self.counts.get(tok, 0) + 1

    def collect_background(self, barcodes: Iterable[str], start: int = 0,
                           end: int = -1, revcomp: bool = False,
                           case_cnt: int = 2000000) -> None:
        n = 0
        for raw in barcodes:
            bc = format_barcode(raw, start, end, revcomp)
            if bc in self.counts:
                self.counts[bc] += 1
            n += 1
            if n >= case_cnt:
                break

    def correct(self, barcode: str, qual: Optional[str]) -> Optional[str]:
        """Return the (possibly corrected) barcode, or None if
        uncorrectable."""
        if barcode in self.counts and all(c in "ACGT" for c in barcode):
            return barcode
        best_cnt = -1
        best = None
        best_low_qual = 255
        for i, orig in enumerate(barcode):
            for b in "ACGT":
                if b == orig:
                    continue
                cand = barcode[:i] + b + barcode[i + 1:]
                cnt = self.counts.get(cand, -1) if all(
                    c in "ACGT" for c in cand) else -1
                if cnt == -1:
                    continue
                if cnt > best_cnt:
                    best_cnt = cnt
                    best = cand
                    if qual is not None:
                        best_low_qual = ord(qual[i])
                elif cnt == best_cnt and qual is not None and ord(qual[i]) < best_low_qual:
                    best_low_qual = ord(qual[i])
                    best = cand
        return best
