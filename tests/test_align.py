"""Banded affine aligner parity: native engine vs reference golden data.

Goldens were produced by running the reference implementation's
GlobalAlignment (AlignAlgo.hpp:215) over randomized sequence pairs; both
the score and the full edit walk (traceback tie-breaking) must match.
"""

import os

import numpy as np
import pytest

from t1k_tpu.constants import encode_seq
from t1k_tpu.native import align_global
from tests.conftest import GOLDEN_DIR


def load_golden():
    cases = []
    with open(os.path.join(GOLDEN_DIR, "align_global.tsv")) as f:
        for line in f:
            lent, lenp, t, p, score, edits = line.rstrip("\n").split("\t")
            t = "" if t == "-" else t
            p = "" if p == "-" else p
            cases.append((int(lent), int(lenp), t, p, int(score), edits))
    return cases


GOLDEN = load_golden()


def test_golden_count():
    assert len(GOLDEN) >= 100


def test_align_global_scores_and_edits():
    mismatches = []
    for lent, lenp, t, p, want_score, want_edits in GOLDEN:
        score, edits = align_global(encode_seq(t), encode_seq(p))
        got_edits = "".join(str(int(e)) for e in edits)
        if score != want_score or got_edits != want_edits:
            mismatches.append((t, p, want_score, score, want_edits, got_edits))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"


def test_align_empty_and_single():
    score, edits = align_global(encode_seq(""), encode_seq("ACGT"))
    assert score == 0 and len(edits) == 0
    score, edits = align_global(encode_seq("A"), encode_seq("A"))
    assert score == 2 and list(edits) == [0]
    score, edits = align_global(encode_seq("A"), encode_seq("C"))
    assert score == -2 and list(edits) == [1]
    # N matches anything in the single-base case
    score, edits = align_global(encode_seq("N"), encode_seq("C"))
    assert score == 2 and list(edits) == [0]


def test_align_stats_matches_walk_counts():
    """The count-only stats kernel must agree with the edit-walk kernel
    on every window shape, including across the <=31bp stack-state
    dispatch boundary (engine.cc BandedGlobalAlignStatsSmall)."""
    from t1k_tpu.native import align_stats
    import numpy as np

    rng = np.random.default_rng(20260821)
    bases = "ACGTN"
    mismatches = []
    for trial in range(1500):
        # sizes straddle the small-kernel cap (31) on both sides
        lent = int(rng.integers(1, 41))
        # keep |dlen| modest like the engine's gap/overhang windows
        lenp = max(1, lent + int(rng.integers(-4, 5)))
        t = "".join(rng.choice(list(bases), p=[0.24, 0.24, 0.24, 0.24, 0.04])
                    for _ in range(lent))
        # derive p from t with point edits so alignments are nontrivial
        p = list(t[:lenp].ljust(lenp, "A"))
        for _ in range(int(rng.integers(0, 4))):
            q = int(rng.integers(0, lenp))
            p[q] = bases[int(rng.integers(0, 4))]
        p = "".join(p)
        _, edits = align_global(encode_seq(t), encode_seq(p))
        want = (int((edits == 0).sum()), int((edits == 1).sum()),
                int(((edits == 2) | (edits == 3)).sum()))
        got = align_stats(encode_seq(t), encode_seq(p))
        if got != want:
            mismatches.append((t, p, want, got))
    assert not mismatches, f"{len(mismatches)}; first: {mismatches[0]}"


def test_align_stats_batch_matches_per_pair():
    """The padded-row batch oracle (native align_stats_batch — the
    deferred-DP stats_fn-signature scorer used by tests and the
    host-half harness) must equal per-pair align_stats."""
    import numpy as np

    from t1k_tpu.native import align_stats, align_stats_batch

    rng = np.random.default_rng(5)
    n, tcap, pcap = 257, 40, 44
    tc = np.full((n, tcap), 4, np.int8)
    pc = np.full((n, pcap), 4, np.int8)
    tl = np.zeros(n, np.int32)
    pl = np.zeros(n, np.int32)
    for i in range(n):
        tl[i] = int(rng.integers(1, tcap + 1))
        pl[i] = max(1, min(pcap, tl[i] + int(rng.integers(-4, 5))))
        tc[i, :tl[i]] = rng.integers(0, 5, tl[i])
        m = min(tl[i], pl[i])
        pc[i, :pl[i]] = rng.integers(0, 4, pl[i])
        pc[i, :m] = tc[i, :m]
        for _ in range(int(rng.integers(0, 4))):
            pc[i, int(rng.integers(0, pl[i]))] = int(rng.integers(0, 4))
    out = align_stats_batch(tc, tl, pc, pl)
    for i in range(n):
        want, _, _ = align_stats(tc[i, :tl[i]], pc[i, :pl[i]])
        assert out[i] == want, i
