"""Cross-equivalence of the two fragment-assignment implementations.

The genotyper path runs mate pairing / tie relaxation / dangling and
truncated-reference filters inside the native engine
(engine.cc FragmentAssignCore); the analyzer path runs the same contract
in Python (core/fragment.py, reference SeqSet.hpp:2310-2655 +
Genotyper.hpp:778-832).  This test feeds both implementations the same
per-read-end alignment sets and requires identical weighted assignments,
so any future divergence fails CI instead of silently skewing one stage.
"""

import os

import numpy as np
import pytest

from t1k_tpu.constants import encode_seq
from t1k_tpu.core.fragment import (RefContext, fragment_assign,
                                   set_read_assignments)
from t1k_tpu.core.pipeline import overlap_lists_from_records
from t1k_tpu.io.reads import read_seq_file
from t1k_tpu.io.refset import RefSet
from t1k_tpu.native import NativeEngine

CYP_RNA = os.environ.get(
    "T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx"
) + "/cyp2d6_rna_seq.fa"


def _simulate(rs_records, n_pairs, seed, mutate=0):
    from t1k_tpu.tools.simulate import SimConfig, simulate_pairs

    by_name = {r.id: r for r in rs_records}
    names = sorted(by_name)[:4]
    r1, r2 = simulate_pairs([by_name[n] for n in names],
                            [1.0, 0.8, 0.5, 0.3][: len(names)],
                            SimConfig(n_pairs=n_pairs, seed=seed))
    seqs1 = [r.seq for r in r1]
    seqs2 = [r.seq for r in r2]
    if mutate:
        rng = np.random.default_rng(seed + 1)
        for lst in (seqs1, seqs2):
            for i in range(0, len(lst), 3):
                s = list(lst[i])
                for _ in range(mutate):
                    p = int(rng.integers(0, len(s)))
                    s[p] = "ACGTN"[int(rng.integers(0, 5))]
                lst[i] = "".join(s)
    return seqs1, seqs2


@pytest.mark.parametrize("relax,mutate", [(False, 0), (False, 4), (True, 4)])
def test_engine_vs_python_fragment_assignment(relax, mutate):
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    recs = list(read_seq_file(CYP_RNA))
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        for r in recs[:16]:
            f.write(f">{r.id} {r.comment}\n{r.seq}\n")
        name = f.name
    rs = RefSet.from_fasta(name)
    os.unlink(name)

    seqs1, seqs2 = _simulate(recs[:16], 120, seed=9, mutate=mutate)
    all_seqs = seqs1 + seqs2
    codes = [encode_seq(s) for s in all_seqs]
    lens = np.array([len(c) for c in codes], np.int32)
    starts = np.zeros(len(codes), np.int64)
    starts[1:] = np.cumsum(lens[:-1])
    flat = np.concatenate(codes).astype(np.int8)
    weights = np.ones(len(codes), np.int32)

    packed = rs.packed()
    k = rs.infer_kmer_length()
    eng = NativeEngine(packed, k, relax_intron_align=relax)
    rec, off = eng.assign_batch(flat, starts, lens, weights)
    overlap_lists = overlap_lists_from_records(rec, off)

    n = len(seqs1)
    uid1 = np.arange(n, dtype=np.int64)
    uid2 = np.arange(n, 2 * n, dtype=np.int64)
    has_n = np.array(
        [("N" in a) or ("N" in b) for a, b in zip(seqs1, seqs2)], np.uint8)

    frag_rec, frag_counts, flags = eng.fragment_batch(
        uid1, uid2, has_n, True, 2000, None)
    offs = np.zeros(n + 1, np.int64)
    offs[1:] = np.cumsum(frag_counts)

    ctx = RefContext(rs, hit_len_required=31, relax_intron_align=relax)
    n_nonempty = 0
    for i in range(n):
        frags = fragment_assign(ctx, overlap_lists[i],
                                overlap_lists[n + i], bool(has_n[i]), True)
        py = set_read_assignments(ctx, frags, None, 2000)
        eng_rows = frag_rec[offs[i]:offs[i + 1]]
        assert len(py) == len(eng_rows), f"fragment {i}: count mismatch"
        assert bool(flags[i]) == bool(frags), f"fragment {i}: flag mismatch"
        for a, row in zip(py, eng_rows):
            assert a.allele_idx == int(row[0]), i
            assert a.start == int(row[1]), i
            assert a.end == int(row[2]), i
            assert np.float32(a.weight) == np.float32(row[3]), i
            assert np.float32(a.adjust_weight) == np.float32(row[4]), i
            assert np.float32(a.qual) == np.float32(row[5]), i
        n_nonempty += bool(len(py))
    assert n_nonempty > 60, "expected most fragments assigned"
