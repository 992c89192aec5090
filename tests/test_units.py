"""Unit tests for the small numerical contracts (SURVEY.md section 4):
k-mer codec round trips, canonical codes, LIS chaining behavior via the
engine, SQUAREM/alnorm, allele-name parsing, effective lengths."""

import math

import numpy as np

from t1k_tpu.constants import decode_seq, encode_seq, revcomp_str
from t1k_tpu.core.genotyper import alnorm
from t1k_tpu.io.refset import (
    _canonical_kmer_counts,
    compute_effective_len,
    parse_allele_name,
    parse_exons_from_comment,
)


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    assert decode_seq(encode_seq(s)) == s
    assert revcomp_str("ACGTN") == "NACGT"
    assert revcomp_str(revcomp_str("GATTACA")) == "GATTACA"


def test_canonical_kmers():
    # a sequence and its reverse complement share the canonical multiset
    s = "ACGTAGCTAGGATCGGCTAAGCTTGCA"
    a = _canonical_kmer_counts(encode_seq(s), 5)
    b = _canonical_kmer_counts(encode_seq(revcomp_str(s)), 5)
    assert a == b
    # N invalidates covering windows
    sN = s[:10] + "N" + s[11:]
    c = _canonical_kmer_counts(encode_seq(sN), 5)
    assert sum(c.values()) == sum(a.values()) - 5


def test_parse_allele_name():
    # KIR style: '*' + 3 digits
    assert parse_allele_name("KIR2DL1*0010101") == ("KIR2DL1", "KIR2DL1*001")
    # HLA style: 3 ':' fields
    assert parse_allele_name("A*01:01:01:02") == ("A", "A*01:01:01")
    # exon-stage granularity
    assert parse_allele_name("KIR2DL1*0010101", fields_type=1) == (
        "KIR2DL1", "KIR2DL1*00101")
    # explicit structure
    assert parse_allele_name("CFTR*F508del:x", digit_units=1, delimiter=":") == (
        "CFTR", "CFTR*F508del")


def test_exon_comment_parsing():
    assert parse_exons_from_comment("2 10 20 30 40", 100) == [(10, 20), (30, 40)]
    assert parse_exons_from_comment(None, 50) == [(0, 49)]
    assert parse_exons_from_comment("", 50) == [(0, 49)]


def test_effective_len_collapses_n_runs():
    assert compute_effective_len("ACGT") == 4
    assert compute_effective_len("ACNNNNGT") == 5  # N-run counts once
    assert compute_effective_len("NNN") == 1


def test_alnorm_matches_normal_cdf():
    # AS66 is an approximation (abs error ~1e-7); exactness vs the
    # reference comes from replicating its formula, not the true CDF
    for x, want in [(0.0, 0.5), (1.0, 0.15865525393145707),
                    (2.0, 0.022750131948179195), (-1.5, 0.9331927987311419)]:
        assert abs(alnorm(x, True) - want) < 1e-6
    assert alnorm(20.0, True) == 0.0
    assert alnorm(-20.0, True) == 1.0


def test_native_em_squarem_convergence():
    from t1k_tpu.native import em_quantify

    # two ECs, reads split 3:1 -> abundances should converge to FPK ratio
    ec_to_alleles = [[0], [1]]
    rg_off = np.array([0, 1, 2, 3, 4], np.int64)
    rg_ecs = np.array([0, 0, 0, 1], np.int32)
    counts = np.ones(4)
    iters, ec_count = em_quantify(
        ec_to_alleles, (rg_off, rg_ecs), counts,
        allele_eff_len=np.array([1000, 1000], np.int32),
        allele_missing=np.zeros(2, np.int32),
        allele_weight=np.ones(2, np.int32),
        allele_gene=np.zeros(2, np.int32),
        allele_major=np.arange(2, dtype=np.int32),
        n_genes=1, n_majors=2)
    assert iters < 1000
    np.testing.assert_allclose(ec_count, [3.0, 1.0], atol=1e-6)


def test_engine_chain_prefers_consistent_diagonal():
    """A read present in the reference must align full-length with
    matchCnt == 2*len (seed/LIS/extension integration)."""
    from t1k_tpu.io.refset import RefSet
    from t1k_tpu.native import NativeEngine

    rng = np.random.default_rng(2)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    rs = RefSet()
    rs.add_allele("G*001", ref, None)
    rs.finalize(init_gene_info=False)
    eng = NativeEngine(rs.packed(), 11)
    read = ref[100:200]
    codes = encode_seq(read)
    rec, off = eng.assign_batch(codes, np.zeros(1, np.int64),
                                np.array([100], np.int32),
                                np.ones(1, np.int32))
    assert off[1] == 1
    assert int(rec[0][6]) == 200          # matchCnt counts twice
    assert float(rec[0][8]) == 1.0        # similarity
    assert (int(rec[0][3]), int(rec[0][4])) == (100, 199)
