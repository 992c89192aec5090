"""Post-analysis parity: the genotype -> analyze chain on reads carrying
injected exonic SNPs must reproduce the reference's VCF and barcode
expression matrix byte-for-byte."""

import os

import pytest

from tests.conftest import DATA_DIR, GOLDEN_DIR
from t1k_tpu.core.analyzer import AnalyzerOptions, run_analyzer
from t1k_tpu.core.pipeline import GenotypeOptions, run_genotyper

CYP_RNA = os.environ.get(
    "T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx"
) + "/cyp2d6_rna_seq.fa"


def test_analyzer_matches_reference(tmp_path):
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    p1 = os.path.join(DATA_DIR, "variant_1.fq")
    assert os.path.exists(p1), "run tests/make_goldens.py first"
    p2 = os.path.join(DATA_DIR, "variant_2.fq")
    pb = os.path.join(DATA_DIR, "variant_bc.fa")

    prefix = str(tmp_path / "variant")
    run_genotyper(CYP_RNA, [p1], [p2], prefix,
                  GenotypeOptions(barcode_file=pb))
    out = run_analyzer(CYP_RNA, prefix + "_allele.tsv",
                       [prefix + "_aligned_1.fa"], [prefix + "_aligned_2.fa"],
                       prefix,
                       AnalyzerOptions(barcode_file=prefix + "_aligned_bc.fa"))
    assert out["variants"] > 0

    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf",
                   "_barcode_expr.tsv"):
        with open(prefix + suffix) as f:
            got = f.read()
        with open(os.path.join(GOLDEN_DIR, "variant" + suffix)) as f:
            want = f.read()
        assert got == want, f"variant{suffix} differs"


def test_dna_variant_chain_matches_reference(tmp_path):
    """Genomic-mode novel-SNP calling (relaxIntronAlign + intra-exon
    constraint): genotype, VCF and allele outputs byte-identical."""
    ref = os.path.join(
        os.environ.get("T1K_CYP2D6_IDX",
                       "/root/reference/vcf_database/cyp2d6_idx"),
        "cyp2d6_dna_seq.fa")
    if not os.path.exists(ref):
        pytest.skip("cyp2d6 database unavailable")
    p1 = os.path.join(DATA_DIR, "vardna_1.fq")
    if not os.path.exists(p1):
        pytest.skip("run tests/make_goldens.py first")
    p2 = os.path.join(DATA_DIR, "vardna_2.fq")

    prefix = str(tmp_path / "vardna")
    run_genotyper(ref, [p1], [p2], prefix,
                  GenotypeOptions(ref_seq_similarity=0.9,
                                  relax_intron_align=True))
    run_analyzer(ref, prefix + "_allele.tsv", [prefix + "_aligned_1.fa"],
                 [prefix + "_aligned_2.fa"], prefix,
                 AnalyzerOptions(ref_seq_similarity=0.9,
                                 relax_intron_align=True))
    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf"):
        with open(prefix + suffix) as f:
            got = f.read()
        with open(os.path.join(GOLDEN_DIR, "vardna" + suffix)) as f:
            want = f.read()
        assert got == want, f"vardna{suffix} differs"


def test_variant_walk_stall_quirk(tmp_path):
    """Same-major allele pair whose matchCnt spread triggers the
    variant-caller's walk-stall (filtered substitutions skip position
    advancement); outputs must stay byte-identical."""
    ref = os.path.join(
        os.environ.get("T1K_CYP2D6_IDX",
                       "/root/reference/vcf_database/cyp2d6_idx"),
        "cyp2d6_rna_seq.fa")
    if not os.path.exists(ref):
        pytest.skip("cyp2d6 database unavailable")
    p1 = os.path.join(DATA_DIR, "varstall_1.fq")
    if not os.path.exists(p1):
        pytest.skip("run tests/make_goldens.py first")
    p2 = os.path.join(DATA_DIR, "varstall_2.fq")

    prefix = str(tmp_path / "varstall")
    run_genotyper(ref, [p1], [p2], prefix, GenotypeOptions())
    run_analyzer(ref, prefix + "_allele.tsv", [prefix + "_aligned_1.fa"],
                 [prefix + "_aligned_2.fa"], prefix, AnalyzerOptions())
    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf"):
        with open(prefix + suffix) as f:
            got = f.read()
        with open(os.path.join(GOLDEN_DIR, "varstall" + suffix)) as f:
            want = f.read()
        assert got == want, f"varstall{suffix} differs"


def test_negative_var_max_group_cli(tmp_path):
    """`--varMaxGroup -1` (no group-size limit) must parse like the
    reference's getopt — argparse would otherwise read -1 as an option.
    With no limit, the injected-SNP case calls the same variants."""
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    from t1k_tpu.cli.analyze import main as amain

    p1 = os.path.join(DATA_DIR, "variant_1.fq")
    p2 = os.path.join(DATA_DIR, "variant_2.fq")
    prefix = str(tmp_path / "neg")
    run_genotyper(CYP_RNA, [p1], [p2], prefix, GenotypeOptions())
    rc = amain(["-f", CYP_RNA, "-a", prefix + "_allele.tsv",
                "-1", prefix + "_aligned_1.fa",
                "-2", prefix + "_aligned_2.fa",
                "-o", prefix, "--varMaxGroup", "-1"])
    assert rc == 0
    with open(prefix + "_allele.vcf") as f:
        got = f.read()
    assert got  # variants called with the unlimited group size
