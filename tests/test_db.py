"""Database-construction parity tests.

The .dat -> FASTA builder must reproduce the reference builder's output
byte-for-byte: on the bundled cyp2d6 database (both modes) and on a
synthetic .dat exercising random UTR padding, partial alleles and short
introns (goldens generated with the reference Perl implementation).
The VCF -> .dat path is compared record-wise (the reference emits
records in Perl-hash order, which is unspecified).
"""

import io
import os

import pytest

from tests.conftest import DATA_DIR, GOLDEN_DIR
from t1k_tpu.db.parse_dat import BuildOptions, PerlRand, build_allele_fasta
from t1k_tpu.db.vcf_to_dat import combine_vcfs, vcf_to_dat

CYP_IDX = os.environ.get(
    "T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx")


def _build(dat, mode):
    out = io.StringIO()
    build_allele_fasta(dat, out, BuildOptions(mode=mode))
    return out.getvalue()


def test_perl_rand_stream():
    rng = PerlRand(17)
    assert [rng.randint(4) for _ in range(12)] == [3, 2, 2, 3, 1, 1, 0, 3, 3, 1, 3, 0]


@pytest.mark.parametrize("mode", ["rna", "dna"])
def test_cyp2d6_database(mode):
    dat = os.path.join(CYP_IDX, "cyp2d6.dat")
    if not os.path.exists(dat):
        pytest.skip("cyp2d6 database unavailable")
    with open(os.path.join(CYP_IDX, f"cyp2d6_{mode}_seq.fa")) as f:
        want = f.read()
    assert _build(dat, mode) == want


@pytest.mark.parametrize("mode", ["rna", "dna", "genome"])
def test_synthetic_dat(mode):
    dat = os.path.join(DATA_DIR, "synth.dat")
    with open(os.path.join(GOLDEN_DIR, f"synth_{mode}.fa")) as f:
        want = f.read()
    assert _build(dat, mode) == want


def test_vcf_database_chain():
    files = [os.path.join(DATA_DIR, "vcfdb_MYG_2.vcf"),
             os.path.join(DATA_DIR, "vcfdb_MYG_3.vcf")]
    out = io.StringIO()
    combine_vcfs("MYG*1", files, out)
    with open(os.path.join(GOLDEN_DIR, "vcfdb_combined.tsv")) as f:
        want = f.read()
    # allele names derive from the file path given, so compare data columns
    assert [l.split("\t")[1:] for l in out.getvalue().splitlines()] == \
        [l.split("\t")[1:] for l in want.splitlines()]

    combined = os.path.join(GOLDEN_DIR, "vcfdb_combined.tsv")
    out = io.StringIO()
    n = vcf_to_dat(os.path.join(DATA_DIR, "vcfdb_genome.fa"),
                   os.path.join(DATA_DIR, "vcfdb_anno.gtf"), combined, out)
    assert n == 3
    got_recs = sorted(r for r in out.getvalue().split("//\n") if r.strip())
    with open(os.path.join(GOLDEN_DIR, "vcfdb.dat")) as f:
        want_recs = sorted(r for r in f.read().split("//\n") if r.strip())
    assert got_recs == want_recs


@pytest.mark.parametrize("mode", ["rna", "dna"])
def test_oversized_utr_padding_quirk(mode, tmp_path):
    """A gene whose alleles all start at (or near) exon 1 makes the
    best-possible 5' padding longer than the 50bp UTR; Perl's oversized
    substr splice swallows the whole random pad (ParseDatFile.pl:588)."""
    dat = os.path.join(DATA_DIR, "synth_pad.dat")
    with open(os.path.join(GOLDEN_DIR, f"synth_pad_{mode}.fa")) as f:
        want = f.read()
    assert _build(dat, mode) == want


def test_gtf_to_dat_strand_overwrite_quirk(tmp_path):
    """A gene whose transcripts disagree on strand: first-transcript
    exons, LAST-transcript strand (GtfToDat.pl stale-length helper +
    unconditional strand overwrite)."""
    import io

    from t1k_tpu.db.gtf_to_dat import gtf_to_dat

    out = io.StringIO()
    gtf_to_dat(os.path.join(DATA_DIR, "gtfdat_strand.fa"),
               os.path.join(DATA_DIR, "gtfdat_strand.gtf"), out,
               allele_id="007", source="fuzzsrc")
    got = sorted(x for x in out.getvalue().split("//\n") if x.strip())
    got = "//\n".join(got) + "//\n"
    with open(os.path.join(GOLDEN_DIR, "gtfdat_strand.dat")) as f:
        want = f.read()
    assert got == want


def test_left_exonization_trim(tmp_path):
    """Left-side exonization trimming: the reference CHECKS the 'N' at
    exons[2i-1]-1-pad but TRIMS at posN = exons[2i]-1-pad
    (ParseDatFile.pl:665-674) — a positional mismatch that only fires
    when the previous exon is 1bp; golden generated from the Perl
    reference on a 4-exon gene whose third exon annexes intron bases."""
    out = io.StringIO()
    build_allele_fasta(os.path.join(DATA_DIR, "synth_exonized.dat"), out,
                       BuildOptions(mode="dna", intron_padding=30))
    with open(os.path.join(GOLDEN_DIR, "synth_exonized_dna.fa")) as f:
        assert out.getvalue() == f.read()
