"""Bundled-example parity: the reference repository's example reads
(example/example_{1,2}.fq, 1,000 simulated 100bp KIR read pairs) run
through the full extract -> genotype -> analyze chain must match the
reference run-t1k chain byte-for-byte.

The official expected output (example/T1K_example_genotype.tsv) was
produced against IPD-KIR v2.10.0, which cannot be downloaded here, so
the panel is reconstructed from the reads' ground-truth provenance
headers (contig=/orig_begin=/haplotype_infix=, zero conflicts, >99%
coverage per allele; gaps filled with seeded random bases mirroring
ParseDatFile.pl:575-601's srand(17) UTR padding).  Both the reference
binaries and this framework were run against the identical panel
(tests/data/kirex_rna.fa); the goldens pin the reference outputs.
Both recover exactly the simulation's 20 ground-truth alleles across
all 10 covered genes.
"""

import hashlib
import os

import pytest

from tests.conftest import DATA_DIR, GOLDEN_DIR

EXAMPLE_DIR = os.environ.get("T1K_EXAMPLE_DIR", "/root/reference/example")

# ground truth from the read provenance headers: gene -> called alleles
TRUTH = {
    "KIR2DL1": {"KIR2DL1*035", "KIR2DL1*003"},
    "KIR2DL2": {"KIR2DL2*003", "KIR2DL2*004"},
    "KIR2DL3": {"KIR2DL3*001"},  # both haplotypes carry *001 majors
    "KIR2DL5B": {"KIR2DL5B*038", "KIR2DL5B*035"},
    "KIR2DP1": {"KIR2DP1*010", "KIR2DP1*003"},
    "KIR2DS1": {"KIR2DS1*004", "KIR2DS1*011"},
    "KIR2DS5": {"KIR2DS5*012", "KIR2DS5*002"},
    "KIR3DL2": {"KIR3DL2*047", "KIR3DL2*086"},
    "KIR3DL3": {"KIR3DL3*013", "KIR3DL3*002"},
    "KIR3DS1": {"KIR3DS1*048", "KIR3DS1*013"},
}


def test_bundled_example_chain(tmp_path):
    fq1 = os.path.join(EXAMPLE_DIR, "example_1.fq")
    fq2 = os.path.join(EXAMPLE_DIR, "example_2.fq")
    if not (os.path.exists(fq1) and os.path.exists(fq2)):
        pytest.skip("bundled example reads unavailable")
    from t1k_tpu.cli.run import main

    outdir = str(tmp_path / "exrun")
    rc = main(["-f", os.path.join(DATA_DIR, "kirex_rna.fa"),
               "-1", fq1, "-2", fq2, "--od", outdir, "-o", "exref", "-t", "1"])
    assert rc == 0

    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf"):
        with open(os.path.join(outdir, "exref" + suffix)) as f:
            got = f.read()
        with open(os.path.join(GOLDEN_DIR, "kirex" + suffix)) as f:
            want = f.read()
        assert got == want, f"kirex{suffix} differs from reference output"

    with open(os.path.join(GOLDEN_DIR, "kirex_digests.txt")) as f:
        for line in f:
            suffix, want = line.split()
            with open(os.path.join(outdir, "exref" + suffix), "rb") as fh:
                got = hashlib.sha256(fh.read()).hexdigest()
            assert got == want, f"exref{suffix} differs from reference output"

    # every called allele matches the simulation's ground truth
    calls = {}
    with open(os.path.join(outdir, "exref_genotype.tsv")) as f:
        for line in f:
            cols = line.rstrip("\n").split("\t")
            got = set()
            for i in (2, 5):
                if cols[i] != ".":
                    # truncate to the 3-digit major-allele series
                    gene, allele = cols[i].split("*")
                    got.add(f"{gene}*{allele[:3]}")
            calls[cols[0]] = got
    assert calls == TRUTH
