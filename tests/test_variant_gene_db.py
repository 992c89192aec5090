"""Variant-panel gene database builder (generalized CFTR2 pipeline):
cDNA-name parsing, mutant construction, .dat export compatible with the
standard database builder, and end-to-end genotyping of a panel allele."""

import os
import subprocess
import sys

import numpy as np
import pytest

from t1k_tpu.db.variant_gene_db import (
    AlleleRecord,
    TranscriptModel,
    apply_edits,
    build_allele,
    build_database,
    expand_combined,
    export_dat,
    parse_cdna_variant,
)


def _model():
    rng = np.random.default_rng(42)
    bases = np.array(list("ACGT"))
    # transcript: 30bp UTR + ATG + 160 non-stop codons + TAA + 3' tail
    non_stop = [c for c in
                ("".join(p) for p in __import__("itertools").product("ACGT",
                                                                    repeat=3))
                if c not in ("TAA", "TAG", "TGA")]
    utr5 = "".join(rng.choice(bases, 30))
    coding = "ATG" + "".join(rng.choice(non_stop, 160)) + "TAA"
    tail = "".join(rng.choice(bases, 650 - 30 - len(coding)))
    transcript = utr5 + coding + tail
    assert len(transcript) == 650
    # distribute across exons [200,449], [600,899], [1000,1099]
    seq = list("".join(rng.choice(bases, 1200)))
    seq[200:450] = transcript[:250]
    seq[600:900] = transcript[250:550]
    seq[1000:1100] = transcript[550:650]
    return TranscriptModel(genome="".join(seq),
                           exons=[(200, 449), (600, 899), (1000, 1099)],
                           utr5_len=30, gene="PANEL")


def _nonsyn(m, cpos: int) -> str:
    """A substitution at cDNA position cpos guaranteed to change the
    protein sequence."""
    wild = build_allele(m, "")
    base = m.genome[m.cdna_to_dna(str(cpos))]
    for alt in "ACGT":
        if alt == base:
            continue
        rec = build_allele(m, f"c.{cpos}{base}>{alt}")
        if rec.protein != wild.protein:
            return f"c.{cpos}{base}>{alt}"
    raise AssertionError(f"no non-synonymous alt at c.{cpos}")


def test_cdna_mapping():
    m = _model()
    # c.1 -> transcript index 30 -> genomic 230
    assert m.cdna_to_dna("1") == 230
    # c.-1 (last UTR base) -> transcript 29 -> genomic 229
    assert m.cdna_to_dna("-1") == 229
    # exon1 is 250 bases; c.220 is transcript 249 -> genomic 449
    assert m.cdna_to_dna("220") == 449
    # c.221 crosses into exon2 -> genomic 600
    assert m.cdna_to_dna("221") == 600
    # intronic offset: c.220+5 -> 449 + 5
    assert m.cdna_to_dna("220+5") == 454
    assert m.cdna_to_dna("221-3") == 597


def test_edit_application():
    m = _model()
    ref = m.genome

    snv = build_allele(m, f"c.10{ref[239]}>{'A' if ref[239] != 'A' else 'G'}")
    assert len(snv.seq) == len(ref)
    assert snv.seq[239] != ref[239]
    assert snv.layout == [(r.label, r.start, r.end) for r in m.regions]

    dele = build_allele(m, "c.10_12del")
    assert len(dele.seq) == len(ref) - 3
    ex1 = [x for x in dele.layout if x[0] == "exon1"][0]
    assert ex1[2] - ex1[1] + 1 == 247  # exon1 shrank by 3

    ins = build_allele(m, "c.10_11insTTT")
    assert len(ins.seq) == len(ref) + 3

    dup = build_allele(m, "c.10_12dup")
    assert len(dup.seq) == len(ref) + 3

    both = build_allele(m, "c.[10_12del;300A>C]"
                        if ref[m.cdna_to_dna("300")] == "A" else
                        f"c.[10_12del;300{ref[m.cdna_to_dna('300')]}>A]")
    assert len(both.seq) == len(ref) - 3


def test_combined_expansion_and_families():
    m = _model()
    variants = [
        {"cdna": _nonsyn(m, 11), "name": "v1", "freq": 0.2},
        {"cdna": _nonsyn(m, 231), "name": "v2", "freq": 0.001},
    ]
    expanded = expand_combined(variants, 0.01)
    # originals + (v1 x v2) pair
    assert len(expanded) == 3
    assert expanded[2]["cdna"].startswith("c.[")

    records = build_database(m, variants, 0.01)
    assert len(records) == 4  # reference + 2 + combined
    assert all(r.allele_id.startswith("PANEL*") for r in records)
    # ids are family:allele with 4-digit padding; non-synonymous variants
    # open new protein families
    assert records[0].allele_id == "PANEL*0001:0001"
    assert records[1].allele_id.startswith("PANEL*0002:")
    assert len({r.allele_id for r in records}) == 4


def test_dat_roundtrip_and_genotyping(tmp_path):
    """Export .dat -> build rna fasta via the standard builder -> simulate
    reads from a panel allele -> genotype with the CFTR-style options."""
    from t1k_tpu.core.pipeline import GenotypeOptions, run_genotyper
    from t1k_tpu.db.parse_dat import build_allele_fasta, BuildOptions
    from t1k_tpu.io.reads import read_seq_file
    from t1k_tpu.tools.simulate import SimConfig, simulate_pairs

    m = _model()
    variants = [
        {"cdna": _nonsyn(m, 11), "name": "v1", "freq": 0.2},
        {"cdna": "c.50_52del", "name": "v2", "freq": 0.05},
        {"cdna": _nonsyn(m, 331), "name": "v3", "freq": 0.001},
    ]
    records = build_database(m, variants, 0.01)
    dat = str(tmp_path / "panel.dat")
    export_dat(records, dat)

    rna_fa = str(tmp_path / "panel_rna.fa")
    with open(rna_fa, "w") as out:
        build_allele_fasta(dat, out, BuildOptions(mode="rna"))
    alleles = list(read_seq_file(rna_fa))
    assert len(alleles) == len(records)
    by_name = {r.id: r for r in alleles}

    # simulate a heterozygous sample: reference + the combined v1;v2 allele
    combined = [r for r in records if ";" in r.name or "[" in r.name]
    assert combined
    target = combined[0].allele_id
    r1, r2 = simulate_pairs([by_name["PANEL*0001:0001"], by_name[target]],
                            [1.0, 0.9], SimConfig(n_pairs=300, seed=3))
    fq1, fq2 = str(tmp_path / "p_1.fq"), str(tmp_path / "p_2.fq")
    from t1k_tpu.io.reads import write_fastq
    write_fastq(fq1, r1)
    write_fastq(fq2, r2)

    prefix = str(tmp_path / "panel")
    run_genotyper(rna_fa, [fq1], [fq2], prefix,
                  GenotypeOptions(digit_units=1, delimiter=":",
                                  min_squarem_alpha=10.0))
    calls = {}
    with open(prefix + "_genotype.tsv") as f:
        for line in f:
            cols = line.rstrip("\n").split("\t")
            calls[cols[0]] = [cols[2], cols[5]]
    assert "PANEL" in calls
    # genotype.tsv reports major-series names; allele.tsv the full ids
    majors = {calls["PANEL"][0].split(",")[0], calls["PANEL"][1].split(",")[0]}
    assert majors == {target.split(":")[0], "PANEL*0001"}
    with open(prefix + "_allele.tsv") as f:
        full = {line.split()[0] for line in f}
    assert full == {target, "PANEL*0001:0001"}
