"""IPD-scale database-build stress: an hla.dat-shaped synthetic input
(~3,000 alleles, 24 multi-exon genes, rna-style exon-only partial
alleles that force the dna-mode intron rescue, duplicates) through the
FULL chain — db/build.py's two-mode build vs ParseDatFile.pl, then
simulated reads genotyped against the built panel vs the reference
genotyper binary, byte-identical (reference paths:
t1k-build.pl:116-164, ParseDatFile.pl:281-331,460-617).

The smaller fuzz (fuzz_db.py) explores the option surface; this pins
the scale class the real IPD-IMGT/HLA release occupies, which the
download-based build flow cannot exercise offline.
"""

import os
import random
import subprocess
import sys

import pytest

from tests.conftest import DATA_DIR  # noqa: F401  (repo-root sys.path)
from tests.fuzz_db import _benign_order_diff, _emit_record, _mutate, _rand_seq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = os.environ.get("T1K_REFERENCE_SRC", "/tmp/t1k-ref-src")
REF_BIN = os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref-bench")


def make_ipd_dat(rng, path, n_genes=24, alleles_per_gene=125):
    """hla.dat-shaped: 6-8 exons/gene, ~1-3kb alleles, 18% exon-only
    (rna-style) partial records, 12% block-dropped partials, 5% exact
    duplicates."""
    with open(path, "w") as f:
        for g in range(n_genes):
            gene = f"IP{chr(65 + g // 4)}{g % 4 + 1}"
            n_ex = rng.randint(6, 8)
            utr5, utr3 = rng.choice([30, 50, 80]), rng.choice([30, 50, 80])
            ex_lens = [rng.randint(90, 360) for _ in range(n_ex)]
            in_lens = [rng.randint(80, 250) for _ in range(n_ex - 1)]
            exons_t = [_rand_seq(rng, n) for n in ex_lens]
            introns_t = [_rand_seq(rng, n) for n in in_lens]
            dup_from = None
            for a in range(alleles_per_gene):
                allele = f"{gene}*{a + 1:03d}"
                ex = [_mutate(rng, e, rng.uniform(0.0, 0.01)) for e in exons_t]
                if dup_from is not None and rng.random() < 0.05:
                    ex = dup_from
                elif rng.random() < 0.1:
                    dup_from = ex
                r = rng.random()
                parts, feats, pos = [], [], 1
                if r < 0.18:
                    # exon-only partial (rna-style record): drives the
                    # dna-mode intron rescue from the gene modal
                    # consensus (ParseDatFile.pl:460-573)
                    lo = rng.randint(0, 1)
                    hi = n_ex - rng.randint(0, 1)
                    for i in range(lo, hi):
                        parts.append(ex[i])
                        feats.append(
                            f"exon          {pos}..{pos + len(ex[i]) - 1}")
                        pos += len(ex[i])
                    feats.append("/partial")
                else:
                    lo, hi = 0, n_ex
                    partial = r < 0.30
                    if partial:
                        if rng.random() < 0.7:
                            lo = rng.randint(1, n_ex - 1)
                        if hi - lo > 1 and rng.random() < 0.5:
                            hi = rng.randint(lo + 1, n_ex)
                        if (lo, hi) == (0, n_ex):
                            partial = False
                    pad5 = utr5 if lo == 0 else 0
                    if pad5:
                        parts.append(_rand_seq(rng, pad5))
                        pos += pad5
                    for i in range(lo, hi):
                        parts.append(ex[i])
                        feats.append(
                            f"exon          {pos}..{pos + len(ex[i]) - 1}")
                        pos += len(ex[i])
                        if i + 1 < hi:
                            intr = introns_t[i]
                            parts.append(intr)
                            feats.append(
                                f"intron        {pos}..{pos + len(intr) - 1}")
                            pos += len(intr)
                    if hi == n_ex:
                        parts.append(_rand_seq(rng, utr3))
                    if partial:
                        feats.append("/partial")
                _emit_record(f, allele, "".join(parts), feats)


def test_ipd_scale_build_and_genotype_chain(tmp_path):
    if not os.path.exists(os.path.join(REF_SRC, "ParseDatFile.pl")):
        pytest.skip("reference source checkout not available")
    geno_bin = os.path.join(REF_BIN, "genotyper")
    if not os.path.exists(geno_bin):
        pytest.skip("reference genotyper binary not available")

    dat = str(tmp_path / "ipd.dat")
    make_ipd_dat(random.Random(42), dat)

    # ---- two-mode build: db/build.py vs ParseDatFile.pl
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, "-m", "t1k_tpu.db.build", "-d", dat,
         "-o", str(tmp_path), "--prefix", "ipd"],
        check=True, env=env, capture_output=True)
    for mode in ("rna", "dna"):
        ref = subprocess.run(
            ["perl", os.path.join(REF_SRC, "ParseDatFile.pl"), dat,
             "--mode", mode],
            capture_output=True, text=True, check=True).stdout
        mine = open(tmp_path / f"ipd_{mode}_seq.fa").read()
        # rescued-partial append order is Perl hash order in the
        # reference (its own output varies run to run); equality is
        # record-set equality (fuzz_db._benign_order_diff)
        assert mine == ref or _benign_order_diff(ref, mine, dedup=False), (
            f"{mode} build differs at IPD scale")

    n_alleles = sum(1 for l in open(tmp_path / "ipd_rna_seq.fa")
                    if l.startswith(">"))
    assert n_alleles > 2000, f"scale regression: only {n_alleles} alleles"

    # ---- genotype simulated reads against the built panel, vs the
    # reference binary on the SAME panel (byte-identical)
    panel = str(tmp_path / "ipd_rna_seq.fa")
    names = [l[1:].split()[0] for l in open(panel) if l.startswith(">")]
    picks = ([n for n in names if n.startswith("IPA1*")][:2]
             + [n for n in names if n.startswith("IPC3*")][:2])
    subprocess.run(
        [sys.executable, "-m", "t1k_tpu.tools.simulate", "-f", panel,
         "-o", str(tmp_path / "reads"), "--alleles", *picks,
         "-n", "2000", "--seed", "11"],
        check=True, env=env, capture_output=True)
    r1, r2 = str(tmp_path / "reads_1.fq"), str(tmp_path / "reads_2.fq")
    env_native = dict(env, T1K_BACKEND="native", JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "-m", "t1k_tpu.cli.genotype", "-f", panel,
         "-1", r1, "-2", r2, "-o", str(tmp_path / "mine"), "-t", "1"],
        check=True, env=env_native, capture_output=True)
    subprocess.run(
        [geno_bin, "-f", panel, "-1", r1, "-2", r2,
         "-o", str(tmp_path / "ref"), "-t", "1"],
        check=True, capture_output=True)
    for suf in ("_genotype.tsv", "_allele.tsv"):
        a = open(str(tmp_path / "mine") + suf).read()
        b = open(str(tmp_path / "ref") + suf).read()
        assert a == b, f"IPD-scale genotype chain differs: {suf}"
