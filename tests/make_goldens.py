"""Regenerate golden outputs for the end-to-end pipeline tests.

Requires the reference T1K binaries (built from the upstream C++ release)
at $T1K_REFERENCE_BIN and the bundled cyp2d6 database at
$T1K_CYP2D6_IDX (defaults target the standard evaluation layout).
Goldens are stored in tests/golden/ as small text files; the simulated
reads are regenerated deterministically by the tests themselves.

Usage:  python tests/make_goldens.py
"""

import hashlib
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t1k_tpu.io.reads import read_seq_file, write_fastq, write_fasta, SeqRecord  # noqa: E402
from t1k_tpu.tools.simulate import SimConfig, simulate_pairs  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
REF_BIN = os.environ.get("T1K_REFERENCE_BIN", "/tmp/t1k-ref")
CYP_IDX = os.environ.get(
    "T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx")


def build_multigene_reference() -> str:
    """Synthesize a 3-gene RNA database from cyp2d6 alleles: per gene a
    deterministic set of substitutions is applied to every allele, so
    within-gene variation stays tiny while genes are ~97% similar."""
    import numpy as np

    src = [r for r in read_seq_file(os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa"))]
    src = src[:40]
    out = []
    rng = np.random.default_rng(99)
    for gi, gene in enumerate(["GENA", "GENB", "GENC"]):
        n_mut = 0 if gi == 0 else 40 * gi
        # mutation positions/values shared by all alleles of the gene
        pos = rng.integers(0, 1000, size=n_mut)
        sub = rng.integers(1, 4, size=n_mut)
        for ai, rec in enumerate(src):
            seq = list(rec.seq)
            for p, s in zip(pos, sub):
                if p < len(seq) and seq[p] in "ACGT":
                    seq[p] = "ACGT"[("ACGT".index(seq[p]) + s) % 4]
            allele = rec.id.split("*")[1]
            name = f"{gene}*{allele}"
            out.append(SeqRecord(name, "".join(seq), None, rec.comment))
    path = os.path.join(DATA, "multigene_rna.fa")
    with open(path, "w") as f:
        for r in out:
            f.write(f">{r.id} {r.comment}\n{r.seq}\n")
    return path


CASES = {
    "rna": dict(
        ref=os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa"),
        alleles=["CYP2D6*1", "CYP2D6*4"], abund=[1.0, 0.8],
        n=300, seed=17, paired=True, args=[],
    ),
    "dna": dict(
        ref=os.path.join(CYP_IDX, "cyp2d6_dna_seq.fa"),
        alleles=["CYP2D6*1", "CYP2D6*4", "CYP2D6*2"], abund=[1.0, 0.8, 0.5],
        n=400, seed=23, paired=True, args=["-s", "0.9", "--relaxIntronAlign"],
    ),
    "rna_single": dict(
        ref=os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa"),
        alleles=["CYP2D6*1", "CYP2D6*4"], abund=[1.0, 0.8],
        n=300, seed=31, paired=False, args=[],
    ),
    "rna_s97": dict(
        # the HLA preset's similarity regime: different assignment-weight
        # bucketing (ref SimpleVector-free path in Genotyper.hpp weights)
        ref=os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa"),
        alleles=["CYP2D6*1", "CYP2D6*4"], abund=[1.0, 0.8],
        n=300, seed=17, paired=True, args=["-s", "0.97"],
    ),
    "rna_n": dict(
        # reads carrying N bases exercise the hasN weight/10 path
        ref=os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa"),
        alleles=["CYP2D6*1", "CYP2D6*4"], abund=[1.0, 0.8],
        n=300, seed=17, paired=True, args=[], inject_n=88,
    ),
    "multigene": dict(
        ref="MULTIGENE",
        alleles=["GENA*83", "GENA*50", "GENB*15.001", "GENB*129.001", "GENC*4.006"],
        abund=[1.0, 0.9, 0.8, 0.7, 0.6],
        n=600, seed=41, paired=True, args=[],
    ),
}


def simulate_case(name: str, case: dict, ref_path: str):
    by_name = {r.id: r for r in read_seq_file(ref_path)}
    chosen = [by_name[a] for a in case["alleles"]]
    cfg = SimConfig(n_pairs=case["n"], seed=case["seed"])
    r1, r2 = simulate_pairs(chosen, case["abund"], cfg)
    if case.get("inject_n"):
        import numpy as np

        rng = np.random.default_rng(case["inject_n"])
        for i, rec in enumerate(r1):
            if rng.random() < 0.3:
                s = list(rec.seq)
                s[int(rng.integers(0, len(s)))] = "N"
                r1[i] = SeqRecord(rec.id, "".join(s), rec.qual, rec.comment)
    p1 = os.path.join(DATA, f"{name}_1.fq")
    p2 = os.path.join(DATA, f"{name}_2.fq")
    write_fastq(p1, r1)
    write_fastq(p2, r2)
    return p1, p2


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read())
    return h.hexdigest()


def make_extractor_input():
    """Mixed on-target / background / low-complexity reads for the
    extraction-stage golden."""
    import numpy as np

    ref = os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa")
    by_name = {r.id: r for r in read_seq_file(ref)}
    chosen = [by_name["CYP2D6*1"], by_name["CYP2D6*4"]]
    r1, r2 = simulate_pairs(chosen, [1.0, 0.8], SimConfig(n_pairs=200, seed=77))
    rng = np.random.default_rng(123)
    bases = np.array(list("ACGT"))
    for i in range(250):
        s1 = "".join(rng.choice(bases, 100))
        s2 = "".join(rng.choice(bases, 100))
        r1.append(SeqRecord(f"bg_{i}", s1, "I" * 100))
        r2.append(SeqRecord(f"bg_{i}", s2, "I" * 100))
    for i in range(10):
        r1.append(SeqRecord(f"low_{i}", "A" * 60 + "C" * 40, "I" * 100))
        r2.append(SeqRecord(f"low_{i}", "ACAC" * 25, "I" * 100))
    order = rng.permutation(len(r1))
    p1 = os.path.join(DATA, "extract_1.fq")
    p2 = os.path.join(DATA, "extract_2.fq")
    write_fastq(p1, [r1[i] for i in order])
    write_fastq(p2, [r2[i] for i in order])
    return ref, p1, p2


def golden_extractor():
    ref, p1, p2 = make_extractor_input()
    prefix = "/tmp/golden_extract"
    subprocess.run([os.path.join(REF_BIN, "fastq-extractor"), "-f", ref,
                    "-1", p1, "-2", p2, "-o", prefix],
                   check=True, capture_output=True)
    with open(os.path.join(GOLDEN, "extract_digests.txt"), "w") as f:
        f.write(f"_1.fq\t{sha256(prefix + '_1.fq')}\n")
        f.write(f"_2.fq\t{sha256(prefix + '_2.fq')}\n")
    print("extract: done")


def make_variant_input():
    """Reads carrying injected exonic SNPs + per-fragment barcodes, to
    exercise the novel-variant caller and the barcode matrix."""
    from t1k_tpu.io.reads import write_fasta

    ref = os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa")
    by_name = {r.id: r for r in read_seq_file(ref)}
    a1, a4 = by_name["CYP2D6*1"], by_name["CYP2D6*4"]

    def mut(rec, positions):
        s = list(rec.seq)
        for p in positions:
            s[p] = "A" if s[p] != "A" else "G"
        return SeqRecord(rec.id, "".join(s), None, rec.comment)

    a1m = mut(a1, [400, 430, 900])
    a4m = mut(a4, [700])
    r1, r2 = simulate_pairs([a1m, a4m], [1.0, 0.9], SimConfig(n_pairs=600, seed=61))
    bcs = [SeqRecord(r.id, f"BC{i % 4:02d}", None) for i, r in enumerate(r1)]
    p1 = os.path.join(DATA, "variant_1.fq")
    p2 = os.path.join(DATA, "variant_2.fq")
    pb = os.path.join(DATA, "variant_bc.fa")
    write_fastq(p1, r1)
    write_fastq(p2, r2)
    write_fasta(pb, bcs)
    return ref, p1, p2, pb


def golden_analyzer():
    ref, p1, p2, pb = make_variant_input()
    prefix = "/tmp/golden_variant"
    subprocess.run([os.path.join(REF_BIN, "genotyper"), "-f", ref, "-1", p1,
                    "-2", p2, "--barcode", pb, "-o", prefix],
                   check=True, capture_output=True)
    subprocess.run([os.path.join(REF_BIN, "analyzer"), "-f", ref,
                    "-a", prefix + "_allele.tsv",
                    "-1", prefix + "_aligned_1.fa",
                    "-2", prefix + "_aligned_2.fa",
                    "--barcode", prefix + "_aligned_bc.fa", "-o", prefix],
                   check=True, capture_output=True)
    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf",
                   "_barcode_expr.tsv"):
        with open(prefix + suffix) as fin, open(
                os.path.join(GOLDEN, "variant" + suffix), "w") as fout:
            fout.write(fin.read())
    print("variant: done")


def make_dna_variant_input():
    """Exonic + intronic SNPs on the genomic (dna) reference: the caller
    must report only the exonic ones (intra-exon constraint)."""
    ref = os.path.join(CYP_IDX, "cyp2d6_dna_seq.fa")
    by_name = {r.id: r for r in read_seq_file(ref)}
    a1, a2 = by_name["CYP2D6*1"], by_name["CYP2D6*2"]
    c = [int(x) for x in a1.comment.split()]
    exons = list(zip(c[1::2], c[2::2]))

    def mut(rec, positions):
        s = list(rec.seq)
        for p in positions:
            if s[p] != "N":
                s[p] = "A" if s[p] != "A" else "G"
        return SeqRecord(rec.id, "".join(s), None, rec.comment)

    pos = [exons[1][0] + 40, exons[3][0] + 25, exons[1][1] + 50]
    a1m = mut(a1, pos)
    r1, r2 = simulate_pairs([a1m, a2], [1.0, 0.85],
                            SimConfig(n_pairs=800, seed=99))
    p1 = os.path.join(DATA, "vardna_1.fq")
    p2 = os.path.join(DATA, "vardna_2.fq")
    write_fastq(p1, r1)
    write_fastq(p2, r2)
    return ref, p1, p2


def make_stall_variant_input():
    """Same-major allele pair with close mutations: triggers the
    variant-caller walk-stall quirk (filtered positions skip the
    refPos/readPos increments, VariantCaller.hpp:139-167)."""
    ref = os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa")
    by_name = {r.id: r for r in read_seq_file(ref)}
    a, b = by_name["CYP2D6*4.016"], by_name["CYP2D6*4.022"]

    def mut(rec, positions):
        s = list(rec.seq)
        for p in positions:
            if s[p] != "N":
                s[p] = "A" if s[p] != "A" else "G"
        return SeqRecord(rec.id, "".join(s), None, rec.comment)

    am = mut(a, [191, 929])
    bm = mut(b, [191])
    r1, r2 = simulate_pairs([am, bm], [1.0, 0.8],
                            SimConfig(n_pairs=500, seed=5036))
    p1 = os.path.join(DATA, "varstall_1.fq")
    p2 = os.path.join(DATA, "varstall_2.fq")
    write_fastq(p1, r1)
    write_fastq(p2, r2)
    return ref, p1, p2


def golden_stall_variant():
    ref, p1, p2 = make_stall_variant_input()
    prefix = "/tmp/golden_varstall"
    subprocess.run([os.path.join(REF_BIN, "genotyper"), "-f", ref, "-1", p1,
                    "-2", p2, "-o", prefix], check=True, capture_output=True)
    subprocess.run([os.path.join(REF_BIN, "analyzer"), "-f", ref,
                    "-a", prefix + "_allele.tsv",
                    "-1", prefix + "_aligned_1.fa",
                    "-2", prefix + "_aligned_2.fa", "-o", prefix],
                   check=True, capture_output=True)
    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf"):
        with open(prefix + suffix) as fin, open(
                os.path.join(GOLDEN, "varstall" + suffix), "w") as fout:
            fout.write(fin.read())
    print("varstall: done")


def golden_dna_variant():
    ref, p1, p2 = make_dna_variant_input()
    prefix = "/tmp/golden_vardna"
    args = ["-s", "0.9", "--relaxIntronAlign"]
    subprocess.run([os.path.join(REF_BIN, "genotyper"), "-f", ref, "-1", p1,
                    "-2", p2, "-o", prefix] + args,
                   check=True, capture_output=True)
    subprocess.run([os.path.join(REF_BIN, "analyzer"), "-f", ref,
                    "-a", prefix + "_allele.tsv",
                    "-1", prefix + "_aligned_1.fa",
                    "-2", prefix + "_aligned_2.fa", "-o", prefix] + args,
                   check=True, capture_output=True)
    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf"):
        with open(prefix + suffix) as fin, open(
                os.path.join(GOLDEN, "vardna" + suffix), "w") as fout:
            fout.write(fin.read())
    print("vardna: done")


def make_barcode_input():
    """Whitelist + noisy per-read barcodes for the correction golden."""
    import numpy as np

    rng = np.random.default_rng(31)
    bases = "ACGT"
    wl = ["".join(bases[i] for i in rng.integers(0, 4, 16)) for _ in range(20)]
    with open(os.path.join(DATA, "bc_whitelist.txt"), "w") as f:
        f.write("\n".join(wl) + "\n")
    out = []
    for i in range(460):
        r = rng.random()
        bc = wl[int(rng.integers(0, 20))]
        if r < 0.2:
            p = int(rng.integers(0, 16))
            bc = (bc[:p]
                  + bases[(bases.index(bc[p]) + 1 + int(rng.integers(0, 3))) % 4]
                  + bc[p + 1:])
        elif r < 0.25:
            bc = "".join(bases[j] for j in rng.integers(0, 4, 16))
        qual = "".join(chr(34 + int(q)) for q in rng.integers(0, 40, 16))
        out.append(f"@bc_{i}\n{bc}\n+\n{qual}")
    with open(os.path.join(DATA, "extract_bc.fq"), "w") as f:
        f.write("\n".join(out) + "\n")


def golden_barcode():
    make_barcode_input()
    ref = os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa")
    prefix = "/tmp/golden_bc"
    subprocess.run([os.path.join(REF_BIN, "fastq-extractor"), "-f", ref,
                    "-1", os.path.join(DATA, "extract_1.fq"),
                    "-2", os.path.join(DATA, "extract_2.fq"),
                    "--barcode", os.path.join(DATA, "extract_bc.fq"),
                    "--barcodeWhitelist", os.path.join(DATA, "bc_whitelist.txt"),
                    "-o", prefix], check=True, capture_output=True)
    with open(os.path.join(GOLDEN, "extract_bc_digest.txt"), "w") as f:
        f.write(f"_bc.fa\t{sha256(prefix + '_bc.fa')}\n")
    print("barcode: done")


def golden_runt1k():
    """Full driver chain (extract -> genotype -> analyze) through the
    reference run-t1k, on the rna case inputs."""
    ref = os.path.join(CYP_IDX, "cyp2d6_rna_seq.fa")
    outdir = "/tmp/golden_runt1k"
    os.makedirs(outdir, exist_ok=True)
    subprocess.run(["perl", os.path.join(REF_BIN, "run-t1k"), "-f", ref,
                    "-1", os.path.join(DATA, "rna_1.fq"),
                    "-2", os.path.join(DATA, "rna_2.fq"),
                    "--od", outdir, "-o", "chain"],
                   check=True, capture_output=True)
    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf"):
        with open(os.path.join(outdir, "chain" + suffix)) as fin, open(
                os.path.join(GOLDEN, "runt1k" + suffix), "w") as fout:
            fout.write(fin.read())
    digests = {}
    for suffix in ("_candidate_1.fq", "_candidate_2.fq", "_aligned_1.fa",
                   "_aligned_2.fa"):
        digests[suffix] = sha256(os.path.join(outdir, "chain" + suffix))
    with open(os.path.join(GOLDEN, "runt1k_digests.txt"), "w") as f:
        for k, v in sorted(digests.items()):
            f.write(f"{k}\t{v}\n")
    print("runt1k: done")


def build_kirex_panel():
    """Reconstruct the KIR panel for the reference repo's bundled example
    reads from their ground-truth provenance headers (contig=, orig_begin=,
    haplotype_infix= — zero conflicts, >99% coverage per allele).  Gaps are
    filled with seeded random bases, mirroring ParseDatFile.pl:575-601's
    srand(17) UTR padding.  The official expected output was built against
    IPD-KIR v2.10.0 (not redistributable); this panel lets both the
    reference binaries and the framework run the identical example reads."""
    import collections
    import re

    import numpy as np

    example = os.environ.get("T1K_EXAMPLE_DIR", "/root/reference/example")
    scaff = collections.defaultdict(dict)
    for mate in ("example_1.fq", "example_2.fq"):
        with open(os.path.join(example, mate)) as f:
            lines = f.read().splitlines()
        for i in range(0, len(lines), 4):
            h = lines[i]
            c = re.search(r"contig=(\S+)", h).group(1)
            b = int(re.search(r"orig_begin=(\d+)", h).group(1))
            infix = re.search(r"haplotype_infix=(\S+)", h).group(1)
            d = scaff[c]
            for j, base in enumerate(infix):
                assert d.get(b + j, base) == base, "provenance conflict"
                d[b + j] = base
    rng = np.random.default_rng(17)
    panel = os.path.join(DATA, "kirex_rna.fa")
    with open(panel, "w") as f:
        for c in sorted(scaff):
            d = scaff[c]
            length = max(d) + 1
            seq = "".join(d.get(p) or "ACGT"[rng.integers(0, 4)]
                          for p in range(length))
            f.write(f">{c} 1 50 {length - 51}\n{seq}\n")
    return panel


def golden_kirex():
    """Full driver chain on the bundled example reads (see test_example)."""
    example = os.environ.get("T1K_EXAMPLE_DIR", "/root/reference/example")
    panel = build_kirex_panel()
    outdir = "/tmp/golden_kirex"
    os.makedirs(outdir, exist_ok=True)
    subprocess.run(["perl", os.path.join(REF_BIN, "run-t1k"), "-f", panel,
                    "-1", os.path.join(example, "example_1.fq"),
                    "-2", os.path.join(example, "example_2.fq"),
                    "--od", outdir, "-o", "exref", "-t", "1"],
                   check=True, capture_output=True)
    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf"):
        with open(os.path.join(outdir, "exref" + suffix)) as fin, open(
                os.path.join(GOLDEN, "kirex" + suffix), "w") as fout:
            fout.write(fin.read())
    with open(os.path.join(GOLDEN, "kirex_digests.txt"), "w") as f:
        for suffix in ("_candidate_1.fq", "_candidate_2.fq",
                       "_aligned_1.fa", "_aligned_2.fa"):
            f.write(f"{suffix} {sha256(os.path.join(outdir, 'exref' + suffix))}\n")
    print("kirex: done")


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    os.makedirs(DATA, exist_ok=True)
    golden_kirex()
    golden_extractor()
    golden_barcode()
    golden_analyzer()
    golden_dna_variant()
    golden_stall_variant()
    mg = build_multigene_reference()
    for name, case in CASES.items():
        ref = mg if case["ref"] == "MULTIGENE" else case["ref"]
        p1, p2 = simulate_case(name, case, ref)
        prefix = os.path.join("/tmp", f"golden_{name}")
        cmd = [os.path.join(REF_BIN, "genotyper"), "-f", ref,
               "-o", prefix, "--outputReadAssignment"] + case["args"]
        if case["paired"]:
            cmd += ["-1", p1, "-2", p2]
        else:
            cmd += ["-u", p1]
        subprocess.run(cmd, check=True, capture_output=True)
        for suffix in ("_genotype.tsv", "_allele.tsv"):
            with open(prefix + suffix) as f:
                content = f.read()
            with open(os.path.join(GOLDEN, name + suffix), "w") as f:
                f.write(content)
        # large outputs: store digests of sorted content
        digests = {}
        for suffix in ("_assign.tsv",):
            with open(prefix + suffix) as f:
                lines = sorted(f.readlines())
            digests[suffix] = hashlib.sha256("".join(lines).encode()).hexdigest()
        aligned = prefix + ("_aligned_1.fa" if case["paired"] else "_aligned.fa")
        digests["_aligned.fa"] = sha256(aligned)
        with open(os.path.join(GOLDEN, name + "_digests.txt"), "w") as f:
            for k, v in sorted(digests.items()):
                f.write(f"{k}\t{v}\n")
        print(f"{name}: done")
    golden_runt1k()
    golden_db()


def golden_db():
    """Database-builder goldens from the reference ParseDatFile.pl
    (requires the reference source checkout at T1K_REFERENCE_SRC)."""
    ref_src = os.environ.get("T1K_REFERENCE_SRC", "/tmp/t1k-ref-src")
    script = os.path.join(ref_src, "ParseDatFile.pl")
    if not os.path.exists(script):
        print("golden_db: ParseDatFile.pl unavailable, skipped")
        return
    jobs = [
        ("synth.dat", "synth_rna.fa", ["--mode", "rna"]),
        ("synth.dat", "synth_dna.fa", ["--mode", "dna"]),
        ("synth.dat", "synth_genome.fa", ["--mode", "genome"]),
        ("synth_pad.dat", "synth_pad_rna.fa", ["--mode", "rna"]),
        ("synth_pad.dat", "synth_pad_dna.fa", ["--mode", "dna"]),
        ("synth_exonized.dat", "synth_exonized_dna.fa",
         ["--mode", "dna", "--intronPadding", "30"]),
    ]
    for dat, golden, args in jobs:
        if not os.path.exists(os.path.join(GOLDEN, golden)):
            continue  # only refresh goldens the suite uses
        r = subprocess.run(
            ["perl", script, os.path.join(DATA, dat)] + args,
            capture_output=True, text=True, check=True)
        with open(os.path.join(GOLDEN, golden), "w") as f:
            f.write(r.stdout)
        print(f"golden_db: {golden} done")


if __name__ == "__main__":
    main()
