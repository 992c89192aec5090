"""Cohort-tool parity tests: merge matrix, copy-number inference,
sample grouping, SMART-seq driver output format."""

import io
import os

import pytest

from tests.conftest import DATA_DIR, GOLDEN_DIR
from t1k_tpu.tools.copynumber import infer_copy_number
from t1k_tpu.tools.group_samples import group_samples
from t1k_tpu.tools.merge import merge_genotypes


def test_copynumber_matches_reference(tmp_path):
    g = os.path.join(GOLDEN_DIR, "multigene_genotype.tsv")
    out = io.StringIO()
    infer_copy_number(g, upper_quantile=1.0, out=out)
    with open(os.path.join(GOLDEN_DIR, "multigene_copynumber.tsv")) as f:
        assert out.getvalue() == f.read()


def test_merge_basic(tmp_path):
    g1 = tmp_path / "s1_genotype.tsv"
    g2 = tmp_path / "s2_genotype.tsv"
    g1.write_text("GENA\t2\tGENA*01\t50.0\t60\tGENA*02\t40.0\t50\t\n")
    g2.write_text("GENA\t1\tGENA*01\t55.0\t60\t.\t0\t-1\t\n")
    out = io.StringIO()
    final = merge_genotypes([str(g1), str(g2)], total_qual=30, out=out)
    lines = out.getvalue().splitlines()
    assert lines[0] == "sample\tGENA*01\tGENA*02\tinconsistency"
    assert lines[1].startswith("s1\t50.0\t40.0")
    assert lines[2].startswith("s2\t55.0\t0")
    assert final["GENA*01"] == 120.0


def test_group_samples(tmp_path):
    rows = "HLA-A\t2\tHLA-A*01:01\t10\t60\tHLA-A*02:01\t9\t55\t\n"
    a = tmp_path / "a_genotype.tsv"
    b = tmp_path / "b_genotype.tsv"
    c = tmp_path / "c_genotype.tsv"
    a.write_text(rows)
    b.write_text(rows)
    c.write_text("HLA-A\t2\tHLA-A*03:01\t10\t60\tHLA-A*02:01\t9\t55\t\n")
    out = io.StringIO()
    group_samples([str(a), str(b), str(c)], out=out)
    groups = dict(line.rsplit(" ", 1) for line in out.getvalue().splitlines())
    assert groups[str(a)] == groups[str(b)]
    assert groups[str(a)] != groups[str(c)]


CYP_RNA = os.environ.get(
    "T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx"
) + "/cyp2d6_rna_seq.fa"


def test_smartseq_pipeline(tmp_path):
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    from t1k_tpu.io.reads import read_seq_file, write_fastq
    from t1k_tpu.tools.simulate import SimConfig, simulate_pairs
    from t1k_tpu.tools.smartseq import run_smartseq

    by_name = {r.id: r for r in read_seq_file(CYP_RNA)}
    l1, l2 = [], []
    for ci, (alleles, seed) in enumerate(
            [(["CYP2D6*1", "CYP2D6*4"], 101), (["CYP2D6*1"], 103)]):
        r1, r2 = simulate_pairs([by_name[a] for a in alleles],
                                [1.0] * len(alleles),
                                SimConfig(n_pairs=150, seed=seed))
        p1 = tmp_path / f"cell{ci}.R1.fq"
        p2 = tmp_path / f"cell{ci}.R2.fq"
        write_fastq(str(p1), r1)
        write_fastq(str(p2), r2)
        l1.append(str(p1))
        l2.append(str(p2))
    (tmp_path / "list1.txt").write_text("\n".join(l1) + "\n")
    (tmp_path / "list2.txt").write_text("\n".join(l2) + "\n")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        final = run_smartseq("list1.txt", "list2.txt", CYP_RNA, "SS")
        with open(final) as f:
            lines = f.read().splitlines()
    finally:
        os.chdir(cwd)
    assert lines[0].startswith("sample\t")
    assert len(lines) == 3
    # both cells should report the same dominant allele column
    assert "CYP2D6" in lines[0]


def test_smartseq_workers_invariance(tmp_path):
    """Cells are dispatched over a process pool; the merged matrix must
    be identical at any worker count."""
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    from t1k_tpu.io.reads import read_seq_file, write_fastq
    from t1k_tpu.tools.simulate import SimConfig, simulate_pairs
    from t1k_tpu.tools.smartseq import run_smartseq

    by_name = {r.id: r for r in read_seq_file(CYP_RNA)}
    l1, l2 = [], []
    for ci, (alleles, seed) in enumerate(
            [(["CYP2D6*1", "CYP2D6*4"], 101), (["CYP2D6*1"], 103),
             (["CYP2D6*4"], 107)]):
        r1, r2 = simulate_pairs([by_name[a] for a in alleles],
                                [1.0] * len(alleles),
                                SimConfig(n_pairs=120, seed=seed))
        p1 = tmp_path / f"wcell{ci}.R1.fq"
        p2 = tmp_path / f"wcell{ci}.R2.fq"
        write_fastq(str(p1), r1)
        write_fastq(str(p2), r2)
        l1.append(str(p1))
        l2.append(str(p2))
    (tmp_path / "wlist1.txt").write_text("\n".join(l1) + "\n")
    (tmp_path / "wlist2.txt").write_text("\n".join(l2) + "\n")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        seq = run_smartseq("wlist1.txt", "wlist2.txt", CYP_RNA, "W1",
                           workers=1)
        par = run_smartseq("wlist1.txt", "wlist2.txt", CYP_RNA, "W2",
                           workers=2)
        with open(seq) as f:
            a = f.read()
        with open(par) as f:
            b = f.read()
    finally:
        os.chdir(cwd)
    assert a == b


def test_smartseq_cohort_em(tmp_path):
    """--cohortEm batches every second-pass cell's EM into one device
    program (cells as a batched axis).  The merged matrix must agree
    with the per-cell path on the allele calls (the EM runs in f32 on
    device, so abundances are compared to tolerance)."""
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    from t1k_tpu.io.reads import read_seq_file, write_fastq
    from t1k_tpu.tools.simulate import SimConfig, simulate_pairs
    from t1k_tpu.tools.smartseq import run_smartseq

    by_name = {r.id: r for r in read_seq_file(CYP_RNA)}
    l1, l2 = [], []
    for ci, (alleles, seed) in enumerate(
            [(["CYP2D6*1", "CYP2D6*4"], 101), (["CYP2D6*1"], 103),
             (["CYP2D6*4"], 107)]):
        r1, r2 = simulate_pairs([by_name[a] for a in alleles],
                                [1.0] * len(alleles),
                                SimConfig(n_pairs=120, seed=seed))
        p1 = tmp_path / f"ccell{ci}.R1.fq"
        p2 = tmp_path / f"ccell{ci}.R2.fq"
        write_fastq(str(p1), r1)
        write_fastq(str(p2), r2)
        l1.append(str(p1))
        l2.append(str(p2))
    (tmp_path / "clist1.txt").write_text("\n".join(l1) + "\n")
    (tmp_path / "clist2.txt").write_text("\n".join(l2) + "\n")

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        base = run_smartseq("clist1.txt", "clist2.txt", CYP_RNA, "CB")
        import jax

        from t1k_tpu.parallel.mesh import data_mesh
        mesh = data_mesh() if len(jax.devices()) > 1 else None
        cohort = run_smartseq("clist1.txt", "clist2.txt", CYP_RNA, "CC",
                              cohort_em=True, mesh=mesh)
        with open(base) as f:
            a = f.read().splitlines()
        with open(cohort) as f:
            b = f.read().splitlines()
    finally:
        os.chdir(cwd)
    assert a[0] == b[0]  # same called alleles in the header
    assert len(a) == len(b)
    for la, lb in zip(a[1:], b[1:]):
        ca, cb = la.split("\t"), lb.split("\t")
        assert os.path.basename(ca[0]) == os.path.basename(cb[0])
        assert ca[-1] == cb[-1]  # inconsistency column
        for va, vb in zip(ca[1:-1], cb[1:-1]):
            assert abs(float(va) - float(vb)) <= max(
                1e-2, 1e-3 * abs(float(va)))
