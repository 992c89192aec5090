"""Full driver chain parity: extract -> genotype -> analyze through
cli.run must match the reference run-t1k chain byte-for-byte."""

import hashlib
import os

import pytest

from tests.conftest import DATA_DIR, GOLDEN_DIR

CYP_RNA = os.environ.get(
    "T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx"
) + "/cyp2d6_rna_seq.fa"


def test_run_driver_chain_matches_reference(tmp_path):
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    golden = os.path.join(GOLDEN_DIR, "runt1k_genotype.tsv")
    if not os.path.exists(golden):
        pytest.skip("run tests/make_goldens.py first")
    from t1k_tpu.cli.run import main

    outdir = str(tmp_path / "chainrun")
    rc = main(["-f", CYP_RNA,
               "-1", os.path.join(DATA_DIR, "rna_1.fq"),
               "-2", os.path.join(DATA_DIR, "rna_2.fq"),
               "--od", outdir, "-o", "chain"])
    assert rc == 0

    for suffix in ("_genotype.tsv", "_allele.tsv", "_allele.vcf"):
        with open(os.path.join(outdir, "chain" + suffix)) as f:
            got = f.read()
        with open(os.path.join(GOLDEN_DIR, "runt1k" + suffix)) as f:
            want = f.read()
        assert got == want, f"runt1k{suffix} differs"

    digests = {}
    with open(os.path.join(GOLDEN_DIR, "runt1k_digests.txt")) as f:
        for line in f:
            k, v = line.split()
            digests[k] = v
    for suffix, want in digests.items():
        with open(os.path.join(outdir, "chain" + suffix), "rb") as f:
            got = hashlib.sha256(f.read()).hexdigest()
        assert got == want, f"runt1k{suffix} differs"


def test_interleaved_prefix_inference(tmp_path):
    """Interleaved-only input infers the bare `T1K` prefix: run-t1k's
    inference looks only at -b and -1/-u and falls through to the plain
    default for -i (run-t1k:316-331)."""
    from t1k_tpu.io.reads import read_seq_file, write_fastq

    r1 = list(read_seq_file(os.path.join(DATA_DIR, "multigene_1.fq")))
    r2 = list(read_seq_file(os.path.join(DATA_DIR, "multigene_2.fq")))
    inter = str(tmp_path / "sample.inter.fq")
    write_fastq(inter, [x for pair in zip(r1, r2) for x in pair])

    from t1k_tpu.cli.run import main

    outdir = str(tmp_path / "out")
    rc = main(["-f", os.path.join(DATA_DIR, "multigene_rna.fa"),
               "-i", inter, "--od", outdir, "--skipPostAnalysis"])
    assert rc == 0
    names = set(os.listdir(outdir))
    assert "T1K_genotype.tsv" in names, names
    assert not any(n.startswith("T1K_sample") for n in names), names


def test_no_extraction_requires_direct_reads(tmp_path):
    """-i with --noExtraction fails cleanly: the reference driver would
    fall through to nonexistent candidate files (run-t1k:389-415)."""
    from t1k_tpu.cli.run import main

    rc = main(["-f", os.path.join(DATA_DIR, "multigene_rna.fa"),
               "-i", os.path.join(DATA_DIR, "multigene_1.fq"),
               "--od", str(tmp_path), "--noExtraction"])
    assert rc == 1


def test_config_and_metrics_provenance(tmp_path):
    """The driver serializes the resolved config (<prefix>_config.json,
    PipelineConfig round-trip) and per-stage metrics
    (<prefix>_metrics.json with wall time + throughput counters)."""
    import json

    from t1k_tpu.cli.run import main
    from t1k_tpu.config import PipelineConfig

    outdir = str(tmp_path / "prov")
    rc = main(["-f", os.path.join(DATA_DIR, "multigene_rna.fa"),
               "-1", os.path.join(DATA_DIR, "multigene_1.fq"),
               "-2", os.path.join(DATA_DIR, "multigene_2.fq"),
               "--od", outdir, "-o", "p", "--preset", "hla",
               "--skipPostAnalysis"])
    assert rc == 0
    cfg = PipelineConfig.load(os.path.join(outdir, "p_config.json"))
    assert cfg.preset == "hla"
    assert cfg.similarity == 0.97  # hla preset resolved into the config
    assert cfg.skip_post_analysis
    with open(os.path.join(outdir, "p_metrics.json")) as f:
        metrics = json.load(f)
    for stage_name in ("read_assignment", "fragment_assignment",
                       "em_quantification", "allele_selection"):
        assert stage_name in metrics, metrics.keys()
        assert metrics[stage_name]["seconds"] >= 0
    assert metrics["read_assignment"]["read_count"] > 0
