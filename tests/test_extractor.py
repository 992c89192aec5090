"""Extraction-stage parity: candidate fastqs must be byte-identical to
the reference extractor's output on the mixed on/off-target input."""

import hashlib
import os

import pytest

from tests.conftest import DATA_DIR, GOLDEN_DIR
from t1k_tpu.core.extractor import ExtractorOptions, is_low_complexity, run_extractor

CYP_RNA = os.environ.get(
    "T1K_CYP2D6_IDX", "/root/reference/vcf_database/cyp2d6_idx"
) + "/cyp2d6_rna_seq.fa"


def test_low_complexity():
    assert is_low_complexity("A" * 100)
    assert is_low_complexity("ACAC" * 25)          # two bases absent
    assert is_low_complexity("ACGT" * 2 + "N" * 5 + "ACGT" * 5)  # many Ns
    assert not is_low_complexity("ACGTAGCTAGGATCGGCTAAGCTTGCAGT" * 3)


def test_extractor_matches_reference(tmp_path):
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    p1 = os.path.join(DATA_DIR, "extract_1.fq")
    assert os.path.exists(p1), "run tests/make_goldens.py first"
    p2 = os.path.join(DATA_DIR, "extract_2.fq")

    prefix = str(tmp_path / "cand")
    stats = run_extractor(CYP_RNA, [p1], [p2], prefix, ExtractorOptions())
    assert stats["candidates"] > 0

    digests = {}
    with open(os.path.join(GOLDEN_DIR, "extract_digests.txt")) as f:
        for line in f:
            k, v = line.split()
            digests[k] = v
    for suffix in ("_1.fq", "_2.fq"):
        with open(prefix + suffix, "rb") as f:
            got = hashlib.sha256(f.read()).hexdigest()
        assert got == digests[suffix], f"candidate {suffix} differs"


def test_barcode_correction_matches_reference(tmp_path):
    if not os.path.exists(CYP_RNA):
        pytest.skip("cyp2d6 database unavailable")
    bcfile = os.path.join(DATA_DIR, "extract_bc.fq")
    if not os.path.exists(bcfile):
        pytest.skip("run tests/make_goldens.py first")
    prefix = str(tmp_path / "bc")
    run_extractor(
        CYP_RNA, [os.path.join(DATA_DIR, "extract_1.fq")],
        [os.path.join(DATA_DIR, "extract_2.fq")], prefix,
        ExtractorOptions(
            barcode_file=bcfile,
            barcode_whitelist=os.path.join(DATA_DIR, "bc_whitelist.txt")))
    with open(os.path.join(GOLDEN_DIR, "extract_bc_digest.txt")) as f:
        want = f.read().split()[1]
    with open(prefix + "_bc.fa", "rb") as f:
        got = hashlib.sha256(f.read()).hexdigest()
    assert got == want


def test_repeated_input_flags_extend(tmp_path):
    """Repeated -u/-1 flags append files like the reference binaries'
    getopt loops (each occurrence is another AddReadFile,
    FastqExtractor.cpp:310-330) — argparse must not overwrite."""
    from t1k_tpu.cli.extract import build_parser

    args = build_parser().parse_args(
        ["-f", "x.fa", "-u", "a.fq", "-u", "b.fq", "-1", "c.fq",
         "-1", "d.fq", "e.fq", "--barcode", "f.fq", "--barcode", "g.fq"])
    assert args.single == ["a.fq", "b.fq"]
    assert args.first == ["c.fq", "d.fq", "e.fq"]
    assert args.barcode == ["f.fq", "g.fq"]


def test_barcode_trie_prefix_acceptance(tmp_path):
    """The reference trie's SearchAndUpdate never checks the end-of-word
    flag (BarcodeCorrector.hpp:82-99), so a barcode that is a PREFIX of
    a whitelist entry is accepted unchanged — observable when
    --barcodeStart/--barcodeEnd slice barcodes shorter than the
    whitelist entries."""
    from t1k_tpu.core.barcode import BarcodeCorrector

    wl = tmp_path / "wl.txt"
    wl.write_text("ACGTACGT\nTTTTGGGG\n")
    c = BarcodeCorrector()
    c.set_whitelist(str(wl))
    # exact prefix of ACGTACGT -> accepted as-is (internal node)
    assert c.correct("ACGTAC", None) == "ACGTAC"
    # 1-Hamming from the TTTTGGGG prefix -> corrected onto the path
    assert c.correct("TTATGG", None) == "TTTTGG"
    # off every path entirely -> uncorrectable
    assert c.correct("CCCCCC", None) is None
