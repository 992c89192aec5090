"""End-to-end genotyping parity tests.

Each case simulates reads deterministically, runs the full pipeline, and
compares outputs byte-for-byte against goldens produced by the reference
implementation (see make_goldens.py):
  * genotype.tsv and allele.tsv compared literally,
  * per-read assignment table and aligned-read fasta compared by digest.
"""

import hashlib
import os

import pytest

from tests.conftest import DATA_DIR, GOLDEN_DIR
from tests.make_goldens import CASES
from t1k_tpu.core.pipeline import GenotypeOptions, run_genotyper


def _opts_from_args(args):
    opts = GenotypeOptions(output_read_assignment=True)
    it = iter(range(len(args)))
    i = 0
    while i < len(args):
        if args[i] == "-s":
            opts.ref_seq_similarity = float(args[i + 1])
            i += 2
        elif args[i] == "--relaxIntronAlign":
            opts.relax_intron_align = True
            i += 1
        else:
            raise ValueError(args[i])
    return opts


@pytest.mark.parametrize("name", list(CASES.keys()))
def test_pipeline_matches_reference(name, tmp_path):
    case = CASES[name]
    ref = (os.path.join(DATA_DIR, "multigene_rna.fa")
           if case["ref"] == "MULTIGENE" else case["ref"])
    if not os.path.exists(ref):
        pytest.skip(f"reference database not available: {ref}")
    p1 = os.path.join(DATA_DIR, f"{name}_1.fq")
    p2 = os.path.join(DATA_DIR, f"{name}_2.fq")
    assert os.path.exists(p1), "run tests/make_goldens.py first"

    prefix = str(tmp_path / name)
    opts = _opts_from_args(case["args"])
    run_genotyper(ref, [p1], [p2] if case["paired"] else None, prefix, opts)

    for suffix in ("_genotype.tsv", "_allele.tsv"):
        with open(prefix + suffix) as f:
            got = f.read()
        with open(os.path.join(GOLDEN_DIR, name + suffix)) as f:
            want = f.read()
        assert got == want, f"{name}{suffix} differs"

    digests = {}
    with open(os.path.join(GOLDEN_DIR, name + "_digests.txt")) as f:
        for line in f:
            k, v = line.split()
            digests[k] = v

    with open(prefix + "_assign.tsv") as f:
        lines = sorted(f.readlines())
    got = hashlib.sha256("".join(lines).encode()).hexdigest()
    assert got == digests["_assign.tsv"], f"{name} assign.tsv differs"

    aligned = prefix + ("_aligned_1.fa" if case["paired"] else "_aligned.fa")
    with open(aligned, "rb") as f:
        got = hashlib.sha256(f.read()).hexdigest()
    assert got == digests["_aligned.fa"], f"{name} aligned fasta differs"


@pytest.mark.parametrize("workers", [2, 3])
def test_distributed_matches_single_host(workers, tmp_path):
    """Host-sharded execution (parallel/distributed.py) must be
    byte-identical to the single-host pipeline: contiguous fragment
    shards restore global coalesce order, coverage tensors sum."""
    from t1k_tpu.parallel.distributed import run_genotyper_distributed

    ref = CASES["rna"]["ref"]
    if not os.path.exists(ref):
        pytest.skip("reference database not available")
    p1 = os.path.join(DATA_DIR, "rna_1.fq")
    p2 = os.path.join(DATA_DIR, "rna_2.fq")

    prefix = str(tmp_path / f"dist{workers}")
    run_genotyper_distributed(ref, [p1], [p2], prefix,
                              GenotypeOptions(), n_workers=workers)
    for suffix in ("_genotype.tsv", "_allele.tsv"):
        with open(prefix + suffix) as f:
            got = f.read()
        with open(os.path.join(GOLDEN_DIR, "rna" + suffix)) as f:
            want = f.read()
        assert got == want, f"distributed {suffix} differs"


def test_thread_count_invariance(tmp_path):
    """Race check: the multi-threaded engine must be byte-deterministic
    and identical to single-threaded output (reference contiguous-shard
    convention; coverage scatter is atomic and order-free)."""
    case = CASES["dna"]
    if not os.path.exists(case["ref"]):
        pytest.skip("reference database not available")
    p1 = os.path.join(DATA_DIR, "dna_1.fq")
    p2 = os.path.join(DATA_DIR, "dna_2.fq")
    outs = []
    for threads in (1, 8):
        prefix = str(tmp_path / f"t{threads}")
        opts = _opts_from_args(case["args"])
        opts.threads = threads
        run_genotyper(case["ref"], [p1], [p2], prefix, opts)
        with open(prefix + "_genotype.tsv") as f:
            g = f.read()
        with open(prefix + "_assign.tsv") as f:
            a = "".join(sorted(f.readlines()))
        outs.append((g, a))
    assert outs[0] == outs[1]


def test_truncated_mate_boundary_sentinel(tmp_path):
    """Fragments whose mate-pair window reaches exactly position 0 of a
    better-matching allele must be dropped: the reference's separator
    list carries -1/len boundary sentinels that trip the truncated-mate
    filter (SeqSet.hpp:924-928, 502-520). Found by fuzzing."""
    ref = os.path.join(DATA_DIR, "truncmate_panel.fa")
    prefix = str(tmp_path / "tm")
    run_genotyper(ref, [os.path.join(DATA_DIR, "truncmate_1.fq")],
                  [os.path.join(DATA_DIR, "truncmate_2.fq")], prefix,
                  GenotypeOptions(output_read_assignment=True))
    with open(prefix + "_assign.tsv") as f:
        assert f.read() == ""  # both fragments filtered
    with open(prefix + "_genotype.tsv") as f:
        got = f.read()
    with open(os.path.join(GOLDEN_DIR, "truncmate_genotype.tsv")) as f:
        assert got == f.read()
