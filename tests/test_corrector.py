"""Tests for the k-mer spectrum read corrector (ref ReadCorrector.cpp)."""

import numpy as np

from alga_tpu.core import packing
from alga_tpu.corrector import SMALL, BIG, build_spectrum, correct_reads


def test_spectrum_counts(rng):
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 50))
    codes, lengths = packing.strings_to_codes([base, base, base])
    spec = build_spectrum(codes, lengths, np.ones(3, dtype=bool))
    # every (big, small) pair appears 3 times >= threshold -> kept
    num_windows = 50 - SMALL - BIG + 1
    assert sum(len(v) for v in spec.values()) == num_windows


def test_spectrum_prunes_singletons(rng):
    a = "".join("ACGT"[i] for i in rng.integers(0, 4, 50))
    b = "".join("ACGT"[i] for i in rng.integers(0, 4, 50))
    codes, lengths = packing.strings_to_codes([a, a, b])
    spec = build_spectrum(codes, lengths, np.ones(3, dtype=bool))
    # b's windows are singletons -> pruned; only a's pairs kept
    num_windows = 50 - SMALL - BIG + 1
    assert sum(len(v) for v in spec.values()) == num_windows


def test_corrector_fixes_supported_snp(rng):
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    reads = [base] * 8
    bad = list(base)
    bad[20] = "ACGT"[("ACGT".index(base[20]) + 1) % 4]
    reads.append("".join(bad))
    codes, lengths = packing.strings_to_codes(reads)
    changed = correct_reads(codes, lengths, np.ones(len(reads), dtype=bool))
    assert changed >= 1
    want, _ = packing.strings_to_codes([base])
    assert (codes[8, :60] == want[0, :60]).all()


def test_corrector_no_change_on_clean_reads(rng):
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    reads = [base] * 6
    codes, lengths = packing.strings_to_codes(reads)
    before = codes.copy()
    changed = correct_reads(codes, lengths, np.ones(len(reads), dtype=bool))
    assert changed == 0
    np.testing.assert_array_equal(codes, before)


def test_pipeline_correct_reads_flag(rng):
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from simulate import random_genome, simulate_single
    from alga_tpu.config import AssemblyConfig
    from alga_tpu.pipeline import assemble
    genome = random_genome(rng, 3000)
    reads = simulate_single(genome, rng, read_len=100, coverage=25,
                            error_rate=0.005)
    res = assemble(AssemblyConfig(correct_reads=1), file1_seqs=reads)
    assert res.contigs  # assembles after correction
