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


def test_native_matches_python(rng):
    """Differential: the native multithreaded fix-up (alga_correct_pass)
    must mutate codes identically to the pure-Python oracle."""
    from alga_tpu import native
    from alga_tpu.corrector import correct_reads_py
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")

    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    reads = [genome[i: i + 80] for i in range(0, 320, 4)] * 3
    # sprinkle errors
    noisy = []
    for j, r in enumerate(reads):
        r = list(r)
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, len(r)))
            r[p] = "ACGT"[int(rng.integers(0, 4))]
        noisy.append("".join(r))
    codes_a, lengths = packing.strings_to_codes(noisy)
    codes_b = codes_a.copy()
    valid = np.ones(len(noisy), dtype=bool)
    ca = correct_reads(codes_a, lengths, valid)       # native path
    cb = correct_reads_py(codes_b, lengths, valid)    # oracle
    assert ca == cb
    assert (codes_a == codes_b).all()


def test_corrected_fasta_dump(tmp_path, rng):
    """--correct_reads=2 writes the *_algacorrect FASTA artifact
    (ref Global.cpp:78-119, main.cpp:122-127)."""
    from alga_tpu.core.seqbatch import SeqBatch
    from alga_tpu.io import output as out_mod
    from alga_tpu.io.fastx import build_read_batch

    reads = ["".join("ACGT"[i] for i in rng.integers(0, 4, 40))
             for _ in range(6)]
    batch = build_read_batch(reads, trim_left=0, trim_right=0)
    prefix = str(tmp_path / "t_algacorrect")
    out_mod.write_corrected_fasta(batch, paired=False, prefix=prefix)
    txt = (tmp_path / "t_algacorrect_1.fasta").read_text().splitlines()
    # slots == 1 mod 4 land in _1 (the reference's always-on mate split,
    # Params.cpp:693), revcomps (even slots) skipped
    assert txt[0] == ">1"
    want_ids = [i for i in range(2 * len(reads)) if i % 4 == 1]
    assert len(txt) == 2 * len(want_ids)
    for hdr, seq in zip(txt[::2], txt[1::2]):
        i = int(hdr[1:])
        assert i % 4 == 1
        if batch.valid[i]:
            assert seq == reads[i // 2]
        else:
            assert seq == "N" * 100
    # _2 exists too (reference writes both even for unpaired input)
    assert (tmp_path / "t_algacorrect_2.fasta").exists()


def test_correct_reads_batch_matches_unchunked(rng):
    """Chunked packed-store correction == whole-matrix correction."""
    from alga_tpu.core.seqbatch import SeqBatch
    from alga_tpu.core import packing
    from alga_tpu import corrector

    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    reads = []
    for _ in range(600):
        p = int(rng.integers(0, len(genome) - 80))
        r = list(genome[p : p + 80])
        if rng.random() < 0.5:          # one error per ~2 reads
            q = int(rng.integers(5, 75))
            r[q] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(r))
    b1 = SeqBatch.from_strings(reads)
    b2 = SeqBatch.from_strings(reads)

    codes = b1.codes()
    c1 = corrector.correct_reads(codes, b1.lengths, b1.valid)
    b1.packed = packing.codes_to_packed(codes, b1.lengths, b1.width_words)

    c2 = corrector.correct_reads_batch(b2, chunk_rows=97)  # ragged chunks
    assert c1 == c2
    assert np.array_equal(b1.packed, b2.packed)
