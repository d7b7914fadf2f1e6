"""End-to-end assembly tests on simulated genomes (the reference has no
tests at all — SURVEY.md §4; this is our golden-contig harness)."""

import numpy as np
import pytest

from alga_tpu.config import AssemblyConfig
from alga_tpu.pipeline import assemble
from tests.simulate import (all_contigs_align, genome_fraction, random_genome,
                            simulate_single, simulate_paired)


def test_e2e_single_end_error_free():
    rng = np.random.default_rng(42)
    genome = random_genome(rng, 4000)
    reads = simulate_single(genome, rng, read_len=100, coverage=25)
    res = assemble(AssemblyConfig(), file1_seqs=reads)
    seqs = [c.seq for c in res.contigs if c.seq != "CCCC"]
    assert seqs, "no contigs produced"
    assert all_contigs_align(seqs, genome), "contig does not align to genome"
    frac = genome_fraction(seqs, genome)
    assert frac > 0.90, f"genome fraction {frac}"
    # a repeat-free genome at 25x should assemble nearly completely
    assert max(len(s) for s in seqs) > 2000


def test_e2e_paired_end_error_free():
    rng = np.random.default_rng(7)
    genome = random_genome(rng, 4000)
    r1, r2 = simulate_paired(genome, rng, read_len=100, insert=300, coverage=25)
    res = assemble(AssemblyConfig(file2="x"), file1_seqs=r1, file2_seqs=r2)
    seqs = [c.seq for c in res.contigs if c.seq != "CCCC"]
    assert seqs
    assert all_contigs_align(seqs, genome)
    frac = genome_fraction(seqs, genome)
    assert frac > 0.90, f"genome fraction {frac}"


def test_e2e_genome_with_repeat():
    rng = np.random.default_rng(3)
    a = random_genome(rng, 1200)
    rep = random_genome(rng, 400)
    b = random_genome(rng, 1200)
    c = random_genome(rng, 1200)
    genome = a + rep + b + rep + c
    reads = simulate_single(genome, rng, read_len=100, coverage=30)
    res = assemble(AssemblyConfig(), file1_seqs=reads)
    seqs = [s.seq for s in res.contigs if s.seq != "CCCC"]
    assert seqs
    # contigs must still be exact genome substrings (no chimeras)
    assert all_contigs_align(seqs, genome)
    assert genome_fraction(seqs, genome) > 0.75


def test_e2e_with_errors_supplement():
    rng = np.random.default_rng(5)
    genome = random_genome(rng, 3000)
    reads = simulate_single(genome, rng, read_len=100, coverage=30,
                            error_rate=0.01)
    res = assemble(AssemblyConfig(error_rate=0.02), file1_seqs=reads)
    assert res.cfg.use_supplement
    seqs = [c.seq for c in res.contigs if c.seq != "CCCC"]
    assert seqs, "no contigs with error reads"
    # with errors contigs are not exact substrings; check coarse coverage
    # via shared 31-mers with the genome
    k = 31
    gkmers = {genome[i:i+k] for i in range(len(genome) - k + 1)}
    from tests.simulate import revcomp
    rc = revcomp(genome)
    gkmers |= {rc[i:i+k] for i in range(len(rc) - k + 1)}
    hits = total = 0
    for s in seqs:
        for i in range(0, len(s) - k + 1, 7):
            total += 1
            hits += s[i:i+k] in gkmers
    assert total > 0 and hits / total > 0.9, f"kmer identity {hits}/{total}"
