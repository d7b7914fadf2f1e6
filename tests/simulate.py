"""Tiny read simulator for end-to-end tests (PhiX-style configs)."""

from __future__ import annotations

import numpy as np

_COMP = str.maketrans("ACGT", "TGCA")


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def random_genome(rng, n: int) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def mutate(s: str, rng, error_rate: float) -> str:
    if error_rate <= 0:
        return s
    arr = list(s)
    for i in range(len(arr)):
        if rng.random() < error_rate:
            arr[i] = "ACGT"[int(rng.integers(0, 4))]
    return "".join(arr)


def simulate_single(genome: str, rng, read_len: int = 100, coverage: float = 20.0,
                    error_rate: float = 0.0) -> list[str]:
    n_reads = int(len(genome) * coverage / read_len)
    reads = []
    for _ in range(n_reads):
        p = int(rng.integers(0, len(genome) - read_len + 1))
        r = genome[p : p + read_len]
        if rng.random() < 0.5:
            r = revcomp(r)
        reads.append(mutate(r, rng, error_rate))
    return reads


def simulate_paired(genome: str, rng, read_len: int = 100, insert: int = 300,
                    coverage: float = 20.0, error_rate: float = 0.0):
    n_frags = int(len(genome) * coverage / (2 * read_len))
    r1, r2 = [], []
    for _ in range(n_frags):
        p = int(rng.integers(0, len(genome) - insert + 1))
        frag = genome[p : p + insert]
        a = frag[:read_len]
        b = revcomp(frag[-read_len:])
        if rng.random() < 0.5:
            a, b = revcomp(b), revcomp(a)
        r1.append(mutate(a, rng, error_rate))
        r2.append(mutate(b, rng, error_rate))
    return r1, r2


def genome_fraction(contigs: list[str], genome: str) -> float:
    """Fraction of genome positions covered by exact contig alignments
    (contigs must be exact substrings of genome or its revcomp — valid for
    error-free simulations)."""
    covered = np.zeros(len(genome), dtype=bool)
    rc = revcomp(genome)
    for c in contigs:
        for target, flip in ((genome, False), (rc, True)):
            start = target.find(c)
            while start != -1:
                if flip:
                    covered[len(genome) - start - len(c) : len(genome) - start] = True
                else:
                    covered[start : start + len(c)] = True
                start = target.find(c, start + 1)
    return float(covered.mean())


def all_contigs_align(contigs: list[str], genome: str) -> bool:
    rc = revcomp(genome)
    return all((c in genome) or (c in rc) for c in contigs)
