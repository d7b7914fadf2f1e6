"""Differential tests for the 2-bit codec (pattern: ref Bitset::test,
src/DataStructures/Bitset.cpp:652-856 — randomized against an oracle)."""

import numpy as np
import pytest

from alga_tpu.core import packing
from alga_tpu.core.seqbatch import SeqBatch


def revcomp_str(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def test_roundtrip_random(rng):
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(1, 200)))
            for _ in range(50)]
    packed, lengths = packing.pack_strings(seqs)
    assert packed.dtype == np.uint32
    out = packing.unpack_to_strings(packed, lengths)
    assert out == seqs


def test_bit_layout_matches_reference():
    # ref Read.cpp:40-68: base i occupies bits (2i, 2i+1), little-endian,
    # C sets bit 2i, G sets bit 2i+1, T sets both.
    packed, _ = packing.pack_strings(["ACGT"])
    # A=00 C=01 G=10 T=11 -> bits: 00 01 10 11 packed little-endian
    expected = 0b11_10_01_00
    assert int(packed[0, 0]) == expected


def test_padding_is_zero(rng):
    packed, lengths = packing.pack_strings(["TTT", "TTTTTTTTTTTTTTTTT"])
    # row 0: only 3 bases set; rest of word and later words must be zero
    assert int(packed[0, 0]) == 0b111111
    assert np.all(packed[0, 1:] == 0)


def test_base_at(rng):
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=77)) for _ in range(10)]
    packed, lengths = packing.pack_strings(seqs)
    rows = rng.integers(0, 10, size=100)
    poss = rng.integers(0, 77, size=100)
    got = packing.base_at(packed, rows, poss)
    want = np.array(["ACGT".index(seqs[r][p]) for r, p in zip(rows, poss)], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


def test_revcomp_codes(rng):
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(1, 60)))
            for _ in range(30)]
    codes, lengths = packing.strings_to_codes(seqs)
    rc = packing.revcomp_codes(codes, lengths)
    batch = SeqBatch.from_codes(rc, lengths)
    assert batch.to_strings() == [revcomp_str(s) for s in seqs]


def test_seqbatch_id_arithmetic():
    b = SeqBatch.from_strings(["AC", "GT", "AC", "GT"])
    assert list(SeqBatch.revcomp_id(np.array([0, 1, 2, 3]))) == [1, 0, 3, 2]
    b.paired_offset = np.array([1, 1, 2, 2], dtype=np.int8)
    assert list(b.paired_id(np.array([0, 1, 2, 3]))) == [2, 3, 0, 1]


def test_compact():
    b = SeqBatch.from_strings(["AAAA", "CCCC", "GGGG", "TTTT"])
    b.invalidate([1, 2])
    nb, remap = b.compact()
    assert len(nb) == 2
    assert nb.to_strings() == ["AAAA", "TTTT"]
    assert list(remap) == [0, -1, -1, 1]
