"""Differential tests for device hash/bit kernels against numpy oracles
(pattern: ref Bitset::test randomized-vs-oracle)."""

import numpy as np

from alga_tpu.core import packing
from alga_tpu.ops import bitops, hashes


def _random_batch(rng, n, min_len=20, max_len=90):
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(min_len, max_len + 1)))
            for _ in range(n)]
    codes, lengths = packing.strings_to_codes(seqs)
    packed = packing.codes_to_packed(codes, lengths)
    return seqs, codes, packed, lengths


def test_window_keys_match_oracle(rng):
    seqs, codes, packed, lengths = _random_batch(rng, 20, 25, 60)
    k = 11
    P = int(lengths.max()) - k + 1
    k1, k2, valid = hashes.window_kmer_keys_u32(packed, lengths, k, P)
    keys = hashes.combine_keys(np.asarray(k1), np.asarray(k2))
    valid = np.asarray(valid)
    for i in range(len(seqs)):
        for p in range(P):
            expect_valid = p + k <= lengths[i]
            assert valid[i, p] == expect_valid
            if expect_valid:
                assert keys[i, p] == hashes.np_window_hash(codes[i], p, k), (i, p)


def test_window_keys_equal_iff_windows_equal(rng):
    # same window content -> same key; sampled different windows -> different
    seqs = ["ACGTACGTACGT", "TTACGTACGAAA"]
    codes, lengths = packing.strings_to_codes(seqs)
    packed = packing.codes_to_packed(codes, lengths)
    k1, k2, _ = hashes.window_kmer_keys_u32(packed, lengths, 6, 7)
    keys = hashes.combine_keys(np.asarray(k1), np.asarray(k2))
    # read0 windows at p=0 and p=4 are both "ACGTAC"
    assert keys[0, 0] == keys[0, 4]
    # read1 window at p=2 is "ACGTAC" too
    assert keys[1, 2] == keys[0, 0]
    assert keys[0, 0] != keys[0, 1]


def test_prefix_keys(rng):
    seqs, codes, packed, lengths = _random_batch(rng, 10, 30, 50)
    k = 21
    P = int(lengths.max()) - k + 1
    keys, pv = hashes.window_keys(packed, codes, lengths, k, P)
    for i in range(10):
        assert pv[i, 0] == (lengths[i] >= k)
        assert keys[i, 0] == hashes.np_window_hash(codes[i], 0, k)


def test_np_window_keys_match_device(rng):
    seqs, codes, packed, lengths = _random_batch(rng, 15, 25, 60)
    k = 13
    P = int(lengths.max()) - k + 1
    k1, k2, v1 = hashes.window_kmer_keys_u32(packed, lengths, k, P)
    n1, n2, v2 = hashes.np_window_kmer_keys(codes, lengths, k, P)
    np.testing.assert_array_equal(np.asarray(k1), n1)
    np.testing.assert_array_equal(np.asarray(k2), n2)
    np.testing.assert_array_equal(np.asarray(v1), v2)


def test_substr_equal_random(rng):
    seqs, codes, packed, lengths = _random_batch(rng, 30, 40, 80)
    n = len(seqs)
    M = 300
    a_ids = rng.integers(0, n, M)
    b_ids = rng.integers(0, n, M)
    a_starts = np.array([rng.integers(0, lengths[a]) for a in a_ids])
    match_lens = np.array([
        rng.integers(1, min(lengths[a] - s, lengths[b]) + 1)
        if min(lengths[a] - s, lengths[b]) >= 1 else 0
        for a, s, b in zip(a_ids, a_starts, b_ids)
    ])
    W = packing.words_for(int(match_lens.max()))
    got = np.asarray(bitops.substr_equal(packed, a_ids, a_starts, b_ids, match_lens, W))
    want = np.array([
        bitops.np_substr_equal(codes, lengths, a, s, b, m)
        for a, s, b, m in zip(a_ids, a_starts, b_ids, match_lens)
    ])
    np.testing.assert_array_equal(got, want)


def test_substr_equal_true_overlaps(rng):
    # construct genuine suffix-prefix overlaps and confirm they verify
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, size=200))
    a, b = g[:120], g[70:190]   # overlap of 50 at a_start=70
    codes, lengths = packing.strings_to_codes([a, b])
    packed = packing.codes_to_packed(codes, lengths)
    got = np.asarray(bitops.substr_equal(
        packed, np.array([0]), np.array([70]), np.array([1]), np.array([50]), 4))
    assert got[0]
    # one mismatch inside the region must fail
    b_bad = b[:10] + ("A" if b[10] != "A" else "C") + b[11:]
    codes2, l2 = packing.strings_to_codes([a, b_bad])
    p2 = packing.codes_to_packed(codes2, l2)
    got2 = np.asarray(bitops.substr_equal(
        p2, np.array([0]), np.array([70]), np.array([1]), np.array([50]), 4))
    assert not got2[0]


def test_mismatch_count_random(rng):
    seqs, codes, packed, lengths = _random_batch(rng, 20, 40, 80)
    M = 200
    n = len(seqs)
    a_ids = rng.integers(0, n, M)
    b_ids = rng.integers(0, n, M)
    a_starts = np.array([rng.integers(0, lengths[a]) for a in a_ids])
    match_lens = np.array([
        max(0, min(lengths[a] - s, lengths[b]))
        for a, s, b in zip(a_ids, a_starts, b_ids)
    ])
    W = packing.words_for(max(1, int(match_lens.max())))
    got = np.asarray(bitops.overlap_mismatch_count(
        packed, a_ids, a_starts, b_ids, match_lens, W))
    want = np.array([
        bitops.np_mismatch_count(codes, a, s, b, m)
        for a, s, b, m in zip(a_ids, a_starts, b_ids, match_lens)
    ])
    np.testing.assert_array_equal(got, want)
