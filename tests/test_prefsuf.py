"""Differential tests: vectorized GCPS graph construction vs the sequential
oracle simulating the reference's canonical-order execution."""

import numpy as np
import pytest

from alga_tpu.core import packing
from alga_tpu.graph import prefsuf
from tests.oracles import oracle_all_overlaps, oracle_gcps_edges


def reads_from_genome(genome, read_len, step):
    reads = []
    for p in range(0, len(genome) - read_len + 1, step):
        reads.append(genome[p : p + read_len])
    return reads


def random_genome(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def _find(seqs, ell_min, cap):
    packed, lengths = packing.pack_strings(seqs)
    m = prefsuf.find_exact_overlaps(packed, lengths, ell_min, cap)
    return set(zip(m.src.tolist(), m.dst.tolist(), m.ell.tolist()))


def test_find_exact_overlaps_simple_chain(rng):
    g = random_genome(rng, 120)
    seqs = [g[0:50], g[30:80], g[60:110]]
    got = _find(seqs, 10, 500)
    want = oracle_all_overlaps(seqs, 10, 500)
    assert got == want
    assert (0, 1, 20) in got and (1, 2, 20) in got


def test_find_exact_overlaps_random_reads(rng):
    # random genome with a repeat to create many-way overlaps
    core = random_genome(rng, 60)
    g = random_genome(rng, 80) + core + random_genome(rng, 70) + core + random_genome(rng, 80)
    seqs = reads_from_genome(g, 40, 6)
    got = _find(seqs, 12, 500)
    want = oracle_all_overlaps(seqs, 12, 500)
    assert got == want


def test_find_exact_overlaps_duplicate_and_contained(rng):
    g = random_genome(rng, 100)
    seqs = [g[0:60], g[0:60], g[20:60], g[10:70]]
    got = _find(seqs, 10, 500)
    want = oracle_all_overlaps(seqs, 10, 500)
    assert got == want
    # read2 is an exact suffix of read0 -> full-length containment match
    assert (0, 2, 40) in got


def test_find_exact_overlaps_cap(rng):
    g = random_genome(rng, 100)
    seqs = [g[0:80], g[10:90]]
    got = _find(seqs, 10, 30)
    want = oracle_all_overlaps(seqs, 10, 30)
    assert got == want


def _build(seqs, ell_min, cap, rsoe, soes=3):
    packed, lengths = packing.pack_strings(seqs)
    g = prefsuf.build_gcps_graph(packed, lengths, len(seqs), ell_min, cap, rsoe, soes)
    return g.edge_set()


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_gcps_graph_matches_oracle_random(seed):
    rng = np.random.default_rng(seed)
    core = random_genome(rng, 50)
    g = (random_genome(rng, 100) + core + random_genome(rng, 60)
         + core + random_genome(rng, 100))
    seqs = reads_from_genome(g, 45, 5)
    ell_min, cap, rsoe = 15, 500, 30
    got = _build(seqs, ell_min, cap, rsoe)
    want = oracle_gcps_edges(seqs, ell_min, cap, rsoe)
    assert got == want


def test_gcps_graph_dense_overlaps(rng):
    # step 1 -> every adjacent pair overlaps; exercises ring buffer heavily
    g = random_genome(rng, 90)
    seqs = reads_from_genome(g, 30, 1)
    ell_min, cap, rsoe = 8, 500, 20
    got = _build(seqs, ell_min, cap, rsoe)
    want = oracle_gcps_edges(seqs, ell_min, cap, rsoe)
    assert got == want


def test_gcps_graph_with_duplicates(rng):
    g = random_genome(rng, 150)
    seqs = reads_from_genome(g, 40, 10)
    seqs += [seqs[0], seqs[3]]  # exact duplicates
    ell_min, cap, rsoe = 12, 500, 25
    got = _build(seqs, ell_min, cap, rsoe)
    want = oracle_gcps_edges(seqs, ell_min, cap, rsoe)
    assert got == want


def test_gcps_graph_high_rsoe_all_regime1(rng):
    g = random_genome(rng, 120)
    seqs = reads_from_genome(g, 40, 8)
    # rsoe above max read length: everything stays in regime 1 ring
    got = _build(seqs, 10, 500, 1000)
    want = oracle_gcps_edges(seqs, 10, 500, 1000)
    assert got == want


def test_gcps_graph_low_rsoe_all_regime2(rng):
    g = random_genome(rng, 120)
    seqs = reads_from_genome(g, 40, 8)
    got = _build(seqs, 10, 500, 10)
    want = oracle_gcps_edges(seqs, 10, 500, 10)
    assert got == want


def test_gcps_chain_gives_simple_path(rng):
    # error-free tiling reads of a repeat-free genome must produce a graph
    # whose min-offset edges form the genome path
    g = random_genome(rng, 200)
    seqs = reads_from_genome(g, 50, 10)
    packed, lengths = packing.pack_strings(seqs)
    og = prefsuf.build_gcps_graph(packed, lengths, len(seqs), 20, 500, 35)
    og = og.retain_min_offset()
    # successive reads overlap by 40 -> offset 10 edges must exist
    for i in range(len(seqs) - 1):
        assert (i, i + 1, 10) in og.edge_set()


def test_device_join_matches_host(rng):
    from alga_tpu.graph.device_join import find_exact_overlaps_device
    core = random_genome(rng, 60)
    g = (random_genome(rng, 150) + core + random_genome(rng, 100)
         + core + random_genome(rng, 150))
    seqs = reads_from_genome(g, 45, 4)
    packed, lengths = packing.pack_strings(seqs)
    m1 = prefsuf.find_exact_overlaps(packed, lengths, 15, 500)
    m2 = find_exact_overlaps_device(packed, lengths, 15, 500)
    s1 = set(zip(m1.src.tolist(), m1.dst.tolist(), m1.ell.tolist()))
    s2 = set(zip(m2.src.tolist(), m2.dst.tolist(), m2.ell.tolist()))
    assert s1 == s2


def test_device_join_with_masks(rng):
    from alga_tpu.graph.device_join import find_exact_overlaps_device
    g = random_genome(rng, 300)
    seqs = reads_from_genome(g, 40, 5)
    packed, lengths = packing.pack_strings(seqs)
    n = len(seqs)
    af = rng.random(n) > 0.3
    at = rng.random(n) > 0.3
    m1 = prefsuf.find_exact_overlaps(packed, lengths, 12, 500, af, at)
    m2 = find_exact_overlaps_device(packed, lengths, 12, 500, af, at)
    s1 = set(zip(m1.src.tolist(), m1.dst.tolist(), m1.ell.tolist()))
    s2 = set(zip(m2.src.tolist(), m2.dst.tolist(), m2.ell.tolist()))
    assert s1 == s2


def test_gcps_graph_device_matches_fallbacks(rng):
    """The full device GCPS path (join + ring/dedup/domination on device)
    must produce the identical edge set and order as the Python fallback
    and the native engine, including repeat-heavy genomes where the ring
    buffer and domination pruning both fire."""
    from alga_tpu.graph.device_join import gcps_graph_device
    from alga_tpu import native as native_mod

    for trial in range(4):
        # repeat-rich genome: tandem duplications force regime-1/regime-2
        # interactions and dominated edges
        core = random_genome(rng, 120)
        g = core + core[:60] + random_genome(rng, 150) + core[40:100]
        seqs = reads_from_genome(g, 50, 3)
        packed, lengths = packing.pack_strings(seqs)
        n = len(seqs)
        ell_min = 14 + trial
        rsoe = 25 + 3 * trial
        m = prefsuf.find_exact_overlaps(packed, lengths, ell_min, 500)
        py = prefsuf.build_gcps_graph(packed, lengths, n, ell_min, 500,
                                      rsoe, soes=3, matches=m)
        dev = gcps_graph_device(packed, lengths, n, ell_min, 500, rsoe, 3)
        # edge order is canonicalized downstream (adjacency re-sorted per
        # node); compare canonical triples
        def canon(g):
            o = np.lexsort((g.offset, g.dst, g.src))
            return np.stack([g.src[o], g.dst[o], g.offset[o]])
        assert np.array_equal(canon(py), canon(dev))
        if native_mod.available():
            nat = native_mod.gcps_from_matches(n, m, packed, lengths,
                                               rsoe, 3)
            assert np.array_equal(canon(nat), canon(dev))


def test_gcps_graph_device_with_masks(rng):
    from alga_tpu.graph.device_join import gcps_graph_device
    g = random_genome(rng, 400)
    seqs = reads_from_genome(g, 40, 4)
    packed, lengths = packing.pack_strings(seqs)
    n = len(seqs)
    af = rng.random(n) > 0.25
    at = rng.random(n) > 0.25
    m = prefsuf.find_exact_overlaps(packed, lengths, 12, 500, af, at)
    py = prefsuf.build_gcps_graph(packed, lengths, n, 12, 500, 20, soes=3,
                                  matches=m, align_from=af, align_to=at)
    dev = gcps_graph_device(packed, lengths, n, 12, 500, 20, 3, af, at)
    def canon(g):
        o = np.lexsort((g.offset, g.dst, g.src))
        return np.stack([g.src[o], g.dst[o], g.offset[o]])
    assert np.array_equal(canon(py), canon(dev))


def test_fused_native_join_matches_numpy_chain():
    """The fused native join+verify (alga_gcps_join_verify) must produce
    the SAME matches in the SAME order as the numpy probe/expand/verify
    chain, including align_from/align_to masks."""
    from unittest import mock

    import alga_tpu.native as native
    from alga_tpu.io import fastx
    from tests.simulate import random_genome, simulate_paired

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    genome = random_genome(rng, 40_000)
    r1, r2 = simulate_paired(genome, rng, read_len=100, insert=300,
                             coverage=10.0)
    batch = fastx.build_read_batch(r1, r2, trim_left=3, trim_right=3)
    n = len(batch)
    af = batch.valid.copy()
    at = batch.valid.copy()
    af[rng.random(n) < 0.1] = False
    at[rng.random(n) < 0.1] = False

    m_nat = prefsuf.find_exact_overlaps(batch.packed, batch.lengths, 55, 500,
                                        af, at)
    with mock.patch.object(native, "available", lambda: False):
        m_np = prefsuf.find_exact_overlaps(batch.packed, batch.lengths, 55,
                                           500, af, at)
    np.testing.assert_array_equal(m_nat.src, m_np.src)
    np.testing.assert_array_equal(m_nat.dst, m_np.dst)
    np.testing.assert_array_equal(m_nat.ell, m_np.ell)
