"""Differential tests for the scale-out device GCPS (graph/device_scale.py)
against the host reference implementation (graph/prefsuf.py): identical
edge arrays (set AND row order), across block boundaries, masks, ring/soes
regimes, and forced capacity retries (VERDICT r3 items 1 and 7)."""

import numpy as np
import pytest

from alga_tpu.core import packing
from alga_tpu.graph import device_scale, prefsuf


def random_genome(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def simulate_reads(rng, genome, read_len, n_reads):
    comp = str.maketrans("ACGT", "TGCA")
    out = []
    for _ in range(n_reads):
        p = int(rng.integers(0, len(genome) - read_len + 1))
        r = genome[p : p + read_len]
        if rng.random() < 0.5:
            r = r.translate(comp)[::-1]
        out.append(r)
    return out


def _both(seqs, ell_min, cap, rsoe, soes=3, af=None, at=None, **kw):
    packed, lengths = packing.pack_strings(seqs)
    n = len(seqs)
    g_host = prefsuf.build_gcps_graph(packed, lengths, n, ell_min, cap,
                                      rsoe, soes, align_from=af,
                                      align_to=at)
    g_dev = device_scale.gcps_graph_device_scale(
        packed, lengths, n, ell_min, cap, rsoe, soes,
        align_from=af, align_to=at, **kw)
    return g_host, g_dev


def _assert_equal(g_host, g_dev):
    """Identical edge arrays after the canonical (src, dst) resort the
    pipeline applies right after construction (retain_min_offset): the
    host native engine emits (dst, src) order, the device paths (src,
    dst) — row order is canonicalized one call later either way."""
    assert g_dev.n == g_host.n
    gh = g_host.retain_min_offset()
    gd = g_dev.retain_min_offset()
    assert np.array_equal(gd.src, gh.src)
    assert np.array_equal(gd.dst, gh.dst)
    assert np.array_equal(gd.offset, gh.offset)
    # and the pre-resort multisets match exactly
    def tri(g):
        return sorted(zip(g.src.tolist(), g.dst.tolist(),
                          g.offset.tolist()))
    assert tri(g_dev) == tri(g_host)


def test_scale_matches_host_basic(rng):
    genome = random_genome(rng, 2000)
    seqs = simulate_reads(rng, genome, 60, 300)
    g_host, g_dev = _both(seqs, 20, 500, 40)
    assert g_host.num_edges > 0
    _assert_equal(g_host, g_dev)


def test_scale_matches_host_multiblock(rng):
    """Force several src blocks (block_elems tiny) incl. a padded tail."""
    genome = random_genome(rng, 1500)
    seqs = simulate_reads(rng, genome, 50, 700)   # 700 reads, BS=2^14 min
    nw = 50 - 18 + 1
    g_host, g_dev = _both(seqs, 18, 500, 33, block_elems=256 * nw)
    # block_elems small but BS floors at 2^14 > 700: exercise the pad path
    _assert_equal(g_host, g_dev)


def test_scale_matches_host_varlen_and_masks(rng):
    genome = random_genome(rng, 1200)
    rl = rng.integers(35, 90, size=400)
    seqs = []
    for L in rl:
        p = int(rng.integers(0, len(genome) - int(L)))
        seqs.append(genome[p : p + int(L)])
    af = rng.random(len(seqs)) < 0.8
    at = rng.random(len(seqs)) < 0.8
    g_host, g_dev = _both(seqs, 15, 500, 30, af=af, at=at)
    assert g_host.num_edges > 0
    _assert_equal(g_host, g_dev)


def test_scale_ring_regime(rng):
    """rsoe in the middle of the ell range so both regimes + the soes ring
    are live, including >soes matches per src (repeat-rich genome)."""
    core = random_genome(rng, 80)
    genome = (random_genome(rng, 150) + core + random_genome(rng, 100)
              + core + random_genome(rng, 120) + core
              + random_genome(rng, 150))
    seqs = [genome[p : p + 45] for p in range(0, len(genome) - 45, 3)]
    g_host, g_dev = _both(seqs, 12, 500, 30, soes=2)
    assert g_host.num_edges > 0
    _assert_equal(g_host, g_dev)


def test_scale_domination_pruning(rng):
    """Perfect tiling chain => transitive edges that domination removes."""
    genome = random_genome(rng, 900)
    seqs = [genome[p : p + 60] for p in range(0, len(genome) - 60, 10)]
    g_host, g_dev = _both(seqs, 20, 500, 25)
    _assert_equal(g_host, g_dev)
    # sanity: domination actually pruned something vs the raw match set
    m = prefsuf.find_exact_overlaps(*packing.pack_strings(seqs), 20, 500)
    assert g_host.num_edges < len(m.src)


def test_scale_capacity_retry(rng, monkeypatch):
    """Seed absurdly small capacity hints and assert the retry loop fires
    (retry counter > 0) while the result stays identical."""
    from alga_tpu.utils import timers

    genome = random_genome(rng, 1500)
    seqs = simulate_reads(rng, genome, 55, 500)
    packed, lengths = packing.pack_strings(seqs)
    n = len(seqs)

    g_host = prefsuf.build_gcps_graph(packed, lengths, n, 18, 500, 35)

    # force tiny starting targets for every capacity family
    class TinyHints(dict):
        def get(self, key, default=None):
            return (1, 1, 1, 1)

    monkeypatch.setattr(device_scale, "_save_hints", lambda: None)
    monkeypatch.setattr(device_scale, "_hints", TinyHints())
    timers.reset_counters()
    g_dev = device_scale.gcps_graph_device_scale(
        packed, lengths, n, 18, 500, 35, 3, cap_quantum=64)
    _assert_equal(g_host, g_dev)
    assert timers.counters_report().get("gcps_scale_retries", 0) > 0


def test_scale_empty_and_degenerate(rng):
    packed, lengths = packing.pack_strings(["ACGTACGTAA"])
    g = device_scale.gcps_graph_device_scale(packed, lengths, 1, 20, 500,
                                             30, 3)
    assert g.num_edges == 0
    g2 = device_scale.gcps_graph_device_scale(packed, lengths, 1, 4, 500,
                                              6, 3)
    assert g2.num_edges == 0  # single read, self-match excluded


def _over_cap_fixture(rng, cap=64):
    """Reads in (cap, 1.25*cap] PLUS an adversarial trio where the
    domination compare diverges only past word words_for(cap - rsoe):
    A and B agree on the first 44 bases of the compare window, diverge at
    base 50 < offB=60, and both overlap D's prefix — the old truncated W3
    wrongly prunes A→D while the host oracle keeps it."""
    def rs(n):
        return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))
    D = rs(70)
    common = rs(44)
    tail_a = rs(16)
    tb = list(tail_a)
    tb[6] = "ACGT"[("ACGT".index(tail_a[6]) + 1) % 4]   # mismatch @ base 50
    A = common + tail_a + D[:18]                        # offA = 60, ellA=18
    B = common + "".join(tb) + D[:20]                   # offB = 60, ellB=20
    seqs = [A, B, D]
    for L in rng.integers(cap + 1, cap + cap // 4 + 1, size=200):
        seqs.append(rs(int(L)))
    return seqs


def test_scale_long_reads_over_cap(rng):
    """ADVICE r4 (medium): reads with max_len in (cap, 1.25*cap] must get
    the same domination compare width as the host oracle (W_verify =
    words_for(min(max_len, cap))); the old W3 truncated at
    min(max_len, cap) - rsoe and wrongly pruned edges."""
    cap = 64
    seqs = _over_cap_fixture(rng, cap)
    # small rsoe so remover offsets reach well past cap - rsoe
    g_host, g_dev = _both(seqs, 16, cap, 20)
    tri = set(zip(g_host.src.tolist(), g_host.dst.tolist(),
                  g_host.offset.tolist()))
    assert (0, 2, 60) in tri        # the edge the old W3 wrongly pruned
    _assert_equal(g_host, g_dev)


def test_join_long_reads_over_cap(rng):
    """Same differential for the fused small path (device_join.py)."""
    from alga_tpu.graph import device_join
    cap = 64
    seqs = _over_cap_fixture(rng, cap)
    packed, lengths = packing.pack_strings(seqs)
    n = len(seqs)
    g_host = prefsuf.build_gcps_graph(packed, lengths, n, 16, cap, 20, 3)
    g_dev = device_join.gcps_graph_device(packed, lengths, n, 16, cap, 20, 3)
    tri = set(zip(g_host.src.tolist(), g_host.dst.tolist(),
                  g_host.offset.tolist()))
    assert (0, 2, 60) in tri
    _assert_equal(g_host, g_dev)
