"""Differential tests: native C++ host engine vs the Python oracles."""

import numpy as np
import pytest

from alga_tpu import native as native_mod
from alga_tpu.contig import consensus as consensus_mod
from alga_tpu.contig import walk as walk_mod
from alga_tpu.core.seqbatch import SeqBatch
from alga_tpu.graph import simplify
from alga_tpu.graph.contract import ContractedGraph, simplify_contract
from alga_tpu.graph.overlap_graph import OverlapGraph

pytestmark = pytest.mark.skipif(not native_mod.available(),
                                reason="native lib not built")


class _Batch:
    def __init__(self, n, lengths=None, avg=100.0):
        self.valid = np.ones(n, dtype=bool)
        self.lengths = np.full(n, 100, dtype=np.int32) if lengths is None else lengths
        self.paired_offset = np.zeros(n, dtype=np.int8)

    def avg_read_length(self):
        v = self.valid
        return float(self.lengths[v].mean()) if v.any() else 0.0


def random_graph(rng, n, e, wmax=40):
    seen = {}
    while len(seen) < e:
        a, b = rng.integers(0, n, 2)
        if a == b:
            continue
        seen.setdefault((int(a), int(b)), int(rng.integers(1, wmax)))
    return [(a, b, w) for (a, b), w in seen.items()]


@pytest.mark.parametrize("seed", range(20))
def test_native_simplify_matches_python(seed):
    rng = np.random.default_rng(seed)
    n = 80
    edges = random_graph(rng, n, 200, wmax=25)
    g = OverlapGraph.from_edges(n, edges)

    bp = _Batch(n)
    gp = simplify.simplify_graph_old(g.copy(), bp, 250, 250)

    bn = _Batch(n)
    gn = native_mod.simplify_graph_old(g.copy(), bn, 250, 250)

    # ORDER-exact comparison: both twins exit in canonical (src, offset,
    # dst) order; divergence here would leak into contraction/walk/contig
    # order downstream
    np.testing.assert_array_equal(gn.src, gp.src)
    np.testing.assert_array_equal(gn.dst, gp.dst)
    np.testing.assert_array_equal(gn.offset, gp.offset)
    np.testing.assert_array_equal(bn.valid, bp.valid)


@pytest.mark.parametrize("seed", range(5))
def test_native_contract_walk_matches_python(seed):
    rng = np.random.default_rng(100 + seed)
    n = 60
    # chain-heavy graph to exercise contraction
    edges = []
    chain = list(range(0, 40))
    for a, b in zip(chain, chain[1:]):
        edges.append((a, b, int(rng.integers(3, 12))))
    edges += random_graph(rng, n, 30, wmax=15)
    # dedup (keep first weight)
    seen = {}
    for a, b, w in edges:
        if a != b:
            seen.setdefault((a, b), w)
    edges = [(a, b, w) for (a, b), w in seen.items()]
    g = OverlapGraph.from_edges(n, edges)

    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, 100)) for _ in range(n)]
    batch = SeqBatch.from_strings(seqs)

    # python path
    cg = ContractedGraph(g.copy())
    for _ in range(2):
        cg.retain_min_offset_inplace()
        simplify_contract(cg, 250)
    cg.retain_min_offset_inplace()
    pc = walk_mod.get_all_contigs(cg, batch, min_output_length=50)
    p_lists = [c.reads for c in pc]

    # native path
    n_lists = native_mod.contract_and_walk(
        g.copy(), batch, mopp=250, min_output_length=50, paired=False,
        min_paired_connections=5, max_insert_size=1000)

    assert [[(int(r), int(o)) for r, o in lst] for lst in n_lists] == \
           [[(int(r), int(o)) for r, o in lst] for lst in p_lists]


def _forked_chain_graph(rng, n, nchains=200):
    """Chain-heavy graph with forks, short parallel paths and dangling tips
    — enough seeds (>64 forks, >2048 nodes) to cross the native engine's
    parallel-execution thresholds."""
    edges = {}

    def add(a, b, w):
        if a != b:
            edges.setdefault((int(a), int(b)), int(w))

    nodes = np.arange(n)
    rng.shuffle(nodes)
    pos = 0
    for _ in range(nchains):
        L = int(rng.integers(4, 24))
        chain = nodes[pos : pos + L]
        pos += L
        if len(chain) < 3 or pos >= n:
            break
        for a, b in zip(chain, chain[1:]):
            add(a, b, rng.integers(3, 15))
        # fork with a dangling tip + a parallel path (bubble)
        if rng.random() < 0.7 and len(chain) >= 5:
            mid = chain[len(chain) // 2]
            tip = nodes[(pos + int(rng.integers(0, n - pos - 1))) % n]
            add(mid, tip, rng.integers(3, 15))
            add(chain[0], chain[2], rng.integers(5, 30))
    # sparse noise (real overlap graphs are chain-like; a dense random
    # graph would be a small world whose bounded-BFS neighborhoods cover
    # everything and time out both execution modes)
    for a, b in rng.integers(0, n, (n // 4, 2)):
        add(a, b, rng.integers(10, 40))
    return [(a, b, w) for (a, b), w in edges.items()]


@pytest.mark.parametrize("seed", range(2))
def test_native_simplify_parallel_matches_sequential(seed, monkeypatch):
    """Threaded execution (waves / parallel collection) must be
    bit-identical to forced-sequential execution at the SAME `threads`
    value (the value also feeds the WorkloadManager coverage quirks, so
    only the execution schedule may differ)."""
    rng = np.random.default_rng(1000 + seed)
    n = 30000
    edges = _forked_chain_graph(rng, n)
    g = OverlapGraph.from_edges(n, edges)

    monkeypatch.setenv("ALGA_NATIVE_SEQ", "1")
    bs = _Batch(n)
    gs = native_mod.simplify_graph_old(g.copy(), bs, 60, 60, threads=8)
    monkeypatch.delenv("ALGA_NATIVE_SEQ")
    bp = _Batch(n)
    gp = native_mod.simplify_graph_old(g.copy(), bp, 60, 60, threads=8)

    np.testing.assert_array_equal(gs.src, gp.src)
    np.testing.assert_array_equal(gs.dst, gp.dst)
    np.testing.assert_array_equal(gs.offset, gp.offset)
    np.testing.assert_array_equal(bs.valid, bp.valid)


def test_native_walk_parallel_matches_sequential(monkeypatch):
    rng = np.random.default_rng(77)
    n = 12000
    edges = _forked_chain_graph(rng, n, nchains=400)
    g = OverlapGraph.from_edges(n, edges)
    batch = _Batch(n)
    batch.lengths = np.full(n, 100, dtype=np.int32)

    monkeypatch.setenv("ALGA_NATIVE_SEQ", "1")
    seq_lists = native_mod.contract_and_walk(
        g.copy(), batch, mopp=250, min_output_length=150, paired=False,
        min_paired_connections=5, max_insert_size=1000, threads=8)
    monkeypatch.delenv("ALGA_NATIVE_SEQ")
    par_lists = native_mod.contract_and_walk(
        g.copy(), batch, mopp=250, min_output_length=150, paired=False,
        min_paired_connections=5, max_insert_size=1000, threads=8)
    assert seq_lists == par_lists


def test_native_full_pipeline_equivalence():
    """Assemble the same dataset with native on/off; outputs must be equal."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from simulate import random_genome, simulate_single
    from alga_tpu.config import AssemblyConfig
    from alga_tpu.pipeline import assemble

    rng = np.random.default_rng(9)
    genome = random_genome(rng, 20000)
    reads = simulate_single(genome, rng, read_len=100, coverage=20)
    r_native = assemble(AssemblyConfig(use_native=True), file1_seqs=reads)
    r_python = assemble(AssemblyConfig(use_native=False), file1_seqs=reads)
    assert [c.seq for c in r_native.contigs] == [c.seq for c in r_python.contigs]


def test_native_consensus_matches_python(rng):
    """Native consensus vs the pure-python per-contig oracle."""
    from alga_tpu.contig.consensus import correct_snips
    from alga_tpu.contig.walk import Contig

    n = 40
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, 60)) for _ in range(n)]
    batch = SeqBatch.from_strings(seqs)
    codes = batch.codes()
    contigs = []
    for ci in range(6):
        k = int(rng.integers(3, 10))
        rids = rng.integers(0, n, k)
        offs = [-1] + [int(rng.integers(0, 20)) for _ in range(k - 1)]
        contigs.append(Contig(ci, "", list(zip(rids.tolist(), offs))))
    import copy
    ref = [copy.deepcopy(c) for c in contigs]
    for c in ref:
        correct_snips(c, batch, codes)
    native_mod.consensus_native(contigs, batch, codes, 3)
    assert [c.seq for c in contigs] == [c.seq for c in ref]
    # packed-store variant (memory diet): no codes matrix at all
    packed_contigs = [copy.deepcopy(c) for c in ref]
    for c in packed_contigs:
        c.seq = ""
    native_mod.consensus_native(packed_contigs, batch, None, 3, threads=4)
    assert [c.seq for c in packed_contigs] == [c.seq for c in ref]


def test_native_preprocess_pack_matches_python(rng):
    """The fused C++ preprocess+pack must reproduce the Python twin exactly
    (trim, N drop, STR filter, revcomp interleave, packed words) for both
    unpaired and paired layouts, mixed lengths, RNA, and odd trims."""
    from alga_tpu import native
    from alga_tpu.core import packing
    from alga_tpu.io.fastx import _build_read_batch_native, preprocess_reads
    from alga_tpu.io import fastx
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")

    def python_batch(f1, f2=None, **kw):
        # force the pure-Python path by going through the module internals
        c1, l1, d1 = preprocess_reads(f1, **kw)
        out = fastx.build_read_batch.__wrapped__ if hasattr(
            fastx.build_read_batch, "__wrapped__") else None
        # rebuild manually, mirroring build_read_batch's python tail
        if f2:
            c2, l2, d2 = preprocess_reads(f2, **kw)
            lpad = max(c1.shape[1], c2.shape[1])
            c1p = np.pad(c1, ((0, 0), (0, lpad - c1.shape[1])))
            c2p = np.pad(c2, ((0, 0), (0, lpad - c2.shape[1])))
            m = len(f1)
            codes = np.zeros((4 * m, lpad), dtype=np.uint8)
            lengths = np.zeros(4 * m, dtype=np.int64)
            dropped = np.zeros(4 * m, dtype=bool)
            codes[1::4], codes[3::4] = c1p, c2p
            codes[0::4] = packing.revcomp_codes(c1p, l1)
            codes[2::4] = packing.revcomp_codes(c2p, l2)
            lengths[1::4] = l1; lengths[3::4] = l2
            lengths[0::4] = l1; lengths[2::4] = l2
            dropped[1::4] = d1; dropped[3::4] = d2
            dropped[0::4] = d1; dropped[2::4] = d2
        else:
            m = len(f1)
            lpad = c1.shape[1]
            codes = np.zeros((2 * m, lpad), dtype=np.uint8)
            lengths = np.zeros(2 * m, dtype=np.int64)
            dropped = np.zeros(2 * m, dtype=bool)
            codes[1::2] = c1
            codes[0::2] = packing.revcomp_codes(c1, l1)
            lengths[1::2] = l1; lengths[0::2] = l1
            dropped[1::2] = d1; dropped[0::2] = d1
        from alga_tpu.core.seqbatch import SeqBatch
        b = SeqBatch.from_codes(codes, lengths)
        b.valid = ~dropped
        return b

    def mk(n, lo, hi, with_n=0.0, periodic=0.0):
        out = []
        for _ in range(n):
            L = int(rng.integers(lo, hi + 1))
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            u = rng.random()
            if u < with_n:
                i = int(rng.integers(0, L))
                s = s[:i] + "N" + s[i + 1:]
            elif u < with_n + periodic:
                s = ("ACG" * (L // 3 + 1))[:L]
            out.append(s)
        return out

    cases = [
        dict(f1=mk(200, 30, 120, 0.1, 0.1), f2=None,
             kw=dict(trim_left=3, trim_right=3)),
        dict(f1=mk(100, 15, 60, 0.2, 0.05), f2=mk(100, 15, 60, 0.2, 0.05),
             kw=dict(trim_left=2, trim_right=5)),
        dict(f1=mk(50, 21, 40), f2=None, kw=dict(trim_left=0, trim_right=0)),
    ]
    for case in cases:
        kw = dict(case["kw"], str_period=20)
        got = _build_read_batch_native(case["f1"], case["f2"], **kw)
        want = python_batch(case["f1"], case["f2"], **kw)
        assert np.array_equal(got.lengths, want.lengths)
        assert np.array_equal(got.valid, want.valid)
        # packed widths may differ; compare the common prefix + zero tails
        w = min(got.packed.shape[1], want.packed.shape[1])
        assert np.array_equal(got.packed[:, :w], want.packed[:, :w])
        assert not got.packed[:, w:].any() and not want.packed[:, w:].any()
