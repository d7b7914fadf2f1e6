"""Tests for graph simplification passes vs sequential oracles and
hand-constructed cases."""

import numpy as np
import pytest

from alga_tpu.graph.contract import ContractedGraph, simplify_contract
from alga_tpu.graph.overlap_graph import OverlapGraph
from alga_tpu.graph import simplify
from tests.oracles import oracle_cut_triangles, oracle_dangling


def random_dag(rng, n, e, wmax=50):
    """Random forward DAG edges (src < dst) with random offsets, deduped."""
    edges = set()
    while len(edges) < e:
        a, b = sorted(rng.integers(0, n, 2))
        if a == b:
            continue
        edges.add((int(a), int(b), int(rng.integers(1, wmax))))
    # retain one offset per (a,b)
    seen = {}
    for a, b, w in sorted(edges):
        seen.setdefault((a, b), w)
    return [(a, b, w) for (a, b), w in seen.items()]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cut_triangles_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 40
    edges = random_dag(rng, n, 120, wmax=12)  # small weights -> many equal paths
    g = OverlapGraph.from_edges(n, edges)
    got, _ = simplify.cut_triangles(g, max_offset=100)
    want = oracle_cut_triangles(n, edges, 100)
    assert got.edge_set() == want


def test_cut_triangles_basic():
    # i->a (3), a->b (4), i->b (7): equal-distance triangle -> cut i->b
    g = OverlapGraph.from_edges(3, [(0, 1, 3), (1, 2, 4), (0, 2, 7)])
    got, ncut = simplify.cut_triangles(g, 100)
    assert ncut == 1
    assert got.edge_set() == {(0, 1, 3), (1, 2, 4)}
    # non-equal distance (truly metric) -> kept
    g2 = OverlapGraph.from_edges(3, [(0, 1, 3), (1, 2, 4), (0, 2, 6)])
    got2, ncut2 = simplify.cut_triangles(g2, 100)
    assert ncut2 == 0
    # over max_offset -> kept even if equal
    g3 = OverlapGraph.from_edges(3, [(0, 1, 3), (1, 2, 4), (0, 2, 7)])
    got3, ncut3 = simplify.cut_triangles(g3, 5)
    assert ncut3 == 0


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_dangling_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 50
    edges = random_dag(rng, n, 70, wmax=20)
    g = OverlapGraph.from_edges(n, edges)
    got, _ = simplify.remove_dangling_branches(g, max_offset=60)
    want = oracle_dangling(n, edges, 60)
    assert got.edge_set() == want


def test_dangling_basic_fork():
    # fork at 0: long branch 0->1->2->3 and short dangling 0->4
    edges = [(0, 1, 10), (1, 2, 10), (2, 3, 10), (0, 4, 5)]
    g = OverlapGraph.from_edges(5, edges)
    got, removed = simplify.remove_dangling_branches(g, max_offset=100)
    # both branches dangle -> keep the longest (0->1->2->3), remove 0->4
    assert removed == 1
    assert got.edge_set() == {(0, 1, 10), (1, 2, 10), (2, 3, 10)}


def test_dangling_keeps_continuing_branch():
    # branch through 1 continues into a fork (outdeg 2 at 2) -> not dangling;
    # branch 0->4 dangles -> removed entirely
    edges = [(0, 1, 10), (1, 2, 10), (2, 3, 10), (2, 5, 10), (0, 4, 5)]
    g = OverlapGraph.from_edges(6, edges)
    got, removed = simplify.remove_dangling_branches(g, max_offset=100)
    assert (0, 4, 5) not in got.edge_set()
    assert (0, 1, 10) in got.edge_set()


def test_mst_bubble_pop():
    # bubble: 0->1(5)->3(5) and 0->2(4)->3(7); MST keeps per-node one
    # incoming: edges sorted by offset: (0,2,4),(0,1,5),(1,3,5),(2,3,7)
    # re-add: 2 gets in from 0; 1 gets in from 0; 3 gets in from 1; (2,3) dropped
    edges = [(0, 1, 5), (1, 3, 5), (0, 2, 4), (2, 3, 7)]
    g = OverlapGraph.from_edges(4, edges)
    got = simplify.remove_short_parallel_paths(g, max_offset=100)
    assert got.edge_set() == {(0, 2, 4), (0, 1, 5), (1, 3, 5)}


def test_mst_respects_max_offset():
    # beyond max offset the BFS stops; distant edges untouched
    edges = [(0, 1, 5), (0, 2, 6), (1, 3, 50), (2, 3, 49)]
    g = OverlapGraph.from_edges(4, edges)
    got = simplify.remove_short_parallel_paths(g, max_offset=8)
    # nodes 1,2 within 8; their out-edges relax dst[3]=55 then 55<… kept both?
    # BFS collects edges (0,1),(0,2),(1,3),(2,3) but dst[1]=5,dst[2]=6 <= 8
    # are expanded; 3 at 55/54 pushed but never expanded (>8). MST re-add by
    # offset: (0,1,5),(0,2,6),(2,3,49),(1,3,50) -> 3 enters via (2,3).
    assert got.edge_set() == {(0, 1, 5), (0, 2, 6), (2, 3, 49)}


def test_contract_chain():
    # 0 -> 1 -> 2 -> 3 with 1,2 path nodes -> contract into 0->3
    edges = [(0, 1, 7), (1, 2, 8), (2, 3, 9)]
    cg = ContractedGraph(OverlapGraph.from_edges(4, edges))
    ncontr = cg.contract_path_nodes(threshold=1000)
    assert ncontr == 2
    g = cg.to_overlap_graph()
    assert g.edge_set() == {(0, 3, 24)}
    assert cg.path(0, 3) == [(1, 7), (2, 8), (3, 9)]


def test_contract_respects_threshold_with_parallel_edge():
    # contracting 0->1->2 would duplicate existing 0->2 with wabc >= threshold
    edges = [(0, 1, 7), (1, 2, 8), (0, 2, 20)]
    cg = ContractedGraph(OverlapGraph.from_edges(3, edges))
    ncontr = cg.contract_path_nodes(threshold=10)
    assert ncontr == 0
    # with a high threshold the parallel edge is replaced by the path
    cg2 = ContractedGraph(OverlapGraph.from_edges(3, edges))
    ncontr2 = cg2.contract_path_nodes(threshold=1000)
    assert ncontr2 == 1
    assert cg2.to_overlap_graph().edge_set() == {(0, 2, 15)}
    assert cg2.path(0, 2) == [(1, 7), (2, 8)]


def test_simplify_contract_full():
    # triangle + chain: after cut and contraction only the contracted path
    edges = [(0, 1, 3), (1, 2, 4), (0, 2, 7), (2, 3, 5)]
    cg = ContractedGraph(OverlapGraph.from_edges(4, edges))
    simplify_contract(cg, max_offset_parallel_paths=100)
    g = cg.to_overlap_graph()
    assert g.edge_set() == {(0, 3, 12)}
    assert cg.path(0, 3) == [(1, 3), (2, 4), (3, 5)]


class _StubBatch:
    def __init__(self, n, avg):
        import numpy as _np
        self.valid = _np.ones(n, dtype=bool)
        self._avg = avg

    def avg_read_length(self):
        return self._avg


def test_simplify_graph_old_smoke(rng):
    n = 60
    edges = random_dag(rng, n, 150, wmax=15)
    g = OverlapGraph.from_edges(n, edges)
    out = simplify.simplify_graph_old(
        g, _StubBatch(n, 100), max_offset_parallel_paths=250,
        max_offset_dangling_branches=250)
    # invariant: no equal-distance triangles under the offset bound remain
    # before the dangling stage reintroduces none; smoke: result is a graph
    assert out.num_edges <= g.num_edges
