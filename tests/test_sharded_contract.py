"""Differential tests for the sharded pointer-doubling chain discovery
(parallel/sharded_contract.py) on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from alga_tpu.graph.contract import ContractedGraph
from alga_tpu.graph.overlap_graph import OverlapGraph
from alga_tpu.parallel.sharded_contract import (chain_terminals_sharded,
                                                np_chain_terminals)


@pytest.fixture(scope="module")
def mesh():
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices("cpu")[:8])
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return Mesh(devs, ("r",))


def _random_chain_graph(rng, n, extra_edges):
    """Random graph with long chains: a permutation-path backbone plus
    random extra edges creating forks/joins and some pure cycles."""
    perm = rng.permutation(n).astype(np.int32)
    src = [perm[:-1]]
    dst = [perm[1:]]
    off = [rng.integers(1, 50, n - 1).astype(np.int32)]
    src.append(rng.integers(0, n, extra_edges).astype(np.int32))
    dst.append(rng.integers(0, n, extra_edges).astype(np.int32))
    off.append(rng.integers(1, 50, extra_edges).astype(np.int32))
    # a pure 3-cycle among otherwise untouched ids (if present)
    return OverlapGraph(n, np.concatenate(src), np.concatenate(dst),
                        np.concatenate(off))


def _pure_cycle_graph(n=12):
    ids = np.arange(n, dtype=np.int32)
    return OverlapGraph(n, ids, np.roll(ids, -1),
                        np.full(n, 7, dtype=np.int32))


@pytest.mark.parametrize("seed,n,extra", [(0, 300, 40), (1, 513, 10),
                                          (2, 64, 200)])
def test_chain_discovery_matches_oracle(mesh, seed, n, extra):
    rng = np.random.default_rng(seed)
    g = _random_chain_graph(rng, n, extra)
    chain_d, term_d, rank_d, wsum_d = chain_terminals_sharded(mesh, g)
    chain_h, term_h, rank_h, wsum_h = np_chain_terminals(g)
    np.testing.assert_array_equal(chain_d, chain_h)
    np.testing.assert_array_equal(rank_d >= 0, rank_h >= 0)
    ok = chain_h & (rank_h >= 0)
    np.testing.assert_array_equal(term_d[ok], term_h[ok])
    np.testing.assert_array_equal(rank_d[ok], rank_h[ok])
    np.testing.assert_array_equal(wsum_d[ok], wsum_h[ok])


def test_pure_cycle_reported(mesh):
    g = _pure_cycle_graph()
    chain_d, _term, rank_d, _w = chain_terminals_sharded(mesh, g)
    assert chain_d.all()
    assert (rank_d == -1).all()


def test_contraction_with_device_mask_is_identical(mesh):
    rng = np.random.default_rng(3)
    g = _random_chain_graph(rng, 200, 30)
    chain_d, _, _, _ = chain_terminals_sharded(mesh, g)

    cg_a = ContractedGraph(g)
    cg_a.contract_path_nodes(10**9)
    cg_b = ContractedGraph(g)
    cg_b.contract_path_nodes(10**9, path_node=chain_d)

    ga, gb = cg_a.to_overlap_graph(), cg_b.to_overlap_graph()
    np.testing.assert_array_equal(ga.src, gb.src)
    np.testing.assert_array_equal(ga.dst, gb.dst)
    np.testing.assert_array_equal(ga.offset, gb.offset)
    assert cg_a.cedges == cg_b.cedges
