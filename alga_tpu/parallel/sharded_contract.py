"""Sharded path-contraction chain discovery via pointer doubling.

SURVEY §7.1 item 4 / §7.3 item 5: path contraction is pointer-chasing; the
blueprint calls for "pointer-doubling on device + small host graphs after
contraction".  This module is the device half: for every indeg-1/outdeg-1
chain node of the simplified graph it computes, in O(log N) synchronized
SPMD rounds over the mesh,

    terminal[i]  — the first non-chain node reached by following the
                   unique out-edges from i,
    rank[i]      — the number of hops to that terminal,
    wsum[i]      — the total offset along the way,

with the node table block-sharded by id over mesh axis 'r' and each
doubling round exchanging pointer rows shard-to-shard (the same
request/response all_to_all pattern as sharded_gcps._fetch_rows).  Pure
cycles of chain nodes never converge to a terminal and are reported as
such (rank -1); the reference never contracts them either — contraction
starts only from non-chain anchors (ref GraphSimplifier.cpp:910-958).

The host half (graph/contract.py::ContractedGraph.contract_path_nodes)
then applies the order-sensitive splices (threshold caps, retry-same-slot,
existing-(a,c) interactions — ref Graph.cpp:390-469) on the drastically
smaller contracted graph, optionally seeded with the device-discovered
chain-node mask.  Differential contract: the device discovery must equal
the host walk exactly (tests/test_sharded_contract.py), and contraction
seeded by it must be bit-identical to the unseeded host pass.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from alga_tpu.graph.overlap_graph import OverlapGraph
from alga_tpu.parallel.sharded_gcps import _fetch_table_rows


@lru_cache(maxsize=32)
def _doubling_fn(mesh: Mesh, d: int, per: int):
    """One pointer-doubling round: tab[i] = (ptr, wsum, rank, active).
    active=1 while ptr[i] is itself a chain node (more hops to fold in).
    Returns the updated table and the psum'd active count."""

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P("r", None),), out_specs=(P("r", None), P("r")))
    def step(tab_l):
        ptr = tab_l[:, 0]
        wsum = tab_l[:, 1]
        rank = tab_l[:, 2]
        active = tab_l[:, 3] > 0

        # fetch (ptr, wsum, rank, active) rows of each lane's ptr target
        # (F = per can never overflow: at most `per` requests per shard)
        rows, _ovf = _fetch_table_rows(tab_l, ptr, active, per, d, per)
        t_ptr = rows[:, 0].astype(jnp.int32)
        t_w = rows[:, 1].astype(jnp.int32)
        t_rank = rows[:, 2].astype(jnp.int32)
        t_act = rows[:, 3].astype(jnp.int32)

        new_ptr = jnp.where(active, t_ptr, ptr)
        new_w = jnp.where(active, wsum + t_w, wsum)
        new_rank = jnp.where(active, rank + t_rank, rank)
        new_act = jnp.where(active, t_act, 0)
        out = jnp.stack([new_ptr, new_w, new_rank, new_act], axis=1)
        return out, jax.lax.psum(new_act.sum(), "r")[None]

    return step


def chain_terminals_sharded(mesh: Mesh, g: OverlapGraph):
    """(chain_node bool[n], terminal int32[n], rank int32[n], wsum
    int32[n]): pointer-doubling over the mesh.  rank/terminal/wsum are
    meaningful for chain nodes only; nodes on pure chain cycles get
    rank -1."""
    d = int(mesh.devices.size)
    n = g.n
    npad = -(-n // d) * d
    per = npad // d

    outdeg = np.bincount(g.src, minlength=npad).astype(np.int32)
    indeg = np.bincount(g.dst, minlength=npad).astype(np.int32)
    chain = (outdeg == 1) & (indeg == 1)
    chain[n:] = False

    # unique out-edge of outdeg-1 nodes
    succ = np.zeros(npad, dtype=np.int32)
    wsucc = np.zeros(npad, dtype=np.int32)
    one = outdeg == 1
    sel = one[g.src]
    succ[g.src[sel]] = g.dst[sel]
    wsucc[g.src[sel]] = g.offset[sel]

    ids = np.arange(npad, dtype=np.int32)
    ptr0 = np.where(chain, succ, ids)
    w0 = np.where(chain, wsucc, 0).astype(np.int32)
    r0 = chain.astype(np.int32)
    act0 = (chain & chain[np.clip(ptr0, 0, npad - 1)]).astype(np.int32)
    tab = np.stack([ptr0, w0, r0, act0], axis=1).astype(np.int32)

    from alga_tpu.parallel.sharded_gcps import _host, _put

    step = _doubling_fn(mesh, d, per)
    tab_d = _put(tab, jax.sharding.NamedSharding(mesh, P("r", None)))
    max_rounds = max(1, int(np.ceil(np.log2(max(npad, 2)))) + 1)
    for _ in range(max_rounds):
        tab_d, nact = step(tab_d)
        if int(_host(nact)[0]) == 0:
            break
    out = _host(tab_d)
    terminal = out[:n, 0].copy()
    wsum = out[:n, 1].copy()
    rank = out[:n, 2].copy()
    still = out[:n, 3] > 0            # pure chain cycles never converge
    rank[still] = -1
    return chain[:n].copy(), terminal, rank, wsum


def np_chain_terminals(g: OverlapGraph):
    """Host oracle: same outputs by sequential walking."""
    n = g.n
    outdeg = np.bincount(g.src, minlength=n).astype(np.int32)
    indeg = np.bincount(g.dst, minlength=n).astype(np.int32)
    chain = (outdeg == 1) & (indeg == 1)
    succ = np.zeros(n, dtype=np.int32)
    wsucc = np.zeros(n, dtype=np.int32)
    sel = (outdeg == 1)[g.src]
    succ[g.src[sel]] = g.dst[sel]
    wsucc[g.src[sel]] = g.offset[sel]
    terminal = np.arange(n, dtype=np.int32)
    rank = np.zeros(n, dtype=np.int32)
    wsum = np.zeros(n, dtype=np.int32)
    for i in np.flatnonzero(chain):
        x, r, w = i, 0, 0
        while chain[x]:
            w += int(wsucc[x])
            x = int(succ[x])
            r += 1
            if x == i:          # pure cycle
                r = -1
                break
        terminal[i] = x
        rank[i] = r
        wsum[i] = w
    return chain, terminal, rank, wsum
