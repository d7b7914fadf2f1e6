"""Sharded graph-simplification passes (SURVEY §2.10, §7.1 item 4).

Device-mesh re-expression of the reference's thread-parallel simplifier
(ref src/GraphSimplifiers/GraphSimplifier.cpp) for graphs too large for one
host: edges live block-sharded by source node over mesh axis 'r' and the
passes run as shard_map programs with `all_to_all` routing and `psum`'d
overflow/convergence flags.

  * cut_triangles_sharded — cutNonAndWeaklyMetricTriangles
    (ref GraphSimplifier.cpp:228-348) as a sharded wedge join: each shard
    routes its edges (i, a, w1) to owner(a), the owner expands them against
    its local CSR rows into 2-hop wedges (i, b, w1+w2), wedges are routed
    to owner(i), and the owner removes its direct edge (i, b, w) iff the
    group-min wedge weight equals w and w <= max_offset (predicate :319).
  * retain_min_offset_sharded — retainOnlySmallestOffset
    (ref Graph.cpp:348-387): per-(src, dst) min is purely shard-local
    because all edges of a source live on one shard.
  * dangling collection — removeDanglingBranches (ref :577-808): the chain
    walks from every fork run as synchronized SPMD rounds (one remote
    node-table fetch per step, `lax.while_loop` with a psum'd active-lane
    count as the uniform convergence flag), with the reference's exact
    `was`/`par` bookkeeping kept in per-seed fixed-capacity buffers; the
    tiny post-collection bookkeeping (sort+unique, the never-seeded glibc
    rand() shuffle, WorkloadManager truncation — ref :658-679) stays on the
    host, identical to graph/simplify.py (the parity-locked twin).
  * simplify_graph_old_sharded — the simplifyGraphOld orchestration
    (ref :85-226) over the passes above.  removeShortParallelPaths is
    host-side pointer surgery (native wave-parallel engine when built,
    Python twin otherwise) — the one pass that does not map to SPMD.

Differential contract: identical output (edge arrays AND batch.valid) to
graph/simplify.simplify_graph_old / the native engine on the same inputs,
for any mesh size (tests/test_sharded_simplify.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alga_tpu.graph.overlap_graph import OverlapGraph
from alga_tpu.parallel.sharded_gcps import (_host, _put, _round_cap, _route,
                                            _scatter_to_blocks,
                                            _segmented_slots)
from alga_tpu.utils.glibc_rand import GlibcRand, random_shuffle, workload_covered

_SENT = 0xFFFFFFFF
_I32MAX = np.int32(0x7FFFFFFF)


def _edges_to_shards(g: OverlapGraph, d: int, per: int, Ecap: int):
    """Host-side layout: edges bucketed by owner shard (src // per) into a
    SENT-filled uint32[d, Ecap, 3] buffer, in (src, offset, dst) order."""
    gs = g.sorted_by_src_offset()
    owner = gs.src.astype(np.int64) // per
    buf = np.full((d, Ecap, 3), _SENT, dtype=np.uint32)
    for s in range(d):
        m = owner == s
        k = int(m.sum())
        buf[s, :k, 0] = gs.src[m]
        buf[s, :k, 1] = gs.dst[m]
        buf[s, :k, 2] = gs.offset[m]
    return buf


def _edges_from_shards(n: int, buf: np.ndarray) -> OverlapGraph:
    e = buf.reshape(-1, 3)
    v = e[:, 0] != _SENT
    return OverlapGraph(n, e[v, 0].astype(np.int32),
                        e[v, 1].astype(np.int32),
                        e[v, 2].astype(np.int32)).sorted_by_src_offset()


# ---------------------------------------------------------------------------
# triangle cut


@lru_cache(maxsize=64)
def _tri_fn(mesh: Mesh, d: int, per: int, Ecap: int, SQ: int, CW: int,
            SW: int, max_offset: int):
    spec = P("r", None, None)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(spec,), out_specs=(spec, P("r"), P("r"), P("r")))
    def tri(edges_b):
        edges = edges_b[0]                       # [Ecap, 3]
        my = jax.lax.axis_index("r")
        base = (my * per).astype(jnp.int32)
        ev = edges[:, 0] != jnp.uint32(_SENT)
        src = edges[:, 0].astype(jnp.int32)
        dst = edges[:, 1].astype(jnp.int32)
        off = edges[:, 2].astype(jnp.int32)

        # local CSR over this shard's node range (edges arrive sorted by
        # (src, offset, dst), fills at the tail)
        src_l = jnp.where(ev, src - base, per)
        outdeg = jnp.zeros(per + 1, jnp.int32).at[src_l].add(1)[:per]
        indptr = jnp.cumsum(outdeg) - outdeg

        # route queries (i, a, w1) to owner(a)
        q_owner = jnp.where(ev, dst // per, d)
        q, ovf1 = _route(q_owner, edges, d, SQ)

        # owner(a): expand each query against local out-edges of a
        qv = q[:, 0] != jnp.uint32(_SENT)
        qa_l = jnp.clip(jnp.where(qv, q[:, 1].astype(jnp.int32) - base, 0),
                        0, per - 1)
        cnt = jnp.where(qv, outdeg[qa_l], 0)
        wedge_total = cnt.sum()
        seg, rank, in_range = _segmented_slots(cnt, CW)
        eidx = jnp.clip(indptr[qa_l[seg]] + rank, 0, Ecap - 1)
        wi = q[seg, 0]                            # original source i
        wb = edges[eidx, 1]                       # 2-hop target b
        wsum = q[seg, 2] + edges[eidx, 2]         # w1 + w2
        wv = in_range & qv[seg]
        wedges = jnp.stack([jnp.where(wv, wi, jnp.uint32(_SENT)),
                            jnp.where(wv, wb, jnp.uint32(_SENT)),
                            jnp.where(wv, wsum, jnp.uint32(_SENT))], axis=1)

        # route wedges to owner(i)
        w_owner = jnp.where(wv, wi.astype(jnp.int32) // per, d)
        wr, ovf2 = _route(w_owner, wedges, d, SW)

        # owner(i): group-min over (i, b), compare to direct edges.
        # 3-key sort puts each (i, b) group's min wsum first.
        rk_i, rk_b, rk_w = jax.lax.sort((wr[:, 0], wr[:, 1], wr[:, 2]),
                                        num_keys=3)
        first = jnp.concatenate(
            [jnp.ones(1, bool), (rk_i[1:] != rk_i[:-1]) | (rk_b[1:] != rk_b[:-1])])
        # searchsorted over the group-min subsequence: build compacted keys
        ngrp = jnp.cumsum(first.astype(jnp.int32))
        gpos = jnp.where(first, ngrp - 1, wr.shape[0])
        gi = jnp.full(wr.shape[0], jnp.uint32(_SENT)).at[gpos].set(
            rk_i, mode="drop")
        gb = jnp.full(wr.shape[0], jnp.uint32(_SENT)).at[gpos].set(
            rk_b, mode="drop")
        gw = jnp.full(wr.shape[0], jnp.uint32(_SENT)).at[gpos].set(
            rk_w, mode="drop")
        # lookup per local edge: binary search on (gi, gb) via u64 keys
        gkey = gi.astype(jnp.uint64) << 32 | gb.astype(jnp.uint64)
        ekey = (edges[:, 0].astype(jnp.uint64) << 32
                | edges[:, 1].astype(jnp.uint64))
        pos = jnp.searchsorted(gkey, ekey)
        pos_c = jnp.clip(pos, 0, wr.shape[0] - 1)
        has2 = (gkey[pos_c] == ekey) & ev
        d2 = gw[pos_c].astype(jnp.int32)
        remove = has2 & (d2 == off) & (off <= max_offset)

        keep = ev & ~remove
        nkeep = jnp.cumsum(keep.astype(jnp.int32))
        out_pos = jnp.where(keep, nkeep - 1, Ecap)
        out = jnp.full((Ecap, 3), _SENT, dtype=jnp.uint32)
        out = out.at[out_pos].set(edges, mode="drop")
        ncut = jax.lax.psum(remove.sum(), "r")
        return (out[None], ncut[None], wedge_total[None],
                (ovf1 + ovf2)[None])

    return tri


def cut_triangles_sharded(mesh: Mesh, g: OverlapGraph,
                          max_offset: int) -> tuple[OverlapGraph, int]:
    """Sharded twin of simplify.cut_triangles (same output, any mesh)."""
    d = int(mesh.devices.size)
    if g.num_edges == 0:
        return g, 0
    n = g.n
    npad = -(-n // d) * d
    per = npad // d
    per_edges = np.bincount(g.src.astype(np.int64) // per, minlength=d)
    Ecap = _round_cap(int(per_edges.max()))
    buf = _edges_to_shards(g, d, per, Ecap)
    spec = NamedSharding(mesh, P("r", None, None))

    SQ = _round_cap(Ecap * 2 // d + 64)
    CW = _round_cap(Ecap * 4 + 64)
    SW = _round_cap(CW * 2 // d + 64)
    while True:
        buf_d = _put(buf.reshape(d, Ecap, 3), spec)
        out, ncut, wtot, ovf = _tri_fn(mesh, d, per, Ecap, SQ, CW, SW,
                                       int(max_offset))(buf_d)
        wtot_h = int(_host(wtot).max())
        if int(_host(ovf).max()) == 0 and wtot_h <= CW:
            break
        SQ *= 2
        SW *= 2
        CW = max(2 * CW, _round_cap(wtot_h))
    return (_edges_from_shards(n, _host(out)), int(_host(ncut).max()))


# ---------------------------------------------------------------------------
# retain-min-offset


@lru_cache(maxsize=64)
def _retain_fn(mesh: Mesh, Ecap: int):
    spec = P("r", None, None)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(spec,), out_specs=spec)
    def retain(edges_b):
        edges = edges_b[0]
        # sort (src, dst, off); keep first per (src, dst) — all edges of a
        # source are local, so the pass needs no communication at all
        s, ds, of = jax.lax.sort((edges[:, 0], edges[:, 1], edges[:, 2]),
                                 num_keys=3)
        first = jnp.concatenate(
            [jnp.ones(1, bool), (s[1:] != s[:-1]) | (ds[1:] != ds[:-1])])
        keep = first & (s != jnp.uint32(_SENT))
        nkeep = jnp.cumsum(keep.astype(jnp.int32))
        out_pos = jnp.where(keep, nkeep - 1, Ecap)
        out = jnp.full((Ecap, 3), _SENT, dtype=jnp.uint32)
        out = out.at[out_pos, 0].set(s, mode="drop")
        out = out.at[out_pos, 1].set(ds, mode="drop")
        out = out.at[out_pos, 2].set(of, mode="drop")
        return out[None]

    return retain


def retain_min_offset_sharded(mesh: Mesh, g: OverlapGraph) -> OverlapGraph:
    d = int(mesh.devices.size)
    if g.num_edges == 0:
        return g
    npad = -(-g.n // d) * d
    per = npad // d
    per_edges = np.bincount(g.src.astype(np.int64) // per, minlength=d)
    Ecap = _round_cap(int(per_edges.max()))
    buf = _edges_to_shards(g, d, per, Ecap)
    spec = NamedSharding(mesh, P("r", None, None))
    out = _retain_fn(mesh, Ecap)(_put(buf, spec))
    return _edges_from_shards(g.n, _host(out))


# ---------------------------------------------------------------------------
# dangling-branch collection (device walks + host bookkeeping)


def _fetch_node3(tab_l, ids, valid, per: int, d: int, F: int):
    """Remote gather of per-node walk records (outdeg, next_dst, next_w):
    requests routed to owner(id) = id // per, responses ride back in slot
    order (same request/response pattern as sharded_gcps._fetch_rows)."""
    owner = jnp.where(valid, ids // per, d)
    buf, order, owner_s, pos, ovf = _scatter_to_blocks(
        owner, ids.astype(jnp.uint32)[:, None], d, F)
    req = jax.lax.all_to_all(buf, "r", split_axis=0, concat_axis=0)
    my = jax.lax.axis_index("r")
    lid = jnp.clip(req[..., 0].astype(jnp.int32) - my * per, 0, per - 1)
    resp = jax.lax.all_to_all(tab_l[lid].astype(jnp.uint32),
                              "r", split_axis=0, concat_axis=0)
    got = resp[jnp.minimum(owner_s, d - 1), jnp.minimum(pos, F - 1)]
    out = jnp.zeros((ids.shape[0], 3), jnp.uint32).at[order].set(got)
    return (out[:, 0].astype(jnp.int32), out[:, 1].astype(jnp.int32),
            out[:, 2].astype(jnp.int32), jax.lax.psum(ovf, "r"))


@lru_cache(maxsize=64)
def _dangling_fn(mesh: Mesh, d: int, per: int, S: int, B: int, V: int,
                 F: int, max_offset: int):
    """One shard_map program running ALL chain walks of one
    removeDanglingBranches collection (ref GraphSimplifier.cpp:725-808):
    lanes = seeds (S per shard), branch slots processed sequentially under
    lax.fori_loop (branch k's walk sees `was`/`par` state of branches < k,
    ref :739 unconditional par overwrite included), each branch walk a
    lax.while_loop whose condition is the psum'd active-lane count."""
    spec_sb = P("r", None, None)
    spec_s = P("r", None)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(spec_sb, spec_s, spec_s, P("r", None)),
             out_specs=(spec_sb, spec_sb, spec_s, spec_sb, P("r"))
             )
    def collect(branches_b, seeds_b, nbranch_b, tab_l):
        branches = branches_b[0]        # [S, B, 2] (dst, w) neighbor order
        seeds = seeds_b[0]              # int32[S], -1 fill
        nbranch = nbranch_b[0]          # int32[S] true outdeg (<= B checked host-side)
        sv = seeds >= 0
        rows = jnp.arange(S, dtype=jnp.int32)

        # per-seed state buffers (+1 scratch column for masked scatters)
        visited0 = jnp.full((S, V + 1), -1, jnp.int32)
        par0 = jnp.full((S, V + 1), -1, jnp.int32)
        vcount0 = jnp.zeros(S, jnp.int32)
        ends0 = jnp.full((S, B, 2), _I32MAX, jnp.int32)  # (offset, v)
        ovf0 = jnp.zeros((), jnp.int32)

        def member(visited, vcount, x):
            """slot of x in visited[:vcount] (else -1)."""
            hit = (visited[:, :V] == x[:, None]) & \
                  (jnp.arange(V)[None, :] < vcount[:, None])
            found = hit.any(axis=1)
            idx = jnp.argmax(hit, axis=1).astype(jnp.int32)
            return jnp.where(found, idx, -1)

        def branch_step(k, st):
            visited, par, vcount, ends, ovf = st
            act0 = sv & (k < nbranch)
            v0 = branches[:, k, 0]
            w0 = branches[:, k, 1]

            # unconditional was-add + par[v0] = seed (ref :737-740): reuse
            # the existing slot when v0 was already visited
            slot = member(visited, vcount, v0)
            appended = act0 & (slot < 0)
            slot = jnp.where(slot >= 0, slot, vcount)
            ovf = ovf + (appended & (slot >= V)).sum().astype(jnp.int32)
            wslot = jnp.where(act0, jnp.minimum(slot, V), V)
            visited = visited.at[rows, wslot].set(
                jnp.where(act0, v0, visited[rows, wslot]))
            par = par.at[rows, wslot].set(
                jnp.where(act0, seeds, par[rows, wslot]))
            vcount = vcount + jnp.where(appended & (slot < V), 1, 0)

            # chain walk (ref :745-760): v advances while outdeg == 1,
            # stopping on was-hit (v unchanged) or offset > max (after step)
            def wcond(wst):
                return wst[0] > 0

            def wbody(wst):
                (_, v, offv, walking, last_odeg, visited, par, vcount,
                 ovf) = wst
                odeg, son, wv, fovf = _fetch_node3(
                    tab_l, v, walking, per, d, F)
                ovf = ovf + fovf
                can = walking & (odeg == 1)
                last_odeg = jnp.where(walking, odeg, last_odeg)
                sslot = member(visited, vcount, son)
                hit_was = can & (sslot >= 0)
                step = can & ~hit_was
                # append son, par[son] = v
                appended = step
                aslot = jnp.where(appended, jnp.minimum(vcount, V), V)
                ovf = ovf + (appended & (vcount >= V)).sum().astype(jnp.int32)
                visited = visited.at[rows, aslot].set(
                    jnp.where(appended, son, visited[rows, aslot]))
                par = par.at[rows, aslot].set(
                    jnp.where(appended, v, par[rows, aslot]))
                vcount = vcount + jnp.where(appended & (vcount < V), 1, 0)
                offv = jnp.where(step, offv + wv, offv)
                v = jnp.where(step, son, v)
                walking = step & (offv <= max_offset)
                nact = jax.lax.psum(walking.sum().astype(jnp.int32), "r")
                return (nact, v, offv, walking, last_odeg, visited, par,
                        vcount, ovf)

            walking0 = act0
            nact0 = jax.lax.psum(walking0.sum().astype(jnp.int32), "r")
            (_, v, offv, _, last_odeg, visited, par, vcount, ovf) = \
                jax.lax.while_loop(wcond, wbody,
                                   (nact0, v0, w0, walking0,
                                    jnp.full(S, -1, jnp.int32), visited,
                                    par, vcount, ovf))
            # branch end (ref :763-765): dead end within range
            is_end = act0 & (last_odeg == 0) & (offv <= max_offset)
            # lanes whose while never ran globally still need odeg(v0):
            # nact0 == 0 means NO lane anywhere walked — then no ends here
            is_end = is_end & (nact0 > 0)
            ends = ends.at[rows, k, 0].set(
                jnp.where(is_end, offv, ends[rows, k, 0]))
            ends = ends.at[rows, k, 1].set(
                jnp.where(is_end, v, ends[rows, k, 1]))
            return visited, par, vcount, ends, ovf

        visited, par, vcount, ends, ovf = jax.lax.fori_loop(
            0, B, branch_step, (visited0, par0, vcount0, ends0, ovf0))
        return (visited[None, :, :V], par[None, :, :V], vcount[None],
                ends[None], jax.lax.psum(ovf, "r")[None])

    return collect


def _node_tables(g: OverlapGraph, npad: int):
    """(outdeg, first-out-edge dst, first-out-edge w) per node, adjacency in
    neighbor order — what the reference's dangling loop iterates
    (post-retain canonical layout, see simplify._Adjacency order='neighbor')."""
    order = np.lexsort((g.offset, g.dst, g.src))
    src = g.src[order]
    outdeg = np.bincount(src, minlength=npad).astype(np.int32)
    first = np.zeros(npad, dtype=np.int64)
    first[1:] = np.cumsum(outdeg)[:-1]
    nx_dst = np.zeros(npad, dtype=np.int32)
    nx_w = np.zeros(npad, dtype=np.int32)
    has = outdeg[: len(outdeg)] > 0
    idx = np.clip(first, 0, max(len(src) - 1, 0))
    nx_dst[has] = g.dst[order][idx[has]]
    nx_w[has] = g.offset[order][idx[has]]
    return outdeg, nx_dst, nx_w, order


def collect_dangling_sharded(mesh: Mesh, g: OverlapGraph, max_offset: int,
                             threads: int) -> list[tuple[int, int]]:
    """Device-parallel collection of removable dangling-branch edges —
    exact replication of simplify._dangling_edges_from_seed over all seeds
    within the WorkloadManager coverage (blocks=10*T, ref :641).  Returns
    the (a, b) edge list BEFORE dedup/shuffle (host applies those)."""
    d = int(mesh.devices.size)
    n = g.n
    npad = -(-n // d) * d
    per = npad // d

    outdeg, nx_dst, nx_w, order = _node_tables(g, npad)
    covered = workload_covered(n, 10 * threads)
    seed_mask = (outdeg[:n] >= 2) & (np.arange(n) < covered)
    seed_ids = np.flatnonzero(seed_mask).astype(np.int32)
    if len(seed_ids) == 0:
        return []

    # per-shard seed slots
    sown = seed_ids // per
    S = _round_cap(int(np.bincount(sown, minlength=d).max()), 64)
    B = 1 << int(np.ceil(np.log2(max(int(outdeg[seed_ids].max()), 2))))
    seeds_h = np.full((d, S), -1, dtype=np.int32)
    nbr_h = np.zeros((d, S), dtype=np.int32)
    branches_h = np.zeros((d, S, B, 2), dtype=np.int32)
    src_sorted = g.src[order]
    dst_sorted = g.dst[order]
    w_sorted = g.offset[order]
    starts = np.searchsorted(src_sorted, seed_ids)
    fill = np.zeros(d, dtype=np.int64)
    for sid, st in zip(seed_ids.tolist(), starts.tolist()):
        s = sid // per
        j = fill[s]
        fill[s] += 1
        k = int(outdeg[sid])
        seeds_h[s, j] = sid
        nbr_h[s, j] = k
        branches_h[s, j, :k, 0] = dst_sorted[st : st + k]
        branches_h[s, j, :k, 1] = w_sorted[st : st + k]

    tab = np.stack([outdeg, nx_dst, nx_w], axis=1).astype(np.int32)
    spec_sb = NamedSharding(mesh, P("r", None, None))
    spec_s = NamedSharding(mesh, P("r", None))
    tab_d = _put(tab, NamedSharding(mesh, P("r", None)))
    br_d = _put(branches_h.reshape(d, S, B * 2), spec_sb)
    seeds_d = _put(seeds_h, spec_s)
    nbr_d = _put(nbr_h, spec_s)

    V = 256
    F = _round_cap(S, 64)
    while True:
        fn = _dangling_fn(mesh, d, per, S, B, V, F, int(max_offset))
        visited, par, vcount, ends, ovf = fn(
            br_d.reshape(d, S, B, 2), seeds_d, nbr_d, tab_d)
        if int(_host(ovf).max()) == 0:
            break
        V *= 2
        F *= 2

    visited = _host(visited).reshape(d, S, V)
    par = _host(par).reshape(d, S, V)
    vcount = _host(vcount).reshape(d, S)
    ends = _host(ends).reshape(d, S, B, 2)

    # host backwalk (ref :780-800): sort ends, keep-longest rule, emit the
    # par-chain edges of every removable branch
    edges = []
    for s in range(d):
        for j in range(int(fill[s])):
            seed = int(seeds_h[s, j])
            evs = ends[s, j]
            be = sorted((int(o), int(v)) for o, v in evs if o != _I32MAX)
            div = 1 if len(be) == int(nbr_h[s, j]) else 0
            if len(be) - div <= 0:
                continue
            vc = int(vcount[s, j])
            slot = {int(visited[s, j, t]): t for t in range(vc)}
            for _, v in be[: len(be) - div]:
                while v != seed:
                    p = int(par[s, j, slot[v]])
                    edges.append((p, v))
                    v = p
    return edges


def remove_dangling_sharded(mesh: Mesh, g: OverlapGraph, max_offset: int,
                            threads: int,
                            rng: GlibcRand | None) -> tuple[OverlapGraph, int]:
    """Sharded twin of simplify.remove_dangling_branches: device collection
    + the host-side canonical dedup/shuffle/truncate bookkeeping."""
    edges = collect_dangling_sharded(mesh, g, max_offset, threads)
    lst = sorted(set(edges))
    if rng is not None:
        if len(lst) >= 2:
            random_shuffle(lst, rng)
        lst = lst[: workload_covered(len(lst), 3 * threads)]
    if not lst:
        return g, 0
    key = np.asarray([a * np.int64(g.n) + b for a, b in lst], dtype=np.int64)
    ekey = g.src.astype(np.int64) * np.int64(g.n) + g.dst
    remove = np.isin(ekey, key)
    return g.remove_edges_mask(remove), int(remove.sum())


# ---------------------------------------------------------------------------
# orchestration


def simplify_graph_old_sharded(mesh: Mesh, g: OverlapGraph, batch,
                               max_offset_parallel_paths: int,
                               max_offset_dangling_branches: int,
                               threads: int = 6,
                               log=lambda *a: None) -> OverlapGraph:
    """simplifyGraphOld (ref GraphSimplifier.cpp:85-226) with the triangle
    cut, retain-min-offset, and dangling collection running sharded on the
    mesh; identical output to the host engines."""
    g, ncut = cut_triangles_sharded(mesh, g, max_offset_parallel_paths)
    log(f"[sharded] triangle cut removed {ncut} edges")
    batch.valid &= ~g.isolated_nodes()
    avg = batch.avg_read_length()

    mopp_scaled = int(max_offset_parallel_paths * avg / 100.0)
    g = mst_pass_sharded(mesh, g, mopp_scaled, threads, log=log)
    log("[sharded] short parallel paths removed (mesh footprints + "
        "wave pops)")
    batch.valid &= ~g.isolated_nodes()
    g = retain_min_offset_sharded(mesh, g)

    modb_scaled = int(max_offset_dangling_branches * avg / 100.0)
    rng = GlibcRand(1)
    iterations = 0
    while True:
        g, r1 = remove_dangling_sharded(mesh, g, modb_scaled, threads, rng)
        gr, r2 = remove_dangling_sharded(mesh, g.reverse(), modb_scaled,
                                         threads, rng)
        g = gr.reverse()
        removed = r1 + r2
        iterations += 1
        log(f"[sharded] dangling iteration {iterations}: removed {removed}")
        if removed == 0:
            break
        if iterations >= 16 and removed <= 30:
            break
    batch.valid &= ~g.isolated_nodes()
    return g.sorted_by_src_offset()


# ---------------------------------------------------------------------------
# sharded MST bubble pop (VERDICT r3 item 6): removeShortParallelPaths /
# tryToRemoveShortPathsMST (ref GraphSimplifier.cpp:351-518).
#
# The native engine proved (native/alga_host.cpp:246-336) that seeds whose
# footprints — ball(seed, max_offset) plus its out-neighbors, computed on
# the frozen pass-start graph — are disjoint commute, so wave-ordered
# execution is bit-identical to the sequential seed-id-ascending pass.
# Here the footprint DISCOVERY (the dominant cost: one bounded Dijkstra
# per fork seed) runs on the mesh as label relaxation:
#
#   labels (seed, node, dist) live on owner(node); each round every
#   improved label with dist <= max_offset expands through the shard-LOCAL
#   adjacency rows (edges are sharded by src owner, so expansion needs no
#   remote fetch), new labels ride ONE all_to_all to owner(neighbor), and
#   a (seed, node, dist·2|tag) sort + segment-min merges them into the
#   shard's best-distance table.  Convergence = psum'd improved count 0.
#
# The host then applies only the per-wave pops (cheap pointer surgery,
# identical to graph/simplify._mst_pop) in wave order — within a wave the
# order is free, across waves it reproduces seed order exactly.


def _mst_round_factory(mesh: Mesh, d: int, per: int, K: int, mopp: int):
    spec_r = P("r")
    spec_rn = P("r", None)

    @lru_cache(maxsize=8)
    def round_fn(LS: int, BS_: int, SR: int):
        @jax.jit
        @partial(jax.shard_map, mesh=mesh, check_vma=False,
                 in_specs=(spec_rn, spec_rn, spec_rn),
                 out_specs=(spec_rn, spec_rn, spec_r, spec_r))
        def rnd(adj_l, frontier_l, bests_l):
            my = jax.lax.axis_index("r")
            base = (my * per).astype(jnp.int32)
            SENTu = jnp.uint32(_SENT)

            # ---- expand local frontier through local adjacency ----------
            f_seed = frontier_l[:, 0]
            f_node = frontier_l[:, 1]
            f_dist = frontier_l[:, 2]
            f_ok = (f_seed != SENTu) & (f_dist <= jnp.uint32(mopp))
            lid = jnp.clip(f_node.astype(jnp.int32) - base, 0, per - 1)
            rows = adj_l[lid]                       # [LS, 2K]
            nb = rows[:, 0::2]                      # [LS, K]
            off = rows[:, 1::2]
            cand_ok = f_ok[:, None] & (nb != SENTu)
            nd = jnp.minimum(f_dist[:, None] + off, jnp.uint32(1 << 30))
            c_seed = jnp.broadcast_to(f_seed[:, None], nb.shape).ravel()
            c_node = nb.ravel()
            c_dist = nd.ravel()
            c_ok = cand_ok.ravel()

            owner = jnp.where(c_ok,
                              (c_node.astype(jnp.int32) //
                               jnp.int32(per)), d)
            payload = jnp.stack(
                [jnp.where(c_ok, c_seed, SENTu),
                 jnp.where(c_ok, c_node, SENTu),
                 c_dist], axis=1)
            recv, ovf_r = _route(owner, payload, d, SR)

            # ---- merge received labels into the best table --------------
            NB = BS_ + recv.shape[0]
            m_seed = jnp.concatenate([bests_l[:, 0], recv[:, 0]])
            m_node = jnp.concatenate([bests_l[:, 1], recv[:, 1]])
            # dist key doubled with a tag bit: existing bests (tag 0) win
            # ties so a non-improving duplicate is never "improved"
            m_key = jnp.concatenate(
                [jnp.where(bests_l[:, 0] != SENTu,
                           bests_l[:, 2] * 2, SENTu),
                 jnp.where(recv[:, 0] != SENTu,
                           recv[:, 2] * 2 + 1, SENTu)])
            s_seed, s_node, s_key = jax.lax.sort(
                (jnp.where(m_key != SENTu, m_seed, SENTu),
                 jnp.where(m_key != SENTu, m_node, SENTu),
                 m_key), num_keys=3)
            is_first = jnp.concatenate(
                [jnp.ones(1, bool),
                 (s_seed[1:] != s_seed[:-1]) | (s_node[1:] != s_node[:-1])])
            live = s_seed != SENTu
            keep = is_first & live
            improved = keep & (s_key & 1).astype(bool)

            # compact the new best table
            nkeep = jnp.cumsum(keep.astype(jnp.int32))
            pos = jnp.where(keep, nkeep - 1, BS_)
            nb_l = jnp.full((BS_, 3), _SENT, dtype=jnp.uint32)
            nb_l = nb_l.at[pos, 0].set(s_seed, mode="drop")
            nb_l = nb_l.at[pos, 1].set(s_node, mode="drop")
            nb_l = nb_l.at[pos, 2].set(s_key // 2, mode="drop")
            ovf_b = (nkeep[-1] > BS_).astype(jnp.int32)

            # compact the improved labels into the next frontier
            nimp = jnp.cumsum(improved.astype(jnp.int32))
            fpos = jnp.where(improved, nimp - 1, LS)
            nf_l = jnp.full((LS, 3), _SENT, dtype=jnp.uint32)
            nf_l = nf_l.at[fpos, 0].set(s_seed, mode="drop")
            nf_l = nf_l.at[fpos, 1].set(s_node, mode="drop")
            nf_l = nf_l.at[fpos, 2].set(s_key // 2, mode="drop")
            ovf_f = (nimp[-1] > LS).astype(jnp.int32)

            nactive = jax.lax.psum(nimp[-1], "r")
            ovf = jax.lax.psum(ovf_r + ovf_b + ovf_f, "r")
            return nf_l, nb_l, nactive[None], ovf[None]
        return rnd
    return round_fn


def mst_footprints_sharded(mesh: Mesh, g: OverlapGraph, seeds: np.ndarray,
                           max_offset: int):
    """(seed_idx int32[M], node int32[M]): per-seed footprint pairs by
    label relaxation over the mesh (seed_idx indexes into `seeds`)."""
    d = int(mesh.devices.size)
    n = g.n
    npad = -(-n // d) * d
    per = npad // d

    outdeg = np.bincount(g.src, minlength=npad)
    K = int(outdeg.max()) if len(outdeg) else 0
    K = max(K, 1)
    if K > 64:
        raise ValueError(f"mst_footprints_sharded: out-degree {K} > 64")

    # padded adjacency table [npad, 2K]: (dst, offset) pairs, SENT-filled
    gs = g.sorted_by_src_offset()
    adj = np.full((npad, 2 * K), _SENT, dtype=np.uint32)
    starts = np.cumsum(np.bincount(gs.src, minlength=npad)) - np.bincount(
        gs.src, minlength=npad)
    sl = np.arange(len(gs.src)) - starts[gs.src]
    adj[gs.src, 2 * sl] = gs.dst.astype(np.uint32)
    adj[gs.src, 2 * sl + 1] = gs.offset.astype(np.uint32)

    ns = len(seeds)
    if ns == 0:
        z = np.zeros(0, dtype=np.int32)
        return z, z.copy()

    shard_rn = NamedSharding(mesh, P("r", None))
    adj_d = _put(adj, shard_rn)

    # seed labels (seed_idx, node=seed, dist 0) bucketed by owner shard
    own = seeds // per
    from alga_tpu.utils.timers import bump
    round_fn = _mst_round_factory(mesh, d, per, K, int(max_offset))

    per_seed_guess = 48
    LS = _round_cap(max(64, ns * 2 // d))
    BS_ = _round_cap(max(256, ns * per_seed_guess // d))
    SR = _round_cap(max(64, LS * min(K, 4) // d))
    for _attempt in range(10):
        # initial frontier/bests: the seed labels
        f0 = np.full((d, LS, 3), _SENT, dtype=np.uint32)
        b0 = np.full((d, BS_, 3), _SENT, dtype=np.uint32)
        fill = np.zeros(d, dtype=np.int64)
        for i, sd in enumerate(seeds):
            o = int(own[i])
            f0[o, fill[o], 0] = i
            f0[o, fill[o], 1] = sd
            f0[o, fill[o], 2] = 0
            b0[o, fill[o]] = f0[o, fill[o]]
            fill[o] += 1
        if fill.max() > LS or fill.max() > BS_:
            LS = _round_cap(int(fill.max()) * 2)
            BS_ = max(BS_, LS)
            continue
        frontier = _put(f0.reshape(d * LS, 3), shard_rn)
        bests = _put(b0.reshape(d * BS_, 3), shard_rn)
        rf = round_fn(LS, BS_, SR)
        ok = True
        for _round in range(max(256, 2 * int(max_offset))):
            frontier, bests, nact, ovf = rf(adj_d, frontier, bests)
            if int(_host(ovf).max()) > 0:
                LS *= 2
                BS_ *= 2
                SR *= 2
                bump("sharded_mst_retries", 1)
                ok = False
                break
            if int(_host(nact).max()) == 0:
                break
        else:
            raise RuntimeError("mst_footprints_sharded did not converge")
        if ok:
            break
    else:
        raise RuntimeError("mst_footprints_sharded: capacity retry "
                           "did not converge")

    out = _host(bests)
    live = out[:, 0] != _SENT
    return (out[live, 0].astype(np.int32), out[live, 1].astype(np.int32))


def mst_pass_sharded(mesh: Mesh, g: OverlapGraph, mopp_scaled: int,
                     threads: int = 6,
                     log=lambda *a: None) -> OverlapGraph:
    """removeShortParallelPaths with mesh-side footprint discovery and
    host-side per-wave pops; bit-identical to the host engines."""
    from alga_tpu.graph.simplify import _Adjacency, _mst_pop
    from alga_tpu.utils.timers import bump

    nrange = workload_covered(g.n, 50 * threads)
    outdeg = np.bincount(g.src, minlength=g.n)
    seeds = np.flatnonzero(outdeg[:nrange] >= 2).astype(np.int32)
    if len(seeds) == 0:
        return g.sorted_by_src_offset()

    # the mesh footprint table is [npad, 2K] — repeat-dense graphs with
    # out-degree > 64 would need an unreasonable K, so route them to the
    # host engines (which the pre-mesh pipeline always used) instead of
    # hard-failing mesh-mode assembly
    if int(outdeg.max(initial=0)) > 64:
        bump("sharded_mst_host_fallback", 1)
        log(f"[sharded] MST: out-degree {int(outdeg.max())} > 64, "
            "using host engine for this pass")
        from alga_tpu import native as _native
        if _native.available():
            return _native.mst_pass(g, mopp_scaled, threads)
        from alga_tpu.graph.simplify import remove_short_parallel_paths
        return remove_short_parallel_paths(g, mopp_scaled, threads)

    sidx, snode = mst_footprints_sharded(mesh, g, seeds, mopp_scaled)

    # wave layering (host, cheap): wave(i) = 1 + max wave of any EARLIER
    # seed sharing a footprint node (native/alga_host.cpp:307-318)
    order = np.argsort(sidx, kind="stable")
    sidx, snode = sidx[order], snode[order]
    node_wave = np.full(g.n, -1, dtype=np.int32)
    waves = np.zeros(len(seeds), dtype=np.int32)
    bnd = np.searchsorted(sidx, np.arange(len(seeds) + 1))
    for i in range(len(seeds)):
        nodes = snode[bnd[i]:bnd[i + 1]]
        w = int(node_wave[nodes].max(initial=-1)) + 1
        waves[i] = w
        node_wave[nodes] = w
    nw = int(waves.max()) + 1
    bump("sharded_mst_waves", nw)
    log(f"[sharded] MST: {len(seeds)} seeds in {nw} waves "
        f"({len(sidx)} footprint labels)")

    # per-wave pops — order within a wave is free (footprint-disjoint);
    # across waves this reproduces the sequential seed order exactly.
    # The application is pure O(changes) edge surgery: native when the
    # host engine is built (VERDICT r4 item 9 — no per-seed Python walk)
    wave_order = np.concatenate(
        [seeds[waves == w] for w in range(nw)]) if nw else seeds
    from alga_tpu import native as _native
    if _native.available():
        import time as _time
        _t0 = _time.perf_counter()
        out = _native.mst_pops(g, wave_order, mopp_scaled)
        bump("sharded_mst_host_apply_ms",
             int((_time.perf_counter() - _t0) * 1000))
        return out
    adj = _Adjacency(g)
    for beg in wave_order:
        if len(adj.out[beg]) >= 2:
            _mst_pop(adj, int(beg), mopp_scaled)
    return adj.to_graph()
