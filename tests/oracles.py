"""Sequential oracle implementations of reference algorithms, written
directly from the C++ logic, in the canonical order (round ℓ ascending,
source id ascending, candidate id ascending).  Used as differential-test
ground truth for the vectorized/device reformulations.
"""

from __future__ import annotations


def oracle_gcps_edges(seqs: list[str], ell_min: int, cap: int, rsoe: int,
                      soes: int = 3,
                      align_from=None, align_to=None) -> set[tuple[int, int, int]]:
    """Sequential simulation of GraphCreatorPrefSuf
    (ref: src/GraphCreators/GraphCreatorPrefSuf.cpp:73-488) followed by
    main's retainOnlySmallestOffset (ref: src/main.cpp:291).

    Returns the final edge set {(src, dst, offset)} in final orientation
    (src's suffix == dst's prefix).
    """
    n = len(seqs)
    lens = [len(s) for s in seqs]
    af = [True] * n if align_from is None else list(align_from)
    at = [True] * n if align_to is None else list(align_to)

    max_ell = min(max(lens, default=0), cap)

    def matches_at(ell):
        """All (B, C) with B suffix-ell == C prefix-ell, canonical order."""
        out = []
        for b in range(n):
            if not af[b] or ell > lens[b]:
                continue
            suff = seqs[b][lens[b] - ell:]
            for c in range(n):
                if c == b or not at[c] or ell > lens[c]:
                    continue
                if seqs[c][:ell] == suff:
                    out.append((b, c))
        return out

    # regime 1: ring buffer of out-edges per source (ref GCPS.cpp:397-401)
    ring = {b: [] for b in range(n)}  # b -> list of (c, offset), oldest first
    for ell in range(ell_min, min(rsoe - 1, max_ell) + 1):
        for b, c in matches_at(ell):
            if len(ring[b]) == soes:
                ring[b].pop(0)
            ring[b].append((c, lens[b] - ell))

    # flip + retainOnlySmallestOffset (ref GCPS.cpp:288-296)
    inedges = {c: {} for c in range(n)}   # c -> {a: offset}
    for b, lst in ring.items():
        for c, off in lst:
            if b in inedges[c]:
                inedges[c][b] = min(inedges[c][b], off)
            else:
                inedges[c][b] = off

    # regime 2 (ref GCPS.cpp:403-483)
    for ell in range(max(ell_min, rsoe), max_ell + 1):
        for b, c in matches_at(ell):
            offset = lens[b] - ell
            to_remove = {b}
            if offset > 0:
                for a, off_a in list(inedges[c].items()):
                    diff = off_a - offset
                    if diff < 0 or a == b:
                        continue
                    if lens[b] + diff - lens[a] < 0:
                        continue
                    if seqs[a][diff:off_a] == seqs[b][:offset]:
                        to_remove.add(a)
            for a in to_remove:
                inedges[c].pop(a, None)
            inedges[c][b] = offset

    edges = set()
    for c, d in inedges.items():
        for a, off in d.items():
            edges.add((a, c, off))
    return edges


def oracle_all_overlaps(seqs: list[str], ell_min: int, cap: int) -> set[tuple[int, int, int]]:
    """All exact suffix-prefix matches (src, dst, ell), brute force."""
    n = len(seqs)
    out = set()
    for b in range(n):
        for c in range(n):
            if b == c:
                continue
            m = min(len(seqs[b]), len(seqs[c]), cap)
            for ell in range(ell_min, m + 1):
                if seqs[b][len(seqs[b]) - ell:] == seqs[c][:ell]:
                    out.add((b, c, ell))
    return out


def oracle_cut_triangles(n, edges, max_offset):
    """Sequential cutNonAndWeaklyMetricTriangles
    (ref GraphSimplifier.cpp:284-348): two-phase collect+remove."""
    adj = {i: [] for i in range(n)}
    for s, d, o in edges:
        adj[s].append((d, o))
    to_remove = []
    for i in range(n):
        dst = {}
        for a, w1 in adj[i]:
            for b, w2 in adj[a]:
                if b not in dst:
                    dst[b] = w1 + w2
                else:
                    dst[b] = min(dst[b], w1 + w2)
        for b, w in adj[i]:
            if w > max_offset:
                continue
            if b in dst and dst[b] == w:
                to_remove.append((i, b))
    out = set(edges)
    for i, b in to_remove:
        out = {e for e in out if not (e[0] == i and e[1] == b)}
    return out


def oracle_dangling(n, edges, max_offset):
    """Sequential removeDanglingBranches (ref GraphSimplifier.cpp:577-808),
    one pass: returns surviving edge set."""
    adj = {i: [] for i in range(n)}
    for s, d, o in edges:
        adj[s].append((d, o))
    for i in adj:
        adj[i].sort(key=lambda e: (e[1], e[0]))
    to_remove = set()
    for beg in range(n):
        if len(adj[beg]) < 2:
            continue
        was = set()
        par = {beg: beg}
        branch_ends = []
        for v, offset in list(adj[beg]):
            par[v] = beg
            was.add(v)
            while len(adj[v]) == 1:
                son = adj[v][0][0]
                if son in was:
                    break
                was.add(son)
                par[son] = v
                offset += adj[v][0][1]
                v = son
                if offset > max_offset:
                    break
            if len(adj[v]) == 0 and offset <= max_offset:
                branch_ends.append((offset, v))
        branch_ends.sort()
        div = 1 if len(branch_ends) == len(adj[beg]) else 0
        for _, v in branch_ends[: len(branch_ends) - div]:
            while v != beg:
                to_remove.add((par[v], v))
                v = par[v]
    return {e for e in edges if (e[0], e[1]) not in to_remove}


def oracle_correct_snips(read_seqs, offsets, thr=3):
    """Sequential Contig::correctSnipsInContig (ref Contig.cpp:33-92).

    read_seqs: sequences of contained reads in order; offsets: offset from
    previous read (first entry ignored).  Returns corrected contig string.
    """
    contained = list(zip(read_seqs, offsets))
    # sentinel: any read with offset = last read's length (ref :40-41)
    contained.append(("", len(read_seqs[-1])))
    correctors = [[read_seqs[0], 0]]
    s = []
    freqs = []
    for i in range(1, len(contained)):
        offset = contained[i][1]
        while offset > 0:
            offset -= 1
            most = [0, 0, 0, 0]
            k = len(correctors) - 1
            while k >= 0:
                r, ind = correctors[k]
                if ind >= len(r):
                    correctors[k] = correctors[-1]
                    correctors.pop()
                    k -= 1
                    continue
                correctors[k][1] += 1
                most["ACGT".index(r[ind])] += 1
                k -= 1
            best = max(range(4), key=lambda j: (most[j], -j))
            freqs.append(most[best])
            s.append("ACGT"[best])
        if i < len(contained) - 1:
            correctors.append([contained[i][0], 0])
    p, q = 0, len(freqs) - 1
    while p <= q and freqs[p] <= thr:
        p += 1
    while p <= q and freqs[q] <= thr:
        q -= 1
    return "".join(s[p : q + 1])
