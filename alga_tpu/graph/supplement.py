"""Error-tolerant graph supplement: LI minimizer k-mers + pairwise-kmer
branch candidate verification.

Ref: src/GraphCreators/GraphCreatorLI.cpp (4 passes, one per rotation of the
nucleotide priority permutation), src/DataStructures/Read.cpp:145-226
(getLIKmers — per-interval minimum-hash k-mer under the remapped alphabet),
src/GraphCreators/GraphCreatorPairwiseKmerBranch.cpp (PKB — pair loop within
equal-hash runs with transitive branch markers + hybrid alignment check),
wired from main.cpp:300-355: only nodes with (indeg==0 && outdeg>0) get
alignTo and (indeg>0 && outdeg==0) get alignFrom — the supplement stitches
dead ends to orphan starts.

The LI hash of a window is its sequence remapped through the priority
permutation read as a big-endian base-4 number, so "minimum hash" ==
lexicographically smallest remapped window; we compare via a (hi, lo)
uint64 pair instead of the reference's __int128 and group by the exact pair
(the reference groups by hash mod 10^18+3, which can only merge groups —
the merged pairs are then rejected by the alignment check).
"""

from __future__ import annotations

import numpy as np

from alga_tpu.ops.align import np_ach_can_align


def li_kmers(codes: np.ndarray, lengths: np.ndarray, valid: np.ndarray,
             priorities: list[int], k: int, intervals: int):
    """Per-read LI minimizer k-mers.

    Returns arrays (read_id, ind_in_read, key_hi, key_lo): for each read and
    each of `intervals` position intervals, the window whose remapped
    sequence is lexicographically smallest (first window wins ties,
    ref Read.cpp:206 strict '<').  Reads shorter than k are skipped
    (callers exclude them, ref main.cpp:253-257 removes them globally).
    """
    n, lpad = codes.shape
    pr = np.asarray(priorities, dtype=np.uint64)
    rc = pr[codes]  # remapped codes

    out_id, out_ind, out_hi, out_lo = [], [], [], []
    lengths = np.asarray(lengths, dtype=np.int64)

    ids = np.flatnonzero(valid & (lengths >= k))
    if len(ids) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy(), z.copy()

    hi_len = min(k, 32)
    lo_len = k - hi_len

    for i in ids:
        L = int(lengths[i])
        nwin = L - k + 1
        row = rc[i]
        # big-endian keys per window
        # hi: first hi_len remapped bases; lo: remaining lo_len
        win = np.lib.stride_tricks.sliding_window_view(row[:L], k)  # [nwin, k]
        pw_hi = (np.uint64(4) ** np.arange(hi_len - 1, -1, -1, dtype=np.uint64))
        hi = (win[:, :hi_len].astype(np.uint64) * pw_hi[None, :]).sum(axis=1)
        if lo_len > 0:
            pw_lo = (np.uint64(4) ** np.arange(lo_len - 1, -1, -1, dtype=np.uint64))
            lo = (win[:, hi_len:].astype(np.uint64) * pw_lo[None, :]).sum(axis=1)
        else:
            lo = np.zeros(nwin, dtype=np.uint64)

        interval_len = -(-nwin // intervals)   # ceil (ref Read.cpp:180)
        # interval of window p is p // interval_len (ref :199)
        for iv in range(intervals):
            a = iv * interval_len
            b = min((iv + 1) * interval_len, nwin)
            if a >= nwin:
                break
            seg_hi = hi[a:b]
            seg_lo = lo[a:b]
            best = int(np.lexsort((np.arange(b - a), seg_lo, seg_hi))[0])
            out_id.append(i)
            out_ind.append(a + best)
            out_hi.append(seg_hi[best])
            out_lo.append(seg_lo[best])

    return (np.asarray(out_id, dtype=np.int64),
            np.asarray(out_ind, dtype=np.int64),
            np.asarray(out_hi, dtype=np.uint64),
            np.asarray(out_lo, dtype=np.uint64))


def pkb_supplement(adj_add, codes, lengths, read_lens, cfg,
                   align_from: np.ndarray, align_to: np.ndarray,
                   priorities_rotations: int = 4):
    """Run the LI/PKB supplement: for each of 4 priority rotations, extract
    LI k-mers, group equal keys, and run the PKB pair loop, adding edges
    through `adj_add(a, b, offset) -> current offset dict access`.

    `adj_add` is a small adapter object with .get_offset(a, b) -> int|None
    and .add_min(a, b, offset); the caller owns the graph.
    """
    k = cfg.li_kmer_length
    intervals = cfg.li_kmer_intervals
    n = len(read_lens)
    valid = (align_from | align_to) & (np.asarray(read_lens) >= k)

    priorities = [0, 1, 2, 3]
    INF = 10**9

    for _rot in range(min(4, priorities_rotations)):
        rid, ind, hi, lo = li_kmers(codes, read_lens, valid, priorities, k, intervals)
        if len(rid):
            # group by key; within a group sort by indInRead DESC, then
            # read length, then id (ref Kmer.cpp:58-64 + stable canonical)
            order = np.lexsort((rid, np.asarray(read_lens)[rid], -ind, lo, hi))
            rid_s, ind_s = rid[order], ind[order]
            hi_s, lo_s = hi[order], lo[order]
            boundary = np.ones(len(order), dtype=bool)
            boundary[1:] = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
            starts = np.flatnonzero(boundary)
            ends = np.append(starts[1:], len(order))
            for s, e in zip(starts, ends):
                if e - s >= 2:
                    _pkb_group(adj_add, codes, read_lens, cfg,
                               rid_s[s:e], ind_s[s:e], align_from, align_to)
        priorities = priorities[1:] + priorities[:1]   # rotate (ref LI.cpp:25)


def _pkb_group(adj_add, codes, read_lens, cfg, rids, inds, align_from, align_to):
    """PKB pair loop within one equal-hash run
    (ref GraphCreatorPairwiseKmerBranch.cpp:16-98).  The run arrives sorted
    by indInRead DESC; iterate i from the END (ascending indInRead), pair
    with j > i (descending indInRead -> offset >= 0)."""
    D = len(rids)
    # branch markers: reach[i] = set of js reachable within the run
    reach = [set() for _ in range(D)]
    for i in range(D - 1, -1, -1):
        id1 = int(rids[i])
        if not align_from[id1]:
            continue
        ind1 = int(inds[i])
        for j in range(i + 1, D):
            id2 = int(rids[j])
            if not align_to[id2]:
                continue
            if id1 == id2:
                continue
            ind2 = int(inds[j])
            offset = ind1 - ind2
            if offset < cfg.min_offset_for_alignment:
                continue
            len1 = int(read_lens[id1])
            len2 = int(read_lens[id2])
            if 100 * offset > cfg.max_offset_considered_for_alignment * len1:
                break
            overlap = min(len1, len2 + offset) - offset
            if overlap < cfg.min_overlap_area:
                continue
            if len2 + offset - len1 < 0:
                continue

            if j not in reach[i]:
                cur = adj_add.get_offset(id1, id2)
                if cur is None or cur > offset:
                    if np_ach_can_align(codes, read_lens, id1, id2, offset, cfg):
                        adj_add.add_min(id1, id2, offset)
                        cur = offset
                if cur is not None:
                    reach[i].add(j)
                    reach[i] |= reach[j]
