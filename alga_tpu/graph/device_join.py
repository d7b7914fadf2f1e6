"""Device-side candidate join for the overlap sweep.

Replaces the host sort-join in graph/prefsuf.py for large batches: window
keys never leave the device, and only the compacted surviving matches
(src, dst, ell) are transferred.  This reduces device→host traffic from
O(N * windows) keys to O(matches) — the difference between ~3.5 GB and
~100 MB at E. coli scale (SURVEY.md §7.3-4).

Join direction is chosen for the TPU memory system: sorting 4M window keys
costs ~30 ms while 4M binary-search probes (gather-heavy) cost ~1 s, so we
SORT the big side (all windows of all reads) and binary-search the small
side (one prefix key per read) into it — the reverse of the textbook
build-on-small-side hash join, and of the reference's bucket design
(ref GraphCreatorPrefSuf.cpp:41-48 buckets the prefixes and probes
suffixes).  Candidate expansion is a scatter+cumsum segmented iota, not a
searchsorted, for the same reason.

Capacities are rounded to multiples of 64Ki so executables are reused
across similarly-sized chunks without paying power-of-two padding waste.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from alga_tpu.core import packing
from alga_tpu.ops import hashes
from alga_tpu.ops.bitops import _pad_words, _shifted_words


@partial(jax.jit, static_argnums=(4, 5, 6))
def _keys_and_counts(packed, lengths, af, at, k: int, num_windows: int,
                     cap: int):
    """Stage 1: hash all windows, sort window keys, count candidates/read.

    A window (B, p) is a live suffix-side candidate iff
      p + k <= len_B           (window in range)
      af[B]                    (read participates as source)
      p >= len_B - cap         (overlap ell = len_B - p <= cap)
    Invalid windows get sentinel key 0xFFFFFFFF; any spurious sentinel
    matches are re-checked and dropped in stage 2.
    """
    k1, k2, valid = hashes.window_kmer_keys_u32(packed, lengths, k, num_windows)
    lengths = lengths.astype(jnp.int32)

    pos = jnp.arange(num_windows, dtype=jnp.int32)[None, :]
    wvalid = valid & af[:, None] & (pos >= (lengths[:, None] - cap))
    wkeys = jnp.where(wvalid, k1, jnp.uint32(0xFFFFFFFF)).ravel()

    worder = jnp.argsort(wkeys).astype(jnp.int32)
    wkeys_sorted = wkeys[worder]

    # prefix side: one key per read (window 0), probed into the sorted
    # window keys — n probes, not n*num_windows
    pvalid = (lengths >= k) & at
    pk1 = k1[:, 0]
    lo = jnp.searchsorted(wkeys_sorted, pk1, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(wkeys_sorted, pk1, side="right").astype(jnp.int32)
    counts = jnp.where(pvalid, hi - lo, 0)
    total = counts.sum()
    # k2 is not needed: every candidate is verified by exact packed compare
    # (the reference trusts its double hash instead, GCPS.cpp:385-387)
    return worder, lo, counts, total, pvalid


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _expand_verify(packed, lengths, worder, lo, counts,
                   pvalid, af, num_windows: int, k: int, cap: int,
                   C: int, num_words: int):
    """Stage 2: materialize up to C candidates, verify, compact.

    Candidate t belongs to prefix-read Cid = segment of t under counts;
    its window is worder[lo[Cid] + rank(t)] = (B, p); the claimed overlap
    is B[p : len_B] == Cid[0 : ell], ell = len_B - p.
    """
    n = packed.shape[0]
    lengths = lengths.astype(jnp.int32)

    csum = jnp.cumsum(counts)
    total = csum[-1]
    csum_ex = csum - counts            # exclusive prefix sum, int32[n]

    # segmented iota: j[t] = rank (among reads with counts>0) of the read
    # whose candidate block holds t; nz_ids maps that rank back to the
    # read id (reads with zero candidates occupy no block)
    marks = jnp.zeros(C, dtype=jnp.int32)
    marks = marks.at[jnp.where(counts > 0, csum_ex, C)].add(1, mode="drop")
    j = jnp.cumsum(marks) - 1                       # int32[C], -1 before 1st
    t = jnp.arange(C, dtype=jnp.int32)
    in_range = (t < total) & (j >= 0)
    nz_rank = jnp.cumsum((counts > 0).astype(jnp.int32)) - 1
    nz_ids = jnp.zeros(n, dtype=jnp.int32).at[
        jnp.where(counts > 0, nz_rank, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    Cid = nz_ids[jnp.clip(j, 0, n - 1)]

    rank = t - csum_ex[Cid]
    widx = jnp.clip(lo[Cid] + rank, 0, worder.shape[0] - 1)
    win = worder[widx]
    B = (win // num_windows).astype(jnp.int32)
    p = (win - B * num_windows).astype(jnp.int32)

    lenB = lengths[B]
    ell = lenB - p
    # window validity is re-checked here (not only via the sentinel key):
    # a read whose prefix key happens to equal the sentinel would otherwise
    # collect invalid windows — and an invalid window's ell <= 0 would make
    # the masked compare below vacuously true.
    ok = (in_range & pvalid[Cid] & (B != Cid) & (lengths[Cid] >= ell)
          & af[B]
          & (p + k <= lenB)              # window inside read B
          & (p >= lenB - cap))           # overlap ell <= cap

    # exact packed verification: B[p : p+ell] == Cid[0 : ell]
    packed_u = packed.astype(jnp.uint32)
    packed_pad = _pad_words(packed_u)
    eq = jnp.ones(C, dtype=bool)
    ml = jnp.where(ok, ell, 0).astype(jnp.int32)
    for w in range(num_words):
        a_word = _shifted_words(packed_pad, B, p, w)
        b_word = packed_pad[Cid, jnp.minimum(w, packed.shape[1] - 1)]
        diff = a_word ^ b_word
        rem = jnp.clip(ml - 16 * w, 0, 16)
        mask = jnp.where(rem >= 16, jnp.uint32(0xFFFFFFFF),
                         (jnp.uint32(1) << (rem.astype(jnp.uint32) * 2)) - 1)
        eq &= (diff & mask) == 0
    ok &= eq

    # compact survivors to the front with a stable scatter
    nok = jnp.cumsum(ok.astype(jnp.int32))
    out_pos = jnp.where(ok, nok - 1, C)
    Bo = jnp.zeros(C, dtype=jnp.int32).at[out_pos].set(B, mode="drop")
    Co = jnp.zeros(C, dtype=jnp.int32).at[out_pos].set(Cid, mode="drop")
    Eo = jnp.zeros(C, dtype=jnp.int32).at[out_pos].set(ell, mode="drop")
    return Bo, Co, Eo, nok[-1]


def _round_cap(x: int, q: int = 1 << 16) -> int:
    return max(q, ((int(x) + q - 1) // q) * q)


# ---------------------------------------------------------------------------
# Device-side GCPS post-join: regime split, ring-buffer survivors, pair
# dedup, and domination pruning (the order-free reformulation documented in
# graph/prefsuf.py, ref GraphCreatorPrefSuf.cpp:397-483) — so only the final
# edge list leaves the device.  The C++ engine (native.gcps_from_matches)
# and the Python fallback remain the differential oracles.

_I32MAX = np.int32(0x7FFFFFFF)


@partial(jax.jit, static_argnums=(4, 5))
def _post_join_stage(B, Cd, E, lengths, rsoe: int, soes: int):
    """From padded match arrays (invalid entries have B == I32MAX) produce:
      pair arrays (psrc, pdst, pell, pair_valid) sorted by (src, dst),
      regime-2 removers sorted by dst (rs, rd, re) + per-dst starts,
      per-pair domination-expansion counts and their total.
    """
    Cap = B.shape[0]
    n = lengths.shape[0]
    lengths = lengths.astype(jnp.int32)
    valid = B != _I32MAX

    # --- regime-1 ring survivors: per src, last `soes` matches with
    # ell < rsoe in canonical arrival order (ell asc, dst asc) -------------
    r1 = valid & (E < rsoe)
    key_src = jnp.where(r1, B, _I32MAX)
    s_src, s_ell, s_dst = jax.lax.sort(
        (key_src, jnp.where(r1, E, _I32MAX), jnp.where(r1, Cd, _I32MAX)),
        num_keys=3)
    t = jnp.arange(Cap, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), s_src[1:] != s_src[:-1]])
    gid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    glast = jnp.zeros(Cap, dtype=jnp.int32).at[gid].max(t)
    ring_keep = (s_src != _I32MAX) & (glast[gid] - t < soes)

    # --- pair instances = ring survivors + all regime-2 matches;
    # dedup by (src, dst) keeping max ell ----------------------------------
    r2 = valid & (E >= rsoe)
    inst_src = jnp.concatenate([jnp.where(ring_keep, s_src, _I32MAX),
                                jnp.where(r2, B, _I32MAX)])
    inst_dst = jnp.concatenate([jnp.where(ring_keep, s_dst, _I32MAX),
                                jnp.where(r2, Cd, _I32MAX)])
    inst_ell = jnp.concatenate([jnp.where(ring_keep, s_ell, _I32MAX),
                                jnp.where(r2, E, _I32MAX)])
    psrc, pdst, pell = jax.lax.sort((inst_src, inst_dst, inst_ell),
                                    num_keys=3)
    is_last = jnp.concatenate(
        [(psrc[:-1] != psrc[1:]) | (pdst[:-1] != pdst[1:]),
         jnp.ones(1, bool)])
    pair_valid = is_last & (psrc != _I32MAX)

    # --- removers: regime-2 matches grouped by dst, offset ascending ------
    # (off = len_src - ell); only removers with offB <= offA can dominate a
    # pair (offA >= offB is part of the predicate, ref GCPS.cpp:414), so
    # with removers sorted by (dst, off) each pair's eligible removers are
    # a PREFIX of its dst run — counted below by a merged-rank sort instead
    # of per-pair binary searches.
    r_off = jnp.where(r2, lengths[jnp.clip(B, 0, n - 1)] - E, _I32MAX)
    rd, ro_s, rs, re_ = jax.lax.sort(
        (jnp.where(r2, Cd, _I32MAX), r_off,
         jnp.where(r2, B, _I32MAX), jnp.where(r2, E, _I32MAX)), num_keys=3)
    r_counts = jnp.zeros(n, dtype=jnp.int32).at[rd].add(1, mode="drop")
    r_start = jnp.cumsum(r_counts) - r_counts

    # merged rank: union of removers (tag 0) and pairs (tag 1) sorted by
    # (dst, off, tag) — a pair's count of preceding removers in its dst
    # group = number of eligible removers (off <= offA, remover-first ties)
    p_off = jnp.where(pair_valid,
                      lengths[jnp.clip(psrc, 0, n - 1)] - pell, _I32MAX)
    u_dst = jnp.concatenate([rd, jnp.where(pair_valid, pdst, _I32MAX)])
    u_off = jnp.concatenate([ro_s, p_off])
    u_tag = jnp.concatenate([jnp.zeros_like(rd),
                             jnp.ones(pdst.shape[0], dtype=jnp.int32)])
    u_idx = jnp.concatenate([jnp.zeros_like(rd),
                             jnp.arange(pdst.shape[0], dtype=jnp.int32)])
    s_dst, s_off, s_tag, s_idx = jax.lax.sort(
        (u_dst, u_off, u_tag, u_idx), num_keys=3)
    rem_before = jnp.cumsum((s_tag == 0).astype(jnp.int32))  # inclusive
    # eligible removers for the pair at sorted slot = removers before it in
    # the SAME dst group = rem_before - removers before the group start
    grp_start = jnp.concatenate(
        [jnp.ones(1, bool), s_dst[1:] != s_dst[:-1]])
    ggid = jnp.cumsum(grp_start.astype(jnp.int32)) - 1
    grp_base = jnp.full(s_dst.shape[0], _I32MAX, dtype=jnp.int32).at[
        ggid].min(rem_before - (s_tag == 0).astype(jnp.int32), mode="drop")
    elig = rem_before - grp_base[ggid]
    is_pair = (s_tag == 1) & (s_dst != _I32MAX)
    cnt = jnp.zeros(pdst.shape[0], dtype=jnp.int32).at[
        jnp.where(is_pair, s_idx, pdst.shape[0])].set(
        jnp.where(is_pair, elig, 0), mode="drop")
    cnt = jnp.where(pair_valid, cnt, 0)
    exp_total = cnt.sum()
    return (psrc, pdst, pell, pair_valid, rs, re_, r_start, cnt,
            exp_total)


@partial(jax.jit, static_argnums=(10, 11))
def _dominate_and_compact(packed, lengths, psrc, pdst, pell, pair_valid,
                          rs, re_, r_start, cnt,
                          C3: int, num_words: int):
    """Expand (pair x same-dst regime-2 remover), apply the reference's
    domination predicate (ref GCPS.cpp:403-483 reformulated), compact the
    surviving edges (src, dst, offset) to the front."""
    n = packed.shape[0]
    Cap = psrc.shape[0]
    lengths = lengths.astype(jnp.int32)

    csum = jnp.cumsum(cnt)
    total = csum[-1]
    csum_ex = csum - cnt

    marks = jnp.zeros(C3, dtype=jnp.int32)
    marks = marks.at[jnp.where(cnt > 0, csum_ex, C3)].add(1, mode="drop")
    j = jnp.cumsum(marks) - 1
    t = jnp.arange(C3, dtype=jnp.int32)
    in_range = (t < total) & (j >= 0)
    nz_rank = jnp.cumsum((cnt > 0).astype(jnp.int32)) - 1
    nz_ids = jnp.zeros(Cap, dtype=jnp.int32).at[
        jnp.where(cnt > 0, nz_rank, Cap)].set(
        jnp.arange(Cap, dtype=jnp.int32), mode="drop")
    pj = nz_ids[jnp.clip(j, 0, Cap - 1)]

    rank = t - csum_ex[pj]
    A = psrc[pj]
    ellA = pell[pj]
    dstA = pdst[pj]
    A_c = jnp.clip(A, 0, n - 1)
    lenA = lengths[A_c]
    offA = lenA - ellA

    ridx = jnp.clip(r_start[jnp.clip(dstA, 0, n - 1)] + rank, 0,
                    rs.shape[0] - 1)
    Br = rs[ridx]
    ellB = re_[ridx]
    Br_c = jnp.clip(Br, 0, n - 1)
    lenB = lengths[Br_c]
    offB = lenB - ellB

    later = (ellB > ellA) | ((ellB == ellA) & (Br > A))
    cond = (in_range & later & (Br != A) & (offB > 0) & (offA >= offB)
            & (lenB + (offA - offB) - lenA >= 0))

    # A[offA-offB : offA] == B[0 : offB]  (packed compare)
    packed_pad = _pad_words(packed.astype(jnp.uint32))
    eq = jnp.ones(C3, dtype=bool)
    start = jnp.maximum(offA - offB, 0)
    ml = jnp.where(cond, offB, 0).astype(jnp.int32)
    for w in range(num_words):
        a_word = _shifted_words(packed_pad, A_c, start, w)
        b_word = packed_pad[Br_c, jnp.minimum(w, packed.shape[1] - 1)]
        diff = a_word ^ b_word
        rem = jnp.clip(ml - 16 * w, 0, 16)
        mask = jnp.where(rem >= 16, jnp.uint32(0xFFFFFFFF),
                         (jnp.uint32(1) << (rem.astype(jnp.uint32) * 2)) - 1)
        eq &= (diff & mask) == 0
    dominated = cond & eq

    removed = jnp.zeros(Cap, dtype=bool).at[
        jnp.where(dominated, pj, Cap)].set(True, mode="drop")

    keep = pair_valid & ~removed
    nkeep = jnp.cumsum(keep.astype(jnp.int32))
    out_pos = jnp.where(keep, nkeep - 1, Cap)
    p_off = jnp.where(pair_valid,
                      lengths[jnp.clip(psrc, 0, n - 1)] - pell, 0)
    # single interleaved output array -> ONE device->host transfer
    out = jnp.zeros(3 * Cap, dtype=jnp.int32)
    out = out.at[3 * out_pos].set(psrc, mode="drop")
    out = out.at[3 * out_pos + 1].set(pdst, mode="drop")
    out = out.at[3 * out_pos + 2].set(p_off, mode="drop")
    return out, nkeep[-1]


# capacity hints: (k, cap, rsoe, soes, n-bucket) -> (total, exp_total) of
# the last run.  With a hint the whole GCPS chain below executes as ONE
# dispatch (overflow checked on the result fetch) instead of four
# host-synchronized stages — behind a high-latency link (the axon tunnel's
# ~100ms RTT) the stepwise path spends most of its wall time waiting on
# capacity scalars, not computing.  Hints persist next to the jax
# compilation cache so warm processes go single-dispatch immediately.
_cap_hints: dict = {}


def _hints_path():
    import os
    d = os.environ.get("ALGA_TPU_CACHE",
                       os.path.expanduser("~/.cache/alga_tpu_jax"))
    return os.path.join(d, "gcps_cap_hints.json")


def _load_hints():
    import json
    try:
        with open(_hints_path()) as f:
            for k, v in json.load(f).items():
                _cap_hints[tuple(int(x) for x in k.split(","))] = tuple(v)
    except Exception:
        pass


def _save_hints():
    import json
    import os
    try:
        path = _hints_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({",".join(str(x) for x in k): list(v)
                       for k, v in _cap_hints.items()}, f)
        os.replace(tmp, path)
    except Exception:
        pass


_load_hints()


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12))
def _gcps_fused(packed, lengths, af, at, k: int, num_windows: int, cap: int,
                rsoe: int, soes: int, C: int, C3: int, W: int, W3: int):
    """All four GCPS stages chained under one jit with guessed capacities.
    Returns (out, [nkeep, total, nok, exp_total]); the caller discards the
    result and retries exactly when total > C or exp_total > C3."""
    worder, lo, counts, total, pvalid = _keys_and_counts(
        packed, lengths, af, at, k, num_windows, cap)
    Bv, Cv, Ev, nok = _expand_verify(
        packed, lengths, worder, lo, counts, pvalid, af,
        num_windows, k, cap, C, W)
    t = jnp.arange(C, dtype=jnp.int32)
    Bm = jnp.where(t < nok, Bv, _I32MAX)
    (psrc, pdst, pell, pair_valid, rs, re_, r_start, cnt,
     exp_total) = _post_join_stage(Bm, Cv, Ev, lengths, rsoe, soes)
    out, nkeep = _dominate_and_compact(
        packed, lengths, psrc, pdst, pell, pair_valid, rs, re_,
        r_start, cnt, C3, W3)
    scal = jnp.stack([nkeep.astype(jnp.int64), total.astype(jnp.int64),
                      nok.astype(jnp.int64), exp_total.astype(jnp.int64)])
    return out, scal


def gcps_graph_device(packed_np, lengths_np, n: int, ell_min: int, cap: int,
                      rsoe: int, soes: int, align_from=None, align_to=None):
    """Full GCPS graph on device: join + regime/ring/dedup/domination.
    Only the final edge arrays cross device->host."""
    from alga_tpu.graph.overlap_graph import OverlapGraph
    from alga_tpu.utils.timers import bump

    lengths = np.asarray(lengths_np, dtype=np.int64)
    max_len = int(lengths.max()) if n else 0
    k = int(ell_min)
    if n == 0 or max_len < k:
        return OverlapGraph.empty(n)

    af = np.ones(n, dtype=bool) if align_from is None else np.asarray(align_from, bool)
    at = np.ones(n, dtype=bool) if align_to is None else np.asarray(align_to, bool)

    num_windows = max_len - k + 1
    packed_d = jnp.asarray(packed_np)
    lengths_d = jnp.asarray(lengths.astype(np.int32))
    af_d = jnp.asarray(af)

    W = packing.words_for(min(max_len, cap))
    max_off = max(1, min(max_len, cap) - int(rsoe))
    W3 = packing.words_for(min(max_off, min(max_len, cap)))
    hint_key = (k, int(cap), int(rsoe), int(soes), n >> 10)
    hint = _cap_hints.get(hint_key)
    if hint is not None:
        C = _round_cap(hint[0] * 3 // 2)
        C3 = _round_cap(hint[1] * 3 // 2)
        out, scal = _gcps_fused(
            packed_d, lengths_d, af_d, jnp.asarray(at), k, num_windows,
            int(cap), int(rsoe), int(soes), C, C3, W, W3)
        nkeep_i, total, nok_i, exp_total = (int(x) for x in np.asarray(scal))
        _cap_hints[hint_key] = (total, exp_total)
        _save_hints()
        if total <= C and exp_total <= C3:
            bump("gcps_candidates", total)
            bump("gcps_matches", nok_i)
            bump("gcps_domination_checks", exp_total)
            edges = np.asarray(out[: 3 * nkeep_i]).reshape(nkeep_i, 3)
            return OverlapGraph(n, edges[:, 0].copy(), edges[:, 1].copy(),
                                edges[:, 2].copy())
        # capacities undershot: fall through to the exact stepwise path

    worder, lo, counts, total, pvalid = _keys_and_counts(
        packed_d, lengths_d, af_d, jnp.asarray(at), k, num_windows, cap)
    total = int(total)
    if total == 0:
        _cap_hints[hint_key] = (0, 0)
        _save_hints()
        return OverlapGraph.empty(n)

    C = _round_cap(total)
    Bv, Cv, Ev, nok = _expand_verify(
        packed_d, lengths_d, worder, lo, counts, pvalid, af_d,
        num_windows, k, int(cap), C, W)

    # mark the padding tail invalid for the post-join stages
    t = jnp.arange(C, dtype=jnp.int32)
    Bm = jnp.where(t < nok, Bv, _I32MAX)

    (psrc, pdst, pell, pair_valid, rs, re_, r_start, cnt,
     exp_total) = _post_join_stage(Bm, Cv, Ev, lengths_d, int(rsoe),
                                   int(soes))
    # hot-loop counters (ref GCPS.h:111-118 GATHER_STATISTICS atomics)
    bump("gcps_candidates", total)
    bump("gcps_matches", int(nok))
    bump("gcps_domination_checks", int(exp_total))
    C3 = _round_cap(int(exp_total))
    _cap_hints[hint_key] = (total, int(exp_total))
    _save_hints()
    out, nkeep = _dominate_and_compact(
        packed_d, lengths_d, psrc, pdst, pell, pair_valid, rs, re_,
        r_start, cnt, C3, W3)
    m = int(nkeep)
    edges = np.asarray(out[: 3 * m]).reshape(m, 3)
    return OverlapGraph(n, edges[:, 0].copy(), edges[:, 1].copy(),
                        edges[:, 2].copy())


def find_exact_overlaps_device(packed_np, lengths_np, ell_min: int, cap: int,
                               align_from=None, align_to=None):
    """Device-join twin of prefsuf.find_exact_overlaps."""
    from alga_tpu.graph.prefsuf import OverlapMatches

    lengths = np.asarray(lengths_np, dtype=np.int64)
    n = len(lengths)
    max_len = int(lengths.max()) if n else 0
    k = int(ell_min)
    if n == 0 or max_len < k:
        z = np.zeros(0, dtype=np.int64)
        return OverlapMatches(z, z.copy(), z.copy())

    af = np.ones(n, dtype=bool) if align_from is None else np.asarray(align_from, bool)
    at = np.ones(n, dtype=bool) if align_to is None else np.asarray(align_to, bool)

    num_windows = max_len - k + 1
    packed_d = jnp.asarray(packed_np)
    lengths_d = jnp.asarray(lengths.astype(np.int32))
    af_d = jnp.asarray(af)

    worder, lo, counts, total, pvalid = _keys_and_counts(
        packed_d, lengths_d, af_d, jnp.asarray(at), k, num_windows, cap)
    total = int(total)
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return OverlapMatches(z, z.copy(), z.copy())

    C = _round_cap(total)
    W = packing.words_for(min(max_len, cap))
    Bv, Cv, Ev, nok = _expand_verify(
        packed_d, lengths_d, worder, lo, counts, pvalid, af_d,
        num_windows, k, int(cap), C, W)
    m = int(nok)
    return OverlapMatches(
        np.asarray(Bv[:m]).astype(np.int64),
        np.asarray(Cv[:m]).astype(np.int64),
        np.asarray(Ev[:m]).astype(np.int64),
    )
