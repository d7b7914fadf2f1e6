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
