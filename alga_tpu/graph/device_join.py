"""Device-side candidate join for the overlap sweep.

Replaces the host sort-join in graph/prefsuf.py for large batches: window
keys never leave the device — prefix keys are sorted on device, window
keys binary-search into them, the ragged candidate expansion happens with
a static capacity via searchsorted-over-cumsum, verification (secondary
hash + exact packed compare) is fused, and only the compacted surviving
matches (src, dst, ell) are transferred.  This reduces device→host traffic
from O(N * windows) keys to O(matches) — the difference between ~3.5 GB
and ~100 MB at E. coli scale (SURVEY.md §7.3-4).

Capacities are rounded to power-of-two buckets so executables are reused
across chunks.
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
    """Stage 1: hash windows, sort prefix keys, count candidates/window."""
    k1, k2, valid = hashes.window_kmer_keys_u32(packed, lengths, k, num_windows)
    n = packed.shape[0]
    lengths = lengths.astype(jnp.int32)

    pvalid = (lengths >= k) & at
    pk1 = jnp.where(pvalid, k1[:, 0], jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(pk1)
    pk1_sorted = pk1[order]
    pk2_sorted = k2[:, 0][order]
    pids_sorted = order.astype(jnp.int32)
    pvalid_sorted = pvalid[order]

    pos = jnp.arange(num_windows, dtype=jnp.int32)[None, :]
    wvalid = valid & af[:, None] & (pos >= (lengths[:, None] - cap))

    flat1 = k1.ravel()
    lo = jnp.searchsorted(pk1_sorted, flat1, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(pk1_sorted, flat1, side="right").astype(jnp.int32)
    counts = jnp.where(wvalid.ravel(), hi - lo, 0)
    total = counts.sum()
    return (k1, k2, lo, counts, total,
            pk1_sorted, pk2_sorted, pids_sorted, pvalid_sorted)


@partial(jax.jit, static_argnums=(10, 11))
def _expand_verify(packed, lengths, k2, lo, counts,
                   pk2_sorted, pids_sorted, pvalid_sorted,
                   num_windows_arr, dummy, C: int, num_words: int):
    """Stage 2: materialize up to C candidates, verify, compact."""
    n = packed.shape[0]
    num_windows = k2.shape[1]
    lengths = lengths.astype(jnp.int32)

    csum = jnp.cumsum(counts)
    t = jnp.arange(C, dtype=jnp.int32)
    win_idx = jnp.searchsorted(csum, t, side="right").astype(jnp.int32)
    win_idx_c = jnp.minimum(win_idx, counts.shape[0] - 1)
    base = jnp.where(win_idx_c > 0, csum[jnp.maximum(win_idx_c - 1, 0)], 0)
    rank = t - base
    in_range = t < csum[-1]

    B = (win_idx_c // num_windows).astype(jnp.int32)
    p = (win_idx_c % num_windows).astype(jnp.int32)
    pref_slot = lo[win_idx_c] + rank
    pref_slot = jnp.clip(pref_slot, 0, n - 1)
    Cid = pids_sorted[pref_slot]

    ell = lengths[B] - p
    ok = in_range & pvalid_sorted[pref_slot] & (B != Cid) & (lengths[Cid] >= ell)
    # secondary hash agreement
    ok &= k2[B, p] == pk2_sorted[pref_slot]

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

    # compact survivors to the front
    key = jnp.where(ok, t, jnp.int32(C))
    perm = jnp.argsort(key)
    return B[perm], Cid[perm], ell[perm], ok.sum()


def _pow2(x: int, lo: int = 1 << 14) -> int:
    return max(lo, 1 << (max(int(x), 1) - 1).bit_length())


def find_exact_overlaps_device(packed_np, lengths_np, ell_min: int, cap: int,
                               align_from=None, align_to=None):
    """Device-join twin of prefsuf.find_exact_overlaps (full-mask only:
    align masks are applied by zeroing lengths of excluded reads)."""
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

    (k1, k2, lo, counts, total, pk1s, pk2s, pids, pvs) = _keys_and_counts(
        packed_d, lengths_d, jnp.asarray(af), jnp.asarray(at), k,
        num_windows, cap)
    total = int(total)
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return OverlapMatches(z, z.copy(), z.copy())

    C = _pow2(total)
    W = packing.words_for(min(max_len, cap))
    Bv, Cv, Ev, nok = _expand_verify(
        packed_d, lengths_d, k2, lo, counts, pk2s, pids, pvs,
        jnp.int32(num_windows), jnp.int32(0), C, W)
    m = int(nok)
    return OverlapMatches(
        np.asarray(Bv[:m]).astype(np.int64),
        np.asarray(Cv[:m]).astype(np.int64),
        np.asarray(Ev[:m]).astype(np.int64),
    )
