"""Sharded overlap sweep: the multi-device GCPS candidate generator.

Reads are data-sharded over mesh axis 'r'.  Each shard hashes its own
windows, all_gathers every shard's prefix keys (ICI), sort-joins locally,
expands its candidates into a static-capacity buffer (uniform across
shards — SPMD), verifies with the packed-bit kernel against the replicated
read store, and emits compacted matches.  The host concatenates per-shard
outputs into the same OverlapMatches the single-device path produces, so
the rest of the pipeline (regimes, domination pruning, simplification) is
unchanged.

Collective layout: one all_gather of N prefix-key pairs per sweep + a
psum'd capacity reduction — both O(N) on ICI, no DCN dependence for a
single pod slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from alga_tpu.core import packing
from alga_tpu.ops import hashes
from alga_tpu.ops.bitops import _pad_words, _shifted_words


def _sharded_fns(mesh: Mesh, k: int, num_windows: int, cap: int,
                 num_words: int, C: int | None):
    """Build the shard_map'd stage functions for given static config."""

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P("r", None), P("r"), P()),
             out_specs=P("r"))
    def stage_count(packed_l, lengths_l, lengths_all):
        k1, k2, valid = hashes.window_kmer_keys_u32(packed_l, lengths_l, k, num_windows)
        lengths_l = lengths_l.astype(jnp.int32)
        pvalid_all = lengths_all.astype(jnp.int32) >= k
        pk1_l = jnp.where(lengths_l >= k, k1[:, 0], jnp.uint32(0xFFFFFFFF))
        all_pk1 = jax.lax.all_gather(pk1_l, "r", tiled=True)
        all_pk1 = jnp.where(pvalid_all, all_pk1, jnp.uint32(0xFFFFFFFF))
        spk1 = jnp.sort(all_pk1)

        pos = jnp.arange(num_windows, dtype=jnp.int32)[None, :]
        wvalid = valid & (pos >= (lengths_l[:, None] - cap))
        flat = k1.ravel()
        lo = jnp.searchsorted(spk1, flat, side="left")
        hi = jnp.searchsorted(spk1, flat, side="right")
        counts = jnp.where(wvalid.ravel(), hi - lo, 0)
        return counts.sum()[None]

    if C is None:
        return stage_count, None

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P("r", None), P("r"), P(), P()),
             out_specs=(P("r", None), P("r")))
    def stage_expand(packed_l, lengths_l, packed_all, lengths_all):
        my = jax.lax.axis_index("r")
        per = packed_l.shape[0]
        base_id = (my * per).astype(jnp.int32)

        k1, k2, valid = hashes.window_kmer_keys_u32(packed_l, lengths_l, k, num_windows)
        lengths_l = lengths_l.astype(jnp.int32)
        lengths_all32 = lengths_all.astype(jnp.int32)

        pvalid_all = lengths_all32 >= k
        pk1_l = jnp.where(lengths_l >= k, k1[:, 0], jnp.uint32(0xFFFFFFFF))
        pk2_l = k2[:, 0]
        all_pk1 = jax.lax.all_gather(pk1_l, "r", tiled=True)
        all_pk2 = jax.lax.all_gather(pk2_l, "r", tiled=True)
        all_pk1 = jnp.where(pvalid_all, all_pk1, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(all_pk1)
        spk1 = all_pk1[order]
        spk2 = all_pk2[order]
        sids = order.astype(jnp.int32)
        svalid = pvalid_all[order]

        pos = jnp.arange(num_windows, dtype=jnp.int32)[None, :]
        wvalid = valid & (pos >= (lengths_l[:, None] - cap))
        flat = k1.ravel()
        lo = jnp.searchsorted(spk1, flat, side="left").astype(jnp.int32)
        hi = jnp.searchsorted(spk1, flat, side="right").astype(jnp.int32)
        counts = jnp.where(wvalid.ravel(), hi - lo, 0)

        csum = jnp.cumsum(counts)
        t = jnp.arange(C, dtype=jnp.int32)
        widx = jnp.searchsorted(csum, t, side="right").astype(jnp.int32)
        widx_c = jnp.minimum(widx, counts.shape[0] - 1)
        prev = jnp.where(widx_c > 0, csum[jnp.maximum(widx_c - 1, 0)], 0)
        rank = t - prev
        in_range = t < csum[-1]

        Bl = (widx_c // num_windows).astype(jnp.int32)      # local row
        p = (widx_c % num_windows).astype(jnp.int32)
        slot = jnp.clip(lo[widx_c] + rank, 0, spk1.shape[0] - 1)
        Cid = sids[slot]
        Bg = Bl + base_id

        ell = lengths_l[Bl] - p
        ok = (in_range & svalid[slot] & (Bg != Cid)
              & (lengths_all32[Cid] >= ell))
        ok &= k2[Bl, p] == spk2[slot]

        packed_pad = _pad_words(packed_all.astype(jnp.uint32))
        local_pad = _pad_words(packed_l.astype(jnp.uint32))
        ml = jnp.where(ok, ell, 0).astype(jnp.int32)
        eq = jnp.ones(C, dtype=bool)
        for w in range(num_words):
            a_word = _shifted_words(local_pad, Bl, p, w)
            b_word = packed_pad[Cid, jnp.minimum(w, packed_all.shape[1] - 1)]
            diff = a_word ^ b_word
            rem = jnp.clip(ml - 16 * w, 0, 16)
            mask = jnp.where(rem >= 16, jnp.uint32(0xFFFFFFFF),
                             (jnp.uint32(1) << (rem.astype(jnp.uint32) * 2)) - 1)
            eq &= (diff & mask) == 0
        ok &= eq

        key = jnp.where(ok, t, jnp.int32(C))
        perm = jnp.argsort(key)
        out = jnp.stack([Bg[perm], Cid[perm], ell[perm]], axis=1)
        return out[None], ok.sum()[None]

    return stage_count, stage_expand


def find_exact_overlaps_sharded(mesh: Mesh, packed_np, lengths_np,
                                ell_min: int, cap: int):
    """Multi-device twin of find_exact_overlaps (full masks)."""
    from alga_tpu.graph.prefsuf import OverlapMatches

    d = mesh.devices.size
    lengths = np.asarray(lengths_np, dtype=np.int32)
    n = len(lengths)
    max_len = int(lengths.max()) if n else 0
    k = int(ell_min)
    if n == 0 or max_len < k:
        z = np.zeros(0, dtype=np.int64)
        return OverlapMatches(z, z.copy(), z.copy())

    # pad N to a multiple of the mesh size (padded reads have length 0)
    npad = -(-n // d) * d
    if npad != n:
        packed_np = np.vstack([packed_np,
                               np.zeros((npad - n, packed_np.shape[1]),
                                        dtype=packed_np.dtype)])
        lengths = np.append(lengths, np.zeros(npad - n, dtype=np.int32))

    num_windows = max_len - k + 1
    W = packing.words_for(min(max_len, cap))

    packed_d = jnp.asarray(packed_np)
    lengths_d = jnp.asarray(lengths)

    stage_count, _ = _sharded_fns(mesh, k, num_windows, cap, W, None)
    per_shard = np.asarray(stage_count(packed_d, lengths_d, lengths_d))
    cmax = int(per_shard.max())
    if cmax == 0:
        z = np.zeros(0, dtype=np.int64)
        return OverlapMatches(z, z.copy(), z.copy())
    C = max(1 << 12, 1 << (cmax - 1).bit_length())

    _, stage_expand = _sharded_fns(mesh, k, num_windows, cap, W, C)
    out, nok = stage_expand(packed_d, lengths_d, packed_d, lengths_d)
    out = np.asarray(out)          # [d, C, 3]
    nok = np.asarray(nok)          # [d]

    srcs, dsts, ells = [], [], []
    for s in range(d):
        m = int(nok[s])
        srcs.append(out[s, :m, 0])
        dsts.append(out[s, :m, 1])
        ells.append(out[s, :m, 2])
    return OverlapMatches(
        np.concatenate(srcs).astype(np.int64),
        np.concatenate(dsts).astype(np.int64),
        np.concatenate(ells).astype(np.int64),
    )
