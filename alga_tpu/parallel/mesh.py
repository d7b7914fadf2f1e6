"""Device-mesh sharding of the overlap sweep.

The reference has NO distributed execution (one process, pthreads —
SURVEY.md §2.9/2.10); this module is the new scale-out layer: reads are
sharded over a 1-D mesh axis 'r', each shard hashes its own reads, prefix
keys are exchanged with `all_gather` (rides ICI), candidate counts are
`psum`-reduced, and candidate verification runs shard-local on the pairs
each shard owns.

This is the sharding pattern the full multi-host pipeline uses: per-round
candidate routing is a key-partitioned exchange; graph passes merge
frontiers with psum'd convergence flags.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from alga_tpu.ops import bitops, hashes


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("r",))


def sharded_candidate_count(mesh: Mesh, packed, lengths, k: int,
                            num_windows: int):
    """Count suffix-prefix candidate pairs across the mesh: each shard
    hashes its local reads, all_gathers every shard's prefix keys, and
    joins its local window keys against them.  Returns the global count
    (replicated)."""

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P("r", None), P("r")), out_specs=P())
    def step(packed_l, lengths_l):
        k1, k2, valid = hashes.window_kmer_keys_u32(packed_l, lengths_l, k, num_windows)
        keys = (k1.astype(jnp.uint64) << 32) | k2.astype(jnp.uint64)
        pvalid = lengths_l >= k
        pk = jnp.where(pvalid, keys[:, 0], jnp.uint64(0xFFFFFFFFFFFFFFFF))
        all_pk = jax.lax.all_gather(pk, "r", tiled=True)
        sorted_pk = jnp.sort(all_pk)
        flat = keys.ravel()
        lo = jnp.searchsorted(sorted_pk, flat, side="left")
        hi = jnp.searchsorted(sorted_pk, flat, side="right")
        local = jnp.where(valid.ravel(), hi - lo, 0).sum()
        return jax.lax.psum(local, "r")

    return step(packed, lengths)


def sharded_overlap_step(mesh: Mesh, packed, lengths, cand_a, cand_starts,
                         cand_b, cand_lens, k: int, num_windows: int,
                         num_words: int):
    """The full sharded device step: candidate counting (collective join)
    + verification of a sharded batch of candidate pairs against the
    replicated read store.  Returns (global candidate count, per-candidate
    verification bits, per-candidate mismatch counts)."""

    count = sharded_candidate_count(mesh, packed, lengths, k, num_windows)

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P("r"), P("r"), P("r"), P("r")),
             out_specs=(P("r"), P("r")))
    def verify(packed_r, a, s, b, l):
        ok = bitops.substr_equal(packed_r, a, s, b, l, num_words)
        mm = bitops.overlap_mismatch_count(packed_r, a, s, b, l, num_words)
        return ok, mm

    ok, mm = verify(packed, cand_a, cand_starts, cand_b, cand_lens)
    return count, ok, mm
