"""Pallas TPU kernel: banded LCS DP over batches of read pairs.

The alignment hot loop of the error path (ref:
src/AlignmentControllers/AlignmentControllerLCS.cpp:61-150 — row-by-row
banded LCS with half-width E), re-designed for the VPU:

  * pairs are laid out across the 128 lanes of a tile; the 2E+1 band
    diagonals live in sublanes — every DP row update is a handful of
    [1, 128] vector ops;
  * read2 is PRE-ALIGNED by its per-pair offset on the XLA side
    (c2_aligned[m, t] = c2[m, t - offset_m - E]) which makes the band's
    column accesses uniform static slices: row p, diagonal d reads
    c2_aligned[:, p + d] — no per-lane gathers inside the kernel;
  * per-pair result extraction (row p*, diagonal d*) happens in-loop with
    masked selects, so the kernel streams rows once and emits one int32
    per pair.

Throughput metric: band cells/s = M * rows * (2E+1) (the "Gcells/s"
number in BASELINE.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128


def _dp_kernel(c1_ref, c2a_ref, offs_ref, len1_ref, len2_ref, pstar_ref,
               dstar_ref, out_ref, *, max_len: int, E: int):
    B = 2 * E + 1
    tile = c1_ref.shape[2]          # lanes

    # all values kept 2-D [1, tile] (Mosaic wants >= 2-D vectors)
    offs = offs_ref[0, :, :]
    len1 = len1_ref[0, :, :]
    len2 = len2_ref[0, :, :]
    p_star = pstar_ref[0, :, :]
    d_star = dstar_ref[0, :, :]
    p_beg = jnp.maximum(0, offs - E)

    def row(p, carry):
        prev, result = carry        # prev: tuple of B x [1, tile]
        a = c1_ref[0, pl.ds(p, 1), :]                 # [1, tile]
        in_row = (p >= p_beg) & (p <= p_star) & (p < len1)

        new_rows = []
        left = jnp.zeros((1, tile), jnp.int32)
        for d in range(B):
            q = p - offs + (d - E)
            q_ok = (q >= 0) & (q < len2) & in_row
            b = c2a_ref[0, pl.ds(p + d, 1), :]        # [1, tile]
            match = (a == b) & q_ok
            diag = prev[d]
            up = prev[d + 1] if d + 1 < B else jnp.zeros((1, tile), jnp.int32)
            val = jnp.where(match, diag + 1, jnp.maximum(up, left))
            val = jnp.where(q_ok, val, 0)
            left = val
            new_rows.append(val)
        cur = tuple(jnp.where(in_row, new_rows[d], prev[d]) for d in range(B))

        # harvest result at (p*, d*)
        at_star = (p == p_star)
        picked = jnp.zeros((1, tile), jnp.int32)
        for d in range(B):
            picked = jnp.where(d_star == d, cur[d], picked)
        result = jnp.where(at_star, picked, result)
        return cur, result

    prev0 = tuple(jnp.zeros((1, tile), jnp.int32) for _ in range(B))
    res0 = jnp.zeros((1, tile), jnp.int32)
    _, result = jax.lax.fori_loop(0, max_len, row, (prev0, res0))
    out_ref[0, :, :] = result


@partial(jax.jit, static_argnums=(5, 6, 7))
def banded_lcs_pallas(codes, lengths, r1, r2, offsets, max_len: int, E: int = 2,
                      interpret: bool | None = None):
    """int32[M]: same contract as ops.align.banded_lcs_batch, executed as a
    Pallas kernel.  M is padded to a multiple of 128 internally.  On a CPU
    backend the Pallas interpreter is used automatically."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    codes = codes.astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)
    r1 = r1.astype(jnp.int32)
    r2 = r2.astype(jnp.int32)
    offsets = offsets.astype(jnp.int32)

    m = r1.shape[0]
    B = 2 * E + 1
    mp = -(-m // LANES) * LANES
    pad = mp - m
    if pad:
        r1 = jnp.pad(r1, (0, pad))
        r2 = jnp.pad(r2, (0, pad))
        offsets = jnp.pad(offsets, (0, pad))

    len1 = lengths[r1]
    len2 = lengths[r2]
    p_star = jnp.minimum(len1 - 1, len2 - 1 + offsets)
    q_star = jnp.minimum(len2 - 1, p_star - offsets + E)
    d_star = jnp.clip(q_star - (p_star - offsets) + E, 0, B - 1)

    c1 = codes[r1]                                   # [mp, L]
    # pre-align read2: c2a[m, t] = c2[m, t - offset_m - (-E)] shifted so the
    # kernel reads diagonal d of row p at column p + d
    cols = jnp.arange(max_len + B - 1)[None, :]
    src = cols - offsets[:, None] - E
    src_ok = (src >= 0) & (src < max_len)
    c2a = jnp.where(
        src_ok,
        jnp.take_along_axis(codes[r2], jnp.clip(src, 0, max_len - 1), axis=1),
        -1,
    )

    # tile layout: rows = sequence position (sublanes), lanes = pairs
    c1_t = c1.T.reshape(max_len, mp // LANES, LANES).transpose(1, 0, 2)
    c2a_t = c2a.T.reshape(max_len + B - 1, mp // LANES, LANES).transpose(1, 0, 2)

    def scalars(x):
        return x.reshape(mp // LANES, 1, LANES)

    grid = (mp // LANES,)
    out = pl.pallas_call(
        partial(_dp_kernel, max_len=max_len, E=E),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, max_len, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, max_len + B - 1, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((mp // LANES, 1, LANES), jnp.int32),
        interpret=interpret,
    )(
        c1_t, c2a_t, scalars(offsets), scalars(len1), scalars(len2),
        scalars(p_star), scalars(d_star),
    )
    return out.transpose(0, 2, 1).reshape(mp)[:m]
