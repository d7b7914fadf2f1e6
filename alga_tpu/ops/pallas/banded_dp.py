"""Pallas TPU kernel: banded LCS DP over batches of read pairs.

The alignment hot loop of the error path (ref:
src/AlignmentControllers/AlignmentControllerLCS.cpp:61-150 — row-by-row
banded LCS with half-width E), re-designed for the VPU:

  * pairs are laid out across the trailing TILE lanes of a block — every
    DP row update is a handful of [1, TILE] vector ops;
  * read2 is PRE-ALIGNED by its per-pair offset on the XLA side
    (c2_aligned[m, t] = c2[m, t - offset_m - E]) which makes the band's
    column accesses uniform row reads: row p, diagonal d reads
    c2_aligned[:, p + d] — no per-lane gathers inside the kernel;
  * the DP row index rides the GRID (R rows per grid step), so every
    in-kernel memory access uses static offsets — Mosaic rejects
    dynamic-start sublane slices (`pl.ds(p, B)` with traced p needs a
    provable multiple-of-8 start), so the row loop cannot be a fori_loop
    over dynamic row slices.  The [B, TILE] DP carry and the harvested
    result live in VMEM scratch, which persists across the sequential
    grid steps of one pair-block;
  * rows p*R+r need aligned-read2 rows p*R+r+d (d < B <= R+1), all of
    which sit inside the [2R, TILE] window formed by TWO adjacent R-row
    blocks of c2_aligned — streamed per grid step via two BlockSpecs on
    the same array, offset by one block;
  * per-pair result extraction (row p*, diagonal d*) happens in-row with
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
from jax.experimental.pallas import tpu as pltpu

# pairs per grid step: 1024 = 8 sublanes x 128 lanes — a [1, TILE] vector
# op fills a whole (8, 128) vreg, 8x the VPU utilization of a 128-lane tile
TILE = 1024
# DP rows per grid step; must satisfy R >= B - 1 so the two adjacent
# R-row blocks of c2_aligned cover rows r..r+B-1 for every r < R
ROWS_PER_STEP = 8


def _dp_kernel(c1_ref, c2lo_ref, c2hi_ref, offs_ref, len1_ref, len2_ref,
               pstar_ref, dstar_ref, out_ref, prev_ref, res_ref,
               *, E: int, R: int):
    B = 2 * E + 1
    tile = c1_ref.shape[2]
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        prev_ref[...] = jnp.zeros((B, tile), jnp.int32)
        res_ref[...] = jnp.zeros((1, tile), jnp.int32)

    zero1 = jnp.zeros((1, tile), jnp.int32)
    one1 = jnp.ones((1, tile), jnp.int32)
    offs = offs_ref[0]
    len1 = len1_ref[0]
    len2 = len2_ref[0]
    p_star = pstar_ref[0]
    d_star = dstar_ref[0]
    p_beg = jnp.maximum(zero1, offs - jnp.full((1, tile), E, jnp.int32))
    base = (p * R).astype(jnp.int32)

    prev = prev_ref[...]
    result = res_ref[...]
    for r in range(R):
        pv = jnp.broadcast_to(base, (1, tile)) + jnp.full(
            (1, tile), r, jnp.int32)
        a = c1_ref[0, r: r + 1, :]                         # [1, tile]
        in_row = (pv >= p_beg) & (pv <= p_star) & (pv < len1)

        left = zero1
        new_rows = []
        for d in range(B):
            idx = r + d                                    # static
            b = (c2lo_ref[0, idx: idx + 1, :] if idx < R
                 else c2hi_ref[0, idx - R: idx - R + 1, :])
            q = pv - offs + jnp.full((1, tile), d - E, jnp.int32)
            q_ok = (q >= zero1) & (q < len2) & in_row
            match = (a == b) & q_ok
            diag = prev[d: d + 1]
            up = prev[d + 1: d + 2] if d + 1 < B else zero1
            val = jnp.where(match, diag + one1, jnp.maximum(up, left))
            val = jnp.where(q_ok, val, zero1)
            left = val
            new_rows.append(val)
        new = jnp.concatenate(new_rows, axis=0)            # [B, tile]
        prev = jnp.where(in_row, new, prev)

        # harvest result at (p*, d*)
        picked = zero1
        for d in range(B):
            dv = jnp.full((1, tile), d, jnp.int32)
            picked = jnp.where(d_star == dv, prev[d: d + 1], picked)
        result = jnp.where(pv == p_star, picked, result)

    prev_ref[...] = prev
    res_ref[...] = result
    out_ref[0, :, :] = result


def banded_lcs_pallas(codes, lengths, r1, r2, offsets, max_len: int, E: int = 2,
                      interpret: bool | None = None):
    """int32[M]: same contract as ops.align.banded_lcs_batch, executed as a
    Pallas kernel.  M is padded to a multiple of 1024 internally.  On a CPU
    backend the Pallas interpreter is used automatically.

    Runs under disable_x64: the package enables jax x64 globally, which
    makes pallas grid index-map constants i64 — Mosaic then fails to
    legalize its trivial scalar returns.  Everything here is int32."""
    with jax.enable_x64(False):
        return _banded_lcs_pallas_x32(
            codes, lengths, r1, r2, offsets, max_len, E, interpret)


@partial(jax.jit, static_argnums=(5, 6, 7))
def _banded_lcs_pallas_x32(codes, lengths, r1, r2, offsets, max_len: int,
                           E: int = 2, interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    codes = codes.astype(jnp.int32)
    lengths = lengths.astype(jnp.int32)
    r1 = r1.astype(jnp.int32)
    r2 = r2.astype(jnp.int32)
    offsets = offsets.astype(jnp.int32)

    m = r1.shape[0]
    B = 2 * E + 1
    R = ROWS_PER_STEP
    assert R >= B - 1
    mp = -(-m // TILE) * TILE
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

    n_chunks = -(-max_len // R)
    rows1 = n_chunks * R                 # c1 rows, grid-covered
    rows2 = (n_chunks + 1) * R           # c2_aligned rows (one spare block)

    c1 = codes[r1]                                   # [mp, L]
    c1 = jnp.pad(c1, ((0, 0), (0, rows1 - max_len)))
    # pre-align read2: c2a[m, t] = c2[m, t - offset_m - E] so the kernel
    # reads diagonal d of row p at column p + d.  The per-row variable
    # shift is a BARREL SHIFTER — ceil(log2(maxshift)) uniform rolls +
    # masked selects — because a per-element take_along_axis gather is
    # catastrophically slow on TPU (measured 614 ms vs 4 ms for the whole
    # row gather at M=256k; the rolls cost ~2 HBM passes per bit)
    w2 = rows2
    shift = offsets + E                              # [mp], >= 0
    x = jnp.pad(codes[r2], ((0, 0), (0, w2 - max_len)))
    nbits = max(1, int(w2 - 1).bit_length())
    for k in range(nbits):
        rolled = jnp.roll(x, 1 << k, axis=1)
        bit = ((shift >> k) & 1)[:, None].astype(bool)
        x = jnp.where(bit, rolled, x)
    cols = jnp.arange(w2)[None, :]
    src = cols - shift[:, None]
    src_ok = (src >= 0) & (src < max_len)            # mask roll wraparound
    c2a = jnp.where(src_ok, x, -1)

    # tile layout: rows = sequence position, trailing dim = pairs
    c1_t = c1.T.reshape(rows1, mp // TILE, TILE).transpose(1, 0, 2)
    c2a_t = c2a.T.reshape(rows2, mp // TILE, TILE).transpose(1, 0, 2)

    def scalars(x):
        return x.reshape(mp // TILE, 1, TILE)

    scalar_spec = pl.BlockSpec((1, 1, TILE), lambda i, p: (i, 0, 0))
    grid = (mp // TILE, n_chunks)
    out = pl.pallas_call(
        partial(_dp_kernel, E=E, R=R),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, TILE), lambda i, p: (i, p, 0)),
            pl.BlockSpec((1, R, TILE), lambda i, p: (i, p, 0)),
            pl.BlockSpec((1, R, TILE), lambda i, p: (i, p + 1, 0)),
            scalar_spec, scalar_spec, scalar_spec, scalar_spec, scalar_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, TILE), lambda i, p: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((mp // TILE, 1, TILE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, TILE), jnp.int32),
                        pltpu.VMEM((1, TILE), jnp.int32)],
        interpret=interpret,
    )(
        c1_t, c2a_t, c2a_t, scalars(offsets), scalars(len1), scalars(len2),
        scalars(p_star), scalars(d_star),
    )
    return out.transpose(0, 2, 1).reshape(mp)[:m]
