"""Pallas TPU kernel: banded LCS DP over batches of read pairs.

The alignment hot loop of the error path (ref:
src/AlignmentControllers/AlignmentControllerLCS.cpp:61-150 — row-by-row
banded LCS with half-width E), re-designed for the VPU:

  * pairs are laid out across the trailing TILE lanes of a block — every
    DP row update is a handful of [1, TILE] vector ops;
  * both reads stay 2-BIT PACKED end to end: the kernel holds the packed
    words ([W, TILE] per block, a few KB of VMEM) and extracts the band's
    bases in-register with a word select-chain + per-lane funnel shift.
    The previous generation pre-aligned an UNPACKED read2 matrix on the
    XLA side (a ~log2(L)-pass HBM barrel shifter plus two [L, M] int32
    transposes) — that prep dominated the wall clock at ~3x the kernel's
    own time; packing shrinks the kernel's input bandwidth 16x and deletes
    the shifter/transposes outright;
  * the DP row index rides the GRID (R rows per grid step) so every VMEM
    access uses static offsets — Mosaic rejects dynamic-start sublane
    slices; the [B, TILE] DP carry and the harvested result live in VMEM
    scratch, which persists across the sequential grid steps of one
    pair-block;
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
# DP rows per grid step
ROWS_PER_STEP = 8


def _select_word(words_ref, wq, W: int, tile: int):
    """[1, tile] uint32: per-lane word words[wq[lane], lane] via a select
    chain over the (small, static) word axis."""
    out = jnp.zeros((1, tile), jnp.uint32)
    for w in range(W):
        out = jnp.where(wq == w, words_ref[0, w: w + 1, :], out)
    return out


def _dp_kernel(p1_ref, p2_ref, offs_ref, len1_ref, len2_ref,
               pstar_ref, dstar_ref, out_ref, prev_ref, res_ref,
               *, E: int, R: int, W: int):
    B = 2 * E + 1
    tile = p1_ref.shape[2]
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
        in_row = (pv >= p_beg) & (pv <= p_star) & (pv < len1)

        # read1 base at row pv: the row index is uniform across lanes, so
        # the word index is a traced scalar — still a select chain (Mosaic
        # has no dynamic sublane starts), then a uniform shift
        rowv = base + r
        wi1 = jax.lax.shift_right_logical(rowv, 4)
        a_word = jnp.zeros((1, tile), jnp.uint32)
        for w in range(W):
            a_word = jnp.where(jnp.full((1, tile), wi1 == w, jnp.bool_),
                               p1_ref[0, w: w + 1, :], a_word)
        sh1 = (2 * (rowv & 15)).astype(jnp.uint32)
        a = ((a_word >> sh1) & jnp.uint32(3)).astype(jnp.int32)

        # read2 band window [q0, q0+B) extracted from two packed words via
        # a per-lane funnel shift; q0 clamped at 0 (out-of-range diagonals
        # are masked by q_ok below)
        q0 = pv - offs - jnp.full((1, tile), E, jnp.int32)
        q0c = jnp.maximum(q0, zero1)
        wq = jax.lax.shift_right_logical(q0c, 4)
        sb = ((q0c & 15) * 2).astype(jnp.uint32)
        w_lo = _select_word(p2_ref, wq, W, tile)
        w_hi = _select_word(p2_ref, wq + 1, W, tile)
        hi_part = jnp.where(sb == 0, jnp.uint32(0),
                            w_hi << (jnp.uint32(32) - sb))
        v = (w_lo >> sb) | hi_part                     # bases q0c..q0c+15

        left = zero1
        new_rows = []
        for d in range(B):
            q = q0 + jnp.full((1, tile), d, jnp.int32)
            sh = (2 * (q - q0c)).astype(jnp.uint32)
            b = ((v >> sh) & jnp.uint32(3)).astype(jnp.int32)
            q_ok = (q >= zero1) & (q < len2) & in_row
            match = (a == b) & q_ok
            diag = prev[d: d + 1]
            up = prev[d + 1: d + 2] if d + 1 < B else zero1
            val = jnp.where(match, diag + one1, jnp.maximum(up, left))
            val = jnp.where(q_ok, val, zero1)
            left = val
            new_rows.append(val)
        new = jnp.concatenate(new_rows, axis=0)        # [B, tile]
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
                      interpret: bool | None = None, packed=None):
    """int32[M]: same contract as ops.align.banded_lcs_batch, executed as a
    Pallas kernel.  M is padded to a multiple of 1024 internally.  On a CPU
    backend the Pallas interpreter is used automatically.

    `packed` (uint32[N, W] 2-bit rows) is the preferred input; when only
    `codes` is given it is packed here (one cheap XLA pass).

    Runs under disable_x64: the package enables jax x64 globally, which
    makes pallas grid index-map constants i64 — Mosaic then fails to
    legalize its trivial scalar returns.  Everything here is int32."""
    with jax.enable_x64(False):
        if packed is None:
            packed = _pack_codes_device(codes, max_len)
        return _banded_lcs_pallas_x32(
            packed, lengths, r1, r2, offsets, max_len, E, interpret)


@partial(jax.jit, static_argnums=(1,))
def _pack_codes_device(codes, max_len: int):
    """uint32[N, W] little-endian 2-bit packing of a base-code matrix (the
    device twin of core.packing.codes_to_packed)."""
    W = (max_len + 15) // 16
    n, L = codes.shape
    pad = W * 16 - L
    c = jnp.pad(codes.astype(jnp.uint32), ((0, 0), (0, max(0, pad))))
    c = c[:, : W * 16].reshape(n, W, 16)
    sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    return (c << sh).sum(axis=2, dtype=jnp.uint32)


@partial(jax.jit, static_argnums=(5, 6, 7))
def _banded_lcs_pallas_x32(packed, lengths, r1, r2, offsets, max_len: int,
                           E: int = 2, interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    lengths = lengths.astype(jnp.int32)
    r1 = r1.astype(jnp.int32)
    r2 = r2.astype(jnp.int32)
    offsets = offsets.astype(jnp.int32)

    m = r1.shape[0]
    B = 2 * E + 1
    R = ROWS_PER_STEP
    W = (max_len + 15) // 16 + 1     # +1 spare word for the funnel's w_hi
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

    packed_u = packed.astype(jnp.uint32)
    wsrc = packed_u.shape[1]
    p1 = jnp.pad(packed_u[r1], ((0, 0), (0, W - wsrc)))     # [mp, W]
    p2 = jnp.pad(packed_u[r2], ((0, 0), (0, W - wsrc)))
    # tile layout: word index = sublane axis, pairs = trailing lanes; the
    # whole packed block (W x TILE words, a few KB) is resident per
    # pair-block — its BlockSpec index is constant over the row grid, so
    # it is DMA'd once per block, not per step
    p1_t = p1.T.reshape(W, mp // TILE, TILE).transpose(1, 0, 2)
    p2_t = p2.T.reshape(W, mp // TILE, TILE).transpose(1, 0, 2)

    def scalars(x):
        return x.reshape(mp // TILE, 1, TILE)

    scalar_spec = pl.BlockSpec((1, 1, TILE), lambda i, p: (i, 0, 0))
    grid = (mp // TILE, n_chunks)
    out = pl.pallas_call(
        partial(_dp_kernel, E=E, R=R, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, W, TILE), lambda i, p: (i, 0, 0)),
            pl.BlockSpec((1, W, TILE), lambda i, p: (i, 0, 0)),
            scalar_spec, scalar_spec, scalar_spec, scalar_spec, scalar_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, TILE), lambda i, p: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((mp // TILE, 1, TILE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, TILE), jnp.int32),
                        pltpu.VMEM((1, TILE), jnp.int32)],
        interpret=interpret,
    )(
        p1_t, p2_t, scalars(offsets), scalars(len1), scalars(len2),
        scalars(p_star), scalars(d_star),
    )
    return out.transpose(0, 2, 1).reshape(mp)[:m]
