"""Pallas TPU kernels: banded LCS DP over batches of read pairs.

The alignment hot loop of the error path (ref:
src/AlignmentControllers/AlignmentControllerLCS.cpp:61-150 — row-by-row
banded LCS with half-width E), re-designed for the VPU/MXU:

  * pairs are laid out across a [8, tile/8] block — full (8, 128)-vreg
    sublane utilization (a [1, tile] row vector would waste 7/8 of every
    vreg);
  * both reads stay 2-BIT PACKED end to end;
  * per-pair row fetch is a **one-hot matmul gather on the MXU** when
    the read table is small enough (measured: XLA's TPU gather costs
    ~34 ns per index regardless of row width — 4.5 ms for 2^17 rows —
    while an MXU one-hot gather of the same rows runs in a few hundred
    microseconds).  Large tables fall back to the XLA gather;
  * read2 is shifted by the pair offset IN-KERNEL in the packed domain
    (shifted2[j] = read2[j - offset]), via a per-lane word-select chain
    + funnel shift executed once per 16-row grid step over the resident
    raw words — after this the band window of DP row p starts at the
    *uniform* position j0 = p - E, so the inner row loop uses STATIC
    word indices and STATIC bit shifts only;
  * the packed word index rides the GRID: each grid step owns one
    16-row word of read1 (streamed by the BlockSpec index map) while
    read2's raw words stay resident per pair-block;
  * the [B, 8, tile/8] DP carry lives in VMEM scratch, persisting
    across the sequential grid steps of one pair-block; rows stop
    updating past the result row p* (the carry freezes), so the result
    is harvested ONCE on the final grid step instead of every row.

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

# pairs per grid step: at least 1024 (one (8,128) vreg at int32); large
# batches use up to 8192 lanes per step to amortize per-step overhead
TILE = 1024
MAX_TILE = 8192
SUB = 8                       # sublane rows per pair-block
# DP rows per grid step == bases per packed word (fixed by the layout)
ROWS_PER_STEP = 16

# table-size bound for the MXU one-hot gather (cost ~ M*N compares; at
# N = 16384, M = 2^18 that is ~4G lane-ops — beyond this the XLA gather
# wins back)
MXU_GATHER_MAX_N = 16384


def _pick_tile(m: int) -> int:
    t = TILE
    while t < MAX_TILE and t < m:
        t *= 2
    return t


# ---------------------------------------------------------------------------
# MXU one-hot gather: rows of a small packed table, fetched as byte
# planes via a bf16 matmul (bytes are <= 255, exactly representable)

def _gather_kernel(idx_ref, tb_ref, out_ref, acc_ref, *, n_chunks: int):
    n = pl.program_id(1)
    TN = tb_ref.shape[1]
    TM = idx_ref.shape[1]

    @pl.when(n == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (TN, TM), 0) + n * TN
    oh = (iota == idx_ref[0, 0:1, :]).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        tb_ref[...], oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(n == n_chunks - 1)
    def _emit():
        out_ref[0] = acc_ref[...].astype(jnp.int32)


def mxu_gather_planes(planes, idx, tm: int = 4096, tn: int = 1024,
                      interpret: bool = False):
    """int32[P, M]: planes[:, idx] — a gather over the minor axis executed
    as a one-hot bf16 matmul on the MXU.  `planes` values must be exact in
    bf16 (bytes).  P must be a multiple of 8; idx out of [0, N) yields
    row 0 of nothing (zeros)."""
    P, N = planes.shape
    m = idx.shape[0]
    tm = min(tm, max(TILE, 1 << (max(1, m - 1)).bit_length()))
    mp = -(-m // tm) * tm
    npad = -(-N // tn) * tn
    tb = planes.astype(jnp.bfloat16)
    if npad > N:
        tb = jnp.pad(tb, ((0, 0), (0, npad - N)))
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, mp - m), constant_values=-1)

    out = pl.pallas_call(
        partial(_gather_kernel, n_chunks=npad // tn),
        grid=(mp // tm, npad // tn),
        in_specs=[
            pl.BlockSpec((1, 1, tm), lambda i, n: (i, 0, 0)),
            pl.BlockSpec((P, tn), lambda i, n: (0, n)),
        ],
        out_specs=pl.BlockSpec((1, P, tm), lambda i, n: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((mp // tm, P, tm), jnp.int32),
        scratch_shapes=[pltpu.VMEM((P, tm), jnp.float32)],
        interpret=interpret,
    )(idx_p.reshape(mp // tm, 1, tm), tb)
    return out.transpose(1, 0, 2).reshape(P, mp)[:, :m]


def _table_planes(packed_u, lengths):
    """bf16-safe byte planes [4*wsrc + 2 (padded to 8), N]: the packed
    words of every read split into 4 bytes each, plus the 2 length bytes
    (lengths <= 65535)."""
    n, wsrc = packed_u.shape
    by = jax.lax.bitcast_convert_type(
        packed_u, jnp.uint8).reshape(n, 4 * wsrc)
    lens = lengths.astype(jnp.uint32)
    lanes = [by.T.astype(jnp.int32),
             (lens & 0xFF).astype(jnp.int32)[None, :],
             ((lens >> 8) & 0xFF).astype(jnp.int32)[None, :]]
    planes = jnp.concatenate(lanes, axis=0)
    P0 = planes.shape[0]
    P = -(-P0 // 8) * 8
    if P > P0:
        planes = jnp.pad(planes, ((0, P - P0), (0, 0)))
    return planes


def _rows_from_planes(planes, wsrc: int):
    """(words u32[wsrc, M], lengths i32[M]) from gathered byte planes."""
    words = []
    for w in range(wsrc):
        b = [planes[4 * w + k].astype(jnp.uint32) for k in range(4)]
        words.append(b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24))
    lens = planes[4 * wsrc] | (planes[4 * wsrc + 1] << 8)
    return jnp.stack(words, axis=0), lens


# ---------------------------------------------------------------------------
# banded DP kernel

def _dp_kernel(a_ref, braw_ref, offs_ref, len2_ref,
               pstar_ref, dstar_ref, out_ref, prev_ref,
               *, E: int, n_chunks: int, W: int):
    B = 2 * E + 1
    t8 = a_ref.shape[3]
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        prev_ref[...] = jnp.zeros((B, SUB, t8), jnp.int32)
        out_ref[0] = jnp.zeros((SUB, t8), jnp.int32)

    zero = jnp.zeros((SUB, t8), jnp.int32)
    one = jnp.ones((SUB, t8), jnp.int32)
    offs = offs_ref[0]
    len2 = len2_ref[0]
    p_star = pstar_ref[0]
    p_beg = jnp.maximum(zero, offs - jnp.full((SUB, t8), E, jnp.int32))
    base = (p * ROWS_PER_STEP).astype(jnp.int32)
    basev = jnp.broadcast_to(base, (SUB, t8))

    aw = a_ref[0, 0]        # read1 word p            [SUB, t8] uint32

    # shifted read2 words p-1, p, p+1 (shifted2[j] = read2[j - offset]),
    # built IN-KERNEL from the resident raw words: per-lane word select
    # over the (static) word range + one funnel shift — once per 16-row
    # grid step, so it amortizes to ~4 select chains / 16 rows (the XLA
    # twin of this shift cost ~3 ms/2^17 pairs as a standalone pass)
    ws = offs >> 4
    bs = (2 * (offs & 15)).astype(jnp.uint32)
    raw = [braw_ref[0, w] for w in range(W)]
    zero_u = jnp.zeros((SUB, t8), jnp.uint32)

    def raw_at(widx):
        # per-lane raw word widx (int32 [SUB, t8]); out-of-range -> 0
        out = zero_u
        for k in range(W):
            out = jnp.where(widx == k, raw[k], out)
        return out

    # raw word indices needed: (p + delta) - ws - 1 for delta in -1..2
    lo_prev = raw_at(jnp.full((SUB, t8), p - 2, jnp.int32) - ws)
    sel = [lo_prev]
    for delta in (-1, 0, 1):
        sel.append(raw_at(jnp.full((SUB, t8), p + delta, jnp.int32) - ws))
    bs_ok = bs != 0
    inv = jnp.uint32(32) - bs

    def funnel(lo, hi):
        return (lo << bs) | jnp.where(bs_ok, hi >> inv, jnp.uint32(0))

    w_m1 = funnel(sel[1], sel[0])
    w_0 = funnel(sel[2], sel[1])
    w_1 = funnel(sel[3], sel[2])

    prev = prev_ref[...]
    for r in range(ROWS_PER_STEP):
        pv = basev + jnp.full((SUB, t8), r, jnp.int32)
        in_row = (pv >= p_beg) & (pv <= p_star)   # p* <= len1-1 already

        # read1 base at row pv = 16p + r: bit 2r of word p — fully static
        a = ((aw >> np.uint32(2 * r)) & jnp.uint32(3)).astype(jnp.int32)

        # band window bases j0..j0+B-1 of the SHIFTED read2, j0 = pv - E:
        # static funnel over words p-1..p+1 (t = r - E is the base index
        # relative to word p)
        t = r - E
        if t < 0:
            v = (w_m1 >> np.uint32(32 + 2 * t)) | (w_0 << np.uint32(-2 * t))
        elif t == 0:
            v = w_0
        elif 2 * (t + B - 1) < 32:
            v = w_0 >> np.uint32(2 * t)
        else:
            v = (w_0 >> np.uint32(2 * t)) | (w_1 << np.uint32(32 - 2 * t))

        # original read2 column of diagonal d: q = pv - offs - E + d
        q_base = pv - offs - jnp.full((SUB, t8), E, jnp.int32)
        left = zero
        new_rows = []
        for d in range(B):
            q = q_base + jnp.full((SUB, t8), d, jnp.int32)
            b = ((v >> np.uint32(2 * d)) & jnp.uint32(3)).astype(jnp.int32)
            q_ok = (q >= zero) & (q < len2) & in_row
            diag = prev[d]
            up = prev[d + 1] if d + 1 < B else zero
            val = jnp.where(a == b, diag + one, jnp.maximum(up, left))
            val = jnp.where(q_ok, val, zero)
            left = val
            new_rows.append(val)
        new = jnp.stack(new_rows, axis=0)          # [B, SUB, t8]
        prev = jnp.where(in_row[None], new, prev)

    prev_ref[...] = prev

    # the carry freezes once pv > p*, so the final carry row IS row p*:
    # harvest (p*, d*) once on the last step
    @pl.when(p == n_chunks - 1)
    def _harvest():
        d_star = dstar_ref[0]
        picked = zero
        for d in range(B):
            dv = jnp.full((SUB, t8), d, jnp.int32)
            picked = jnp.where(d_star == dv, prev[d], picked)
        out_ref[0] = picked


def banded_lcs_pallas(codes, lengths, r1, r2, offsets, max_len: int, E: int = 2,
                      interpret: bool | None = None, packed=None):
    """int32[M]: same contract as ops.align.banded_lcs_batch, executed as a
    Pallas kernel.  M is padded internally.  On a CPU backend the Pallas
    interpreter is used automatically.

    `packed` (uint32[N, W] 2-bit rows) is the preferred input; when only
    `codes` is given it is packed here (one cheap XLA pass).

    Runs under disable_x64: the package enables jax x64 globally, which
    makes pallas grid index-map constants i64 — Mosaic then fails to
    legalize its trivial scalar returns.  Everything here is int32.

    Band half-widths above 7 (band > 16 bases) exceed the kernel's
    32-bit window extraction and fall back to the XLA kernel."""
    if 2 * E + 1 > 16:
        from alga_tpu.ops.align import banded_lcs_batch
        if codes is None:
            from alga_tpu.core import packing
            codes = jnp.asarray(packing.packed_to_codes(np.asarray(packed)))
        return banded_lcs_batch(codes, lengths, r1, r2, offsets, max_len, E)
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
    W = (max_len + 15) // 16         # words per read / row-grid steps
    tile = _pick_tile(m)
    mp = -(-m // tile) * tile
    pad = mp - m
    if pad:
        r1 = jnp.pad(r1, (0, pad))
        r2 = jnp.pad(r2, (0, pad))
        offsets = jnp.pad(offsets, (0, pad))

    packed_u = packed.astype(jnp.uint32)
    n_reads, wsrc = packed_u.shape

    if n_reads <= MXU_GATHER_MAX_N:
        # fetch both pairs' rows (and lengths) in ONE one-hot MXU gather
        planes = _table_planes(packed_u, lengths)
        both = mxu_gather_planes(
            planes, jnp.concatenate([r1, r2]), interpret=interpret)
        w1T, len1 = _rows_from_planes(both[:, :mp], wsrc)
        w2T, len2 = _rows_from_planes(both[:, mp:], wsrc)
    else:
        w1T = packed_u[r1].T
        w2T = packed_u[r2].T
        len1 = lengths[r1]
        len2 = lengths[r2]

    p_star = jnp.minimum(len1 - 1, len2 - 1 + offsets)
    q_star = jnp.minimum(len2 - 1, p_star - offsets + E)
    d_star = jnp.clip(q_star - (p_star - offsets) + E, 0, B - 1)

    if wsrc < W:
        w1T = jnp.pad(w1T, ((0, W - wsrc), (0, 0)))
        w2T = jnp.pad(w2T, ((0, W - wsrc), (0, 0)))
    elif wsrc > W:
        w1T = w1T[:W]
        w2T = w2T[:W]

    # tile layout: [word, pair-block, 8, tile/8] — pair i of a block sits
    # at (sublane i // (tile/8), lane i % (tile/8)).  read1 words are
    # streamed one per grid step; read2's raw words are resident per
    # block (the in-kernel shift needs a per-lane word window)
    t8 = tile // SUB
    p1_t = w1T.reshape(W, mp // tile, SUB, t8)
    p2_t = jnp.transpose(
        w2T.reshape(W, mp // tile, SUB, t8), (1, 0, 2, 3))

    def scalars(x):
        return x.reshape(mp // tile, SUB, t8)

    scalar_spec = pl.BlockSpec((1, SUB, t8), lambda i, p: (i, 0, 0))
    grid = (mp // tile, W)
    out = pl.pallas_call(
        partial(_dp_kernel, E=E, n_chunks=W, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, SUB, t8), lambda i, p: (p, i, 0, 0)),
            pl.BlockSpec((1, W, SUB, t8), lambda i, p: (i, 0, 0, 0)),
            scalar_spec, scalar_spec, scalar_spec, scalar_spec,
        ],
        out_specs=pl.BlockSpec((1, SUB, t8), lambda i, p: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((mp // tile, SUB, t8), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, SUB, t8), jnp.int32)],
        interpret=interpret,
    )(
        p1_t, p2_t,
        scalars(offsets), scalars(len2), scalars(p_star), scalars(d_star),
    )
    return out.reshape(mp)[:m]
