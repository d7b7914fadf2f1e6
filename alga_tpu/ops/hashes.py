"""Rolling polynomial hash kernels over packed 2-bit reads.

TPU-first redesign of the reference's per-overlap-length iterative-deepening
hash sweep (ref: src/GraphCreators/GraphCreatorPrefSuf.cpp:73-126,213-236):
instead of ~450 sequential rounds maintaining live prefix/suffix hashes under
striped locks, we compute the hash of EVERY length-k window of every read in
one `lax.scan` (one dispatch), and candidate generation becomes a single
sort-join of window keys against prefix keys (see graph/prefsuf.py).

Hashing: two independent polynomial hashes modulo 2^32 with odd multipliers
(natural uint32 wrap-around — no int64 emulation on TPU, unlike the
reference's 10^18+3 / 10^9+7 moduli, ref Params.cpp:721, GCPS.h:42):
    h(window) = sum_j code[p+j] * A^(k-1-j)   (mod 2^32)
Single-base differences can never collide (odd multiplier => A^m odd), and
every candidate is verified with an exact packed-bit comparison anyway
(ops/bitops.py) — the reference trusts its double hash (GCPS.cpp:385-387).

The combined 64-bit key (h1 << 32 | h2) is assembled host-side for the
sort-join.  A vectorized numpy fallback handles small batches and very long
sequences (contig-trim graphs) where a device dispatch/compile would
dominate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

A1 = np.uint32(0x9E3779B1)   # odd multipliers
A2 = np.uint32(0x85EBCA6B)

M32 = np.uint64(0xFFFFFFFF)


def _pows(a: np.uint32, k: int) -> np.ndarray:
    """[a^(k-1), ..., a, 1] mod 2^32."""
    out = np.ones(k, dtype=np.uint32)
    ai = int(a)
    for i in range(k - 2, -1, -1):
        out[i] = (int(out[i + 1]) * ai) & 0xFFFFFFFF
    return out


def combine_keys(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """uint64 key from two uint32 hashes (host side).

    In-place widen/shift/or: the naive `(a.astype(u64) << 32) | b` spends
    ~44x longer (measured 9.3s vs 0.21s on 48M keys) allocating u64
    temporaries per sub-expression."""
    out = h1.astype(np.uint64)
    out <<= np.uint64(32)
    out |= h2
    return out


# ---------------------------------------------------------------------------
# device kernel

def _base_column(packed, p):
    """base code of every read at position p (traced scalar), uint32."""
    word = jax.lax.dynamic_slice_in_dim(packed, p >> 4, 1, axis=1)[:, 0]
    return (word >> ((p & 15).astype(jnp.uint32) * 2)) & 3


@partial(jax.jit, static_argnums=(2, 3))
def window_kmer_keys_u32(packed, lengths, k: int, num_windows: int):
    """(h1 uint32[N, P], h2 uint32[N, P], valid bool[N, P]):
    h(i, p) hashes read i bases [p, p+k); valid iff p + k <= len_i."""
    packed = packed.astype(jnp.uint32)
    lengths = lengths.astype(jnp.int32)
    n = packed.shape[0]

    a1k = jnp.uint32(int(_pows(A1, k + 1)[0]))   # A1^k
    a2k = jnp.uint32(int(_pows(A2, k + 1)[0]))
    a1 = jnp.uint32(int(A1))
    a2 = jnp.uint32(int(A2))

    # initial window [0, k): h = ((code0*A + code1)*A + code2)...
    def init_body(j, carry):
        h1, h2 = carry
        b = _base_column(packed, j)
        return (h1 * a1 + b, h2 * a2 + b)

    zeros = jnp.zeros(n, dtype=jnp.uint32)
    h1, h2 = jax.lax.fori_loop(0, k, init_body, (zeros, zeros))

    max_pos = packed.shape[1] * 16 - 1

    def step(carry, p):
        h1, h2 = carry
        out = (h1, h2)
        b_out = _base_column(packed, p)
        b_in = _base_column(packed, jnp.minimum(p + k, max_pos))
        # h' = h*A + b_in - b_out*A^k
        nh1 = h1 * a1 + b_in - b_out * a1k
        nh2 = h2 * a2 + b_in - b_out * a2k
        return (nh1, nh2), out

    _, (k1, k2) = jax.lax.scan(step, (h1, h2),
                               jnp.arange(num_windows, dtype=jnp.int32))
    k1 = k1.T
    k2 = k2.T

    pos = jnp.arange(num_windows, dtype=jnp.int32)[None, :]
    valid = pos + k <= lengths[:, None]
    return k1, k2, valid


# ---------------------------------------------------------------------------
# host (numpy) implementation — same values, for small/long inputs

def np_window_kmer_keys(codes: np.ndarray, lengths: np.ndarray, k: int,
                        num_windows: int):
    """Vectorized numpy twin of window_kmer_keys_u32 over a base-code
    matrix uint8[N, L] — closed form, no per-position Python loop:

        h(p) = sum_j c[p+j] * A^(k-1-j)          (mod 2^32)
             = A^(k-1+p) * (T(p+k) - T(p)),  T(m) = sum_{i<m} c[i] * A^-i

    (A odd => invertible mod 2^32; cumsum/cumprod wrap in uint32.)"""
    n, lpad = codes.shape
    lengths = np.asarray(lengths, dtype=np.int64)
    L = max(lpad, k + num_windows)
    c = codes.astype(np.uint32)
    if lpad < L:
        c = np.pad(c, ((0, 0), (0, L - lpad)))

    def _keys(a: np.uint32) -> np.ndarray:
        ainv = np.uint32(pow(int(a), -1, 1 << 32))
        inv_pows = np.ones(L, dtype=np.uint32)
        inv_pows[1:] = ainv
        np.cumprod(inv_pows, out=inv_pows)          # A^-i
        fwd_pows = np.ones(k + num_windows, dtype=np.uint32)
        fwd_pows[1:] = a
        np.cumprod(fwd_pows, out=fwd_pows)          # A^i
        T = np.zeros((n, L + 1), dtype=np.uint32)
        np.cumsum(c * inv_pows[None, :], axis=1, out=T[:, 1:])
        p = np.arange(num_windows)
        return fwd_pows[k - 1 + p][None, :] * (T[:, p + k] - T[:, p])

    k1 = _keys(A1)
    k2 = _keys(A2)
    pos = np.arange(num_windows, dtype=np.int64)[None, :]
    valid = pos + k <= lengths[:, None]
    return k1, k2, valid


def window_keys(packed: np.ndarray, codes_or_none, lengths, k: int,
                num_windows: int, prefer_device: bool | None = None):
    """Dispatch device/host hashing; returns (key uint64[N, P], valid).

    Device wins for large batches of short reads; host wins when the batch
    is tiny or sequences are very long (scan length = num_windows would
    dominate compile time)."""
    n = packed.shape[0] if packed is not None else codes_or_none.shape[0]
    if prefer_device is None:
        prefer_device = (n * num_windows >= 1 << 18) and (num_windows <= 4096)
        if jax.default_backend() == "cpu":
            # on a CPU backend the native rolling hash beats the jax scan
            # ~6x (and skips the k1/k2 device->numpy conversions)
            from alga_tpu import native as _native
            if _native.available():
                prefer_device = False
    if prefer_device and packed is not None:
        k1, k2, valid = window_kmer_keys_u32(packed, np.asarray(lengths), k, num_windows)
        k1, k2, valid = np.asarray(k1), np.asarray(k2), np.asarray(valid)
        return combine_keys(k1, k2), valid
    if codes_or_none is None:
        from alga_tpu.core import packing
        codes_or_none = packing.packed_to_codes(packed)
    lengths = np.asarray(lengths, dtype=np.int64)
    pos = np.arange(num_windows, dtype=np.int64)[None, :]
    valid = pos + k <= lengths[:, None]
    from alga_tpu import native as _native
    if _native.available():
        keys = _native.window_hash(codes_or_none, k, num_windows, A1, A2)
        return keys, valid
    k1, k2, _ = np_window_kmer_keys(codes_or_none, lengths, k, num_windows)
    return combine_keys(k1, k2), valid


def np_window_hash(codes_row: np.ndarray, p: int, k: int) -> int:
    """Oracle: direct (non-rolling) window hash for tests."""
    h1 = 0
    h2 = 0
    for j in range(k):
        b = int(codes_row[p + j])
        h1 = (h1 * int(A1) + b) & 0xFFFFFFFF
        h2 = (h2 * int(A2) + b) & 0xFFFFFFFF
    return (h1 << 32) | h2
