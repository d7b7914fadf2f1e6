"""Rolling polynomial hash kernels over packed 2-bit reads (JAX).

TPU-first redesign of the reference's per-overlap-length iterative-deepening
hash sweep (ref: src/GraphCreators/GraphCreatorPrefSuf.cpp:73-126,213-236):
instead of ~450 sequential rounds maintaining live prefix/suffix hashes under
striped locks, we compute the hash of EVERY length-k window of every read in
one `lax.scan` (one dispatch), and candidate generation becomes a single
sort-join of window keys against prefix keys (see graph/prefsuf.py).

Hash: h(window) = sum_j base[j] * 4^j mod p, under two 31-bit primes,
packed into one int64 key `h1 << 31 | h2`.  The reference's actual moduli
(10^18+3, 10^9+7 — ref Params.cpp:721, GraphCreatorPrefSuf.h:42) are an
internal detail; only hash-equality predicates matter, and with ~62 key bits
collisions are negligible — and we additionally verify every candidate with
an exact packed-bit comparison (ops/bitops.py), which the reference does not
(it trusts its double hash, ref GCPS.cpp:385-387).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

P1 = np.int64(2**31 - 1)       # Mersenne prime
P2 = np.int64(2**31 - 19)      # prime
_INV4_P1 = np.int64(pow(4, int(P1) - 2, int(P1)))
_INV4_P2 = np.int64(pow(4, int(P2) - 2, int(P2)))


def _base_column(packed, p):
    """base code of every read at position p (traced scalar)."""
    word = jax.lax.dynamic_slice_in_dim(packed, p >> 4, 1, axis=1)[:, 0]
    return ((word >> ((p & 15) * 2)) & 3).astype(jnp.int64)


@partial(jax.jit, static_argnums=(2, 3))
def window_kmer_keys(packed, lengths, k: int, num_windows: int):
    """Hash every length-k window of every read.

    Returns (keys int64[N, P], valid bool[N, P]) where keys[i, p] hashes
    read i bases [p, p+k) and valid[i, p] = (p + k <= len_i).
    P = num_windows (static; pass max_len - k + 1).

    Rolling update over window start p:
        h(p+1) = (h(p) - base[p]) * inv4 + base[p+k] * 4^(k-1)   (mod m)
    """
    packed = packed.astype(jnp.uint32)
    lengths = lengths.astype(jnp.int64)
    n = packed.shape[0]

    f1 = jnp.int64(pow(4, k - 1, int(P1)))
    f2 = jnp.int64(pow(4, k - 1, int(P2)))

    # initial window [0, k)
    def init_body(j, carry):
        h1, h2, g1, g2 = carry
        b = _base_column(packed, j)
        h1 = (h1 + b * g1) % P1
        h2 = (h2 + b * g2) % P2
        return h1, h2, (g1 * 4) % P1, (g2 * 4) % P2

    zeros = jnp.zeros(n, dtype=jnp.int64)
    h1, h2, _, _ = jax.lax.fori_loop(
        0, k, init_body, (zeros, zeros, jnp.int64(1), jnp.int64(1)))

    def step(carry, p):
        h1, h2 = carry
        key = (h1 << 31) | h2
        b_out = _base_column(packed, p)
        b_in = _base_column(packed, jnp.minimum(p + k, packed.shape[1] * 16 - 1))
        nh1 = (((h1 - b_out) % P1) * _INV4_P1 + b_in * f1) % P1
        nh2 = (((h2 - b_out) % P2) * _INV4_P2 + b_in * f2) % P2
        return (nh1, nh2), key

    _, keys = jax.lax.scan(step, (h1, h2), jnp.arange(num_windows, dtype=jnp.int64))
    keys = keys.T  # [N, P]

    pos = jnp.arange(num_windows, dtype=jnp.int64)[None, :]
    valid = pos + k <= lengths[:, None]
    return keys, valid


def prefix_kmer_keys(packed, lengths, k: int):
    """Hash of the first k bases of every read (= window at p=0)."""
    keys, valid = window_kmer_keys(packed, lengths, k, 1)
    return keys[:, 0], valid[:, 0]


def np_window_hash(codes_row: np.ndarray, p: int, k: int) -> int:
    """Oracle: direct (non-rolling) window hash for tests."""
    h1 = 0
    h2 = 0
    g1 = g2 = 1
    for j in range(k):
        b = int(codes_row[p + j])
        h1 = (h1 + b * g1) % int(P1)
        h2 = (h2 + b * g2) % int(P2)
        g1 = (g1 * 4) % int(P1)
        g2 = (g2 * 4) % int(P2)
    return (h1 << 31) | h2
