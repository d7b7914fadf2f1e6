"""Pallas banded-DP kernel differential tests (interpreter mode on CPU).

The compiled Mosaic path is validated on the real TPU (kernel output
asserted equal to the XLA banded_lcs_batch on random pairs, and timed by
bench.py); these tests exercise the identical kernel body through the
Pallas interpreter so they run in CPU-only CI.
"""

import numpy as np
import pytest

from alga_tpu.ops import align
from alga_tpu.ops.pallas.banded_dp import banded_lcs_pallas


def _batch(rng, n, L):
    codes = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    lengths = np.full(n, L, dtype=np.int64)
    return codes, lengths


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    codes, lengths = _batch(rng, 25, 64)
    M = 300
    r1 = rng.integers(0, 25, M)
    r2 = rng.integers(0, 25, M)
    offs = rng.integers(0, 30, M)
    got = np.asarray(banded_lcs_pallas(codes, lengths, r1, r2, offs, 64, 2))
    want = np.array([align.np_banded_lcs(codes, lengths, a, b, int(o), 2)
                     for a, b, o in zip(r1, r2, offs)])
    np.testing.assert_array_equal(got, want)


def test_pallas_matches_xla_kernel(rng):
    codes, lengths = _batch(rng, 20, 48)
    M = 150
    r1 = rng.integers(0, 20, M)
    r2 = rng.integers(0, 20, M)
    offs = rng.integers(0, 20, M)
    a = np.asarray(banded_lcs_pallas(codes, lengths, r1, r2, offs, 48, 2))
    b = np.asarray(align.banded_lcs_batch(codes, lengths, r1, r2, offs, 48, 2))
    np.testing.assert_array_equal(a, b)


def test_mxu_gather_planes_matches_numpy(rng):
    from alga_tpu.ops.pallas import banded_dp as bd
    import jax
    import jax.numpy as jnp
    with jax.enable_x64(False):
        planes = jnp.asarray(rng.integers(0, 256, (16, 100)).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, 100, 700).astype(np.int32))
        got = np.asarray(bd.mxu_gather_planes(planes, idx, interpret=True))
    want = np.asarray(planes)[:, np.asarray(idx)]
    np.testing.assert_array_equal(got, want)


def test_pallas_large_table_fallback(monkeypatch, rng):
    """Tables above MXU_GATHER_MAX_N use the XLA row-gather path; force the
    threshold to 0 so the fallback runs on a small differential case."""
    from alga_tpu.ops.pallas import banded_dp as bd
    monkeypatch.setattr(bd, "MXU_GATHER_MAX_N", 0)
    # distinct shapes from the other tests: the jit cache is keyed on
    # shapes, and the threshold is read at trace time
    codes, lengths = _batch(rng, 21, 52)
    M = 170
    r1 = rng.integers(0, 21, M)
    r2 = rng.integers(0, 21, M)
    offs = rng.integers(0, 21, M)
    a = np.asarray(banded_lcs_pallas(codes, lengths, r1, r2, offs, 52, 2))
    b = np.asarray(align.banded_lcs_batch(codes, lengths, r1, r2, offs, 52, 2))
    np.testing.assert_array_equal(a, b)
