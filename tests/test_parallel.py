"""Sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alga_tpu.core import packing
from alga_tpu.ops import hashes
from alga_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh(8)


def _batch(rng, n, L):
    codes = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    lengths = np.full(n, L, dtype=np.int64)
    return packing.codes_to_packed(codes, lengths), lengths


def test_sharded_count_matches_single_device(mesh8, rng):
    n, L, k = 8 * 16, 40, 15
    packed, lengths = _batch(rng, n, L)
    num_windows = L - k + 1
    got = int(mesh_mod.sharded_candidate_count(
        mesh8, jnp.asarray(packed), jnp.asarray(lengths), k, num_windows))

    # single-device oracle: same join logic
    k1, k2, valid = hashes.window_kmer_keys_u32(packed, lengths, k, num_windows)
    keys = hashes.combine_keys(np.asarray(k1), np.asarray(k2))
    valid = np.asarray(valid)
    pk = np.sort(keys[:, 0])
    lo = np.searchsorted(pk, keys.ravel(), "left")
    hi = np.searchsorted(pk, keys.ravel(), "right")
    want = int(np.where(valid.ravel(), hi - lo, 0).sum())
    assert got == want


def test_full_sharded_step(mesh8, rng):
    n, L, k = 8 * 8, 48, 21
    packed, lengths = _batch(rng, n, L)
    M = 16
    a = rng.integers(0, n, M).astype(np.int32)
    b = rng.integers(0, n, M).astype(np.int32)
    s = rng.integers(0, L // 2, M).astype(np.int32)
    l = (L - s).astype(np.int32)
    count, ok, mm = mesh_mod.sharded_overlap_step(
        mesh8, jnp.asarray(packed), jnp.asarray(lengths),
        jnp.asarray(a), jnp.asarray(s), jnp.asarray(b), jnp.asarray(l),
        k, L - k + 1, (L + 15) // 16)
    assert int(count) >= n  # every read's own prefix matches itself
    # verification bits agree with the numpy oracle
    codes = packing.packed_to_codes(packed)
    from alga_tpu.ops.bitops import np_substr_equal
    want = np.array([np_substr_equal(codes, lengths, int(ai), int(si), int(bi), int(li))
                     for ai, si, bi, li in zip(a, s, b, l)])
    np.testing.assert_array_equal(np.asarray(ok), want)


def test_graft_entry_single():
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_entry_multichip():
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
