"""Differential tests: vectorized LI/PKB supplement vs the sequential
oracle (the literal transcription of ref GraphCreatorLI.cpp +
GraphCreatorPairwiseKmerBranch.cpp:16-98)."""

import numpy as np
import pytest

from alga_tpu.config import AssemblyConfig, autotune, supplement_retune
from alga_tpu.core.seqbatch import SeqBatch
from alga_tpu.graph import supplement as supp
from tests.simulate import random_genome, simulate_single


class DictAdj:
    """The round-1 dict adapter (oracle adjacency)."""

    def __init__(self, edges=()):
        self.adj = {}
        for a, b, o in edges:
            self.add_min(a, b, o)

    def get_offset(self, a, b):
        return self.adj.get(a, {}).get(b)

    def add_min(self, a, b, offset):
        cur = self.get_offset(a, b)
        if cur is None or offset < cur:
            self.adj.setdefault(a, {})[b] = offset

    def edge_set(self):
        return {(a, b, o) for a, d in self.adj.items() for b, o in d.items()}


def _error_batch(seed, n_genome=2500, coverage=15.0, error_rate=0.02):
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, n_genome)
    reads = simulate_single(genome, rng, read_len=100, coverage=coverage,
                            error_rate=error_rate)
    batch = SeqBatch.from_strings(reads)
    return batch


def _scfg(batch, error_rate=0.02):
    cfg = autotune(AssemblyConfig(error_rate=error_rate),
                   batch.avg_read_length())
    return supplement_retune(cfg, batch.avg_read_length())


@pytest.mark.parametrize("k", [12, 32, 35])
def test_li_kmers_matches_ref(k):
    rng = np.random.default_rng(7)
    n, lmax = 60, 120
    lengths = rng.integers(k, lmax + 1, size=n).astype(np.int64)
    codes = rng.integers(0, 4, size=(n, lmax)).astype(np.uint8)
    valid = rng.random(n) < 0.9
    for priorities in ([0, 1, 2, 3], [2, 3, 0, 1]):
        got = supp.li_kmers(codes, lengths, valid, priorities, k, 6)
        want = supp.li_kmers_ref(codes, lengths, valid, priorities, k, 6)
        got_set = set(zip(*(a.tolist() for a in got)))
        want_set = set(zip(*(a.tolist() for a in want)))
        assert got_set == want_set
        assert len(got[0]) == len(want[0])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fast_pkb_matches_sequential_oracle(seed):
    batch = _error_batch(seed)
    cfg = _scfg(batch)
    n = len(batch)
    rng = np.random.default_rng(seed + 100)
    # random dead-end / orphan-start masks (the production wiring restricts
    # to indeg/outdeg patterns; any mask must agree between paths)
    align_from = rng.random(n) < 0.5
    align_to = rng.random(n) < 0.5

    codes = batch.codes()
    ref = DictAdj()
    supp.pkb_supplement_ref(ref, codes, batch.lengths, batch.lengths, cfg,
                            align_from, align_to)

    fast = DictAdj()
    supp.pkb_supplement(fast, codes, batch.lengths, batch.lengths, cfg,
                        align_from, align_to, packed=batch.packed)
    assert fast.edge_set() == ref.edge_set()
    assert len(ref.edge_set()) > 0  # the scenario must actually add edges


def test_fast_pkb_with_existing_edges_and_device_batch():
    """Pre-existing graph edges gate the replay's get_offset path; also
    force the device kernel by dropping min_device_batch to 1."""
    batch = _error_batch(11, n_genome=1500, coverage=12.0)
    cfg = _scfg(batch)
    n = len(batch)
    rng = np.random.default_rng(42)
    align_from = rng.random(n) < 0.6
    align_to = rng.random(n) < 0.6
    pre = [(int(a), int(b), int(o)) for a, b, o in
           zip(rng.integers(0, n, 30), rng.integers(0, n, 30),
               rng.integers(1, 40, 30)) if a != b]

    codes = batch.codes()
    ref = DictAdj(pre)
    supp.pkb_supplement_ref(ref, codes, batch.lengths, batch.lengths, cfg,
                            align_from, align_to)

    fast = DictAdj(pre)
    supp.pkb_supplement(fast, codes, batch.lengths, batch.lengths, cfg,
                        align_from, align_to, packed=batch.packed,
                        min_device_batch=1)
    assert fast.edge_set() == ref.edge_set()


def test_supplement_adj_matches_dict_adapter():
    """SupplementAdj (CSR + overlay) must behave exactly like the dict
    adapter against the same graph."""
    from alga_tpu.graph.overlap_graph import OverlapGraph
    from alga_tpu.pipeline import SupplementAdj

    rng = np.random.default_rng(5)
    n = 50
    e = 200
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    off = rng.integers(1, 30, e).astype(np.int32)
    g = OverlapGraph(n, src, dst, off).retain_min_offset()

    adj = SupplementAdj(g)
    ref = DictAdj(zip(g.src.tolist(), g.dst.tolist(), g.offset.tolist()))

    for _ in range(500):
        a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
        assert adj.get_offset(a, b) == ref.get_offset(a, b)
        if rng.random() < 0.3:
            o = int(rng.integers(1, 30))
            cur = ref.get_offset(a, b)
            if cur is None or o < cur:       # replay only lowers offsets
                adj.add_min(a, b, o)
                ref.add_min(a, b, o)

    assert adj.to_graph().edge_set() == ref.edge_set()


def test_li_kmers_native_matches_oracle(rng):
    """Native streaming LI extraction == per-read-loop oracle (multiset:
    output order is (read, interval) vs the oracle's (read, interval) —
    exact row-for-row here)."""
    from alga_tpu import native as native_mod
    from alga_tpu.core import packing

    if not native_mod.available():
        pytest.skip("native engine not built")
    n = 120
    lens = rng.integers(40, 100, size=n).astype(np.int64)
    codes = rng.integers(0, 4, size=(n, 100)).astype(np.uint8)
    for i in range(n):
        codes[i, lens[i]:] = 0
    packed = packing.codes_to_packed(codes, lens)
    valid = rng.random(n) < 0.8
    for pri in ([0, 1, 2, 3], [2, 0, 3, 1]):
        for k, iv in ((35, 6), (36, 3), (20, 4)):
            want = supp.li_kmers_ref(codes, lens, valid, pri, k, iv)
            ids = np.flatnonzero(valid & (lens >= k))
            got = native_mod.li_kmers_native(packed, lens, ids, pri, k, iv)
            for a, b in zip(got, want):
                np.testing.assert_array_equal(a, b)


def test_pairgen_native_vs_numpy(rng):
    """Round-5 native pairgen == the numpy formulation (identical arrays
    incl. layout and ok flags)."""
    import unittest.mock as mock

    from alga_tpu import native
    from alga_tpu.config import AssemblyConfig, autotune, supplement_retune
    from alga_tpu.graph import supplement as supp
    if not native.available():
        pytest.skip("native lib unavailable")
    n = 300
    lens = rng.integers(60, 120, n).astype(np.int64)
    cfg = supplement_retune(autotune(AssemblyConfig(error_rate=0.02), 100.0),
                            100.0)
    # synthetic sorted runs: ~40 runs of records with ind descending
    rid, ind, starts, ends = [], [], [], []
    pos = 0
    for _ in range(40):
        sz = int(rng.integers(2, 12))
        starts.append(pos)
        ids = rng.integers(0, n, sz)
        iv = np.sort(rng.integers(0, 60, sz))[::-1]
        rid.extend(ids.tolist())
        ind.extend(iv.tolist())
        pos += sz
        ends.append(pos)
    rid_s = np.asarray(rid, dtype=np.int64)
    ind_s = np.asarray(ind, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    at = np.ones(n, bool)
    af = np.ones(n, bool)
    af[rng.integers(0, n, 20)] = False
    got = supp._gen_candidate_pairs(rid_s, ind_s, starts, ends, lens, cfg,
                                    af, at)
    with mock.patch.object(native, "available", lambda: False):
        want = supp._gen_candidate_pairs(rid_s, ind_s, starts, ends, lens,
                                         cfg, af, at)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
    assert got[2].any() and not got[2].all()
