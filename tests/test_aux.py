"""Tests for auxiliary subsystems: serialization (incl. reference binary
interop), the OLC-correctness oracle, graphviz export, stats."""

import os
import subprocess

import numpy as np
import pytest

from alga_tpu.core import packing
from alga_tpu.core.seqbatch import SeqBatch
from alga_tpu.graph import prefsuf
from alga_tpu.graph.overlap_graph import OverlapGraph
from alga_tpu.utils import oracle, serialize, visualize
from alga_tpu.utils.timers import contig_stats
from tests.simulate import random_genome


def _graph(rng):
    g = random_genome(rng, 200)
    seqs = [g[i : i + 50] for i in range(0, 150, 10)]
    packed, lengths = packing.pack_strings(seqs)
    og = prefsuf.build_gcps_graph(packed, lengths, len(seqs), 20, 500, 35)
    return og.retain_min_offset(), packed, lengths, seqs


def test_reference_binary_roundtrip(rng, tmp_path):
    og, packed, lengths, _ = _graph(rng)
    p = str(tmp_path / "g.graph")
    serialize.write_reference_graph(og, p)
    back = serialize.read_reference_graph(p)
    assert back.edge_set() == og.edge_set()
    assert back.n == og.n


@pytest.mark.skipif(not os.path.exists("/tmp/refbuild/ALGA"),
                    reason="reference binary not built")
def test_midphase_graph_matches_reference_dump(rng, tmp_path):
    """Generate a reference --serialize dump in-test and compare the
    mid-phase (before-simplifier) graph EDGE-FOR-EDGE against ours on the
    same input (VERDICT round-1 'harden the parity suite' item: mid-phase
    serialized-graph comparison, not just final-FASTA parity)."""
    genome = random_genome(rng, 12000)
    reads = [genome[i: i + 100] for i in range(0, 11900, 7)]
    fa = tmp_path / "r.fasta"
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))

    subprocess.run(
        ["/tmp/refbuild/ALGA", "--file1", str(fa), "--threads", "1",
         "--output", str(tmp_path / "ref.fasta"), "--serialize", "1"],
        cwd=str(tmp_path), capture_output=True, check=True)
    dumps = [p for p in os.listdir(tmp_path) if
             p.endswith("beforeSimplifier.graph")]
    assert dumps, "reference produced no --serialize dump"
    ref_g = serialize.read_reference_graph(str(tmp_path / dumps[0]))

    from alga_tpu.config import AssemblyConfig
    from alga_tpu.pipeline import assemble
    pfx = str(tmp_path / "ours")
    assemble(AssemblyConfig(serialize_graph=True, checkpoint_prefix=pfx,
                            output=str(tmp_path / "ours.fasta")),
             file1_seqs=reads)
    our_g = serialize.read_reference_graph(pfx + "_beforeSimplifier.graph")

    assert our_g.n == ref_g.n
    assert our_g.edge_set() == ref_g.edge_set()


def test_npz_checkpoint_roundtrip(rng, tmp_path):
    og, packed, lengths, seqs = _graph(rng)
    batch = SeqBatch.from_strings(seqs)
    p = str(tmp_path / "ck.npz")
    serialize.save_checkpoint(p, batch=batch, graph=og, meta={"phase": 3})
    b2, g2, meta = serialize.load_checkpoint(p)
    assert g2.edge_set() == og.edge_set()
    assert b2.to_strings() == batch.to_strings()
    assert int(meta["phase"]) == 3


def test_olc_oracle_accepts_real_graph(rng):
    og, packed, lengths, _ = _graph(rng)
    ok = oracle.check_olc_graph(og, packed, lengths)
    assert ok.all()
    oracle.assert_olc_graph_correct(og, packed, lengths)


def test_olc_oracle_rejects_bogus_edge(rng):
    og, packed, lengths, seqs = _graph(rng)
    bogus = OverlapGraph(og.n,
                         np.append(og.src, 0).astype(np.int32),
                         np.append(og.dst, len(seqs) - 1).astype(np.int32),
                         np.append(og.offset, 1).astype(np.int32))
    ok = oracle.check_olc_graph(bogus, packed, lengths)
    assert not ok[-1]
    with pytest.raises(AssertionError):
        oracle.assert_olc_graph_correct(bogus, packed, lengths)


def test_graphviz_export(rng, tmp_path):
    og, packed, lengths, _ = _graph(rng)
    p = str(tmp_path / "g.gv")
    visualize.write_whole_graph(og, p)
    text = open(p).read()
    assert text.startswith("digraph") and "->" in text


def test_contig_stats():
    s = contig_stats([100, 200, 300, 400])
    assert s["count"] == 4 and s["total"] == 1000 and s["max"] == 400
    assert s["n50"] == 300  # 400+300 >= 500
    assert contig_stats([])["n50"] == 0


def test_pipeline_checkpoint_resume(rng, tmp_path):
    """--serialize then --deserialize_graph resumes and matches."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from simulate import simulate_single
    from alga_tpu.config import AssemblyConfig
    from alga_tpu.pipeline import assemble
    genome = random_genome(rng, 8000)
    reads = simulate_single(genome, rng, read_len=100, coverage=20)
    pfx = str(tmp_path / "run")
    cfg1 = AssemblyConfig(serialize_graph=True, checkpoint_prefix=pfx,
                          output=str(tmp_path / "a.fasta"))
    r1 = assemble(cfg1, file1_seqs=reads)
    assert os.path.exists(pfx + "_beforeSimplifier.graph")
    cfg2 = AssemblyConfig(deserialize_graph=True, checkpoint_prefix=pfx,
                          output=str(tmp_path / "b.fasta"))
    r2 = assemble(cfg2, file1_seqs=reads)
    assert [c.seq for c in r1.contigs] == [c.seq for c in r2.contigs]


# ---------------------------------------------------------------------------
# observability (VERDICT round-1 item 9) + FAU component view (item 10)

def test_memory_sampling_and_peaks():
    from alga_tpu.utils.timers import memory_peaks, sample_memory
    s = sample_memory("test", log=False)
    assert s["rss_mb"] > 0
    peaks = memory_peaks()
    assert peaks["rss_mb"] >= s["rss_mb"] - 1


def test_counters():
    from alga_tpu.utils.timers import bump, counters_report, reset_counters
    reset_counters()
    bump("x", 3)
    bump("x")
    assert counters_report() == {"x": 4}
    reset_counters()


def test_streaming_stats():
    from alga_tpu.utils.timers import StreamingStats
    ss = StreamingStats()
    ss.add_array("v", [1.0, 2.0, 3.0, 4.0])
    ss.add("v", 5.0)
    r = ss.report()["v"]
    assert r["n"] == 5 and r["mean"] == 3.0
    assert r["min"] == 1.0 and r["max"] == 5.0
    assert abs(r["stddev"] - 2 ** 0.5) < 1e-3


def test_glibc_rand_matches_libc():
    """The pure-python glibc rand replica (used to replay the reference's
    dangling-removal shuffles) must match the in-process libc exactly."""
    import ctypes

    from alga_tpu.utils.glibc_rand import GlibcRand
    libc = ctypes.CDLL(None)
    libc.srand(1)
    g = GlibcRand(1)
    assert [libc.rand() for _ in range(1000)] == [g.rand() for _ in range(1000)]


def test_workload_covered_quirks():
    from alga_tpu.utils.glibc_rand import workload_covered
    assert workload_covered(1, 3) == 0          # single item skipped
    assert workload_covered(2, 3) == 1          # last dropped (clamp)
    assert workload_covered(4, 3) == 3          # blocks | N0 -> drop last
    assert workload_covered(7, 3) == 6          # 3 | 6 -> drop last
    assert workload_covered(5, 3) == 5          # full coverage
    assert workload_covered(1000, 30) == 1000


def test_fau_component_view(tmp_path):
    from alga_tpu.graph.overlap_graph import OverlapGraph
    from alga_tpu.utils.visualize import FAU, write_component_view

    fau = FAU(6)
    fau.union(0, 1)
    fau.union(1, 2)
    fau.union(3, 4)
    assert fau.find(0) == fau.find(2)
    assert fau.find(3) != fau.find(0)

    # two components: a contig path 0->1->2 and an unrelated pair 3->4
    g = OverlapGraph.from_edges(6, [(0, 1, 10), (1, 2, 10), (3, 4, 5)])

    class Ctg:
        reads = [(0, 0), (1, 10), (2, 10)]

    out = tmp_path / "comp.gv"
    write_component_view(g, [Ctg()], str(out))
    txt = out.read_text()
    assert "0 -> 1" in txt and "1 -> 2" in txt
    assert "3 -> 4" not in txt       # unrelated component not selected
    assert "color=" in txt


def test_redirect_cerr(tmp_path):
    """--redirect_cerr sends the run log to <output>.log
    (ref Params.cpp:578-594)."""
    import subprocess
    import sys as _sys

    import numpy as np

    rng = np.random.default_rng(3)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 2000))
    reads = [genome[i: i + 80] for i in range(0, 1900, 10)]
    fa = tmp_path / "r.fasta"
    fa.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
    out = tmp_path / "c.fasta"
    r = subprocess.run(
        [_sys.executable, "-m", "alga_tpu.cli", "--file1", str(fa),
         "--output", str(out), "--redirect_cerr", "1"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    log = tmp_path / "c.log"
    assert log.exists() and "[timer]" in log.read_text()
    assert "[timer]" not in r.stderr


def test_reference_graph_native_vs_fallback(tmp_path, monkeypatch):
    """VERDICT r4 #7: the native counting-sort pack / one-pass unpack and
    the numpy scatter/gather fallback produce interchangeable files."""
    import numpy as np

    from alga_tpu import native
    from alga_tpu.graph.overlap_graph import OverlapGraph
    if not native.available():
        import pytest
        pytest.skip("native engine not built")
    rng = np.random.default_rng(5)
    n, m = 500, 3000
    g = OverlapGraph(n, rng.integers(0, n, m).astype(np.int32),
                     rng.integers(0, n, m).astype(np.int32),
                     rng.integers(0, 300, m).astype(np.int32))

    def tri(gg):
        o = np.lexsort((gg.dst, gg.offset, gg.src))
        return [gg.src[o], gg.dst[o], gg.offset[o]]

    p1 = str(tmp_path / "native.graph")
    p2 = str(tmp_path / "fallback.graph")
    serialize.write_reference_graph(g, p1)           # native pack
    monkeypatch.setattr(native, "available", lambda: False)
    serialize.write_reference_graph(g, p2)           # numpy fallback
    g_fb = serialize.read_reference_graph(p1)        # python fallback read
    monkeypatch.undo()
    g_nat = serialize.read_reference_graph(p2)       # native read
    a, b = tri(g_fb), tri(g_nat)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    assert all(np.array_equal(x, y) for x, y in zip(a, tri(g)))
