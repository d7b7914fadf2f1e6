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
def test_reference_binary_matches_reference_writer(rng, tmp_path):
    """Our reader parses graphs the actual reference binary wrote (the
    benchdata artifacts) — covered by the parity investigation; here we
    validate the header/record framing on a fresh reference dump."""
    path = "/tmp/benchdata/ALGA_reads_scale55_noN_beforeSimplifier.graph"
    if not os.path.exists(path):
        pytest.skip("no reference dump available")
    g = serialize.read_reference_graph(path)
    assert g.n > 0 and g.num_edges > 0


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
