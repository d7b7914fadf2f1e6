"""Golden parity test: byte-identical contigs vs the reference ALGA binary.

Requires the reference built at /tmp/refbuild/ALGA (cmake /root/reference);
skipped when unavailable.  This is the BASELINE.md north-star check
("byte-identical contigs.fasta modulo contig order" — we additionally match
the order)."""

import os
import subprocess

import numpy as np
import pytest

from alga_tpu.config import AssemblyConfig
from alga_tpu.pipeline import assemble
from tests.simulate import random_genome, simulate_single

REF_BIN = "/tmp/refbuild/ALGA"


def _load_fasta(path):
    seqs, cur = [], []
    for line in open(path):
        line = line.strip()
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
                cur = []
        else:
            cur.append(line)
    if cur:
        seqs.append("".join(cur))
    return seqs


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="reference binary not built")
@pytest.mark.parametrize("seed,glen", [(11, 30_000), (12, 30_000)])
def test_byte_identical_single_end(tmp_path, seed, glen):
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, glen)
    reads = simulate_single(genome, rng, read_len=100, coverage=20)
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")

    out = tmp_path / "ref.fasta"
    subprocess.run(
        [REF_BIN, "--file1", str(fq), "--output", str(out), "--threads", "4"],
        check=True, capture_output=True, cwd=tmp_path)
    ref = _load_fasta(out)

    res = assemble(AssemblyConfig(), file1_seqs=reads)
    mine = [c.seq for c in res.contigs]
    assert mine == ref, (
        f"parity broken: {sum(a == b for a, b in zip(mine, ref))}/{len(ref)} "
        f"contigs match (mine {len(mine)}, ref {len(ref)})")
