"""Per-column SNP consensus over a contig's contained reads.

Ref: Contig::correctSnipsInContig (src/DataStructures/Contig.cpp:33-92):
every column of the contig is re-voted by the reads covering it (majority,
ties broken toward the smallest base code A<C<G<T = max_element-first), and
both ends are trimmed while column support <= 3.

The reference advances a per-read cursor column by column under a mutex-free
single thread; here each contig's votes are one scatter-add into a
(length, 4) count matrix — a pure segment-sum, batched across contigs on
demand.  Observationally equivalent: read i (start s_i, length l_i) votes
base r_i[c - s_i] in every column c in [s_i, s_i + l_i).
"""

from __future__ import annotations

import numpy as np

from alga_tpu.core.seqbatch import SeqBatch
from alga_tpu.contig.walk import Contig

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

COVERAGE_TRIM_THRESHOLD = 3  # ref Contig.cpp:82 (THR)


def correct_snips(contig: Contig, batch: SeqBatch, codes: np.ndarray | None = None) -> None:
    """Rebuild contig.seq by majority vote; trim low-coverage ends.

    `codes` — optional precomputed base-code matrix (batch.codes()) to
    avoid re-unpacking per contig.
    """
    reads = contig.reads
    if not reads:
        return
    # absolute start of each read: cumsum of offsets (first offset is -1
    # by convention -> start 0, ref Contig.cpp:37)
    offs = np.array([0] + [off for _, off in reads[1:]], dtype=np.int64)
    starts = np.cumsum(offs)
    ids = np.array([rid for rid, _ in reads], dtype=np.int64)
    lens = batch.lengths[ids].astype(np.int64)
    total = int(starts[-1] + lens[-1])

    counts = np.zeros((total, 4), dtype=np.int32)
    if codes is None:
        codes = batch.codes()
    # one flat scatter-add for all reads of the contig
    lens_c = np.minimum(lens, total - starts)
    lens_c = np.maximum(lens_c, 0)
    tot_votes = int(lens_c.sum())
    if tot_votes:
        row_rep = np.repeat(np.arange(len(ids)), lens_c)
        within = np.arange(tot_votes, dtype=np.int64) - np.repeat(
            np.cumsum(lens_c) - lens_c, lens_c)
        cols_pos = starts[row_rep] + within
        bases = codes[ids[row_rep], within]
        np.add.at(counts, (cols_pos, bases.astype(np.int64)), 1)

    best = counts.argmax(axis=1)           # ties -> lowest code (A first)
    freqs = counts.max(axis=1)

    p, q = 0, total - 1
    thr = COVERAGE_TRIM_THRESHOLD
    while p <= q and freqs[p] <= thr:
        p += 1
    while p <= q and freqs[q] <= thr:
        q -= 1
    if p > q:
        contig.seq = ""
        return
    contig.seq = _BASES[best[p : q + 1]].tobytes().decode("ascii")


def correct_all(contigs: list[Contig], batch: SeqBatch) -> None:
    codes = batch.codes()
    for c in contigs:
        correct_snips(c, batch, codes)
