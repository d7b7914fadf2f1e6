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
    """Batched consensus: ONE scatter-add over the concatenated coordinate
    space of every contig, then per-contig argmax + end trim.  Uses the
    native engine when available."""
    if not contigs:
        return
    import os

    from alga_tpu import native as native_mod
    if os.environ.get("ALGA_DEVICE_CONSENSUS"):
        # device voting/trim (VERDICT r4 item 8): bit-identical; opt-in
        # because behind a slow host<->device link the uint8[G] base-row
        # fetch costs more than the native host pass saves
        from alga_tpu.contig.device_consensus import correct_all_device
        correct_all_device(contigs, batch)
        return
    if native_mod.available():
        # vote directly from the 2-bit packed store — the uint8[N, L] code
        # matrix is never materialized (memory diet; ref streams per-read,
        # Read.cpp:40-68)
        native_mod.consensus_native(contigs, batch, None,
                                    COVERAGE_TRIM_THRESHOLD)
        return
    codes = batch.codes()
    lengths = batch.lengths.astype(np.int64)

    # per-contig absolute starts/lengths
    ctg_total = np.zeros(len(contigs), dtype=np.int64)
    all_ids = []
    all_starts = []       # within-contig start of each read
    all_ctg = []          # contig index per read
    for ci, c in enumerate(contigs):
        offs = np.array([0] + [off for _, off in c.reads[1:]], dtype=np.int64)
        starts = np.cumsum(offs)
        ids = np.array([rid for rid, _ in c.reads], dtype=np.int64)
        ctg_total[ci] = starts[-1] + lengths[ids[-1]]
        all_ids.append(ids)
        all_starts.append(starts)
        all_ctg.append(np.full(len(ids), ci, dtype=np.int64))
    ids = np.concatenate(all_ids)
    starts = np.concatenate(all_starts)
    ctg_of = np.concatenate(all_ctg)

    ctg_base = np.zeros(len(contigs) + 1, dtype=np.int64)
    np.cumsum(ctg_total, out=ctg_base[1:])
    grand_total = int(ctg_base[-1])

    lens_c = np.minimum(lengths[ids], ctg_total[ctg_of] - starts)
    lens_c = np.maximum(lens_c, 0)
    abs_start = ctg_base[ctg_of] + starts

    # chunked bincount voting: bounded temporaries, no ufunc.at
    counts = np.zeros(grand_total * 4, dtype=np.int32)
    CHUNK_VOTES = 16_000_000
    csum = np.cumsum(lens_c)
    i = 0
    nreads = len(ids)
    while i < nreads:
        base_v = csum[i - 1] if i > 0 else 0
        j = int(np.searchsorted(csum, base_v + CHUNK_VOTES)) + 1
        j = min(max(j, i + 1), nreads)
        lc = lens_c[i:j]
        tot = int(lc.sum())
        if tot:
            row_rep = np.repeat(np.arange(i, j), lc)
            within = np.arange(tot, dtype=np.int64) - np.repeat(
                np.cumsum(lc) - lc, lc)
            pos = abs_start[row_rep] + within
            bases = codes[ids[row_rep], within].astype(np.int64)
            counts += np.bincount(pos * 4 + bases, minlength=grand_total * 4
                                  ).astype(np.int32)
        i = j
    counts = counts.reshape(grand_total, 4)

    best = counts.argmax(axis=1)
    freqs = counts.max(axis=1)
    thr = COVERAGE_TRIM_THRESHOLD
    ok = freqs > thr
    for ci, c in enumerate(contigs):
        a, b = int(ctg_base[ci]), int(ctg_base[ci + 1])
        seg_ok = ok[a:b]
        nz = np.flatnonzero(seg_ok)
        if len(nz) == 0:
            c.seq = ""
            continue
        p, q = int(nz[0]), int(nz[-1])
        c.seq = _BASES[best[a + p : a + q + 1]].tobytes().decode("ascii")
