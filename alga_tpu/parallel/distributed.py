"""Distributed end-to-end assembly driver (VERDICT r4 items 2-3).

The reference's one orchestration (ref src/main.cpp:57-779) is a single
process; this is its multi-process counterpart: every process of a
`jax.distributed` job calls `assemble_distributed(cfg)` and

  1. ingests ONLY its own record slice of the input files
     (io/multihost.load_read_batch_distributed — SURVEY P7); the packed
     store lives sharded on the mesh and is NEVER gathered to a host
     before the contig phase,
  2. marks duplicate/prefix reads with the mesh-sharded sort
     (parallel/sharded_preprocess.mark_prefix_sharded — O(N/d) per
     shard),
  3. computes the dense-id remap HOST-SIDE on the small per-slot arrays
     only (lengths/valid/paired offsets, ~13 B/slot vs the packed
     store's ~0.35-0.85 KB/slot),
  4. runs the sharded GCPS DIRECTLY ON SLOT IDS over the ingest-layout
     store (validity masks exclude dropped rows; every tie-break in the
     GCPS semantics — ring order, domination stamp order, dedup — is
     order-based, so a monotone slot->dense renumbering of the edge
     arrays afterward reproduces the compacted-store graph exactly),
  5. runs the sharded simplification + contraction discovery on the
     (small) dense graph,
  6. gathers the packed store CHUNKED to process 0 only (other
     processes drop each chunk immediately), where the walk / consensus
     / filter / trim / write phases run; non-0 processes return an
     AssemblyResult with empty contigs.

Byte parity: process 0's contigs.fasta equals the single-process
`assemble()` output on the same files
(tests/test_multihost.py::test_two_process_distributed_e2e).

Fallback: configs that need the read corrector or the LI/PKB supplement
(error_rate > 0.01) still use the legacy gathered path (the supplement
is per-read over the whole store; its mesh expression covers the
verification kernel — ops/align.ach_batch_mesh — not the extraction).
"""

from __future__ import annotations

import sys

import numpy as np

from alga_tpu.config import AssemblyConfig
from alga_tpu.core.seqbatch import SeqBatch


def _log(*a):
    print(*a, file=sys.stderr)


def gathered_batch(mesh, file1: str, file2: str | None = None, **pre_kw):
    """Distributed ingest -> a host-side SeqBatch identical to
    fastx.load_read_batch(file1, file2) (padding rows stripped).  Used by
    the legacy gathered path and tests."""
    import jax
    from jax.experimental import multihost_utils

    from alga_tpu.io.multihost import load_read_batch_distributed

    pk, ln, vd, nrows = load_read_batch_distributed(mesh, file1, file2,
                                                    **pre_kw)
    if jax.process_count() > 1:
        pk_h = np.asarray(multihost_utils.process_allgather(pk, tiled=True))
        ln_h = np.asarray(multihost_utils.process_allgather(ln, tiled=True))
        vd_h = np.asarray(multihost_utils.process_allgather(vd, tiled=True))
    else:
        pk_h, ln_h, vd_h = (np.asarray(pk), np.asarray(ln), np.asarray(vd))
    return SeqBatch(pk_h[:nrows].copy(), ln_h[:nrows].copy(),
                    vd_h[:nrows].copy())


class _ValidShim:
    """The minimal batch surface the sharded simplifier touches."""

    def __init__(self, valid: np.ndarray, lengths: np.ndarray):
        self.valid = valid
        self.lengths = lengths

    def avg_read_length(self) -> float:
        if not self.valid.any():
            return 0.0
        return float(self.lengths[self.valid].mean())


def _gather_packed_to_proc0(packed_d, keep: np.ndarray, w: int,
                            chunk_rows: int = 1 << 18) -> np.ndarray | None:
    """Chunked gather of the kept packed rows to process 0 (other
    processes drop every chunk immediately — peak O(chunk) there)."""
    import jax
    from jax.experimental import multihost_utils

    from alga_tpu.utils.timers import bump

    nkeep = int(keep.sum())
    is0 = jax.process_index() == 0
    if jax.process_count() == 1:
        full = np.asarray(packed_d)
        bump("dist_store_host_rows", full.shape[0])
        return full[keep[: full.shape[0]]]
    # per-process local host shard (addressable rows only, in order)
    local = np.concatenate(
        [np.asarray(s.data) for s in sorted(
            packed_d.addressable_shards, key=lambda s: s.index[0].start)])
    pcount = jax.process_count()
    per_proc = packed_d.shape[0] // pcount
    out = np.empty((nkeep, w), dtype=np.uint32) if is0 else None
    # per-process host-row watermark: process 0 ends at nkeep, every other
    # process only ever holds its own shard + one gather chunk — the
    # O(N/d) contract the 2-process test asserts
    bump("dist_store_host_rows",
         (nkeep if is0 else 0) + per_proc + chunk_rows * pcount)
    newid = np.cumsum(keep) - 1          # dense id of each kept slot
    for c0 in range(0, per_proc, chunk_rows):
        c1 = min(c0 + chunk_rows, per_proc)
        part = np.ascontiguousarray(local[c0:c1])
        gathered = np.asarray(
            multihost_utils.process_allgather(part))  # [P, c, w]
        if is0:
            for p in range(pcount):
                glo = p * per_proc + c0
                m = keep[glo : glo + (c1 - c0)]
                idx = np.flatnonzero(m)
                if len(idx):
                    dst = int(newid[glo + idx[0]])
                    out[dst : dst + len(idx)] = gathered[p][m]
        del gathered
    return out


def assemble_distributed(cfg: AssemblyConfig, mesh=None,
                         write_output: bool = True):
    """Multi-process ingest -> sharded preprocessing + graph phases ->
    contigs on process 0.

    Call from every process of an initialized jax.distributed job (or a
    single process over a virtual multi-device mesh).  Process 0 returns
    the full AssemblyResult and writes `cfg.output` when `write_output`;
    other processes return a result with empty contigs."""
    import jax

    from alga_tpu.config import autotune
    from alga_tpu.contig import consensus as consensus_mod
    from alga_tpu.contig import walk as walk_mod
    from alga_tpu.graph.contract import ContractedGraph, simplify_contract
    from alga_tpu.graph.overlap_graph import OverlapGraph
    from alga_tpu.io import output
    from alga_tpu.jax_cache import enable_compile_cache
    from alga_tpu.io.multihost import load_read_batch_distributed
    from alga_tpu.parallel import mesh as mesh_mod
    from alga_tpu.parallel.sharded_contract import chain_terminals_sharded
    from alga_tpu.parallel.sharded_gcps import gcps_graph_sharded, _host
    from alga_tpu.parallel.sharded_preprocess import mark_prefix_sharded
    from alga_tpu.parallel.sharded_simplify import simplify_graph_old_sharded
    from alga_tpu.pipeline import (AssemblyResult, assemble,
                                   remap_paired_offsets)
    from alga_tpu.utils.timers import PhaseTimer

    enable_compile_cache()
    if mesh is None:
        mesh = mesh_mod.make_mesh()

    if cfg.correct_reads or cfg.error_rate > 0.01:
        # legacy gathered path (see module docstring)
        _log("[distributed] corrector/supplement config: using the "
             "gathered host path")
        pre_kw = dict(trim_left=cfg.read_end_trim_left,
                      trim_right=cfg.read_end_trim_right,
                      rna=cfg.rna, str_period=cfg.str_period_threshold)
        batch = gathered_batch(mesh, cfg.file1, cfg.file2 or None, **pre_kw)
        res = assemble(cfg, batch=batch, paired=bool(cfg.file2), mesh=mesh)
        if write_output and jax.process_index() == 0:
            output.write_contigs(res.contigs, cfg.output, rna=cfg.rna)
        return res

    timers = PhaseTimer()
    timers.start("total")
    paired = bool(cfg.file2)

    # --- 1: sharded ingest (store stays on the mesh) -----------------------
    with timers.phase("input_reader"):
        packed_d, lengths_d, valid_d, nrows = load_read_batch_distributed(
            mesh, cfg.file1, cfg.file2 or None,
            trim_left=cfg.read_end_trim_left,
            trim_right=cfg.read_end_trim_right,
            rna=cfg.rna, str_period=cfg.str_period_threshold)
        lengths = _host(lengths_d).astype(np.int64)
        valid = _host(valid_d).astype(bool)
        npad = len(lengths)
    _log(f"[distributed] {int(valid.sum())} valid reads of {nrows} slots "
         f"({npad} padded rows)")

    avg = float(lengths[valid].mean()) if valid.any() else 0.0
    tcfg = autotune(cfg, avg)

    # --- 2: sharded duplicate/prefix marking -------------------------------
    with timers.phase("read_preprocess"):
        marked = mark_prefix_sharded(mesh, packed_d, lengths, valid)
        valid &= ~marked
    _log(f"[distributed] {int(marked.sum())} prefix/duplicate reads removed")

    # --- 3: dense remap on host-side small arrays --------------------------
    # (the exact pairing/compaction bookkeeping of
    # pipeline.remap_paired_offsets, applied to flags only — no packed row
    # is touched)
    with timers.phase("remap"):
        valid_pair = valid[0::2] & valid[1::2]
        keep = np.repeat(valid_pair, 2)
        po = np.zeros(npad, dtype=np.int8)
        if paired and npad:
            assert npad % 4 == 0, \
                "paired input must arrive in blocks of 4 slots"
            both = valid_pair[0::2] & valid_pair[1::2]
            po.reshape(-1, 4)[both] = np.array([1, 1, 2, 2], dtype=np.int8)
        newid = np.cumsum(keep) - 1
        n_dense = int(keep.sum())
        lengths_dense = lengths[keep]
        po_dense = po[keep]
    _log(f"[distributed] {n_dense} reads after remap")

    # --- 4: sharded GCPS on slot ids ---------------------------------------
    with timers.phase("graph_creator_prefsuf"):
        g_slots = gcps_graph_sharded(
            mesh, packed_d, lengths, npad,
            tcfg.min_overlap_pref_suf, tcfg.read_length_cap,
            tcfg.rsoe_min_overlap, tcfg.rsoe_number_to_retain,
            align_from=keep, align_to=keep)
        g = OverlapGraph(n_dense,
                         newid[g_slots.src].astype(np.int32),
                         newid[g_slots.dst].astype(np.int32),
                         g_slots.offset.copy()).sorted_by_src_offset()
        g = g.retain_min_offset()
    _log(f"[distributed] overlap graph: {g.num_edges} edges over "
         f"{n_dense} reads")

    # --- 5: sharded simplify + contraction discovery -----------------------
    dense_batch_shim = _ValidShim(np.ones(n_dense, dtype=bool),
                                  lengths_dense)
    with timers.phase("graph_simplifier"):
        iso = g.isolated_nodes()
        dense_batch_shim.valid &= ~iso
        g = simplify_graph_old_sharded(
            mesh, g, dense_batch_shim, tcfg.max_offset_parallel_paths,
            tcfg.max_offset_dangling_branches, threads=tcfg.threads,
            log=_log)

    with timers.phase("contract"):
        def chain_fn(cg_):
            m, _t, _r, _w = chain_terminals_sharded(
                mesh, cg_.to_overlap_graph())
            return m
        cg = ContractedGraph(g)
        for _ in range(2):
            cg.retain_min_offset_inplace()
            simplify_contract(cg, tcfg.max_offset_parallel_paths,
                              log=_log, chain_mask_fn=chain_fn)
        cg.retain_min_offset_inplace()

    # --- 6: contigs on process 0 only --------------------------------------
    with timers.phase("gather_store"):
        packed_kept = _gather_packed_to_proc0(packed_d, keep,
                                              int(packed_d.shape[1]))
    contigs = []
    if packed_kept is not None:
        batch0 = SeqBatch(packed_kept, lengths_dense.copy(),
                          dense_batch_shim.valid.copy(), po_dense.copy())
        with timers.phase("contig_creator"):
            reliable = walk_mod.mark_reliable_predecessors(
                cg, batch0, paired=paired,
                avg_read_length=batch0.avg_read_length(),
                min_paired_connections=tcfg.min_paired_connections,
                max_insert_size=tcfg.max_length_of_insert_size)
            contigs = walk_mod.get_all_contigs(
                cg, batch0, tcfg.contig_min_output_length, reliable)
        with timers.phase("consensus"):
            consensus_mod.correct_all(contigs, batch0)
        with timers.phase("filter"):
            contigs = output.filter_contigs(
                contigs, n_dense, tcfg.contig_min_output_length,
                tcfg.new_reads_per_contig_percentage)
        with timers.phase("trim"):
            output.trim_contigs(contigs, threshold=tcfg.trim_threshold,
                                read_cap=tcfg.read_length_cap)
        if write_output:
            output.write_contigs(contigs, cfg.output, rna=cfg.rna)
            _log(f"[distributed] wrote {len(contigs)} contigs to "
                 f"{cfg.output}")

    timers.stop("total")
    stats = {"phase_seconds": timers.report()}
    return AssemblyResult(contigs, tcfg, timers, stats)
