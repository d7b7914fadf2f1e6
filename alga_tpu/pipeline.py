"""End-to-end assembly orchestration (ref: src/main.cpp:57-779).

Phases (reference boundaries preserved — SURVEY.md §7.1):
  read input → autotune → [correct] → dedup prefix reads → remap →
  overlap graph (GCPS) → [LI supplement] → simplify → contract →
  contigs → consensus → filter → trim → write.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from alga_tpu.config import AssemblyConfig, TunedConfig, autotune, supplement_retune
from alga_tpu.contig import consensus as consensus_mod
from alga_tpu.contig import walk as walk_mod
from alga_tpu.core.seqbatch import SeqBatch
from alga_tpu.graph import prefsuf, simplify
from alga_tpu.graph.contract import ContractedGraph, simplify_contract
from alga_tpu.io import fastx, output
from alga_tpu.utils.timers import (PhaseTimer, STREAMING, contig_stats,
                                    counters_report, emit_metrics,
                                    memory_peaks, reset_counters,
                                    write_progress)


def _log(*a):
    print(*a, file=sys.stderr)


# assembly-level progress (ref MyUtils::writeProgress bars, called between
# every major stage of main.cpp): one tick per pipeline phase
_PIPELINE_STEPS = 10


class _Progress:
    def __init__(self, total: int):
        self.total = total
        self.done = 0

    def tick(self, label: str):
        self.done = min(self.done + 1, self.total)
        write_progress(self.done, self.total, f"assembly:{label}")


class DataQualityError(RuntimeError):
    """User-facing data-quality abort (ref main.cpp:429-435): raised when
    simplification leaves zero valid reads; the CLI maps it to the
    reference's stderr message + exit(1)."""


@dataclass
class AssemblyResult:
    contigs: list
    cfg: TunedConfig
    timers: PhaseTimer
    stats: dict = field(default_factory=dict)


def remap_paired_offsets(batch: SeqBatch, paired: bool) -> SeqBatch:
    """Compact invalid reads away keeping (rc, r) pair structure, and build
    the paired-offset table (ref main.cpp:150-232).

    Pairs are dropped/kept atomically (upstream filters always invalidate a
    read together with its revcomp).  For paired input, blocks of 4 keep
    offsets ±2 when both mate pairs survive.
    """
    n = len(batch)
    valid_pair = batch.valid[0::2] & batch.valid[1::2]
    keep = np.repeat(valid_pair, 2)
    # paired offsets before compaction
    po = np.zeros(n, dtype=np.int8)
    if paired and n:
        # blocks of 4 slots [r, rc(r), pair(r), rc(pair(r))]; a block gets
        # offsets [1,1,2,2] iff both of its (rc,r) pairs survived
        assert n % 4 == 0, "paired input must arrive in blocks of 4 slots"
        vp = valid_pair
        both = vp[0::2] & vp[1::2]
        po.reshape(-1, 4)[both] = np.array([1, 1, 2, 2], dtype=np.int8)
    batch.paired_offset = po
    batch.valid &= keep
    nb, remap = batch.compact()
    return nb


def _gcps_mesh(cfg: TunedConfig, mesh=None):
    """Mesh for the de-replicated sharded GCPS, or None for single-device.

    An explicitly supplied mesh (the distributed driver's) always wins.
    "auto" shards whenever more than one device is visible (a real pod
    slice, or the virtual CPU mesh in tests); "on" forces a mesh even over
    one device; "off" always takes the single-device path."""
    if mesh is not None:
        return mesh
    if cfg.sharded_gcps == "off":
        return None
    import jax
    nd = jax.device_count()
    # "auto" requires real accelerator devices: the virtual CPU mesh is a
    # correctness vehicle (one host core shared by all "devices"), so tests
    # opt in explicitly with sharded_gcps="on"
    if (nd > 1 and jax.default_backend() != "cpu") or cfg.sharded_gcps == "on":
        from alga_tpu.parallel import mesh as mesh_mod
        return mesh_mod.make_mesh(nd)
    return None


def build_graph_phase(batch: SeqBatch, cfg: TunedConfig, timers: PhaseTimer,
                      mesh=None):
    """GCPS graph construction incl. the short-read removal of
    ref main.cpp:253-266."""
    min_len = cfg.li_kmer_intervals + cfg.li_kmer_length
    too_short = batch.lengths < min_len
    batch.valid &= ~too_short
    if too_short.any():
        _log(f"removed {int(too_short.sum())} reads shorter than {min_len}")

    mesh = _gcps_mesh(cfg, mesh)
    with timers.phase("graph_creator_prefsuf"):
        if mesh is not None:
            from alga_tpu.parallel.sharded_gcps import gcps_graph_sharded
            _log(f"sharded GCPS over {mesh.devices.size} devices")
            g = gcps_graph_sharded(
                mesh, batch.packed, batch.lengths, len(batch),
                ell_min=cfg.min_overlap_pref_suf,
                cap=cfg.read_length_cap,
                rsoe=cfg.rsoe_min_overlap,
                soes=cfg.soes,
                align_from=batch.valid,
                align_to=batch.valid,
            )
        else:
            g = prefsuf.build_gcps_graph(
                batch.packed, batch.lengths, len(batch),
                ell_min=cfg.min_overlap_pref_suf,
                cap=cfg.read_length_cap,
                rsoe=cfg.rsoe_min_overlap,
                soes=cfg.soes,
                align_from=batch.valid,
                align_to=batch.valid,
            )
    g = g.retain_min_offset()
    _log(f"overlap graph: {g.num_edges} edges over {g.n} reads")
    return g


class SupplementAdj:
    """Adjacency view for the PKB replay: searchsorted lookups into the
    existing graph's sorted (src, dst) key array, plus a dict overlay of
    edges added/lowered during the supplement.  O(log E) per lookup with
    no O(E) Python dict materialization."""

    def __init__(self, g):
        self.g = g
        key = g.src.astype(np.int64) * np.int64(g.n) + g.dst
        order = np.argsort(key, kind="stable")
        self._keys = key[order]
        self._offs = g.offset[order]
        self.n = g.n
        self.overlay: dict[int, int] = {}
        self._searchsorted = np.searchsorted

    def get_offset(self, a, b):
        k = a * self.n + b
        cur = self.overlay.get(k)
        p = int(self._searchsorted(self._keys, k))
        if p < len(self._keys) and self._keys[p] == k:
            base = int(self._offs[p])
            return base if cur is None or base < cur else cur
        return cur

    def add_min(self, a, b, offset):
        k = a * self.n + b
        cur = self.overlay.get(k)
        if cur is None or offset < cur:
            self.overlay[k] = offset

    def to_graph(self):
        """Original edges + overlay edges, min-offset deduped."""
        from alga_tpu.graph.overlap_graph import OverlapGraph
        if not self.overlay:
            return self.g.retain_min_offset()
        ks = np.fromiter(self.overlay.keys(), dtype=np.int64,
                         count=len(self.overlay))
        os_ = np.fromiter(self.overlay.values(), dtype=np.int32,
                          count=len(self.overlay))
        merged = OverlapGraph(
            self.g.n,
            np.concatenate([self.g.src, (ks // self.n).astype(np.int32)]),
            np.concatenate([self.g.dst, (ks % self.n).astype(np.int32)]),
            np.concatenate([self.g.offset, os_]))
        return merged.retain_min_offset()


def run_supplement(g, batch: SeqBatch, tcfg: TunedConfig, mesh=None):
    """LI/PKB supplement wiring (ref main.cpp:300-355).

    Dead-end/orphan masks: indeg==0&&outdeg>0 gets alignTo,
    indeg>0&&outdeg==0 gets alignFrom (main.cpp:310-322, forwarded to the
    inner PKB by GraphCreatorLI.h:23-30); parameters are re-tuned per
    supplement_retune."""
    from alga_tpu.graph import supplement as supp

    indeg = g.in_degrees()
    outdeg = g.out_degrees()
    align_to = (indeg == 0) & (outdeg > 0)
    align_from = (indeg > 0) & (outdeg == 0)
    scfg = supplement_retune(tcfg, batch.avg_read_length())

    adapter = SupplementAdj(g)
    # codes=None: LI k-mer extraction and the host ACH fallback unpack
    # per-chunk from the packed store (memory diet — no uint8[N, L] matrix)
    # mesh: pair verification (the ACH kernel) runs sharded over the
    # devices; extraction is per-read native and the branch-marker replay
    # is sequential by the reference's own semantics (PKB.cpp:16-94)
    supp.pkb_supplement(adapter, None, batch.lengths, batch.lengths, scfg,
                        align_from, align_to, packed=batch.packed,
                        mesh=mesh)
    out = adapter.to_graph()
    _log(f"supplement: {out.num_edges - g.num_edges:+d} edges")
    return out


def assemble(cfg: AssemblyConfig,
             file1_seqs: list[str] | None = None,
             file2_seqs: list[str] | None = None,
             *, batch: SeqBatch | None = None, paired: bool | None = None,
             mesh=None) -> AssemblyResult:
    """End-to-end assembly.  `batch`/`paired` inject a pre-built SeqBatch
    (the distributed driver's gathered ingest); `mesh` runs the device
    phases (GCPS, simplification, contraction discovery) sharded over it —
    in a multi-process job every process calls this with the same global
    mesh and the host phases run replicated (deterministic, so every
    process computes identical contigs)."""
    from alga_tpu.jax_cache import enable_compile_cache
    enable_compile_cache()
    timers = PhaseTimer()
    timers.start("total")
    reset_counters()
    prog = _Progress(_PIPELINE_STEPS)

    # --- input ------------------------------------------------------------
    with timers.phase("input_reader"):
        pre_kw = dict(
            trim_left=cfg.read_end_trim_left,
            trim_right=cfg.read_end_trim_right,
            remove_reads_with_n=cfg.remove_reads_with_n,
            rna=cfg.rna,
            str_period=cfg.str_period_threshold,
        )
        if batch is not None:
            paired_input = bool(paired)
        elif file1_seqs is None:
            # parallel native ingest (P7): file bytes -> byte matrix ->
            # fused preprocess+pack, no list[str] materialization
            paired_input = bool(cfg.file2)
            batch = fastx.load_read_batch(
                cfg.file1, cfg.file2 or None,
                add_paired_reads=cfg.add_paired_reads, **pre_kw)
        else:
            paired_input = bool(file2_seqs)
            batch = fastx.build_read_batch(file1_seqs, file2_seqs, **pre_kw)
    prog.tick("input")
    _log(f"{batch.count_valid()} valid reads of {len(batch)} slots")
    # ingest statistics (ref InputReader.cpp:92-136 read-length/N stats)
    _lens = np.asarray(batch.lengths)[batch.valid]
    if len(_lens):
        STREAMING.add_array("read_length", _lens)
        _log(f"read lengths: min={int(_lens.min())} "
             f"avg={float(_lens.mean()):.2f} max={int(_lens.max())}; "
             f"{int((~batch.valid).sum())} slots dropped (N/STR filters)")

    # --- autotune (ref main.cpp:93-115) ------------------------------------
    avg_post_trim = batch.avg_read_length()
    tcfg = autotune(cfg, avg_post_trim)
    _log("config: " + " ".join(
        f"{k}={v}" for k, v in sorted(vars(tcfg).items())
        if not k.startswith("_") and k not in ("file1", "file2", "output")))
    _log(f"autotuned: LEN={tcfg.avg_read_length} "
         f"min_overlap={tcfg.min_overlap_pref_suf} rsoe={tcfg.rsoe_min_overlap}")

    # --- optional read correction (ref main.cpp:122-127) --------------------
    if tcfg.correct_reads:
        from alga_tpu import corrector
        with timers.phase("read_corrector"):
            # chunked over read ranges straight on the packed store
            # (memory diet: no global uint8[N, L] matrix)
            nchanged = corrector.correct_reads_batch(batch)
        _log(f"read corrector changed {nchanged} reads")
        if tcfg.correct_reads == 2:
            # correct-only mode: dump the corrected reads and stop
            # (ref main.cpp:122-127 -> Global::generateFasta)
            prefix = tcfg.output.rsplit(".", 1)[0] + "_algacorrect"
            output.write_corrected_fasta(batch, paired_input, prefix)
            _log(f"corrected reads written to {prefix}_{{1,2}}.fasta")
            timers.stop("total")
            return AssemblyResult([], tcfg, timers, {"corrected": nchanged})

    # --- duplicate / prefix read removal -----------------------------------
    with timers.phase("read_preprocess"):
        marked = fastx.mark_prefix_reads(batch)
        batch.valid &= ~marked
    prog.tick("preprocess")
    _log(f"{int(marked.sum())} prefix/duplicate reads removed")

    # --- remap to dense ids -------------------------------------------------
    with timers.phase("remap"):
        batch = remap_paired_offsets(batch, paired=paired_input)
    prog.tick("remap")
    _log(f"{len(batch)} reads after remap")

    # --- overlap graph (with optional checkpoint, ref main.cpp:242-296) -----
    ck_prefix = tcfg.checkpoint_prefix or tcfg.output.rsplit(".", 1)[0]
    ck_before = f"{ck_prefix}_beforeSimplifier.graph"
    from alga_tpu.utils import serialize as ser
    import os as _os
    if tcfg.deserialize_graph and _os.path.exists(ck_before):
        g = ser.read_reference_graph(ck_before)
        _log(f"deserialized graph from {ck_before}: {g.num_edges} edges")
    else:
        g = build_graph_phase(batch, tcfg, timers, mesh=mesh)
        if tcfg.serialize_graph:
            ser.write_reference_graph(g, ck_before)
            _log(f"serialized graph to {ck_before}")

    prog.tick("graph")

    # --- error-tolerant LI/PKB supplement (ref main.cpp:300-355) ------------
    if tcfg.use_supplement:
        with timers.phase("graph_creator_supplement"):
            g = run_supplement(g, batch, tcfg, mesh=mesh)

    # isolated reads out (ref main.cpp:358-359)
    iso = g.isolated_nodes()
    batch.valid &= ~iso

    # --- simplify + contract + walk ----------------------------------------
    from alga_tpu import native as native_mod
    use_native = cfg.use_native and native_mod.available() and mesh is None

    ck_after = (f"{ck_prefix}_mopp{tcfg.max_offset_parallel_paths}"
                f"_modb{tcfg.max_offset_dangling_branches}"
                f"_rsoe{tcfg.rsoe_min_overlap}-{tcfg.rsoe_number_to_retain}"
                f"_afterSimplifier.graph")
    if tcfg.deserialize_graph and _os.path.exists(ck_after):
        g = ser.read_reference_graph(ck_after)
        batch.valid &= ~g.isolated_nodes()
        _log(f"deserialized simplified graph from {ck_after}")
    else:
        with timers.phase("graph_simplifier"):
            if mesh is not None:
                from alga_tpu.parallel.sharded_simplify import \
                    simplify_graph_old_sharded
                g = simplify_graph_old_sharded(
                    mesh, g, batch, tcfg.max_offset_parallel_paths,
                    tcfg.max_offset_dangling_branches,
                    threads=tcfg.threads, log=_log)
            elif use_native:
                g = native_mod.simplify_graph_old(
                    g, batch, tcfg.max_offset_parallel_paths,
                    tcfg.max_offset_dangling_branches,
                    threads=tcfg.threads)
            else:
                if g.n > 100_000:
                    _log("WARNING: native engine unavailable — the Python "
                         "twin simplifier walks nodes in Python loops and "
                         f"will be very slow at {g.n} nodes (build "
                         "native/libalga_host.so, or run on a mesh)")
                g = simplify.simplify_graph_old(
                    g, batch, tcfg.max_offset_parallel_paths,
                    tcfg.max_offset_dangling_branches, log=_log,
                    threads=tcfg.threads)
        if tcfg.serialize_graph:
            ser.write_reference_graph(g, ck_after)
    prog.tick("simplify")
    _log(f"post-simplifier degree stats: {g.degree_stats()}")
    _log(f"There are {batch.count_valid()} reads after graph simplification")
    if batch.count_valid() == 0:
        # ref main.cpp:429-435: actionable abort instead of an empty FASTA
        raise DataQualityError(
            "No valid nodes after graph simplification, no contig to "
            "extract. Please check the quality of the input data.")

    if use_native:
        with timers.phase("contract_walk_native"):
            read_lists = native_mod.contract_and_walk(
                g, batch, tcfg.max_offset_parallel_paths,
                tcfg.contig_min_output_length, paired=paired_input,
                min_paired_connections=tcfg.min_paired_connections,
                max_insert_size=tcfg.max_length_of_insert_size,
                threads=tcfg.threads)
            contigs = [walk_mod.Contig(i, "", rl)
                       for i, rl in enumerate(read_lists)]
    else:
        with timers.phase("contract"):
            # ref main.cpp:412-419: contract loop, then a final
            # retainOnlySmallestOffset (:429) fixes walk-time adjacency order
            chain_fn = None
            if mesh is not None:
                # chain-node discovery on-mesh (pointer doubling); the host
                # applies only the splices
                from alga_tpu.parallel.sharded_contract import \
                    chain_terminals_sharded

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

        with timers.phase("contig_creator"):
            reliable = walk_mod.mark_reliable_predecessors(
                cg, batch, paired=paired_input,
                avg_read_length=batch.avg_read_length(),
                min_paired_connections=tcfg.min_paired_connections,
                max_insert_size=tcfg.max_length_of_insert_size)
            contigs = walk_mod.get_all_contigs(
                cg, batch, tcfg.contig_min_output_length, reliable)
    prog.tick("walk")
    _log(f"{len(contigs)} contigs before filtering")

    with timers.phase("consensus"):
        consensus_mod.correct_all(contigs, batch)

    prog.tick("consensus")
    with timers.phase("filter"):
        contigs = output.filter_contigs(
            contigs, len(batch), tcfg.contig_min_output_length,
            tcfg.new_reads_per_contig_percentage)
    prog.tick("filter")
    _log(f"{len(contigs)} contigs after filtering")
    if not contigs:
        # ref main.cpp:487-490 (warning only — the run still completes and
        # writes an empty FASTA, like the reference)
        _log("NO CONTIGS PRODUCED. PLEASE CHECK THE QUALITY OF THE "
             "INPUT DATA.")

    with timers.phase("trim"):
        output.trim_contigs(contigs, threshold=tcfg.trim_threshold,
                            read_cap=tcfg.read_length_cap)

    prog.tick("trim")
    prog.tick("done")
    timers.stop("total")
    stats = contig_stats([len(c) for c in contigs])
    stats["phase_seconds"] = timers.report()
    stats["memory_peaks_mb"] = memory_peaks()
    stats["counters"] = counters_report()
    STREAMING.add_array("contig_length", [len(c) for c in contigs])
    stats["streaming"] = STREAMING.report()
    emit_metrics(stats)
    return AssemblyResult(contigs, tcfg, timers, stats)


def assemble_to_file(cfg: AssemblyConfig, **kw) -> AssemblyResult:
    res = assemble(cfg, **kw)
    output.write_contigs(res.contigs, cfg.output, rna=cfg.rna)
    _log(f"wrote {len(res.contigs)} contigs to {cfg.output}")
    return res
