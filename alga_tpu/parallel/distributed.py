"""Distributed end-to-end assembly driver (VERDICT r3 item 2).

The reference's one orchestration (ref src/main.cpp:57-779) is a single
process; this is its multi-process counterpart: every process of a
`jax.distributed` job calls `assemble_distributed(cfg)` and

  1. ingests ONLY its own record slice of the input files
     (io/multihost.load_read_batch_distributed — SURVEY P7),
  2. runs the device phases sharded over the GLOBAL mesh: GCPS candidate
     join (parallel/sharded_gcps.py, all_to_all key routing), graph
     simplification (parallel/sharded_simplify.py), and path-contraction
     chain discovery (parallel/sharded_contract.py),
  3. runs the host phases (prefix-read dedup, remap, walk, consensus,
     filter, trim) REPLICATED from the gathered read store — they are
     deterministic, so every process computes identical contigs,
  4. process 0 writes contigs.fasta.

Memory model note: step 3 gathers the packed read store to every host
(process_allgather), so per-host read-store memory is O(N) for the host
phases while the device phases are O(N/d) per device.  A fully
host-sharded dedup/walk is future work; the contract here is BYTE
parity: contigs.fasta equals the single-process `assemble()` output on
the same files (tests/test_multihost.py::test_two_process_distributed_e2e).
"""

from __future__ import annotations

import numpy as np

from alga_tpu.config import AssemblyConfig
from alga_tpu.core.seqbatch import SeqBatch


def gathered_batch(mesh, file1: str, file2: str | None = None, **pre_kw):
    """Distributed ingest -> a host-side SeqBatch identical to
    fastx.load_read_batch(file1, file2) (padding rows stripped)."""
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


def assemble_distributed(cfg: AssemblyConfig, mesh=None,
                         write_output: bool = True):
    """Multi-process ingest -> sharded graph phases -> contigs.

    Call from every process of an initialized jax.distributed job (or a
    single process over a virtual multi-device mesh).  Returns the
    AssemblyResult (identical on every process); process 0 writes
    `cfg.output` when `write_output`."""
    import jax

    from alga_tpu.io import output
    from alga_tpu.parallel import mesh as mesh_mod
    from alga_tpu.pipeline import assemble

    if mesh is None:
        mesh = mesh_mod.make_mesh()

    pre_kw = dict(trim_left=cfg.read_end_trim_left,
                  trim_right=cfg.read_end_trim_right,
                  rna=cfg.rna, str_period=cfg.str_period_threshold)
    batch = gathered_batch(mesh, cfg.file1, cfg.file2 or None, **pre_kw)

    res = assemble(cfg, batch=batch, paired=bool(cfg.file2), mesh=mesh)

    if write_output and jax.process_index() == 0:
        output.write_contigs(res.contigs, cfg.output, rna=cfg.rna)
    return res
