"""Multi-process (jax.distributed) test of the sharded GCPS pipeline: two
processes x 4 virtual CPU devices = one 8-device global mesh, with the
all_to_all key routing and remote row fetches crossing the process
boundary.  This is the multi-host path the VERDICT required to exist
before hardware does (item 3); on real TPU the same code rides ICI/DCN."""

import os
import socket
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_gcps(tmp_path):
    # paired input files for the distributed-ingest leg of the worker
    import numpy as np
    rng = np.random.default_rng(5)
    bases = "ACGT"
    with open(tmp_path / "m1.fastq", "w") as fa, \
         open(tmp_path / "m2.fastq", "w") as fb:
        for i in range(211):   # odd count -> exercises padding rows
            s1 = "".join(bases[c] for c in rng.integers(0, 4, 60))
            s2 = "".join(bases[c] for c in rng.integers(0, 4, 60))
            fa.write(f"@a{i}\n{s1}\n+\n{'I'*60}\n")
            fb.write(f"@b{i}\n{s2}\n+\n{'I'*60}\n")

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["ALGA_TEST_INGEST_F1"] = str(tmp_path / "m1.fastq")
    env["ALGA_TEST_INGEST_F2"] = str(tmp_path / "m2.fastq")
    worker = os.path.join(_ROOT, "tests", "multihost_worker.py")

    procs = [
        subprocess.Popen([sys.executable, worker, str(pid), "2", str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=840)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        assert "OK edges=" in out
        assert "INGEST OK" in out
