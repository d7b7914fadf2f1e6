from alga_tpu.config import AssemblyConfig, autotune, supplement_retune


def test_autotune_default_100bp():
    # ref main.cpp:93-115 with LEN=100 (94 post-trim + 3 + 3), SCALE=0.55:
    cfg = autotune(AssemblyConfig(), avg_read_length_post_trim=94.0)
    assert cfg.avg_read_length == 100
    L = int(100 * 0.55)  # 55
    assert cfg.min_overlap_pref_suf == L
    assert cfg.min_overlap_area == L
    assert cfg.rsoe_min_overlap == int(100 * 1.55 / 2)  # 77
    assert cfg.li_kmer_length == min(2 * L // 3, 60)  # 36
    assert cfg.contig_min_output_length == 200  # max(200, 175)
    assert cfg.max_offset_parallel_paths == 250
    assert cfg.max_offset_dangling_branches == 250


def test_autotune_long_reads_floor():
    cfg = autotune(AssemblyConfig(), avg_read_length_post_trim=294.0)
    # LEN=300 -> 1.75*LEN = 525 floors the offsets
    assert cfg.contig_min_output_length == 525
    assert cfg.max_offset_parallel_paths == 525


def test_autotune_explicit_overlap():
    cfg = autotune(AssemblyConfig(min_overlap_pref_suf=40),
                   avg_read_length_post_trim=94.0)
    assert cfg.min_overlap_pref_suf == 40
    assert cfg.rsoe_min_overlap == (40 + 100) // 2


def test_supplement_retune():
    cfg = autotune(AssemblyConfig(error_rate=0.02), avg_read_length_post_trim=94.0)
    assert cfg.use_supplement
    cfg2 = supplement_retune(cfg, avg_read_length_now=94.0)
    assert cfg2.min_overlap_area == int(1.55 * 94 / 2)
    assert cfg2.max_offset_considered_for_alignment == int(0.45 * 94 / 2)
    assert cfg2.minimal_overlap_for_lcs_low_error == 99 - 2
    assert cfg2.li_kmer_intervals == 6
    assert cfg2.li_kmer_length == 35
