"""Semantic graph checker (ref Global::checkOLCGraphCorrectness,
src/Global.cpp:121-145): re-verify every edge's claimed overlap by exact
packed-bit comparison — the graph-construction correctness oracle, here
vectorized on device instead of a per-edge Bitset XOR loop."""

from __future__ import annotations

import numpy as np

from alga_tpu.core import packing
from alga_tpu.graph.overlap_graph import OverlapGraph
from alga_tpu.ops import bitops


def check_olc_graph(g: OverlapGraph, packed: np.ndarray, lengths: np.ndarray,
                    codes: np.ndarray | None = None) -> np.ndarray:
    """bool[E]: edge (src→dst, offset) is a genuine exact overlap, i.e.
    src[offset : len_src] == dst[0 : len_src - offset] and the overlap is
    positive and within dst."""
    lengths = np.asarray(lengths, dtype=np.int64)
    if g.num_edges == 0:
        return np.zeros(0, dtype=bool)
    ov = np.minimum(lengths[g.src], lengths[g.dst] + g.offset) - g.offset
    ok_shape = (ov > 0) & (g.offset >= 0) & (ov <= lengths[g.dst])
    W = packing.words_for(max(1, int(ov.max())))
    match = bitops.substr_equal_auto(
        packed, codes, g.src.astype(np.int64), g.offset.astype(np.int64),
        g.dst.astype(np.int64), np.maximum(ov, 0), W)
    return ok_shape & match


def assert_olc_graph_correct(g, packed, lengths) -> None:
    ok = check_olc_graph(g, packed, lengths)
    if not ok.all():
        bad = np.flatnonzero(~ok)[:10]
        raise AssertionError(
            f"{(~ok).sum()} invalid overlap edges, e.g. "
            f"{[(int(g.src[i]), int(g.dst[i]), int(g.offset[i])) for i in bad]}")
