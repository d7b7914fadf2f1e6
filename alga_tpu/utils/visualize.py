"""Graphviz export (ref src/Utils/GraphVisualizer.cpp): whole-graph dumps
and contig-focused views for debugging assemblies."""

from __future__ import annotations

from alga_tpu.graph.overlap_graph import OverlapGraph

_PALETTE = ["red", "blue", "green", "orange", "purple", "brown", "cyan"]


def write_whole_graph(g: OverlapGraph, path: str, max_edges: int = 200_000) -> None:
    """ref GraphVisualizer::writeWholeGraph (GraphVisualizer.cpp:234-263)."""
    with open(path, "w") as f:
        f.write("digraph G {\n")
        for i, (s, d, o) in enumerate(zip(g.src.tolist(), g.dst.tolist(),
                                          g.offset.tolist())):
            if i >= max_edges:
                f.write(f'  // truncated at {max_edges} edges\n')
                break
            f.write(f'  {s} -> {d} [label="{o}"];\n')
        f.write("}\n")


def write_contig_paths(g: OverlapGraph, contigs, path: str) -> None:
    """Contig-focused view: each contig's read path in its own color
    (ref GraphVisualizer::writeInGraphvizFormat, :14-45)."""
    with open(path, "w") as f:
        f.write("digraph G {\n")
        for ci, ctg in enumerate(contigs):
            color = _PALETTE[ci % len(_PALETTE)]
            reads = [r for r, _ in ctg.reads]
            for a, b in zip(reads, reads[1:]):
                f.write(f'  {a} -> {b} [color={color}];\n')
        f.write("}\n")
