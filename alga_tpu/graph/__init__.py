from alga_tpu.graph.overlap_graph import OverlapGraph  # noqa: F401
