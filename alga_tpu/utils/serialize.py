"""Checkpoint / resume: graph serialization.

Two formats:
  * the reference's binary graph format (ref Graph::serializeGraph /
    deserializeGraph, src/DataStructures/Graph.cpp:220-297) — interoperable
    with the reference's --serialize/--deserialize_graph workflow, used by
    the parity harness;
  * npz phase checkpoints (packed reads + edge arrays) for fast resume of
    our own pipeline at phase boundaries (SURVEY.md §5 checkpoint).
"""

from __future__ import annotations

import struct

import numpy as np

from alga_tpu.graph.overlap_graph import OverlapGraph


def write_reference_graph(g: OverlapGraph, path: str) -> None:
    """Binary layout: u32 n, then per node: i32 id, i32 degree,
    (i32 dst, i32 offset)*degree — node-major, (dst, offset) order not
    normative (the reference re-sorts on use)."""
    gs = g.sorted_by_src_offset()
    adj: list[list[tuple[int, int]]] = [[] for _ in range(g.n)]
    for s, d, o in zip(gs.src.tolist(), gs.dst.tolist(), gs.offset.tolist()):
        adj[s].append((d, o))
    with open(path, "wb") as f:
        f.write(struct.pack("<I", g.n))
        for i in range(g.n):
            f.write(struct.pack("<ii", i, len(adj[i])))
            for d, o in adj[i]:
                f.write(struct.pack("<ii", d, o))


def read_reference_graph(path: str) -> OverlapGraph:
    data = open(path, "rb").read()
    off = 0
    (n,) = struct.unpack_from("<I", data, off)
    off += 4
    src, dst, wts = [], [], []
    for _ in range(n):
        i, t = struct.unpack_from("<ii", data, off)
        off += 8
        for _ in range(t):
            d, w = struct.unpack_from("<ii", data, off)
            off += 8
            src.append(i)
            dst.append(d)
            wts.append(w)
    return OverlapGraph(n, np.asarray(src, dtype=np.int32),
                        np.asarray(dst, dtype=np.int32),
                        np.asarray(wts, dtype=np.int32))


def save_checkpoint(path: str, *, batch=None, graph: OverlapGraph | None = None,
                    meta: dict | None = None) -> None:
    """npz phase checkpoint: packed reads and/or edge arrays."""
    payload = {}
    if batch is not None:
        payload.update(
            packed=batch.packed, lengths=batch.lengths, valid=batch.valid,
            paired_offset=batch.paired_offset)
    if graph is not None:
        payload.update(g_n=np.int64(graph.n), g_src=graph.src,
                       g_dst=graph.dst, g_off=graph.offset)
    if meta:
        for k, v in meta.items():
            payload[f"meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_checkpoint(path: str):
    """Returns (batch | None, graph | None, meta dict)."""
    from alga_tpu.core.seqbatch import SeqBatch
    z = np.load(path)
    batch = None
    if "packed" in z:
        batch = SeqBatch(z["packed"], z["lengths"], z["valid"], z["paired_offset"])
    graph = None
    if "g_n" in z:
        graph = OverlapGraph(int(z["g_n"]), z["g_src"], z["g_dst"], z["g_off"])
    meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    return batch, graph, meta
