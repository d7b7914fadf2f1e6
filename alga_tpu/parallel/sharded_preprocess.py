"""Host-sharded read preprocessing: O(N/d)-per-shard duplicate/prefix
marking (VERDICT r4 item 3 — breaking the O(N)-per-process barrier).

The single-host formulation (io/fastx.mark_prefix_reads, ref
ReadPreprocess::getPrefixReads) is one global lexicographic sort of the
field-reversed packed keys plus an adjacent-LCP scan.  The mesh version
range-partitions reads by their FIRST key word (the first 16 bases):

  * owner(read) = (rev_word0 * d) >> 32 — monotone in rev_word0, so the
    concatenation of per-shard sorted runs IS the global sorted order;
  * a prefix-containment pair shares its first min(len) >= 16 bases, so
    both rows carry the same rev_word0 and land on the SAME shard — no
    cross-shard boundary compare is ever needed (reads shorter than 16
    bases would break this; such inputs fall back to the host path —
    the reference's STR filter already drops everything with period
    <= 20, ref InputReader.cpp:341-353);
  * each shard sorts only its received rows (jax.lax.sort over the key
    words + length + id) and adjacent-compares locally, then routes
    (slot, mark, mark_rc) verdicts back to the slot's home shard.

Skew note: all reads sharing one 16-base prefix collocate; capacity
retry keeps correctness, pathological repeat-heavy inputs degrade to
fewer effective shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alga_tpu.parallel.sharded_gcps import (_host, _put, _round_cap, _route)

_SENT = np.uint32(0xFFFFFFFF)


def _rev_fields(w):
    m1 = jnp.uint32(0x33333333)
    m2 = jnp.uint32(0x0F0F0F0F)
    m3 = jnp.uint32(0x00FF00FF)
    w = ((w & m1) << 2) | ((w >> 2) & m1)
    w = ((w & m2) << 4) | ((w >> 4) & m2)
    w = ((w & m3) << 8) | ((w >> 8) & m3)
    return (w << 16) | (w >> 16)


def mark_prefix_sharded(mesh: Mesh, packed_d, lengths: np.ndarray,
                        valid: np.ndarray) -> np.ndarray:
    """bool[npad] marks, equal to fastx.mark_prefix_reads on the gathered
    batch.  `packed_d` is the sharded [npad, W] device store; lengths and
    valid are HOST arrays (npad rows incl. ingest padding)."""
    d = int(mesh.devices.size)
    npad = packed_d.shape[0]
    W = int(packed_d.shape[1])
    per = npad // d
    assert per % 2 == 0, "per-shard row count must be even (rc = id^1)"
    lengths = np.asarray(lengths, dtype=np.int64)
    valid = np.asarray(valid, dtype=bool)
    marked = np.zeros(npad, dtype=bool)
    if valid.any() and int(lengths[valid].min()) < 16:
        raise ValueError("mark_prefix_sharded requires reads >= 16 bases "
                         "(route shorter inputs through the host path)")
    assert int(lengths.max(initial=0)) <= 0xFFFF

    shard_rn = NamedSharding(mesh, P("r", None))
    shard_r = NamedSharding(mesh, P("r"))
    valid_d = _put(valid, shard_r)
    lengths_d = _put(lengths.astype(np.int32), shard_r)

    def _stage_factory(S: int, SM: int):
        @partial(jax.shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P("r", None), P("r"), P("r")),
                 out_specs=(P("r", None), P()))
        def stage(packed_l, lengths_l, valid_l):
            my = jax.lax.axis_index("r")
            rev = _rev_fields(packed_l.astype(jnp.uint32))     # [per, W]
            owner = jnp.where(
                valid_l,
                ((rev[:, 0].astype(jnp.uint64) * jnp.uint64(d))
                 >> jnp.uint64(32)).astype(jnp.int32),
                jnp.int32(d))
            gid = (my * per + jnp.arange(per, dtype=jnp.int32))
            payload = jnp.concatenate(
                [rev,
                 lengths_l.astype(jnp.uint32)[:, None],
                 gid.astype(jnp.uint32)[:, None]], axis=1)     # [per, W+2]
            recv, ovf1 = _route(owner, payload, d, S)          # [d*S, W+2]

            # sort received rows by (key words, length, id); SENT padding
            # (all-ones keys + SENT id) sorts last
            cols = tuple(recv[:, w] for w in range(W)) + (
                recv[:, W], recv[:, W + 1])
            sorted_cols = jax.lax.sort(cols, num_keys=W + 2)
            sk = jnp.stack(sorted_cols[:W], axis=1)            # [M, W]
            sl = sorted_cols[W].astype(jnp.int32)
            sid = sorted_cols[W + 1]

            # adjacent first-mismatch (in bases, from the front)
            a = sk[:-1]
            b = sk[1:]
            x = a ^ b
            nz = x != 0
            fm_w = jnp.argmax(nz, axis=1).astype(jnp.int32)
            any_nz = nz.any(axis=1)
            xw = x[jnp.arange(x.shape[0]), fm_w]
            fm = jnp.where(any_nz,
                           16 * fm_w + jax.lax.clz(xw).astype(jnp.int32) // 2,
                           16 * W)
            real = (sid != _SENT)
            succ_real = real[1:]
            is_prefix = real[:-1] & succ_real & (fm >= sl[:-1])
            strict = is_prefix & (sl[:-1] < sl[1:])

            # route verdicts (slot, mark, mark_rc) back to slot owners
            vid = sid[:-1]
            back_owner = jnp.where(is_prefix,
                                   (vid // jnp.uint32(per)).astype(jnp.int32),
                                   jnp.int32(d))
            back_payload = jnp.stack(
                [vid, strict.astype(jnp.uint32)], axis=1)
            back, ovf2 = _route(back_owner, back_payload, d, SM)
            mark_l = jnp.zeros(per, dtype=jnp.uint32)
            lid = jnp.clip(back[:, 0].astype(jnp.int32) - my * per,
                           0, per - 1)
            ok = back[:, 0] != _SENT
            mark_l = mark_l.at[jnp.where(ok, lid, per)].set(1, mode="drop")
            # strict-prefix rows also mark their revcomp (slot id ^ 1)
            rc = jnp.clip((back[:, 0].astype(jnp.int32) ^ 1) - my * per,
                          0, per - 1)
            okrc = ok & (back[:, 1] == 1)
            mark_l = mark_l.at[jnp.where(okrc, rc, per)].set(1, mode="drop")
            return mark_l[:, None], jnp.maximum(ovf1, ovf2)[None]
        return stage

    S = _round_cap(per * 13 // 10 + 64)
    SM = _round_cap(per // 2 + 64)
    for _ in range(10):
        marks_d, ovf = _stage_factory(S, SM)(packed_d, lengths_d, valid_d)
        if int(_host(ovf).max()) == 0:
            break
        S *= 2
        SM *= 2
        from alga_tpu.utils.timers import bump
        bump("sharded_mark_retries", 1)
    else:
        raise RuntimeError("mark_prefix_sharded: capacity retry "
                           "did not converge")
    marked = _host(marks_d)[:, 0].astype(bool)
    return marked & valid
