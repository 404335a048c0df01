"""TPU fast path for lazy two-level instancing.

The XLA packet walk (accel/packet.py:_packet_traverse_instanced) is the
correctness reference, but its nested while_loops run long enough on big
instanced scenes to trip the TPU worker's per-program execution watchdog.
This module is the TPU-native form:

1. ONE dense (N, I) slab matrix of per-(ray, instance) entry distances —
   pure VPU work, the idiomatic replacement for a divergent per-ray top-level
   tree walk (SURVEY §7: "divergence-free variant dispatch").
2. Iterative rounds: each round every ray picks its nearest not-yet-visited
   overlapping instance (monotone (entry, id) cursor), rays transform into
   that instance's local frame, and ONE shared Pallas mesh-kernel sweep
   (accel/pallas_traverse.py) tests the whole wavefront against the shared
   local-space mesh tree.  best-t pruning makes later rounds cheap; the loop
   ends when no ray has a candidate nearer than its current hit.

Local directions stay unnormalized so local t == world t, exactly like the
XLA walk.  Entity ids are the same virtual  vbase + instance*stride + tri
scheme, so scene-side decoding is shared.
"""
from __future__ import annotations

import numpy as np

BIG = 1e30

# dense (N, I) enumeration is the TPU path up to this many instances; above
# it the XLA packet walk (slow but bounded-memory) takes over
DENSE_INSTANCES_MAX = 4096


def _entry_matrix(g, ro, rd, tmin, jnp):
    """(N, I) slab entry distance per (ray, instance); BIG where no overlap."""
    boxes = g["_inst_aabbs"]  # (I, 6) lo/hi, device
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, jnp.where(rd < 0, -1e-9, 1e-9), rd)
    lo = boxes[None, :, 0:3]  # (1,I,3)
    hi = boxes[None, :, 3:6]
    t0 = (lo - ro[:, None, :]) * inv[:, None, :]
    t1 = (hi - ro[:, None, :]) * inv[:, None, :]
    near = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), tmin[:, None])
    far = jnp.min(jnp.maximum(t0, t1), -1)
    return jnp.where(near <= far, near, BIG)


def _pick_candidate(entry, ce, ci, bound, jnp):
    """Per-lane nearest instance with (entry, id) strictly after the cursor
    and entry below the per-lane bound.  argmin's first-occurrence rule gives
    the lowest id among ties, matching the (entry, id) lexicographic order."""
    I = entry.shape[1]
    ids = jnp.arange(I, dtype=jnp.int32)[None, :]
    after = (entry > ce[:, None]) | (
        (entry == ce[:, None]) & (ids > ci[:, None])
    )
    cand = jnp.where(after & (entry < bound[:, None]), entry, BIG)
    e_min = jnp.min(cand, axis=1)
    id_min = jnp.argmin(cand, axis=1).astype(jnp.int32)
    return e_min, id_min, e_min < BIG


def _local_rays(g, inst, ro, rd, jnp):
    minv = g["inst_minv"][inst].reshape(-1, 3, 4)
    ol = jnp.einsum("nab,nb->na", minv[:, :, :3], ro) + minv[:, :, 3]
    dl = jnp.einsum("nab,nb->na", minv[:, :, :3], rd)
    return ol, dl


def _use_kernel(g):
    import os

    from pine_tpu.accel import instanced_kernel as IK

    return IK.kernel_supports(g) and not os.environ.get("PINE_INST_DENSE")


def instanced_pallas_intersect(g, ro, rd, tmin, best_t, best_e):
    """Closest hit.  Default: the two-level single-kernel walk
    (accel/instanced_kernel.py).  PINE_INST_DENSE=1 falls back to the
    dense-enumeration + Pallas-sweep rounds below (round-3 path)."""
    import jax
    import jax.numpy as jnp

    if _use_kernel(g):
        from pine_tpu.accel.instanced_kernel import inst_kernel_intersect

        return inst_kernel_intersect(g, ro, rd, tmin, best_t, best_e)

    from pine_tpu.accel.pallas_traverse import pallas_group_query

    sub = g["mesh"]
    vbase, stride = g["vbase"], g["stride"]
    n = ro.shape[0]
    entry = _entry_matrix(g, ro, rd, tmin, jnp)

    def body(state):
        best_t, best_e, ce, ci, _ = state
        e_min, inst, found = _pick_candidate(entry, ce, ci, best_t, jnp)
        inst_s = jnp.where(found, inst, 0)
        ol, dl = _local_rays(g, inst_s, ro, rd, jnp)
        # lanes without a candidate keep a REAL ray but a -1 best-t limit:
        # they miss every slab (no 1e30 origins -> no inf/NaN, which would
        # drop this TPU into its non-finite slow mode)
        bt_in = jnp.where(found, best_t, -1.0)
        e_dummy = jnp.zeros((n,), jnp.int32)
        t_new, e_loc = pallas_group_query(
            sub, ol, dl, tmin, bt_in, bt_in, e_dummy, any_hit=False
        )
        improved = found & (t_new < best_t)
        best_e = jnp.where(improved, vbase + inst_s * stride + e_loc, best_e)
        best_t = jnp.where(improved, t_new, best_t)
        return best_t, best_e, e_min, inst, jnp.any(found)

    def cond(state):
        return state[4]

    best_t, best_e, _, _, _ = jax.lax.while_loop(
        cond, body,
        (
            best_t, best_e,
            jnp.full((n,), -BIG, jnp.float32), jnp.full((n,), -1, jnp.int32),
            jnp.asarray(True),
        ),
    )
    return best_t, best_e


def instanced_pallas_any_hit(g, ro, rd, tmin, tmax, occ):
    """Occlusion query; occ is the 0/1 int mask carried across groups."""
    import jax
    import jax.numpy as jnp

    if _use_kernel(g):
        from pine_tpu.accel.instanced_kernel import inst_kernel_any_hit

        return inst_kernel_any_hit(g, ro, rd, tmin, tmax, occ)

    from pine_tpu.accel.pallas_traverse import pallas_group_query

    sub = g["mesh"]
    n = ro.shape[0]
    entry = _entry_matrix(g, ro, rd, tmin, jnp)

    def body(state):
        occ, ce, ci, _ = state
        live_bound = jnp.where(occ == 0, tmax, -1.0)
        e_min, inst, found = _pick_candidate(entry, ce, ci, live_bound, jnp)
        inst_s = jnp.where(found, inst, 0)
        ol, dl = _local_rays(g, inst_s, ro, rd, jnp)
        tmax_in = jnp.where(found, tmax, -1.0)
        _, occ = pallas_group_query(
            sub, ol, dl, tmin, tmax_in, tmax_in, occ, any_hit=True
        )
        return occ, e_min, inst, jnp.any(found)

    def cond(state):
        return state[3]

    occ, _, _, _ = jax.lax.while_loop(
        cond, body,
        (
            occ,
            jnp.full((n,), -BIG, jnp.float32), jnp.full((n,), -1, jnp.int32),
            jnp.asarray(True),
        ),
    )
    return occ


def supports(g):
    if _use_kernel(g):
        return True  # two-level kernel: SMEM-bounded at INST_KERNEL_MAX
    return g["n_inst"] <= DENSE_INSTANCES_MAX
