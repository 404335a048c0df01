"""Vectorized BVH traversal over ray wavefronts (JAX).

Replaces the reference's per-ray recursive/stack traversal
(impl/accel/bvh.cpp:320-451) with a lane-parallel short-stack walk inside
``lax.while_loop``: every lane owns a fixed-size stack in registers/VMEM; each
iteration pops one node, tests both child AABBs (parent-stored, near-first
push like the reference), and resolves leaf children with fixed-shape
LEAF_MAX triangle gathers.  All lanes advance in lockstep; finished lanes
idle until the wavefront drains (divergence cost accepted for round 1; the
Pallas kernel with ray binning is the optimization path, SURVEY.md §7 hard
part #1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pine_tpu.accel.bvh import LEAF_MAX

BIG = 1e30
STACK_DEPTH = 64


def _aabb_hit(lower, upper, ro, inv_d, tmin, tmax):
    """lower/upper (...,3) vs ro (...,3) -> (hit, t_near)."""
    t0 = (lower - ro) * inv_d
    t1 = (upper - ro) * inv_d
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), tmin)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), tmax)
    return tn <= tf, tn


def _leaf_test(accel, start, count, ro, rd, tmin, best_t):
    """Test up to LEAF_MAX triangles from `start` -> (t, local_tri)."""
    offs = jnp.arange(LEAF_MAX, dtype=jnp.int32)
    idx = start[:, None] + offs[None, :]  # (N, LEAF_MAX); padded arrays make this safe
    valid = offs[None, :] < count[:, None]
    v0 = accel["v0"][idx]
    v1 = accel["v1"][idx]
    v2 = accel["v2"][idx]
    o = ro[:, None, :]
    d = rd[:, None, :]
    e1 = v1 - v0
    e2 = v2 - v0
    tv = o - v0
    pv = jnp.cross(jnp.broadcast_to(d, e2.shape), e2)
    qv = jnp.cross(tv, e1)
    det = jnp.sum(pv * e1, -1)
    inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = jnp.sum(qv * e2, -1) * inv
    u = jnp.sum(pv * tv, -1) * inv
    v = jnp.sum(qv * d, -1) * inv
    ok = (
        valid
        & (det != 0.0)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (v <= 1.0)
        & (u + v <= 1.0)
        & (t > tmin[:, None])
        & (t < best_t[:, None])
    )
    t = jnp.where(ok, t, BIG)
    k = jnp.argmin(t, axis=1)
    return jnp.min(t, axis=1), idx[jnp.arange(idx.shape[0]), k]


def bvh_intersect(accel, ro, rd, tmin, tmax):
    """Closest-hit over a triangle-only accel -> (t, tri)."""
    return _traverse(accel, ro, rd, tmin, tmax, _leaf_test_wrap)


def _leaf_test_wrap(accel, start, count, ro, rd, tmin, best_t):
    return _leaf_test(accel, start, count, ro, rd, tmin, best_t)


def _traverse(accel, ro, rd, tmin, tmax, leaf_fn):
    n = ro.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, jnp.where(rd < 0, -1e-9, 1e-9), rd)

    stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)  # root (node 0) pre-pushed at slot 0
    best_t = jnp.asarray(tmax, jnp.float32)
    limit_t = jnp.asarray(tmax, jnp.float32)
    best_tri = jnp.full((n,), -1, jnp.int32)

    c_lower, c_upper = accel["c_lower"], accel["c_upper"]
    c_node, c_start, c_count = accel["c_node"], accel["c_start"], accel["c_count"]

    def cond(state):
        stack, sp, best_t, best_tri = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_tri = state
        active = sp > 0
        sp_new = jnp.where(active, sp - 1, sp)
        node = stack[jnp.arange(n), jnp.maximum(sp_new, 0)]
        node = jnp.where(active, node, 0)

        lo = c_lower[node]  # (N,2,3)
        up = c_upper[node]
        hit, tn = _aabb_hit(lo, up, ro[:, None, :], inv_d[:, None, :], tmin[:, None], best_t[:, None])
        hit = hit & active[:, None]
        child_inner = c_node[node]  # (N,2)
        is_leaf = child_inner < 0

        # leaf children: fixed-shape primitive tests
        for k in (0, 1):
            leaf_mask = hit[:, k] & is_leaf[:, k]
            t_leaf, tri_leaf = leaf_fn(
                accel,
                jnp.where(leaf_mask, c_start[node, k], 0),
                jnp.where(leaf_mask, c_count[node, k], 0),
                ro,
                rd,
                tmin,
                best_t,
            )
            better = leaf_mask & (t_leaf < best_t)
            best_t = jnp.where(better, t_leaf, best_t)
            best_tri = jnp.where(better, tri_leaf, best_tri)

        # inner children: push far-first then near (near popped first)
        push0 = hit[:, 0] & ~is_leaf[:, 0]
        push1 = hit[:, 1] & ~is_leaf[:, 1]
        near_is_0 = tn[:, 0] <= tn[:, 1]
        first = jnp.where(near_is_0, 1, 0)  # far child pushed first
        second = 1 - first

        def push(stack, sp, which, do_push):
            child = child_inner[jnp.arange(n), which]
            pos = jnp.minimum(sp, STACK_DEPTH - 1)
            newcol = jnp.where(
                (jnp.arange(STACK_DEPTH)[None, :] == pos[:, None]) & do_push[:, None],
                child[:, None],
                stack,
            )
            return newcol, jnp.where(do_push, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        do_first = jnp.where(first == 0, push0, push1)
        do_second = jnp.where(second == 0, push0, push1)
        stack2, sp2 = push(stack, sp_new, first, do_first & active)
        stack3, sp3 = push(stack2, sp2, second, do_second & active)
        return stack3, sp3, best_t, best_tri

    stack, sp, best_t, best_tri = jax.lax.while_loop(
        cond, body, (stack, sp, best_t, best_tri)
    )
    t_out = jnp.where(best_t < limit_t, best_t, BIG)
    return t_out, jnp.maximum(best_tri, 0)


def mesh_surface_info(accel, tri, p):
    """Shading info at hit point on leaf-order triangle `tri`.

    Barycentrics recovered from the hit position; interpolated normals/uvs when
    present (embree.cpp:233-247 equivalent), else geometric normal and
    reference-style raw uv (geometry.cpp:568-573).
    """
    v0 = accel["v0"][tri]
    v1 = accel["v1"][tri]
    v2 = accel["v2"][tri]
    e1 = v1 - v0
    e2 = v2 - v0
    dp = p - v0
    d11 = jnp.sum(e1 * e1, -1)
    d12 = jnp.sum(e1 * e2, -1)
    d22 = jnp.sum(e2 * e2, -1)
    dp1 = jnp.sum(dp * e1, -1)
    dp2 = jnp.sum(dp * e2, -1)
    det = jnp.maximum(d11 * d22 - d12 * d12, 1e-20)
    u = (d22 * dp1 - d12 * dp2) / det
    v = (d11 * dp2 - d12 * dp1) / det
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    w = jnp.clip(1.0 - u - v, 0.0, 1.0)
    if "n0" in accel:
        nrm = (
            w[:, None] * accel["n0"][tri]
            + u[:, None] * accel["n1"][tri]
            + v[:, None] * accel["n2"][tri]
        )
        ln = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        n = jnp.where(ln > 1e-8, nrm / jnp.maximum(ln, 1e-8), accel["geom_n"][tri])
    else:
        n = accel["geom_n"][tri]
    if "t0" in accel:
        uv = (
            w[:, None] * accel["t0"][tri]
            + u[:, None] * accel["t1"][tri]
            + v[:, None] * accel["t2"][tri]
        )
    else:
        uv = jnp.stack([u, v], -1)
    return p, n, uv
