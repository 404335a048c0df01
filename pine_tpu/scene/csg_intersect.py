"""CSG ray intersection via interval algebra (parity: geometry.cpp:764-882).

The reference walks re-spawned rays through both children; here each convex
child yields an analytic (t_enter, t_exit) interval and boolean ops combine
interval lists with static bounds — branch-free, wavefront-friendly.

Supported children: Sphere, AABB, OBB, Cone, Cylinder, and nested CSG (the
interval count doubles per level; capped at MAX_IVALS).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pine_tpu.scene import shapes as S
from pine_tpu.scene.csg import CSGDifference, CSGIntersection, CSGShape, CSGUnion

BIG = 1e30
MAX_IVALS = 8


def _sphere_interval(shape, ro, rd):
    c = jnp.asarray(shape.c)
    r = shape.r
    ro_p = ro - c
    b = jnp.sum(ro_p * rd, -1)
    cc = jnp.sum(ro_p * ro_p, -1) - r * r
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0, t1 = -b - sq, -b + sq
    ok = disc > 0.0
    return jnp.where(ok, t0, BIG), jnp.where(ok, t1, -BIG)


def _aabb_interval_raw(lower, upper, ro, rd):
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-9, jnp.where(rd < 0, -1e-9, 1e-9), rd)
    t0 = (lower - ro) * inv
    t1 = (upper - ro) * inv
    tn = jnp.max(jnp.minimum(t0, t1), -1)
    tf = jnp.min(jnp.maximum(t0, t1), -1)
    ok = tn <= tf
    return jnp.where(ok, tn, BIG), jnp.where(ok, tf, -BIG)


def _aabb_interval(shape, ro, rd):
    return _aabb_interval_raw(jnp.asarray(shape.lower), jnp.asarray(shape.upper), ro, rd)


def _obb_interval(shape, ro, rd):
    mi = jnp.asarray(shape.m_inv)
    o_l = ro @ mi[:3, :3].T + mi[:3, 3]
    d_l = rd @ mi[:3, :3].T
    scale = jnp.linalg.norm(d_l, axis=-1, keepdims=True)
    d_ln = d_l / jnp.maximum(scale, 1e-20)
    tn, tf = _aabb_interval_raw(
        jnp.asarray(shape.base.lower), jnp.asarray(shape.base.upper), o_l, d_ln
    )
    # local param t maps back to world by 1/scale (d_l has world scale folded)
    s = scale[..., 0]
    return tn / jnp.maximum(s, 1e-20), tf / jnp.maximum(s, 1e-20)


def _cone_interval(shape, ro, rd):
    apex = jnp.asarray(shape.apex)
    nvec = jnp.asarray(shape.n)
    A2 = shape.A2
    o = ro - apex
    dn = jnp.sum(rd * nvec, -1)
    on = jnp.sum(o * nvec, -1)
    a = -A2 * dn * dn + jnp.sum(rd * rd, -1)
    b = 2 * (-A2 * on * dn + jnp.sum(o * rd, -1))
    c = -A2 * on * on + jnp.sum(o * o, -1)
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_s = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    t0 = (-b - sq) / (2 * a_s)
    t1 = (-b + sq) / (2 * a_s)
    lo_t = jnp.minimum(t0, t1)
    hi_t = jnp.maximum(t0, t1)
    # clip to the real (below-apex) nappe and the base plane
    below = lambda t: jnp.sum((o + t[..., None] * rd) * nvec, -1) <= 0.0
    ok = (disc > 0.0) & below((lo_t + hi_t) / 2)
    # base plane: dot(p - base_p, n) >= 0
    base_p = jnp.asarray(shape.base_p)
    t_plane = jnp.sum((base_p - ro) * nvec, -1) / jnp.where(dn == 0, 1e-12, dn)
    going_up = dn > 0
    lo2 = jnp.where(going_up, jnp.maximum(lo_t, t_plane), lo_t)
    hi2 = jnp.where(going_up, hi_t, jnp.minimum(hi_t, t_plane))
    ok = ok & (lo2 <= hi2)
    return jnp.where(ok, lo2, BIG), jnp.where(ok, hi2, -BIG)


def _cylinder_interval(shape, ro, rd):
    p0 = jnp.asarray(shape.p0)
    nvec = jnp.asarray(shape.n)
    r = shape.r
    m = ro - p0
    v = rd - jnp.sum(rd * nvec, -1, keepdims=True) * nvec
    w = m - jnp.sum(m * nvec, -1, keepdims=True) * nvec
    a = jnp.sum(v * v, -1)
    b = 2 * jnp.sum(v * w, -1)
    c = jnp.sum(w * w, -1) - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_s = jnp.where(a < 1e-12, 1e-12, a)
    lo_t = (-b - sq) / (2 * a_s)
    hi_t = (-b + sq) / (2 * a_s)
    # axial clamp
    ln = shape.len if hasattr(shape, "len") else float(
        np.dot(shape.p1 - shape.p0, shape.n)
    )
    axial = lambda t: jnp.sum((ro + t[..., None] * rd - p0) * nvec, -1)
    dn = jnp.sum(rd * nvec, -1)
    t_cap0 = (0.0 - jnp.sum(m * nvec, -1)) / jnp.where(dn == 0, 1e-12, dn)
    t_cap1 = (ln - jnp.sum(m * nvec, -1)) / jnp.where(dn == 0, 1e-12, dn)
    cap_lo = jnp.minimum(t_cap0, t_cap1)
    cap_hi = jnp.maximum(t_cap0, t_cap1)
    lo2 = jnp.maximum(lo_t, cap_lo)
    hi2 = jnp.minimum(hi_t, cap_hi)
    ok = (disc > 0.0) & (lo2 <= hi2)
    return jnp.where(ok, lo2, BIG), jnp.where(ok, hi2, -BIG)


_INTERVAL_FNS = {
    S.Sphere: _sphere_interval,
    S.BoxAABB: _aabb_interval,
    S.BoxOBB: _obb_interval,
    S.Cone: _cone_interval,
    S.Cylinder: _cylinder_interval,
}


def intervals_of(shape, ro, rd):
    """-> (starts (N,K), ends (N,K)) sorted, empty slots = (BIG, -BIG)."""
    if isinstance(shape, CSGShape):
        sa, ea = intervals_of(shape.a, ro, rd)
        sb, eb = intervals_of(shape.b, ro, rd)
        if isinstance(shape, CSGUnion):
            return _union(sa, ea, sb, eb)
        if isinstance(shape, CSGIntersection):
            return _intersection(sa, ea, sb, eb)
        return _difference(sa, ea, sb, eb)
    fn = _INTERVAL_FNS.get(type(shape))
    if fn is None:
        raise TypeError(
            f"CSG child {type(shape).__name__} has no interval intersector"
        )
    s, e = fn(shape, ro, rd)
    return s[:, None], e[:, None]


def _merge_sorted(s, e):
    """Sort interval slots by start; keep shapes static."""
    order = jnp.argsort(s, axis=1)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    return take(s), take(e)


def _union(sa, ea, sb, eb):
    s = jnp.concatenate([sa, sb], axis=1)
    e = jnp.concatenate([ea, eb], axis=1)
    return _clip_slots(*_merge_sorted(s, e))


def _intersection(sa, ea, sb, eb):
    # pairwise overlap of every a-slot with every b-slot
    n = sa.shape[0]
    s = jnp.maximum(sa[:, :, None], sb[:, None, :]).reshape(n, -1)
    e = jnp.minimum(ea[:, :, None], eb[:, None, :]).reshape(n, -1)
    empty = s > e
    s = jnp.where(empty, BIG, s)
    e = jnp.where(empty, -BIG, e)
    return _clip_slots(*_merge_sorted(s, e))


def _difference(sa, ea, sb, eb):
    """a \\ b: subtract each b interval from the a set sequentially."""
    s, e = sa, ea
    k = sb.shape[1]
    for j in range(k):
        bs = sb[:, j : j + 1]
        be = eb[:, j : j + 1]
        # each slot splits into (s, min(e, bs)) and (max(s, be), e)
        left_s, left_e = s, jnp.minimum(e, bs)
        right_s, right_e = jnp.maximum(s, be), e
        s = jnp.concatenate([left_s, right_s], axis=1)
        e = jnp.concatenate([left_e, right_e], axis=1)
        empty = s >= e
        s = jnp.where(empty, BIG, s)
        e = jnp.where(empty, -BIG, e)
        s, e = _clip_slots(*_merge_sorted(s, e))
    return s, e


def _clip_slots(s, e):
    if s.shape[1] > MAX_IVALS:
        s = s[:, :MAX_IVALS]
        e = e[:, :MAX_IVALS]
    return s, e


def csg_intersect(shape, ro, rd, tmin, tmax):
    """-> (t (N,), hit (N,)) first boundary crossing in (tmin, tmax)."""
    s, e = intervals_of(shape, ro, rd)
    # candidate ts: every start and end
    cand = jnp.concatenate([s, e], axis=1)
    valid = jnp.concatenate([s <= e, s <= e], axis=1)
    ok = valid & (cand > tmin[:, None]) & (cand < tmax[:, None])
    cand = jnp.where(ok, cand, BIG)
    t = jnp.min(cand, axis=1)
    return t, t < BIG


def csg_normal(shape, p, eps=1e-4):
    """Normal at CSG surface via the signed-distance-style gradient of the
    combined inside test (robust for all boolean combos)."""

    def inside(q):
        return _inside(shape, q)

    dx = jnp.asarray([eps, 0, 0], jnp.float32)
    dy = jnp.asarray([0, eps, 0], jnp.float32)
    dz = jnp.asarray([0, 0, eps], jnp.float32)
    g = jnp.stack(
        [
            inside(p + dx) - inside(p - dx),
            inside(p + dy) - inside(p - dy),
            inside(p + dz) - inside(p - dz),
        ],
        axis=-1,
    )
    ln = jnp.linalg.norm(g, axis=-1, keepdims=True)
    return jnp.where(ln > 1e-12, g / jnp.maximum(ln, 1e-12), jnp.asarray([0.0, 1.0, 0.0]))


def _sdf_of(shape, q):
    """Approximate signed distance for normal estimation."""
    if isinstance(shape, CSGUnion):
        return jnp.minimum(_sdf_of(shape.a, q), _sdf_of(shape.b, q))
    if isinstance(shape, CSGIntersection):
        return jnp.maximum(_sdf_of(shape.a, q), _sdf_of(shape.b, q))
    if isinstance(shape, CSGDifference):
        return jnp.maximum(_sdf_of(shape.a, q), -_sdf_of(shape.b, q))
    if isinstance(shape, S.Sphere):
        return jnp.linalg.norm(q - jnp.asarray(shape.c), axis=-1) - shape.r
    if isinstance(shape, S.BoxAABB):
        lo, up = jnp.asarray(shape.lower), jnp.asarray(shape.upper)
        c = (lo + up) / 2
        h = (up - lo) / 2
        d = jnp.abs(q - c) - h
        return jnp.linalg.norm(jnp.maximum(d, 0.0), axis=-1) + jnp.minimum(
            jnp.max(d, axis=-1), 0.0
        )
    if isinstance(shape, S.BoxOBB):
        mi = jnp.asarray(shape.m_inv)
        ql = q @ mi[:3, :3].T + mi[:3, 3]
        return _sdf_of(shape.base, ql)
    if isinstance(shape, S.Cone):
        # distance to the infinite cone clipped by base plane (approximate)
        apex = jnp.asarray(shape.apex)
        nv = jnp.asarray(shape.n)
        o = q - apex
        h = jnp.sum(o * nv, -1)
        radial = jnp.linalg.norm(o - h[..., None] * nv, axis=-1)
        slope = shape.r / shape.h
        d_cone = (radial + h * slope) * shape.h / np.sqrt(shape.r**2 + shape.h**2)
        d_plane = -(h + shape.h)
        return jnp.maximum(d_cone, d_plane)
    if isinstance(shape, S.Cylinder):
        p0 = jnp.asarray(shape.p0)
        nv = jnp.asarray(shape.n)
        o = q - p0
        h = jnp.sum(o * nv, -1)
        radial = jnp.linalg.norm(o - h[..., None] * nv, axis=-1) - shape.r
        ln = float(np.linalg.norm(shape.p1 - shape.p0))
        axd = jnp.maximum(-h, h - ln)
        return jnp.maximum(radial, axd)
    raise TypeError(type(shape))


def _inside(shape, q):
    return _sdf_of(shape, q)
