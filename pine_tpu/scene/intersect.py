"""Vectorized ray-primitive intersection kernels.

Each analytic shape type gets three dense kernels:

- ``intersect_T(params (P,k), ro (N,3), rd (N,3), tmin (N,1), tmax (N,1))``
  -> t matrix (N, P), misses = BIG.  Computed all-rays x all-prims: on cbox-
  scale scenes this brute-force product is faster on the VPU than any tree
  (SURVEY.md "hard parts": cbox has ~20 shapes).  Mesh triangles go through
  the BVH path instead (pine_tpu/accel).
- ``surface_info_T(rows (N,k), p (N,3))`` -> (p_corrected, n, uv) for lanes
  whose closest hit is of type T (rows are per-lane gathered params).
- ``sample_T(rows (N,k), p (N,3), u (N,2))`` area sampling for NEE and
  ``pdf_T`` solid-angle pdf for MIS.

Behavior parity with /root/reference/src/pine/core/geometry.cpp and bbox.cpp;
deviations are noted (Rect::pdf uses the correct d^2/(area*cos) instead of the
reference's inconsistent d^2*cos/area so that MIS weights of the two sampling
strategies sum to one).
"""
from __future__ import annotations

import jax.numpy as jnp

from pine_tpu.core.sampling import sample_disk_concentric, uniform_hemisphere
from pine_tpu.core.vecmath import (
    Pi,
    cartesian_to_spherical,
    coordinate_system,
    dot,
    dotk,
    length,
    length_squared,
    safe_normalize,
)
from pine_tpu.scene import shapes as S

BIG = 1e30
EPS = 1e-6


def _bc(params, ro, rd):
    """Broadcast convention: rays get a trailing prim axis, param columns get
    a ray axis inserted before the prim axis.  Supported layouts:

    - params (M,k),  rays (N,3)    -> out (N,M)    (brute force)
    - params (P,L,k), rays (P,K,3) -> out (P,K,L)  (packet leaf tests)

    i.e. params batch dims (if any) must align with the rays' leading dims.
    """
    return ro[..., :, None, :], rd[..., :, None, :]


def _col3(params, i):
    return params[..., None, :, i : i + 3]


def _col(params, i):
    return params[..., None, :, i]


def _valid_t(t, valid, tmin, tmax):
    ok = valid & (t > tmin) & (t < tmax)
    return jnp.where(ok, t, BIG)


# ---------------------------------------------------------------- sphere ----

def intersect_sphere(params, ro, rd, tmin, tmax):
    o, d = _bc(params, ro, rd)
    c, r = _col3(params, 0), _col(params, 3)
    ro_p = o - c
    b = jnp.sum(ro_p * d, -1)
    cc = jnp.sum(ro_p * ro_p, -1) - r * r
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t = jnp.where(t0 < tmin, -b + sq, t0)
    return _valid_t(t, disc > 0.0, tmin, tmax)


def surface_info_sphere(rows, p):
    c, r = rows[:, 0:3], rows[:, 3:4]
    n = safe_normalize(p - c)
    return c + n * r, n, cartesian_to_spherical(n)


def sample_sphere(rows, p, u):
    """Solid-angle cone sampling (geometry.cpp:99-114)."""
    c, r = rows[:, 0:3], rows[:, 3]
    l = length(c - p)
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - (r / l) ** 2, 0.0))
    solid = 2 * Pi * (1.0 - cos_theta)
    cos_wo = 1.0 - u[:, 1] * (1.0 - cos_theta)
    sin_wo = jnp.sqrt(jnp.maximum(1.0 - cos_wo**2, 0.0))
    phi = u[:, 0] * 2 * Pi
    w_local = jnp.stack([sin_wo * jnp.cos(phi), sin_wo * jnp.sin(phi), cos_wo], -1)
    z = (c - p) / l[..., None]
    t, b = coordinate_system(z)
    w = w_local[:, 0:1] * t + w_local[:, 1:2] * b + w_local[:, 2:3] * z
    # distance to sphere along w
    ro_p = p - c
    bq = dot(ro_p, w)
    cq = length_squared(ro_p) - r * r
    disc = jnp.maximum(bq * bq - cq, 0.0)
    dist = -bq - jnp.sqrt(disc)
    sp = p + w * dist[..., None]
    n = safe_normalize(sp - c)
    pdf = 1.0 / jnp.maximum(solid, EPS)
    return dict(p=sp, n=n, w=w, distance=dist, pdf=pdf)


def pdf_sphere(rows, ro, rd, t, ns):
    c, r = rows[:, 0:3], rows[:, 3]
    l = length(c - ro)
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - (r / l) ** 2, 0.0))
    solid = 2 * Pi * (1.0 - cos_theta)
    return 1.0 / jnp.maximum(solid, EPS)


# ------------------------------------------------------------------ rect ----

def intersect_rect(params, ro, rd, tmin, tmax):
    o, d = _bc(params, ro, rd)
    pos, ex, ey, n = _col3(params, 0), _col3(params, 3), _col3(params, 6), _col3(params, 9)
    lx, ly = _col(params, 12), _col(params, 13)
    denom = jnp.sum(d * n, -1)
    t = jnp.sum((pos - o) * n, -1) / jnp.where(denom == 0.0, 1.0, denom)
    p = o + t[..., None] * d - pos
    u = jnp.sum(p * ex, -1) / lx
    v = jnp.sum(p * ey, -1) / ly
    ok = (
        (denom != 0.0)
        & (jnp.abs(u) <= 0.5)
        & (jnp.abs(v) <= 0.5)
    )
    return _valid_t(t, ok, tmin, tmax)


def surface_info_rect(rows, p):
    pos, ex, ey, n = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
    lx, ly = rows[:, 12:13], rows[:, 13:14]
    rp = p - pos
    u = dotk(rp, ex) / lx
    v = dotk(rp, ey) / ly
    p_c = pos + ex * lx * u + ey * ly * v
    uv = jnp.concatenate([u + 0.5, v + 0.5], axis=-1)
    return p_c, n, uv


def sample_rect(rows, p, u):
    pos, ex, ey, n = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
    lx, ly = rows[:, 12:13], rows[:, 13:14]
    sp = pos + (u[:, 0:1] - 0.5) * ex * lx + (u[:, 1:2] - 0.5) * ey * ly
    dvec = sp - p
    dist = length(dvec)
    w = dvec / jnp.maximum(dist[..., None], EPS)
    area = (lx * ly)[:, 0]
    pdf = dist**2 / jnp.maximum(jnp.abs(dot(w, n)) * area, EPS)
    return dict(p=sp, n=n, w=w, distance=dist, pdf=pdf)


def pdf_rect(rows, ro, rd, t, ns):
    lx, ly = rows[:, 12], rows[:, 13]
    area = lx * ly
    return t**2 / jnp.maximum(area * jnp.abs(dot(ns, rd)), EPS)


# ------------------------------------------------------------------ disk ----

def intersect_disk(params, ro, rd, tmin, tmax):
    o, d = _bc(params, ro, rd)
    pos, n, r = _col3(params, 0), _col3(params, 3), _col(params, 12)
    denom = jnp.sum(d * n, -1)
    t = jnp.sum((pos - o) * n, -1) / jnp.where(denom == 0.0, 1.0, denom)
    p = o + t[..., None] * d - pos
    ok = (denom != 0.0) & (jnp.sum(p * p, -1) <= r * r)
    return _valid_t(t, ok, tmin, tmax)


def surface_info_disk(rows, p):
    pos, n, u_ax, v_ax = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
    ex = dotk(p - pos, u_ax)
    ey = dotk(p - pos, v_ax)
    return pos + ex * u_ax + ey * v_ax, n, jnp.concatenate([ex, ey], -1)


def sample_disk(rows, p, u):
    pos, n, u_ax, v_ax = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
    r = rows[:, 12:13]
    uv = sample_disk_concentric(u)
    sp = pos + r * u_ax * uv[:, 0:1] + r * v_ax * uv[:, 1:2]
    dvec = sp - p
    dist = length(dvec)
    w = dvec / jnp.maximum(dist[..., None], EPS)
    area = Pi * r[:, 0] ** 2
    pdf = dist**2 / jnp.maximum(jnp.abs(dot(w, n)) * area, EPS)
    return dict(p=sp, n=n, w=w, distance=dist, pdf=pdf)


def pdf_disk(rows, ro, rd, t, ns):
    r = rows[:, 12]
    area = Pi * r**2
    return t**2 / jnp.maximum(area * jnp.abs(dot(ns, rd)), EPS)


# ----------------------------------------------------------------- plane ----

def intersect_plane(params, ro, rd, tmin, tmax):
    o, d = _bc(params, ro, rd)
    pos, n = _col3(params, 0), _col3(params, 3)
    denom = jnp.sum(d * n, -1)
    t = jnp.sum((pos - o) * n, -1) / jnp.where(denom == 0.0, 1.0, denom)
    return _valid_t(t, denom != 0.0, tmin, tmax)


def surface_info_plane(rows, p):
    pos, n, u_ax, v_ax = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
    dp = p - pos
    u = dotk(dp, u_ax)
    v = dotk(dp, v_ax)
    return pos + u * u_ax + v * v_ax, n, jnp.concatenate([u, v], -1)


def sample_plane(rows, p, u):
    """Hemisphere projection sampling (geometry.cpp:57-69)."""
    pos, n, u_ax, v_ax = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
    sph = uniform_hemisphere(u)
    l = jnp.abs(dot(p - pos, n))
    ex = l * sph[:, 0] / jnp.maximum(sph[:, 2], 1e-4)
    ey = l * sph[:, 1] / jnp.maximum(sph[:, 2], 1e-4)
    dp = p - pos
    proj = pos + u_ax * dotk(dp, u_ax) + v_ax * dotk(dp, v_ax)
    sp = proj + u_ax * ex[..., None] + v_ax * ey[..., None]
    dvec = sp - p
    dist = length(dvec)
    w = dvec / jnp.maximum(dist[..., None], EPS)
    pdf = jnp.full(dist.shape, 1.0 / (2 * Pi))
    return dict(p=sp, n=n, w=w, distance=dist, pdf=pdf)


def pdf_plane(rows, ro, rd, t, ns):
    return jnp.full(t.shape, 1.0 / (2 * Pi))


# ------------------------------------------------------------------ aabb ----

def _slab(lower, upper, o, d, tmin, tmax):
    """Vectorized slab test -> (tnear, tfar, ok) with degenerate-axis handling."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-6, jnp.where(d < 0, -1e-6, 1e-6), d)
    t0 = (lower - o) * inv
    t1 = (upper - o) * inv
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tn, axis=-1), tmin)
    far = jnp.minimum(jnp.min(tf, axis=-1), tmax)
    # parallel-axis outside check (bbox.cpp:72-79)
    par = jnp.abs(d) < 1e-6
    outside = par & ((o < lower) | (o > upper))
    ok = (near <= far) & ~jnp.any(outside, axis=-1)
    return near, far, ok


def intersect_aabb(params, ro, rd, tmin, tmax):
    o, d = _bc(params, ro, rd)
    lower, upper = _col3(params, 0), _col3(params, 3)
    near, far, ok = _slab(lower, upper, o, d, tmin, tmax)
    t = jnp.where(near > tmin, near, far)
    return jnp.where(ok & (t > tmin) & (t <= tmax), t, BIG)


def surface_info_aabb(rows, p):
    lower, upper = rows[:, 0:3], rows[:, 3:6]
    centroid = (lower + upper) / 2
    diag = jnp.maximum(upper - lower, EPS)
    pu = (p - centroid) / diag
    axis = jnp.argmax(jnp.abs(pu), axis=-1)
    sign = jnp.sign(jnp.take_along_axis(pu, axis[:, None], axis=-1))[:, 0]
    n = jnp.zeros_like(p)
    n = jnp.where(
        (jnp.arange(3)[None, :] == axis[:, None]), sign[:, None], n
    )
    # snap hit point to the face
    face = jnp.where(sign[:, None] > 0, upper, lower)
    p_c = jnp.where(jnp.arange(3)[None, :] == axis[:, None], face, p)
    uv = jnp.zeros(p.shape[:-1] + (2,), p.dtype)
    return p_c, n, uv


def sample_aabb(rows, p, u):
    """Face sampling (bbox.cpp:125-137)."""
    lower, upper = rows[:, 0:3], rows[:, 3:6]
    diag = upper - lower
    ux = u[:, 0] * 3.0
    axis = jnp.clip(ux.astype(jnp.int32), 0, 2)
    ux = ux - axis
    b = u[:, 1] < 0.5
    uy = jnp.where(b, u[:, 1] * 2.0, u[:, 1] * 2.0 - 1.0)
    ar = jnp.arange(3)[None, :]
    a1 = (axis[:, None] + 1) % 3
    a2 = (axis[:, None] + 2) % 3
    p0 = jnp.where(ar == axis[:, None], jnp.where(b[:, None], upper, lower), lower)
    p0 = p0 + jnp.where(ar == a1, ux[:, None] * jnp.take_along_axis(diag, a1, -1), 0.0)
    p0 = p0 + jnp.where(ar == a2, uy[:, None] * jnp.take_along_axis(diag, a2, -1), 0.0)
    n = jnp.where(ar == axis[:, None], jnp.where(b[:, None], 1.0, -1.0), 0.0)
    dvec = p0 - p
    dist = length(dvec)
    w = dvec / jnp.maximum(dist[..., None], EPS)
    d = diag
    area = 2 * (d[:, 0] * d[:, 1] + d[:, 0] * d[:, 2] + d[:, 1] * d[:, 2])
    pdf = dist**2 / jnp.maximum(jnp.abs(dot(w, n)) * area, EPS)
    return dict(p=p0, n=n, w=w, distance=dist, pdf=pdf)


def pdf_aabb(rows, ro, rd, t, ns):
    lower, upper = rows[:, 0:3], rows[:, 3:6]
    d = upper - lower
    area = 2 * (d[:, 0] * d[:, 1] + d[:, 0] * d[:, 2] + d[:, 1] * d[:, 2])
    return t**2 / jnp.maximum(area * jnp.abs(dot(ns, rd)), EPS)


# ------------------------------------------------------------------- obb ----

def _mat_vec(mat, vec):
    """Batched 3x3 apply with full broadcasting: mat (...,3,3), vec (...,3)."""
    shape = jnp.broadcast_shapes(mat.shape[:-2], vec.shape[:-1])
    matb = jnp.broadcast_to(mat, shape + (3, 3))
    vecb = jnp.broadcast_to(vec, shape + (3,))
    return jnp.einsum("...ij,...j->...i", matb, vecb)


def _obb_mats(params):
    m = params[..., None, :, 6:18]
    mi = params[..., None, :, 18:30]
    return m.reshape(m.shape[:-1] + (3, 4)), mi.reshape(mi.shape[:-1] + (3, 4))


def intersect_obb(params, ro, rd, tmin, tmax):
    """OBB: transform to local, slab, map t back as world distances
    (bbox.cpp OBB::intersect)."""
    o, d = _bc(params, ro, rd)  # (N,1,3)
    lower, upper = _col3(params, 0), _col3(params, 3)
    m, mi = _obb_mats(params)
    o_l = _mat_vec(mi[..., :3], o) + mi[..., 3]
    d_l = _mat_vec(mi[..., :3], d)
    d_norm = jnp.sqrt(jnp.sum(d_l * d_l, -1, keepdims=True))
    d_l = d_l / jnp.maximum(d_norm, 1e-20)
    # slab in LOCAL units: only clamp the near end at the origin — world-space
    # tmin/tmax are meaningless here and are applied after conversion
    near, far, ok = _slab(lower, upper, o_l, d_l, 0.0, BIG)

    # local->world t: transform hit points back and measure distance
    def world_t(t_l):
        p_l = o_l + t_l[..., None] * d_l
        p_w = _mat_vec(m[..., :3], p_l) + m[..., 3]
        return jnp.sqrt(jnp.sum((p_w - o) ** 2, -1))

    t = jnp.where(near > 0.0, world_t(near), world_t(far))
    return jnp.where(ok & (t > tmin) & (t <= tmax), t, BIG)


def surface_info_obb(rows, p):
    mi = rows[:, 18:30].reshape(-1, 3, 4)
    m = rows[:, 6:18].reshape(-1, 3, 4)
    p_l = jnp.einsum("nij,nj->ni", mi[:, :, :3], p) + mi[:, :, 3]
    p_c, n_l, uv = surface_info_aabb(rows, p_l)
    p_w = jnp.einsum("nij,nj->ni", m[:, :, :3], p_c) + m[:, :, 3]
    n_w = safe_normalize(jnp.einsum("nji,nj->ni", mi[:, :, :3], n_l))
    return p_w, n_w, uv


def sample_obb(rows, p, u):
    m = rows[:, 6:18].reshape(-1, 3, 4)
    ss = sample_aabb(rows, p, u)
    sp = jnp.einsum("nij,nj->ni", m[:, :, :3], ss["p"]) + m[:, :, 3]
    dvec = sp - p
    dist = length(dvec)
    w = dvec / jnp.maximum(dist[..., None], EPS)
    return dict(p=sp, n=ss["n"], w=w, distance=dist, pdf=ss["pdf"])


def pdf_obb(rows, ro, rd, t, ns):
    return pdf_aabb(rows, ro, rd, t, ns)


# -------------------------------------------------------------- triangle ----

def intersect_triangle(params, ro, rd, tmin, tmax):
    o, d = _bc(params, ro, rd)
    v0, v1, v2 = _col3(params, 0), _col3(params, 3), _col3(params, 6)
    e1 = v1 - v0
    e2 = v2 - v0
    tv = o - v0
    pv = jnp.cross(jnp.broadcast_to(d, tv.shape), jnp.broadcast_to(e2, tv.shape))
    qv = jnp.cross(tv, jnp.broadcast_to(e1, tv.shape))
    det = jnp.sum(pv * e1, -1)
    inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = jnp.sum(qv * e2, -1) * inv
    u = jnp.sum(pv * tv, -1) * inv
    v = jnp.sum(qv * d, -1) * inv
    ok = (det != 0.0) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (u + v <= 1.0)
    return _valid_t(t, ok, tmin, tmax)


def surface_info_triangle(rows, p):
    v0, v1, v2, n = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
    # reference stores (u,v) = unnormalized dots; keep barycentric-free parity
    u = dotk(p - v0, v1 - v0)
    v = dotk(p - v0, v2 - v0)
    return p, n, jnp.concatenate([u, v], -1)


def sample_triangle(rows, p, u):
    v0, v1, v2, n = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
    flip = (u[:, 0] + u[:, 1]) > 1.0
    uu = jnp.where(flip[:, None], 1.0 - u, u)
    sp = v0 + uu[:, 0:1] * (v1 - v0) + uu[:, 1:2] * (v2 - v0)
    dvec = sp - p
    dist = length(dvec)
    w = dvec / jnp.maximum(dist[..., None], EPS)
    area = length(jnp.cross(v1 - v0, v2 - v0)) / 2
    pdf = dist**2 / jnp.maximum(jnp.abs(dot(w, n)) * area, EPS)
    return dict(p=sp, n=n, w=w, distance=dist, pdf=pdf)


def pdf_triangle(rows, ro, rd, t, ns):
    v0, v1, v2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    area = length(jnp.cross(v1 - v0, v2 - v0)) / 2
    return t**2 / jnp.maximum(area * jnp.abs(dot(ns, rd)), EPS)


# ------------------------------------------------------------------ cone ----

def intersect_cone(params, ro, rd, tmin, tmax):
    """Finite cone (geometry.cpp:415-453).  The reference's quadratic only
    rejects the upper nappe (above the apex) and relies on Embree's AABB
    culling to bound the lower one; we clamp to the base plane explicitly so
    brute-force and BVH paths agree."""
    o_w, d = _bc(params, ro, rd)
    apex, n, A2 = _col3(params, 0), _col3(params, 3), _col(params, 6)
    h = _col(params, 10)
    o = o_w - apex
    dn = jnp.sum(d * n, -1)
    on = jnp.sum(o * n, -1)
    a = -A2 * dn * dn + jnp.sum(d * d, -1)
    b = 2 * (-A2 * on * dn + jnp.sum(o * d, -1))
    c = -A2 * on * on + jnp.sum(o * o, -1)
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a == 0.0, EPS, a)
    t0 = (-b - sq) / (2 * a_safe)
    t = jnp.where(t0 < tmin, t0 + sq / a_safe, t0)
    height = jnp.sum((o + t[..., None] * d) * n, -1)  # relative to apex
    ok = (disc > 0.0) & (height < 0.0) & (height >= -h)
    return _valid_t(t, ok, tmin, tmax)


def surface_info_cone(rows, p):
    apex, n = rows[:, 0:3], rows[:, 3:6]
    A, Sf = rows[:, 7:8], rows[:, 8:9]
    l = length(p - apex)[..., None] * A
    x = apex - n * l
    nn = safe_normalize(p - x)
    return x + nn * l * Sf, nn, jnp.zeros(p.shape[:-1] + (2,), p.dtype)


def sample_cone(rows, p, u):
    sp = rows[:, 0:3]
    dvec = sp - p
    dist = length(dvec)
    w = dvec / jnp.maximum(dist[..., None], EPS)
    return dict(p=sp, n=-w, w=w, distance=dist, pdf=jnp.zeros_like(dist))


def pdf_cone(rows, ro, rd, t, ns):
    r, h = rows[:, 9], rows[:, 10]
    area = Pi * r * jnp.sqrt(r * r + h * h)
    return t**2 / jnp.maximum(area, EPS) * jnp.abs(dot(ns, rd))


# -------------------------------------------------------------- cylinder ----

def intersect_cylinder(params, ro, rd, tmin, tmax):
    o, d = _bc(params, ro, rd)
    p0, p1, n, r = _col3(params, 0), _col3(params, 3), _col3(params, 6), _col(params, 9)
    m = o - p0
    v = d - jnp.sum(d * n, -1, keepdims=True) * n
    w = m - jnp.sum(m * n, -1, keepdims=True) * n
    a = jnp.sum(v * v, -1)
    b = 2 * jnp.sum(v * w, -1)
    c = jnp.sum(w * w, -1) - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a == 0.0, EPS, a)
    t0 = (-b - sq) / (2 * a_safe)
    t = jnp.where(t0 < tmin, (-b + sq) / (2 * a_safe), t0)
    hp = o + t[..., None] * d
    axial = jnp.sum((hp - p0) * n, -1)
    len_ax = jnp.sum((p1 - p0) * n, -1)
    ok = (disc >= 0.0) & (axial >= 0.0) & (axial <= len_ax)
    return _valid_t(t, ok, tmin, tmax)


def surface_info_cylinder(rows, p):
    p0, n = rows[:, 0:3], rows[:, 6:9]
    proj = p0 + dotk(p - p0, n) * n
    nn = safe_normalize(p - proj)
    return p, nn, jnp.zeros(p.shape[:-1] + (2,), p.dtype)


def sample_cylinder(rows, p, u):
    return sample_cone(rows, p, u)


def pdf_cylinder(rows, ro, rd, t, ns):
    return jnp.zeros_like(t)


# ------------------------------------------------------------------ line ----

def intersect_line(params, ro, rd, tmin, tmax):
    """Capsule-ish 'line with thickness' (geometry.cpp:180-214): transform the
    segment into the ray's look_at frame where the ray is +z."""
    o_w, d = _bc(params, ro, rd)
    p0, p1 = _col3(params, 0), _col3(params, 3)
    thick = _col(params, 15)
    # ray frame (look_at semantics: z = ray dir)
    z = rd
    up = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], rd.dtype), rd.shape)
    z_adj = jnp.where(
        (jnp.abs(dot(z, up)) > 0.999)[..., None],
        safe_normalize(z + jnp.array([0.0, 0.0, 1e-5], rd.dtype)),
        z,
    )
    x = safe_normalize(jnp.cross(up, z_adj))
    y = jnp.cross(z_adj, x)

    rel0 = p0 - o_w
    rel1 = p1 - o_w
    f = lambda rel: jnp.stack(
        [
            jnp.sum(rel * x[..., :, None, :], -1),
            jnp.sum(rel * y[..., :, None, :], -1),
            jnp.sum(rel * z[..., :, None, :], -1),
        ],
        -1,
    )
    q0 = f(rel0)
    q1 = f(rel1)
    o = q0
    dd = q1 - q0
    d2 = jnp.sum(dd * dd, -1)
    dz = dd[..., 2]
    det = d2 - dz * dz
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    rhs0 = -jnp.sum(o * dd, -1)
    rhs1 = o[..., 2]
    tt = (rhs0 + dz * rhs1) / det
    tt = jnp.clip(tt, 0.0, 1.0)
    zhit = jnp.clip(o[..., 2] + tt * dz, tmin + thick, tmax)
    closest = o + tt[..., None] * dd
    dist = jnp.sqrt(
        closest[..., 0] ** 2 + closest[..., 1] ** 2 + (closest[..., 2] - zhit) ** 2
    )
    ok = dist <= thick
    return jnp.where(ok, zhit, BIG)


def surface_info_line(rows, p):
    p0, p1 = rows[:, 0:3], rows[:, 3:6]
    tz = rows[:, 12:15]
    lt = dotk(p - p0, tz)
    lp = p0 + (p1 - p0) * lt / jnp.maximum(dotk(p1 - p0, tz), EPS)
    n = safe_normalize(p - lp)
    return p, n, jnp.concatenate([lt, jnp.zeros_like(lt)], -1)


def sample_line(rows, p, u):
    p0, p1 = rows[:, 0:3], rows[:, 3:6]
    tx, ty = rows[:, 6:9], rows[:, 9:12]
    thick, ln = rows[:, 15:16], rows[:, 16]
    phi = u[:, 1:2] * 2 * Pi
    sp = p0 + (p1 - p0) * u[:, 0:1] + thick * jnp.cos(phi) * tx + thick * jnp.sin(phi) * ty
    n = jnp.cos(phi) * tx + jnp.sin(phi) * ty
    dvec = sp - p
    dist = length(dvec)
    w = dvec / jnp.maximum(dist[..., None], EPS)
    area = 2 * Pi * thick[:, 0] * ln
    pdf = dist**2 / jnp.maximum(jnp.abs(dot(w, n)) * area, EPS)
    return dict(p=sp, n=n, w=w, distance=dist, pdf=pdf)


def pdf_line(rows, ro, rd, t, ns):
    thick, ln = rows[:, 15], rows[:, 16]
    area = 2 * Pi * thick * ln
    return t**2 / jnp.maximum(area * jnp.abs(dot(ns, rd)), EPS)


# ---------------------------------------------------------------- tables ----

INTERSECT = {
    S.SPHERE: intersect_sphere,
    S.RECT: intersect_rect,
    S.DISK: intersect_disk,
    S.PLANE: intersect_plane,
    S.BOX_AABB: intersect_aabb,
    S.BOX_OBB: intersect_obb,
    S.TRIANGLE: intersect_triangle,
    S.CONE: intersect_cone,
    S.CYLINDER: intersect_cylinder,
    S.LINE: intersect_line,
}

SURFACE_INFO = {
    S.SPHERE: surface_info_sphere,
    S.RECT: surface_info_rect,
    S.DISK: surface_info_disk,
    S.PLANE: surface_info_plane,
    S.BOX_AABB: surface_info_aabb,
    S.BOX_OBB: surface_info_obb,
    S.TRIANGLE: surface_info_triangle,
    S.CONE: surface_info_cone,
    S.CYLINDER: surface_info_cylinder,
    S.LINE: surface_info_line,
}

SAMPLE = {
    S.SPHERE: sample_sphere,
    S.RECT: sample_rect,
    S.DISK: sample_disk,
    S.PLANE: sample_plane,
    S.BOX_AABB: sample_aabb,
    S.BOX_OBB: sample_obb,
    S.TRIANGLE: sample_triangle,
    S.CONE: sample_cone,
    S.CYLINDER: sample_cylinder,
    S.LINE: sample_line,
}

PDF = {
    S.SPHERE: pdf_sphere,
    S.RECT: pdf_rect,
    S.DISK: pdf_disk,
    S.PLANE: pdf_plane,
    S.BOX_AABB: pdf_aabb,
    S.BOX_OBB: pdf_obb,
    S.TRIANGLE: pdf_triangle,
    S.CONE: pdf_cone,
    S.CYLINDER: pdf_cylinder,
    S.LINE: pdf_line,
}
