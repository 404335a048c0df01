"""Unified BVH over ALL scene primitives: analytic shapes + mesh triangles.

The reference needs Embree user-geometry callbacks to mix analytic shapes
with triangles under one tree (impl/accel/embree.cpp:12-100); here every
primitive is an entity row in one SoA table:

    ent_type  (E,)   int32   shape type id (TRIANGLE for mesh tris)
    ent_param (E,32) float32 type-specific params (padded)
    ent_gidx  (E,)   int32   owning scene geometry

The SAH tree from accel/bvh.py orders entities into LEAF_MAX-padded leaves;
the wavefront traversal's leaf test gathers rows per lane and evaluates the
(static) set of present types masked-dense — dynamic shape dispatch becomes a
handful of dense VPU kernels per leaf visit (SURVEY.md §7 design table).
Mesh shading attributes (normals/uvs) ride along in entity order.
"""
from __future__ import annotations

import numpy as np

from pine_tpu.accel.bvh import LEAF_MAX, _build_sah
from pine_tpu.scene import shapes as S

ENT_PARAM_WIDTH = 32


def sah_arrays(lo, hi, centroid):
    """SAH build -> flat node arrays; native C++ builder when available
    (pine_tpu/native), numpy fallback otherwise."""
    from pine_tpu.accel.native_build import build_sah_native

    r = build_sah_native(lo, hi)
    if r is not None:
        return r
    order, nodes = _build_sah(lo, hi, centroid)
    order = np.asarray(order, np.int64)
    m = len(nodes)
    c_lower = np.zeros((m, 2, 3), np.float32)
    c_upper = np.zeros((m, 2, 3), np.float32)
    c_node = np.full((m, 2), -1, np.int32)
    c_start = np.zeros((m, 2), np.int32)
    c_count = np.zeros((m, 2), np.int32)
    for i, nd in enumerate(nodes):
        for k in (0, 1):
            c_lower[i, k] = nd["lower"][k]
            c_upper[i, k] = nd["upper"][k]
            if nd["is_leaf"][k]:
                c_start[i, k] = nd["start"][k]
                c_count[i, k] = nd["count"][k]
            else:
                c_node[i, k] = nd["child"][k]
    return order, c_lower, c_upper, c_node, c_start, c_count


def build_unified_accel(analytic_prims, meshes):
    """analytic_prims: list of (type_id, params np(k,), gidx, aabb(lo,hi)).
    meshes: list of (Mesh, gidx).  -> accel dict or None if empty."""
    import jax.numpy as jnp

    types, params, gidxs, los, his = [], [], [], [], []
    tri_attr_n = []  # per-entity (n0,n1,n2) or zeros
    tri_attr_t = []
    have_any_n = False
    have_any_t = False

    for tid, prm, gidx, (lo, hi) in analytic_prims:
        types.append(tid)
        row = np.zeros(ENT_PARAM_WIDTH, np.float32)
        row[: len(prm)] = prm
        params.append(row)
        gidxs.append(gidx)
        los.append(lo)
        his.append(hi)

    for mesh, gidx in meshes:
        v = mesh.vertices
        f = mesh.indices.astype(np.int64)
        v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        gn = np.cross(v0 - v1, v0 - v2)
        gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        rows = np.zeros((len(f), ENT_PARAM_WIDTH), np.float32)
        rows[:, 0:3] = v0
        rows[:, 3:6] = v1
        rows[:, 6:9] = v2
        rows[:, 9:12] = gn
        types.extend([S.TRIANGLE] * len(f))
        params.extend(rows)
        gidxs.extend([gidx] * len(f))
        los.extend(np.minimum(np.minimum(v0, v1), v2))
        his.extend(np.maximum(np.maximum(v0, v1), v2))
        if mesh.normals is not None:
            have_any_n = True

    if not types:
        return None

    types = np.asarray(types, np.int32)
    params = np.asarray(params, np.float32)
    gidxs = np.asarray(gidxs, np.int32)
    lo = np.asarray(los, np.float32)
    hi = np.asarray(his, np.float32)
    centroid = (lo + hi) * 0.5

    order, c_lower, c_upper, c_node, c_start, c_count = sah_arrays(lo, hi, centroid)
    m = len(c_lower)

    pad = LEAF_MAX
    ent_type = np.concatenate([types[order], np.full(pad, -1, np.int32)])
    ent_param = np.concatenate([params[order], np.zeros((pad, ENT_PARAM_WIDTH), np.float32)])
    ent_gidx = np.concatenate([gidxs[order], np.zeros(pad, np.int32)])

    accel = dict(
        c_lower=jnp.asarray(c_lower),
        c_upper=jnp.asarray(c_upper),
        c_node=jnp.asarray(c_node),
        c_start=jnp.asarray(c_start),
        c_count=jnp.asarray(c_count),
        ent_type=jnp.asarray(ent_type),
        ent_param=jnp.asarray(ent_param),
        ent_gidx=jnp.asarray(ent_gidx),
        present_types=sorted(set(int(t) for t in types)),
        n_nodes=m,
        n_entities=len(types),
    )

    # mesh shading attributes in entity order (zeros for analytic entities)
    if meshes:
        geom_n = np.zeros((len(types), 3), np.float32)
        geom_n[types == S.TRIANGLE] = params[types == S.TRIANGLE][:, 9:12]
        accel["geom_n"] = jnp.asarray(
            np.concatenate([geom_n[order], np.zeros((pad, 3), np.float32)])
        )
        if have_any_n or any(mesh.texcoords is not None for mesh, _ in meshes):
            n_attr = np.zeros((len(types), 9), np.float32)
            t_attr = np.zeros((len(types), 6), np.float32)
            has_n = np.zeros(len(types), bool)
            has_t = np.zeros(len(types), bool)
            k = len(analytic_prims)
            for mesh, gidx in meshes:
                f = mesh.indices.astype(np.int64)
                cnt = len(f)
                if mesh.normals is not None:
                    vn = mesh.normals
                    n_attr[k : k + cnt, 0:3] = vn[f[:, 0]]
                    n_attr[k : k + cnt, 3:6] = vn[f[:, 1]]
                    n_attr[k : k + cnt, 6:9] = vn[f[:, 2]]
                    has_n[k : k + cnt] = True
                if mesh.texcoords is not None:
                    vt = mesh.texcoords
                    t_attr[k : k + cnt, 0:2] = vt[f[:, 0]]
                    t_attr[k : k + cnt, 2:4] = vt[f[:, 1]]
                    t_attr[k : k + cnt, 4:6] = vt[f[:, 2]]
                    has_t[k : k + cnt] = True
                k += cnt
            accel["tri_n"] = jnp.asarray(
                np.concatenate([n_attr[order], np.zeros((pad, 9), np.float32)])
            )
            accel["tri_t"] = jnp.asarray(
                np.concatenate([t_attr[order], np.zeros((pad, 6), np.float32)])
            )
            accel["tri_has_n"] = jnp.asarray(
                np.concatenate([has_n[order], np.zeros(pad, bool)])
            )
            accel["tri_has_t"] = jnp.asarray(
                np.concatenate([has_t[order], np.zeros(pad, bool)])
            )
    return accel


def unified_surface_info_triangle(accel, ent, p):
    """Barycentric attrs for triangle entities (entity-order arrays)."""
    import jax.numpy as jnp

    rows = accel["ent_param"][ent]
    v0, v1, v2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    gn = rows[:, 9:12]
    e1 = v1 - v0
    e2 = v2 - v0
    dp = p - v0
    d11 = jnp.sum(e1 * e1, -1)
    d12 = jnp.sum(e1 * e2, -1)
    d22 = jnp.sum(e2 * e2, -1)
    dp1 = jnp.sum(dp * e1, -1)
    dp2 = jnp.sum(dp * e2, -1)
    det = jnp.maximum(d11 * d22 - d12 * d12, 1e-20)
    u = jnp.clip((d22 * dp1 - d12 * dp2) / det, 0.0, 1.0)
    v = jnp.clip((d11 * dp2 - d12 * dp1) / det, 0.0, 1.0)
    w = jnp.clip(1.0 - u - v, 0.0, 1.0)
    n = gn
    uv = jnp.stack([u, v], -1)
    if "tri_n" in accel:
        na = accel["tri_n"][ent]
        nrm = w[:, None] * na[:, 0:3] + u[:, None] * na[:, 3:6] + v[:, None] * na[:, 6:9]
        ln = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        smooth = accel["tri_has_n"][ent][:, None] & (ln > 1e-8)
        n = jnp.where(smooth, nrm / jnp.maximum(ln, 1e-8), gn)
    if "tri_t" in accel:
        ta = accel["tri_t"][ent]
        uv_i = (
            w[:, None] * ta[:, 0:2] + u[:, None] * ta[:, 2:4] + v[:, None] * ta[:, 4:6]
        )
        uv = jnp.where(accel["tri_has_t"][ent][:, None], uv_i, uv)
    return p, n, uv
