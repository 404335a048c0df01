"""Host-side binned-SAH BVH builder over triangle meshes.

Equivalent role to the reference's BVH builder (impl/accel/bvh.cpp:43-147:
16-bucket binned SAH, two-level scheme) but emits a *SoA flattened* tree
designed for vectorized traversal on TPU (pine_tpu/accel/traverse.py):

- parents store BOTH children's AABBs (like the reference's node layout) so a
  traversal step gathers one node record and tests two boxes;
- leaves are ranges of a reordered triangle array padded to LEAF_MAX so leaf
  tests are fixed-shape gathers;
- a C++ builder (pine_tpu/native) accelerates construction for large meshes,
  with this numpy path as fallback.
"""
from __future__ import annotations

import numpy as np

LEAF_MAX = 4
N_BUCKETS = 16


def build_scene_bvh(meshes):
    """Build ONE BVH over the union of several meshes' triangles.

    meshes: list of (Mesh, global_shape_idx, material_slot).  The combined
    accel carries per-triangle ``tri_gidx`` so hits resolve to the owning
    scene geometry (for material/emissive dispatch) without a second level —
    the TPU analogue of the reference's two-level tbvh/lbvh (bvh.cpp:453-548)
    flattened at build time.
    """
    import numpy as _np

    verts = []
    faces = []
    normals = []
    texcoords = []
    gidxs = []
    have_n = all(m.normals is not None for m, _, _ in meshes)
    have_t = all(m.texcoords is not None for m, _, _ in meshes)
    off = 0
    for mesh, gidx, _slot in meshes:
        verts.append(mesh.vertices)
        faces.append(mesh.indices.astype(_np.int64) + off)
        gidxs.append(_np.full(len(mesh.indices), gidx, _np.int32))
        if have_n:
            normals.append(mesh.normals)
        if have_t:
            texcoords.append(mesh.texcoords)
        off += len(mesh.vertices)
    from pine_tpu.scene.shapes import Mesh as _Mesh

    combined = _Mesh(
        _np.concatenate(verts),
        _np.concatenate(faces).astype(_np.uint32),
        _np.concatenate(texcoords) if have_t else None,
        _np.concatenate(normals) if have_n else None,
    )
    accel = build_mesh_bvh(combined, tri_gidx=_np.concatenate(gidxs))
    return accel


def build_mesh_bvh(mesh, tri_gidx=None):
    """-> dict of numpy/jnp arrays (see traverse.bvh_intersect)."""
    import jax.numpy as jnp

    v = mesh.vertices
    f = mesh.indices.astype(np.int64)
    tri_v0 = v[f[:, 0]]
    tri_v1 = v[f[:, 1]]
    tri_v2 = v[f[:, 2]]
    lo = np.minimum(np.minimum(tri_v0, tri_v1), tri_v2)
    hi = np.maximum(np.maximum(tri_v0, tri_v1), tri_v2)
    centroid = (lo + hi) * 0.5
    n_tri = len(f)

    order, nodes = _build_sah(lo, hi, centroid)
    # nodes: list of dict(left/right child descriptors)
    m = len(nodes)
    c_lower = np.zeros((m, 2, 3), np.float32)
    c_upper = np.zeros((m, 2, 3), np.float32)
    c_node = np.full((m, 2), -1, np.int32)  # inner child node index or -1
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

    order = np.asarray(order, np.int64)
    # pad the reordered triangle arrays so leaf gathers of LEAF_MAX are safe
    pad = LEAF_MAX
    def pack(a):
        out = np.concatenate([a[order], np.zeros((pad,) + a.shape[1:], a.dtype)])
        return jnp.asarray(np.ascontiguousarray(out, np.float32))

    accel = dict(
        c_lower=jnp.asarray(c_lower),
        c_upper=jnp.asarray(c_upper),
        c_node=jnp.asarray(c_node),
        c_start=jnp.asarray(c_start),
        c_count=jnp.asarray(c_count),
        v0=pack(tri_v0),
        v1=pack(tri_v1),
        v2=pack(tri_v2),
        n_nodes=m,
        n_tris=n_tri,
    )
    # per-triangle shading attributes in leaf order
    fo = f[order]
    e1 = tri_v0[order] - tri_v1[order]
    e2 = tri_v0[order] - tri_v2[order]
    gn = np.cross(e1, e2)
    gn_len = np.linalg.norm(gn, axis=-1, keepdims=True)
    gn = gn / np.maximum(gn_len, 1e-20)
    accel["geom_n"] = jnp.asarray(
        np.concatenate([gn, np.zeros((pad, 3))]).astype(np.float32)
    )
    if tri_gidx is not None:
        accel["tri_gidx"] = jnp.asarray(
            np.concatenate([tri_gidx[order], np.zeros(pad, np.int32)]).astype(np.int32)
        )
    if mesh.normals is not None:
        vn = mesh.normals
        # pack() itself applies [order]; feed unordered per-face attributes
        accel["n0"] = pack(vn[f[:, 0]])
        accel["n1"] = pack(vn[f[:, 1]])
        accel["n2"] = pack(vn[f[:, 2]])
    if mesh.texcoords is not None:
        vt = mesh.texcoords

        def pack2(a):
            out = np.concatenate([a, np.zeros((pad, 2), a.dtype)])
            return jnp.asarray(out.astype(np.float32))

        accel["t0"] = pack2(vt[fo[:, 0]])
        accel["t1"] = pack2(vt[fo[:, 1]])
        accel["t2"] = pack2(vt[fo[:, 2]])
    return accel


def _build_sah(lo, hi, centroid):
    """Binned-SAH top-down build. Returns (triangle order, node list)."""
    n = len(lo)
    idx = np.arange(n)
    order = []
    nodes = []

    def leaf_desc(ids):
        start = len(order)
        order.extend(ids.tolist())
        return dict(start=start, count=len(ids))

    def node_aabb(ids):
        return lo[ids].min(0), hi[ids].max(0)

    def split(ids):
        """-> (left_ids, right_ids) or None for leaf."""
        if len(ids) <= LEAF_MAX:
            return None
        c = centroid[ids]
        cmin, cmax = c.min(0), c.max(0)
        ext = cmax - cmin
        axis = int(np.argmax(ext))
        if ext[axis] <= 1e-12:
            half = len(ids) // 2
            return ids[:half], ids[half:]
        # 16-bucket binned SAH on the widest axis (bvh.cpp:43-147 approach)
        t = (c[:, axis] - cmin[axis]) / ext[axis]
        bucket = np.minimum((t * N_BUCKETS).astype(np.int32), N_BUCKETS - 1)
        costs = np.full(N_BUCKETS - 1, np.inf)
        for b in range(N_BUCKETS - 1):
            left = bucket <= b
            nl = left.sum()
            nr = len(ids) - nl
            if nl == 0 or nr == 0:
                continue
            llo, lhi = lo[ids[left]].min(0), hi[ids[left]].max(0)
            rlo, rhi = lo[ids[~left]].min(0), hi[ids[~left]].max(0)
            sa = lambda a, b_: 2 * np.prod(np.maximum(b_ - a, 0)[:2]) + 2 * (
                np.maximum(b_ - a, 0)[0] * np.maximum(b_ - a, 0)[2]
                + np.maximum(b_ - a, 0)[1] * np.maximum(b_ - a, 0)[2]
            )
            costs[b] = sa(llo, lhi) * nl + sa(rlo, rhi) * nr
        b = int(np.argmin(costs))
        if not np.isfinite(costs[b]):
            half = len(ids) // 2
            ordered = ids[np.argsort(c[:, axis])]
            return ordered[:half], ordered[half:]
        left = bucket <= b
        return ids[left], ids[~left]

    def recurse(ids):
        """Build a node over ids (len > LEAF_MAX). Returns node index."""
        me = len(nodes)
        nodes.append(None)
        parts = split(ids)
        desc = dict(
            lower=[None, None],
            upper=[None, None],
            is_leaf=[False, False],
            start=[0, 0],
            count=[0, 0],
            child=[0, 0],
        )
        for k, part in enumerate(parts):
            plo, phi = node_aabb(part)
            desc["lower"][k] = plo
            desc["upper"][k] = phi
            if len(part) <= LEAF_MAX or split(part) is None:
                d = leaf_desc(part)
                desc["is_leaf"][k] = True
                desc["start"][k] = d["start"]
                desc["count"][k] = d["count"]
            else:
                desc["child"][k] = recurse(part)
        nodes[me] = desc
        return me

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        if n <= LEAF_MAX:
            d = leaf_desc(idx)
            l, u = node_aabb(idx)
            nodes.append(
                dict(
                    lower=[l, l],
                    upper=[u, u],
                    is_leaf=[True, True],
                    start=[d["start"], 0],
                    count=[d["count"], 0],
                    child=[0, 0],
                )
            )
        else:
            recurse(idx)
    finally:
        sys.setrecursionlimit(old_limit)
    return order, nodes
