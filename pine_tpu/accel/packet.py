"""Packet BVH traversal: the TPU-native intersector.

Round-1's per-lane lockstep traversal gathered LEAF_MAX 32-float entity rows
per *ray* per node pop — pathological on TPU (measured 0.12 Mray/s).  This
module replaces it with *packet* traversal (the classic CPU-SIMD design,
bvh.cpp:320-451's stack walk lifted from 1 ray to K rays):

- rays are grouped into packets of K (tile-major film order keeps packets
  spatially coherent);
- each packet owns ONE scalar traversal stack; a node is visited if ANY ray
  in the packet hits its AABB.  All per-node data is fetched once per packet
  (P gathers of a few floats) and broadcast across the K rays — node tests
  and leaf tests become dense (P,K,·) VPU ops with zero per-ray gathers;
- shape-type dispatch is hoisted out of the tree: each numerous shape type
  gets its OWN BVH (single intersect kernel in its leaf loop), while types
  with few instances are brute-forced densely (the VPU wins outright there,
  SURVEY.md §7 hard part 1).

Entity numbering: the global entity table concatenates every group's
leaf-ordered primitives, so a group-local leaf slot maps to a global entity
by adding the group's base offset.  Shading attribute arrays (tri_n, ...)
are built in this same order, drop-in compatible with
accel.unified.unified_surface_info_triangle.
"""
from __future__ import annotations

import numpy as np

from pine_tpu.accel.unified import ENT_PARAM_WIDTH, sah_arrays
from pine_tpu.scene import shapes as S

BIG = 1e30
STACK_DEPTH = 48
LEAF_MAX = 4  # must match the SAH builders (accel/bvh.py, native)
DENSE_MAX = 16  # types with <= this many instances skip the BVH
DEFAULT_K = 256  # rays per packet


def _detect_lattice(params, lo, hi):
    """Detect a regular 1-D/2-D lattice of identical-shape prims.

    PRL scenes commonly instantiate shapes in nested `for` loops (the README
    cbox's 21x20 cone floor, forests, instance fields).  On TPU a per-lane
    table gather is impossible, but a lattice's prim parameters are AFFINE in
    the lattice indices: rows[i*nj + j] = base + i*dU + j*dV.  A kernel can
    therefore reconstruct the parameters of exactly the few cells a ray
    passes near with two fmas per column — no memory fetch at all
    (pallas_traverse._make_lattice_kernel).

    Returns None, or a dict with the affine model, the dual spatial basis
    for index selection, and conservative per-axis margins.  Caller must
    SNAP the stored params to the model so every traversal path sees
    identical geometry (float accumulation in script loops drifts ~1e-7 from
    the affine model; unsnapped rows would break path-vs-path parity).
    """
    n = len(params)
    if n < 4:
        return None
    P = np.asarray(params, np.float64)
    C = np.asarray((lo + hi) * 0.5, np.float64)  # prim AABB centers
    # tolerance relative to per-column spread (positions) with an absolute
    # floor for constant columns (radii etc.)
    ptp = P.max(0) - P.min(0)
    atol = ptp * 1e-5 + 1e-6
    dV = P[1] - P[0]
    fit1 = np.abs(P - (P[0] + np.arange(n)[:, None] * dV))
    bad = (fit1 > atol).any(1)
    nj = int(np.argmax(bad)) if bad.any() else n
    if nj < 2:
        return None
    if nj == n:
        ni = 1
        dU = np.zeros_like(dV)
    else:
        if n % nj:
            return None
        ni = n // nj
        dU = P[nj] - P[0]
        ii, jj = np.divmod(np.arange(n), nj)
        fit2 = np.abs(P - (P[0] + ii[:, None] * dU + jj[:, None] * dV))
        if (fit2 > atol).any():
            return None
    # spatial lattice vectors from AABB centers (the same (i, j) indexing)
    ii, jj = np.divmod(np.arange(n), nj)
    cV = C[1] - C[0]
    cU = C[nj] - C[0] if ni > 1 else np.zeros(3)
    cfit = np.abs(C - (C[0] + ii[:, None] * cU + jj[:, None] * cV))
    ctol = (C.max(0) - C.min(0)) * 1e-5 + 1e-6
    if (cfit > ctol).any():
        return None
    # dual basis: gu.cU = 1, gu.cV = 0 (and symmetrically), within span(cU,cV)
    if ni > 1 and nj > 1:
        G = np.array([[cU @ cU, cU @ cV], [cV @ cU, cV @ cV]])
        if abs(np.linalg.det(G)) < 1e-12 * max(G[0, 0] * G[1, 1], 1e-30):
            return None  # degenerate (collinear axes)
        Ginv = np.linalg.inv(G)
        gu = Ginv[0, 0] * cU + Ginv[0, 1] * cV
        gv = Ginv[1, 0] * cU + Ginv[1, 1] * cV
    elif nj > 1:  # 1-D lattice along V
        if cV @ cV < 1e-20:
            return None
        gu = np.zeros(3)
        gv = cV / (cV @ cV)
    else:
        return None
    # margins: u-extent of a prim = support of its AABB half-extents along
    # gu, in cell units (|gu.cU| == 1), plus slack for the snap residual
    half = np.asarray(hi - lo, np.float64) * 0.5
    r_u = float((half @ np.abs(gu)).max()) + 1e-4 if ni > 1 else 0.49
    r_v = float((half @ np.abs(gv)).max()) + 1e-4
    # the kernel's K x K candidate window must fit span/T + 2r + 1 entries:
    # reject prims much fatter than their lattice cell (capacity <= 0)
    K = 4
    cap_u = K - 1 - 2 * r_u
    cap_v = K - 1 - 2 * r_v
    if cap_u < 0.45 or cap_v < 0.45:
        return None
    snapped = (
        P[0] + ii[:, None] * dU + jj[:, None] * dV
    ).astype(np.float32)
    return dict(
        ni=ni, nj=nj, K=K,
        base=P[0].astype(np.float32), dU=dU.astype(np.float32),
        dV=dV.astype(np.float32),
        gu=gu.astype(np.float32), gv=gv.astype(np.float32),
        u0=float(C[0] @ gu), v0=float(C[0] @ gv),
        r_u=float(r_u), r_v=float(r_v),
        cap_u=float(cap_u), cap_v=float(cap_v),
        snapped=snapped,
    )


def _mesh_tri_tables(mesh):
    """Local-space per-triangle tables -> (rows(F,12), lo, hi, n_attr, t_attr,
    has_n, has_t)."""
    v = mesh.vertices
    f = mesh.indices.astype(np.int64)
    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    gn = np.cross(v0 - v1, v0 - v2)
    gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    rows = np.concatenate([v0, v1, v2, gn], axis=1).astype(np.float32)
    lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    F = len(f)
    if mesh.normals is not None:
        vn = mesh.normals
        n_attr = np.concatenate([vn[f[:, 0]], vn[f[:, 1]], vn[f[:, 2]]], axis=1)
        has_n = np.ones(F, bool)
    else:
        n_attr = np.zeros((F, 9), np.float32)
        has_n = np.zeros(F, bool)
    if mesh.texcoords is not None:
        vt = mesh.texcoords
        t_attr = np.concatenate([vt[f[:, 0]], vt[f[:, 1]], vt[f[:, 2]]], axis=1)
        has_t = np.ones(F, bool)
    else:
        t_attr = np.zeros((F, 6), np.float32)
        has_t = np.zeros(F, bool)
    return rows, lo, hi, n_attr.astype(np.float32), t_attr.astype(np.float32), has_n, has_t


def build_packet_accel(analytic_prims, meshes, instanced=()):
    """analytic_prims: list of (type_id, params np(k,), gidx, aabb(lo,hi));
    meshes: list of (Mesh, gidx); instanced: list of dicts
    {mesh, minv (I,12 world->local), m (I,12 local->world), gidx (I,)}
    -> accel dict or None if empty.

    Groups primitives by shape type; numerous types get a per-type SAH BVH,
    sparse types a dense table.  Triangles from all meshes form one group.

    Instanced records become lazy two-level groups (geometry.h:371-390,
    Embree RTC instancing): ONE local-space triangle table + SAH tree shared
    by all instances, plus a top-level SAH tree over instance world AABBs.
    Hits report virtual entity ids  vbase + instance*stride + tri  so memory
    stays O(mesh), not O(instances x mesh).
    """
    import jax.numpy as jnp

    by_type = {}
    for tid, prm, gidx, (lo, hi) in analytic_prims:
        by_type.setdefault(tid, []).append((prm, gidx, lo, hi))

    tri_v = []  # (v0,v1,v2,gn) rows
    tri_gidx = []
    tri_lo, tri_hi = [], []
    tri_n, tri_t = [], []
    tri_has_n, tri_has_t = [], []
    for mesh, gidx in meshes:
        v = mesh.vertices
        f = mesh.indices.astype(np.int64)
        v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        gn = np.cross(v0 - v1, v0 - v2)
        gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        rows = np.concatenate([v0, v1, v2, gn], axis=1).astype(np.float32)
        tri_v.append(rows)
        tri_gidx.append(np.full(len(f), gidx, np.int32))
        tri_lo.append(np.minimum(np.minimum(v0, v1), v2))
        tri_hi.append(np.maximum(np.maximum(v0, v1), v2))
        if mesh.normals is not None:
            vn = mesh.normals
            tri_n.append(
                np.concatenate([vn[f[:, 0]], vn[f[:, 1]], vn[f[:, 2]]], axis=1)
            )
            tri_has_n.append(np.ones(len(f), bool))
        else:
            tri_n.append(np.zeros((len(f), 9), np.float32))
            tri_has_n.append(np.zeros(len(f), bool))
        if mesh.texcoords is not None:
            vt = mesh.texcoords
            tri_t.append(
                np.concatenate([vt[f[:, 0]], vt[f[:, 1]], vt[f[:, 2]]], axis=1)
            )
            tri_has_t.append(np.ones(len(f), bool))
        else:
            tri_t.append(np.zeros((len(f), 6), np.float32))
            tri_has_t.append(np.zeros(len(f), bool))

    groups = []
    ent_type_l, ent_param_l, ent_gidx_l = [], [], []
    ent_tri_n, ent_tri_t = [], []
    ent_tri_has_n, ent_tri_has_t = [], []
    base = 0

    def _append_entities(tid, params, gidxs, order, n_attr=None, t_attr=None,
                         has_n=None, has_t=None):
        nonlocal base
        cnt = len(order)
        rows32 = np.zeros((cnt, ENT_PARAM_WIDTH), np.float32)
        pw = params.shape[1]
        rows32[:, :pw] = params[order]
        ent_type_l.append(np.full(cnt, tid, np.int32))
        ent_param_l.append(rows32)
        ent_gidx_l.append(np.asarray(gidxs)[order])
        if n_attr is not None:
            ent_tri_n.append(n_attr[order])
            ent_tri_has_n.append(has_n[order])
            ent_tri_t.append(t_attr[order])
            ent_tri_has_t.append(has_t[order])
        else:
            ent_tri_n.append(np.zeros((cnt, 9), np.float32))
            ent_tri_has_n.append(np.zeros(cnt, bool))
            ent_tri_t.append(np.zeros((cnt, 6), np.float32))
            ent_tri_has_t.append(np.zeros(cnt, bool))
        this_base = base
        base += cnt
        return this_base, rows32[:, :pw]

    def _add_group(tid, params, gidxs, lo, hi, n_attr=None, t_attr=None,
                   has_n=None, has_t=None):
        params = np.asarray(params, np.float32)
        lo = np.asarray(lo, np.float32)
        hi = np.asarray(hi, np.float32)
        n = len(params)
        # regular-lattice prim fields (script loops) get an arithmetic-
        # reconstruction kernel; params snap to the affine model so every
        # traversal path sees identical geometry (drift is ~1e-7, far below
        # any prim scale — _detect_lattice rejects anything larger)
        lattice = None
        from pine_tpu.accel.pallas_traverse import PRIM_TESTS as _PT_TESTS

        import os

        if (
            n > DENSE_MAX
            and tid in _PT_TESTS
            and n_attr is None
            and os.environ.get("PINE_LATTICE", "1") != "0"
        ):
            lattice = _detect_lattice(params, lo, hi)
            if lattice is not None:
                params = lattice.pop("snapped")
        if n <= DENSE_MAX:
            order = np.arange(n)
            gbase, rows = _append_entities(
                tid, params, gidxs, order, n_attr, t_attr, has_n, has_t
            )
            groups.append(
                dict(
                    tid=tid, kind="dense", base=gbase, rows=jnp.asarray(rows),
                    rows_np=rows.copy(),
                    _prim_aabbs=np.concatenate([lo, hi], axis=1),
                )
            )
            return
        centroid = (lo + hi) * 0.5
        order, c_lower, c_upper, c_node, c_start, c_count = sah_arrays(
            lo, hi, centroid
        )
        gbase, rows = _append_entities(
            tid, params, gidxs, order, n_attr, t_attr, has_n, has_t
        )
        rows_pad = np.concatenate(
            [rows, np.zeros((LEAF_MAX, rows.shape[1]), np.float32)]
        )
        if lattice is not None:
            # lattice index k -> SAH slot, applied as an XLA gather AFTER the
            # kernel (pallas_group_query) — per-lane lookups stay impossible
            # in-kernel, but the id translation is ordinary XLA
            inv = np.empty(n, np.int32)
            inv[order] = np.arange(n, dtype=np.int32)
            lattice["slot_of_k"] = inv
        groups.append(
            dict(
                tid=tid,
                kind="bvh",
                lattice=lattice,
                base=gbase,
                rows=jnp.asarray(rows_pad),
                rows_np=rows_pad.copy(),
                _prim_aabbs=np.concatenate([lo, hi], axis=1)[order],
                c_lower=jnp.asarray(c_lower),
                c_upper=jnp.asarray(c_upper),
                c_node=jnp.asarray(c_node),
                c_start=jnp.asarray(c_start),
                c_count=jnp.asarray(c_count),
                nodes_np=dict(
                    c_lower=np.asarray(c_lower), c_upper=np.asarray(c_upper),
                    c_node=np.asarray(c_node), c_start=np.asarray(c_start),
                    c_count=np.asarray(c_count),
                ),
            )
        )

    for tid in sorted(by_type):
        entries = by_type[tid]
        params = np.stack([e[0] for e in entries])
        gidxs = np.asarray([e[1] for e in entries], np.int32)
        lo = np.stack([e[2] for e in entries])
        hi = np.stack([e[3] for e in entries])
        _add_group(tid, params, gidxs, lo, hi)

    if tri_v:
        params = np.concatenate(tri_v)
        gidxs = np.concatenate(tri_gidx)
        lo = np.concatenate(tri_lo).astype(np.float32)
        hi = np.concatenate(tri_hi).astype(np.float32)
        _add_group(
            S.TRIANGLE, params, gidxs, lo, hi,
            n_attr=np.concatenate(tri_n).astype(np.float32),
            t_attr=np.concatenate(tri_t).astype(np.float32),
            has_n=np.concatenate(tri_has_n),
            has_t=np.concatenate(tri_has_t),
        )

    # ---- lazy two-level instanced groups ------------------------------------
    inst_groups = []
    vbase = base + LEAF_MAX  # virtual ids start clear of the entity pad rows
    for rec in instanced:
        mesh = rec["mesh"]
        rows, lo, hi, n_attr, t_attr, has_n, has_t = _mesh_tri_tables(mesh)
        centroid = (lo + hi) * 0.5
        order, c_lower, c_upper, c_node, c_start, c_count = sah_arrays(
            lo, hi, centroid
        )
        rows = rows[order]
        T = len(rows)
        stride = T + LEAF_MAX  # leaf slots may peek into the pad rows
        rows_pad = np.concatenate([rows, np.zeros((LEAF_MAX, 12), np.float32)])
        sub = dict(
            tid=S.TRIANGLE, kind="bvh", base=0,
            rows=jnp.asarray(rows_pad), rows_np=rows_pad.copy(),
            _prim_aabbs=np.concatenate([lo, hi], axis=1)[order],
            c_lower=jnp.asarray(c_lower), c_upper=jnp.asarray(c_upper),
            c_node=jnp.asarray(c_node), c_start=jnp.asarray(c_start),
            c_count=jnp.asarray(c_count),
            nodes_np=dict(
                c_lower=np.asarray(c_lower), c_upper=np.asarray(c_upper),
                c_node=np.asarray(c_node), c_start=np.asarray(c_start),
                c_count=np.asarray(c_count),
            ),
        )
        # instance world AABBs from the mesh's local AABB corners
        mlo, mhi = lo.min(0), hi.max(0)
        corners = np.array(
            [[x, y, z] for x in (mlo[0], mhi[0]) for y in (mlo[1], mhi[1])
             for z in (mlo[2], mhi[2])], np.float32
        )
        m_l2w = np.asarray(rec["m"], np.float32).reshape(-1, 3, 4)
        I_n = len(m_l2w)
        wc = np.einsum("iab,cb->ica", m_l2w[:, :, :3], corners) + m_l2w[:, None, :, 3]
        ilo = wc.min(axis=1)
        ihi = wc.max(axis=1)
        iorder, ic_lower, ic_upper, ic_node, ic_start, ic_count = sah_arrays(
            ilo, ihi, (ilo + ihi) * 0.5
        )
        iorder = np.asarray(iorder, np.int64)
        minv = np.asarray(rec["minv"], np.float32).reshape(I_n, 12)[iorder]
        m_fwd = np.asarray(rec["m"], np.float32).reshape(I_n, 12)[iorder]
        gidxs = np.asarray(rec["gidx"], np.int32)[iorder]
        pad_i = LEAF_MAX
        inst_groups.append(
            dict(
                kind="instanced", tid=S.TRIANGLE, vbase=vbase, stride=stride,
                n_tris=T, n_inst=I_n, mesh=sub,
                ic_lower=jnp.asarray(ic_lower), ic_upper=jnp.asarray(ic_upper),
                ic_node=jnp.asarray(ic_node), ic_start=jnp.asarray(ic_start),
                ic_count=jnp.asarray(ic_count),
                inst_minv=jnp.asarray(
                    np.concatenate([minv, np.zeros((pad_i, 12), np.float32)])
                ),
                inst_m=jnp.asarray(
                    np.concatenate([m_fwd, np.zeros((pad_i, 12), np.float32)])
                ),
                inst_gidx=jnp.asarray(
                    np.concatenate([gidxs, np.zeros(pad_i, np.int32)])
                ),
                _inst_aabbs=jnp.asarray(
                    np.concatenate([ilo, ihi], axis=1)[iorder].astype(np.float32)
                ),
                # host copies for the two-level Pallas kernel's SMEM layout
                # (accel/instanced_kernel.py; no device readback allowed there)
                inst_np=dict(
                    ic_lower=np.asarray(ic_lower), ic_upper=np.asarray(ic_upper),
                    ic_node=np.asarray(ic_node), ic_start=np.asarray(ic_start),
                    ic_count=np.asarray(ic_count),
                    iboxes=np.concatenate([ilo, ihi], axis=1)[iorder].astype(np.float32),
                    minv=minv.copy(),
                ),
                tri_n=jnp.asarray(
                    np.concatenate([n_attr[order], np.zeros((LEAF_MAX, 9), np.float32)])
                ),
                tri_t=jnp.asarray(
                    np.concatenate([t_attr[order], np.zeros((LEAF_MAX, 6), np.float32)])
                ),
                tri_has_n=jnp.asarray(
                    np.concatenate([has_n[order], np.zeros(LEAF_MAX, bool)])
                ),
                tri_has_t=jnp.asarray(
                    np.concatenate([has_t[order], np.zeros(LEAF_MAX, bool)])
                ),
            )
        )
        vbase += I_n * stride
    groups.extend(inst_groups)

    if base == 0 and not inst_groups:
        return None

    # Pre-build the Pallas-side table layouts OUTSIDE any jit trace so the
    # capture walker can pass them as jit arguments (capture.py: captured
    # device constants poison the TPU dispatch path).
    from pine_tpu.accel import pallas_traverse as PT

    for g in groups:
        if g["kind"] == "instanced":
            # the TPU fast path (accel/instanced_pallas.py) sweeps the shared
            # mesh subtree with the regular Pallas kernels: prebuild its
            # layouts outside any trace (capture.py discipline)
            sub = g["mesh"]
            if PT._grid_eligible(sub):
                PT._grid_layout(sub)
                if PT._grid_hbm(sub):
                    PT._sc_tree_layout(sub)
            else:
                PT._group_smem_arrays(sub)
                PT._smem_gbox(sub)
            from pine_tpu.accel import instanced_kernel as IK

            if IK.kernel_supports(g):
                lay = IK.inst_layout(g)  # builds the mesh sctree layout too
                from pine_tpu.accel import mxu_sweep

                # MXU coefficient table for PINE_INST_KERNEL=mxu (outside
                # the trace — capture discipline)
                mxu_sweep.build_mesh_tables(g["mesh"], lay["e_pad"], PT.SUPER)
            continue
        if g["tid"] in PT.PRIM_TESTS:
            if g.get("lattice") is not None:
                # lattice kernel scalars + k->slot table + group box, built
                # outside the trace (capture discipline)
                PT._lattice_smem(g)
                PT._smem_gbox(g)
            if PT._grid_eligible(g):
                PT._grid_layout(g)
                if PT._grid_hbm(g):
                    PT._sc_tree_layout(g)
                else:
                    # small groups: the PINE_SMALL_KERNEL knob may select the
                    # dense/scdense/bvh variants at trace time — prebuild their
                    # SMEM layout too so the captured-array structure (and the
                    # no-captured-constants discipline) is knob-independent
                    PT._group_smem_arrays(g)
                    PT._smem_gbox(g)
            else:
                PT._group_smem_arrays(g)
                PT._smem_gbox(g)
            from pine_tpu.accel import mxu_sweep

            if mxu_sweep.supports(g["tid"]):
                # MXU matmul coefficient tables (PINE_SMALL_KERNEL=mxu/mxup,
                # PINE_MESH_KERNEL=mxu), built outside the trace for the
                # same capture discipline
                if PT._grid_hbm(g):
                    if PT._grid_eligible(g):
                        mxu_sweep.build_mesh_tables(
                            g, PT._grid_layout(g)["e_pad"], PT.SUPER
                        )
                else:
                    mxu_sweep.build_tables(g)
                    mxu_sweep.build_tiled_tables(g)

    pad = LEAF_MAX
    accel = dict(
        groups=groups,
        inst_groups=inst_groups,
        n_entities=base,
        ent_type=jnp.asarray(
            np.concatenate(ent_type_l + [np.full(pad, -1, np.int32)])
        ),
        ent_param=jnp.asarray(
            np.concatenate(ent_param_l + [np.zeros((pad, ENT_PARAM_WIDTH), np.float32)])
        ),
        ent_gidx=jnp.asarray(np.concatenate(ent_gidx_l + [np.zeros(pad, np.int32)])),
    )
    if meshes:
        ep = np.concatenate(ent_param_l)
        et = np.concatenate(ent_type_l)
        geom_n = np.zeros((base, 3), np.float32)
        is_tri = et == S.TRIANGLE
        geom_n[is_tri] = ep[is_tri][:, 9:12]
        accel["geom_n"] = jnp.asarray(
            np.concatenate([geom_n, np.zeros((pad, 3), np.float32)])
        )
        accel["tri_n"] = jnp.asarray(
            np.concatenate(ent_tri_n + [np.zeros((pad, 9), np.float32)])
        )
        accel["tri_t"] = jnp.asarray(
            np.concatenate(ent_tri_t + [np.zeros((pad, 6), np.float32)])
        )
        accel["tri_has_n"] = jnp.asarray(
            np.concatenate(ent_tri_has_n + [np.zeros(pad, bool)])
        )
        accel["tri_has_t"] = jnp.asarray(
            np.concatenate(ent_tri_has_t + [np.zeros(pad, bool)])
        )
    return accel


# --------------------------------------------------------------------------
# traversal
# --------------------------------------------------------------------------

def _safe_inv(rd):
    import jax.numpy as jnp

    return 1.0 / jnp.where(jnp.abs(rd) < 1e-9, jnp.where(rd < 0, -1e-9, 1e-9), rd)


def _pad_rays(ro, rd, tmin, tmax, K):
    import jax.numpy as jnp

    n = ro.shape[0]
    n_pad = ((n + K - 1) // K) * K
    if n_pad != n:
        extra = n_pad - n
        ro = jnp.concatenate([ro, jnp.zeros((extra, 3), ro.dtype)])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], rd.dtype), (extra, 3))]
        )
        tmin = jnp.concatenate([tmin, jnp.zeros((extra,), tmin.dtype)])
        tmax = jnp.concatenate([tmax, jnp.full((extra,), -1.0, tmax.dtype)])
    return ro, rd, tmin, tmax, n


def _group_dense_t(g, ro_p, rd_p, tmin_p, tmax_p):
    """Dense test of every row in a small group -> (t (P,K,E), ent (E,))."""
    from pine_tpu.scene import intersect as I

    t = I.INTERSECT[g["tid"]](g["rows"], ro_p, rd_p, tmin_p[..., None], tmax_p[..., None])
    return t


def _packet_traverse_group(g, ro_p, rd_p, tmin_p, best_t, best_e, inv_d):
    """Closest-hit packet walk of one per-type BVH.

    ro_p/rd_p (P,K,3); best_t (P,K); best_e (P,K) global entity ids.
    """
    import jax
    import jax.numpy as jnp
    from pine_tpu.scene import intersect as I

    P, K = ro_p.shape[:2]
    kern = I.INTERSECT[g["tid"]]
    c_lower, c_upper = g["c_lower"], g["c_upper"]
    c_node, c_start, c_count = g["c_node"], g["c_start"], g["c_count"]
    rows = g["rows"]
    base = g["base"]
    pidx = jnp.arange(P)
    offs = jnp.arange(LEAF_MAX, dtype=jnp.int32)
    scol = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]

    def cond(state):
        _, sp, _, _ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_e = state
        active = sp > 0
        sp1 = jnp.where(active, sp - 1, sp)
        node = jnp.where(active, stack[pidx, jnp.maximum(sp1, 0)], 0)

        lo = c_lower[node]  # (P,2,3)
        up = c_upper[node]
        # (P,K,2,3) slab test against per-ray current best
        t0 = (lo[:, None] - ro_p[:, :, None]) * inv_d[:, :, None]
        t1 = (up[:, None] - ro_p[:, :, None]) * inv_d[:, :, None]
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), tmin_p[:, :, None])
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), best_t[:, :, None])
        hit = (tn <= tf) & active[:, None, None]  # (P,K,2)
        tn = jnp.where(hit, tn, BIG)
        packet_hit = jnp.any(hit, axis=1)  # (P,2)
        child = c_node[node]  # (P,2)
        is_leaf = child < 0

        for k in (0, 1):
            do_leaf = packet_hit[:, k] & is_leaf[:, k]
            start = jnp.where(do_leaf, c_start[node, k], 0)
            cnt = jnp.where(do_leaf, c_count[node, k], 0)
            idx = start[:, None] + offs[None, :]  # (P,L)
            leaf_rows = rows[idx]  # (P,L,W)
            tt = kern(leaf_rows, ro_p, rd_p, tmin_p[..., None], best_t[..., None])
            valid = offs[None, None, :] < cnt[:, None, None]
            tt = jnp.where(valid, tt, BIG)  # (P,K,L)
            tbest = jnp.min(tt, axis=-1)
            arg = jnp.argmin(tt, axis=-1)  # (P,K)
            ent = base + jnp.take_along_axis(idx, arg.reshape(P, -1), axis=1).reshape(P, K)
            better = tbest < best_t
            best_t = jnp.where(better, tbest, best_t)
            best_e = jnp.where(better, ent, best_e)

        # push inner children, far-first by packet-min entry distance
        push = packet_hit & ~is_leaf  # (P,2)
        tn_min = jnp.min(tn, axis=1)  # (P,2) BIG where no hit
        near_is_0 = tn_min[:, 0] <= tn_min[:, 1]
        first = jnp.where(near_is_0, 1, 0)  # far child pushed first
        second = 1 - first

        def push_child(stack, sp, which, do_push):
            ch = child[pidx, which]
            pos = jnp.minimum(sp, STACK_DEPTH - 1)
            stack = jnp.where(
                (scol == pos[:, None]) & do_push[:, None], ch[:, None], stack
            )
            return stack, jnp.where(do_push, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        stack, sp2 = push_child(stack, sp1, first, push[pidx, first] & active)
        stack, sp3 = push_child(stack, sp2, second, push[pidx, second] & active)
        return stack, sp3, best_t, best_e

    stack0 = jnp.zeros((P, STACK_DEPTH), jnp.int32)
    sp0 = jnp.ones((P,), jnp.int32)
    _, _, best_t, best_e = jax.lax.while_loop(
        cond, body, (stack0, sp0, best_t, best_e)
    )
    return best_t, best_e


def _xform_rays(minv, ro_p, rd_p):
    """Apply per-packet-row world->local 3x4 matrices (P,12) to rays.
    Directions stay unnormalized so local t == world t."""
    import jax.numpy as jnp

    m = minv.reshape(minv.shape[0], 3, 4)  # (P,3,4)
    ol = jnp.einsum("pab,pkb->pka", m[:, :, :3], ro_p) + m[:, None, :, 3]
    dl = jnp.einsum("pab,pkb->pka", m[:, :, :3], rd_p)
    return ol, dl


def _packet_traverse_instanced(g, ro_p, rd_p, tmin_p, best_t, best_e, inv_d):
    """Two-level closest hit: outer packet walk over the instance tree; taken
    instance leaves are queued per packet row and drained through ONE shared
    inner mesh walk (the TPU shape of Embree RTC instancing,
    geometry.h:371-390).  best_e gets virtual ids vbase + inst*stride + tri.

    The queue matters: instantiating the inner while_loop per leaf slot (the
    first design) nested 16 loops per path depth and crashed the TPU worker
    at depth 3 — this form embeds exactly ONE inner walk in the program, with
    rows draining their queued instances near-first (best-t pruned) while
    other rows keep descending."""
    import jax
    import jax.numpy as jnp

    P, K = ro_p.shape[:2]
    ic_lower, ic_upper = g["ic_lower"], g["ic_upper"]
    ic_node, ic_start, ic_count = g["ic_node"], g["ic_start"], g["ic_count"]
    sub = g["mesh"]
    vbase, stride = g["vbase"], g["stride"]
    pidx = jnp.arange(P)
    scol = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]
    far_o = jnp.full((P, K, 3), 2.0 * BIG, jnp.float32)

    def leaf_instance(slot, do, best_t, best_e):
        """Shared-mesh walk for one per-row instance slot (masked by do)."""
        slot = jnp.where(do, slot, 0)
        minv = g["inst_minv"][slot]  # (P,12)
        ol, dl = _xform_rays(minv, ro_p, rd_p)
        # degenerate rays for rows without work: origin far outside every
        # AABB so the inner walk's root test misses immediately
        ol = jnp.where(do[:, None, None], ol, far_o)
        dl = jnp.where(do[:, None, None], dl, 1.0)
        sub_g = dict(sub, base=(vbase + slot * stride)[:, None])
        return _packet_traverse_group(
            sub_g, ol, dl, tmin_p, best_t, best_e, _safe_inv(dl)
        )

    def body(state):
        stack, sp, istack, isp, best_t, best_e = state

        # ---- instance phase: rows with queued instances drain one --------
        has_inst = isp > 0
        isp1 = jnp.where(has_inst, isp - 1, isp)
        slot = istack[pidx, jnp.maximum(isp1, 0)]
        best_t, best_e = jax.lax.cond(
            jnp.any(has_inst),
            lambda bt, be: leaf_instance(slot, has_inst, bt, be),
            lambda bt, be: (bt, be),
            best_t, best_e,
        )

        # ---- node phase: remaining rows pop the node stack ---------------
        active = ~has_inst & (sp > 0)
        sp1 = jnp.where(active, sp - 1, sp)
        node = jnp.where(active, stack[pidx, jnp.maximum(sp1, 0)], 0)
        lo = ic_lower[node]
        up = ic_upper[node]
        t0 = (lo[:, None] - ro_p[:, :, None]) * inv_d[:, :, None]
        t1 = (up[:, None] - ro_p[:, :, None]) * inv_d[:, :, None]
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), tmin_p[:, :, None])
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), best_t[:, :, None])
        hit = (tn <= tf) & active[:, None, None]
        tn = jnp.where(hit, tn, BIG)
        packet_hit = jnp.any(hit, axis=1)
        child = ic_node[node]
        is_leaf = child < 0

        # queue this node's leaf instances (near child first: pushed last)
        isp2 = isp1
        for k in (1, 0):
            do_leaf = packet_hit[:, k] & is_leaf[:, k]
            start = jnp.where(do_leaf, ic_start[node, k], 0)
            cnt = jnp.where(do_leaf, ic_count[node, k], 0)
            for j in range(LEAF_MAX - 1, -1, -1):
                push = do_leaf & (j < cnt)
                pos = jnp.minimum(isp2, STACK_DEPTH - 1)
                istack = jnp.where(
                    (scol == pos[:, None]) & push[:, None],
                    (start + j)[:, None], istack,
                )
                isp2 = jnp.where(push, jnp.minimum(isp2 + 1, STACK_DEPTH), isp2)

        push = packet_hit & ~is_leaf
        tn_min = jnp.min(tn, axis=1)
        near_is_0 = tn_min[:, 0] <= tn_min[:, 1]
        first = jnp.where(near_is_0, 1, 0)
        second = 1 - first

        def push_child(stack, sp, which, do_push):
            ch = child[pidx, which]
            pos = jnp.minimum(sp, STACK_DEPTH - 1)
            stack = jnp.where(
                (scol == pos[:, None]) & do_push[:, None], ch[:, None], stack
            )
            return stack, jnp.where(do_push, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        stack, sp2 = push_child(stack, sp1, first, push[pidx, first] & active)
        stack, sp3 = push_child(stack, sp2, second, push[pidx, second] & active)
        return stack, sp3, istack, isp2, best_t, best_e

    def cond(state):
        _, sp, _, isp, _, _ = state
        return jnp.any((sp > 0) | (isp > 0))

    stack0 = jnp.zeros((P, STACK_DEPTH), jnp.int32)
    sp0 = jnp.ones((P,), jnp.int32)
    istack0 = jnp.zeros((P, STACK_DEPTH), jnp.int32)
    isp0 = jnp.zeros((P,), jnp.int32)
    _, _, _, _, best_t, best_e = jax.lax.while_loop(
        cond, body, (stack0, sp0, istack0, isp0, best_t, best_e)
    )
    return best_t, best_e


def _packet_anyhit_instanced(g, ro_p, rd_p, tmin_p, tmax_p, occluded, inv_d):
    """Two-level occlusion walk with the same single-inner-walk queue form
    (early exit once every relevant ray is occluded)."""
    import jax
    import jax.numpy as jnp

    P, K = ro_p.shape[:2]
    ic_lower, ic_upper = g["ic_lower"], g["ic_upper"]
    ic_node, ic_start, ic_count = g["ic_node"], g["ic_start"], g["ic_count"]
    sub = g["mesh"]
    pidx = jnp.arange(P)
    scol = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]
    relevant = tmax_p > tmin_p
    far_o = jnp.full((P, K, 3), 2.0 * BIG, jnp.float32)

    def leaf_instance(slot, do, occluded):
        slot = jnp.where(do, slot, 0)
        minv = g["inst_minv"][slot]
        ol, dl = _xform_rays(minv, ro_p, rd_p)
        ol = jnp.where(do[:, None, None], ol, far_o)
        dl = jnp.where(do[:, None, None], dl, 1.0)
        return _packet_anyhit_group(
            sub, ol, dl, tmin_p, tmax_p, occluded, _safe_inv(dl)
        )

    def body(state):
        stack, sp, istack, isp, occluded = state

        has_inst = isp > 0
        isp1 = jnp.where(has_inst, isp - 1, isp)
        slot = istack[pidx, jnp.maximum(isp1, 0)]
        occluded = jax.lax.cond(
            jnp.any(has_inst),
            lambda oc: leaf_instance(slot, has_inst, oc),
            lambda oc: oc,
            occluded,
        )

        active = ~has_inst & (sp > 0)
        sp1 = jnp.where(active, sp - 1, sp)
        node = jnp.where(active, stack[pidx, jnp.maximum(sp1, 0)], 0)
        lo = ic_lower[node]
        up = ic_upper[node]
        live = ~occluded & relevant
        t0 = (lo[:, None] - ro_p[:, :, None]) * inv_d[:, :, None]
        t1 = (up[:, None] - ro_p[:, :, None]) * inv_d[:, :, None]
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), tmin_p[:, :, None])
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), tmax_p[:, :, None])
        hit = (tn <= tf) & active[:, None, None] & live[:, :, None]
        packet_hit = jnp.any(hit, axis=1)
        child = ic_node[node]
        is_leaf = child < 0

        isp2 = isp1
        for k in (0, 1):
            do_leaf = packet_hit[:, k] & is_leaf[:, k]
            start = jnp.where(do_leaf, ic_start[node, k], 0)
            cnt = jnp.where(do_leaf, ic_count[node, k], 0)
            for j in range(LEAF_MAX):
                push = do_leaf & (j < cnt)
                pos = jnp.minimum(isp2, STACK_DEPTH - 1)
                istack = jnp.where(
                    (scol == pos[:, None]) & push[:, None],
                    (start + j)[:, None], istack,
                )
                isp2 = jnp.where(push, jnp.minimum(isp2 + 1, STACK_DEPTH), isp2)

        push = packet_hit & ~is_leaf

        def push_child(stack, sp, which, do_push):
            ch = child[pidx, which]
            pos = jnp.minimum(sp, STACK_DEPTH - 1)
            stack = jnp.where(
                (scol == pos[:, None]) & do_push[:, None], ch[:, None], stack
            )
            return stack, jnp.where(do_push, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        stack, sp2 = push_child(stack, sp1, 0, push[:, 0] & active)
        stack, sp3 = push_child(stack, sp2, 1, push[:, 1] & active)
        all_done = jnp.all(occluded | ~relevant, axis=1)
        sp3 = jnp.where(all_done, 0, sp3)
        isp2 = jnp.where(all_done, 0, isp2)
        return stack, sp3, istack, isp2, occluded

    def cond(state):
        _, sp, _, isp, _ = state
        return jnp.any((sp > 0) | (isp > 0))

    stack0 = jnp.zeros((P, STACK_DEPTH), jnp.int32)
    sp0 = jnp.ones((P,), jnp.int32)
    istack0 = jnp.zeros((P, STACK_DEPTH), jnp.int32)
    isp0 = jnp.zeros((P,), jnp.int32)
    _, _, _, _, occluded = jax.lax.while_loop(
        cond, body, (stack0, sp0, istack0, isp0, occluded)
    )
    return occluded


def ent_to_gidx(accel, ent):
    """Map (possibly virtual) entity ids to scene geometry ids."""
    import jax.numpy as jnp

    n_real = accel["ent_gidx"].shape[0]
    g = accel["ent_gidx"][jnp.clip(ent, 0, n_real - 1)]
    for ig in accel.get("inst_groups", ()):
        inst = jnp.clip((ent - ig["vbase"]) // ig["stride"], 0, ig["n_inst"] - 1)
        is_i = (ent >= ig["vbase"]) & (ent < ig["vbase"] + ig["n_inst"] * ig["stride"])
        g = jnp.where(is_i, ig["inst_gidx"][inst], g)
    return g


def instanced_surface_info(accel, ent, p, out_p, out_n, out_uv):
    """Overlay barycentric attrs for virtual (instanced) triangle hits:
    local-space triangle tables + the instance transform (normals map through
    the inverse-transpose)."""
    import jax.numpy as jnp

    for ig in accel.get("inst_groups", ()):
        is_i = (ent >= ig["vbase"]) & (
            ent < ig["vbase"] + ig["n_inst"] * ig["stride"]
        )
        rel = jnp.clip(ent - ig["vbase"], 0, ig["n_inst"] * ig["stride"] - 1)
        inst = rel // ig["stride"]
        tri = jnp.clip(rel % ig["stride"], 0, ig["n_tris"] - 1)
        m = ig["inst_m"][inst].reshape(-1, 3, 4)       # local->world
        mi = ig["inst_minv"][inst].reshape(-1, 3, 4)   # world->local
        rows = ig["mesh"]["rows"][tri]
        # world-space vertices
        v0 = jnp.einsum("pab,pb->pa", m[:, :, :3], rows[:, 0:3]) + m[:, :, 3]
        v1 = jnp.einsum("pab,pb->pa", m[:, :, :3], rows[:, 3:6]) + m[:, :, 3]
        v2 = jnp.einsum("pab,pb->pa", m[:, :, :3], rows[:, 6:9]) + m[:, :, 3]
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

        def to_world_n(nl):
            # normals transform by (M^-1)^T: n_w,a = sum_b mi[b,a] * nl[b]
            nw = jnp.einsum("pba,pb->pa", mi[:, :, :3], nl)
            return nw / jnp.maximum(
                jnp.linalg.norm(nw, axis=-1, keepdims=True), 1e-20
            )

        n = to_world_n(rows[:, 9:12])
        na = ig["tri_n"][tri]
        nl = (
            w[:, None] * na[:, 0:3] + u[:, None] * na[:, 3:6]
            + v[:, None] * na[:, 6:9]
        )
        ln = jnp.linalg.norm(nl, axis=-1, keepdims=True)
        smooth = ig["tri_has_n"][tri][:, None] & (ln > 1e-8)
        n = jnp.where(smooth, to_world_n(nl / jnp.maximum(ln, 1e-8)), n)
        uv = jnp.stack([u, v], -1)
        ta = ig["tri_t"][tri]
        uv_i = (
            w[:, None] * ta[:, 0:2] + u[:, None] * ta[:, 2:4]
            + v[:, None] * ta[:, 4:6]
        )
        uv = jnp.where(ig["tri_has_t"][tri][:, None], uv_i, uv)
        mk = is_i[:, None]
        out_n = jnp.where(mk, n, out_n)
        out_uv = jnp.where(mk, uv, out_uv)
    return out_p, out_n, out_uv


def _use_pallas():
    """Pallas kernels only on real TPU backends (tests run on CPU where the
    XLA packet walk is the reference implementation)."""
    import os

    flag = os.environ.get("PINE_TPU_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    import jax

    return jax.default_backend() not in ("cpu",)


def packet_intersect(accel, ro, rd, tmin, tmax, K=DEFAULT_K):
    """Closest hit over all groups -> (t, ent) flat (N,); t=BIG on miss."""
    import jax.numpy as jnp

    if _use_pallas():
        from pine_tpu.accel import pallas_traverse as PT

        regular = [g for g in accel["groups"] if g["kind"] != "instanced"]
        inst = [g for g in accel["groups"] if g["kind"] == "instanced"]
        if all(PT.group_supports_pallas(g) for g in regular):
            best_t = jnp.asarray(tmax, jnp.float32)
            best_e = jnp.full(ro.shape[:1], -1, jnp.int32)
            limit = best_t
            for g in regular:
                t_new, e_loc = PT.pallas_group_query(
                    g, ro, rd, tmin, best_t, best_t, best_e, any_hit=False
                )
                changed = t_new < best_t
                best_e = jnp.where(changed, g["base"] + e_loc, best_e)
                best_t = t_new
            if inst:
                from pine_tpu.accel import instanced_pallas as IP

                fast = [g for g in inst if IP.supports(g)]
                slow = [g for g in inst if not IP.supports(g)]
                tmin_f = jnp.broadcast_to(
                    jnp.ravel(tmin) if jnp.ndim(tmin) else tmin, ro.shape[:1]
                ).astype(jnp.float32)
                for g in fast:
                    best_t, best_e = IP.instanced_pallas_intersect(
                        g, ro, rd, tmin_f, best_t, best_e
                    )
                inst = slow
            if inst:
                # oversized instanced groups run the two-level XLA packet walk
                ro2, rd2, tmin2, bt2, n0 = _pad_rays(ro, rd, tmin, best_t, K)
                be2 = jnp.concatenate(
                    [best_e, jnp.full((ro2.shape[0] - n0,), -1, jnp.int32)]
                ) if ro2.shape[0] != n0 else best_e
                P = ro2.shape[0] // K
                ro_p = ro2.reshape(P, K, 3)
                rd_p = rd2.reshape(P, K, 3)
                tmin_p = tmin2.reshape(P, K)
                bt_p = bt2.reshape(P, K)
                be_p = be2.reshape(P, K)
                inv_d = _safe_inv(rd_p)
                for g in inst:
                    bt_p, be_p = _packet_traverse_instanced(
                        g, ro_p, rd_p, tmin_p, bt_p, be_p, inv_d
                    )
                best_t = bt_p.reshape(-1)[:n0]
                best_e = be_p.reshape(-1)[:n0]
            t_out = jnp.where(best_t < limit, best_t, BIG)
            return t_out, jnp.maximum(best_e, 0)

    ro, rd, tmin, tmax, n = _pad_rays(ro, rd, tmin, tmax, K)
    P = ro.shape[0] // K
    ro_p = ro.reshape(P, K, 3)
    rd_p = rd.reshape(P, K, 3)
    tmin_p = tmin.reshape(P, K)
    best_t = tmax.reshape(P, K)
    limit_t = best_t
    best_e = jnp.full((P, K), -1, jnp.int32)
    inv_d = _safe_inv(rd_p)

    for g in accel["groups"]:
        if g["kind"] == "dense":
            t = _group_dense_t(g, ro_p, rd_p, tmin_p, best_t)  # (P,K,E)
            tb = jnp.min(t, axis=-1)
            arg = jnp.argmin(t, axis=-1).astype(jnp.int32)
            better = tb < best_t
            best_t = jnp.where(better, tb, best_t)
            best_e = jnp.where(better, g["base"] + arg, best_e)
        elif g["kind"] == "instanced":
            best_t, best_e = _packet_traverse_instanced(
                g, ro_p, rd_p, tmin_p, best_t, best_e, inv_d
            )
        else:
            best_t, best_e = _packet_traverse_group(
                g, ro_p, rd_p, tmin_p, best_t, best_e, inv_d
            )

    t_out = jnp.where(best_t < limit_t, best_t, BIG)
    return t_out.reshape(-1)[:n], jnp.maximum(best_e, 0).reshape(-1)[:n]


def _packet_anyhit_group(g, ro_p, rd_p, tmin_p, tmax_p, occluded, inv_d):
    """Early-exit occlusion walk of one per-type BVH -> occluded (P,K)."""
    import jax
    import jax.numpy as jnp
    from pine_tpu.scene import intersect as I

    P, K = ro_p.shape[:2]
    kern = I.INTERSECT[g["tid"]]
    c_lower, c_upper = g["c_lower"], g["c_upper"]
    c_node, c_start, c_count = g["c_node"], g["c_start"], g["c_count"]
    rows = g["rows"]
    pidx = jnp.arange(P)
    offs = jnp.arange(LEAF_MAX, dtype=jnp.int32)
    scol = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]
    relevant = tmax_p > tmin_p  # rays that actually query occlusion

    def cond(state):
        _, sp, _ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, occluded = state
        active = sp > 0
        sp1 = jnp.where(active, sp - 1, sp)
        node = jnp.where(active, stack[pidx, jnp.maximum(sp1, 0)], 0)

        lo = c_lower[node]
        up = c_upper[node]
        live = ~occluded & relevant
        t0 = (lo[:, None] - ro_p[:, :, None]) * inv_d[:, :, None]
        t1 = (up[:, None] - ro_p[:, :, None]) * inv_d[:, :, None]
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), tmin_p[:, :, None])
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), tmax_p[:, :, None])
        hit = (tn <= tf) & active[:, None, None] & live[:, :, None]
        packet_hit = jnp.any(hit, axis=1)
        child = c_node[node]
        is_leaf = child < 0

        for k in (0, 1):
            do_leaf = packet_hit[:, k] & is_leaf[:, k]
            start = jnp.where(do_leaf, c_start[node, k], 0)
            cnt = jnp.where(do_leaf, c_count[node, k], 0)
            idx = start[:, None] + offs[None, :]
            leaf_rows = rows[idx]
            tt = kern(leaf_rows, ro_p, rd_p, tmin_p[..., None], tmax_p[..., None])
            valid = offs[None, None, :] < cnt[:, None, None]
            occluded = occluded | jnp.any(
                jnp.where(valid, tt, BIG) < BIG, axis=-1
            )

        push = packet_hit & ~is_leaf

        def push_child(stack, sp, which, do_push):
            ch = child[pidx, which]
            pos = jnp.minimum(sp, STACK_DEPTH - 1)
            stack = jnp.where(
                (scol == pos[:, None]) & do_push[:, None], ch[:, None], stack
            )
            return stack, jnp.where(do_push, jnp.minimum(sp + 1, STACK_DEPTH), sp)

        stack, sp2 = push_child(stack, sp1, 0, push[:, 0] & active)
        stack, sp3 = push_child(stack, sp2, 1, push[:, 1] & active)
        # packet done once every relevant ray is occluded
        all_done = jnp.all(occluded | ~relevant, axis=1)
        sp3 = jnp.where(all_done, 0, sp3)
        return stack, sp3, occluded

    stack0 = jnp.zeros((P, STACK_DEPTH), jnp.int32)
    sp0 = jnp.ones((P,), jnp.int32)
    _, _, occluded = jax.lax.while_loop(cond, body, (stack0, sp0, occluded))
    return occluded


def packet_any_hit(accel, ro, rd, tmin, tmax, K=DEFAULT_K):
    """Occlusion query -> (N,) bool; early-exits per packet (VERDICT r1:
    shadow rays must not pay the closest-hit price)."""
    import jax.numpy as jnp

    if _use_pallas():
        from pine_tpu.accel import pallas_traverse as PT

        regular = [g for g in accel["groups"] if g["kind"] != "instanced"]
        inst = [g for g in accel["groups"] if g["kind"] == "instanced"]
        if all(PT.group_supports_pallas(g) for g in regular):
            occ = jnp.zeros(ro.shape[:1], jnp.int32)
            tmax_f = jnp.asarray(tmax, jnp.float32)
            for g in regular:
                _, occ = PT.pallas_group_query(
                    g, ro, rd, tmin, tmax_f, tmax_f, occ, any_hit=True
                )
            if inst:
                from pine_tpu.accel import instanced_pallas as IP

                fast = [g for g in inst if IP.supports(g)]
                slow = [g for g in inst if not IP.supports(g)]
                tmin_f = jnp.broadcast_to(
                    jnp.ravel(tmin) if jnp.ndim(tmin) else tmin, ro.shape[:1]
                ).astype(jnp.float32)
                tmax_b = jnp.broadcast_to(tmax_f, ro.shape[:1]).astype(jnp.float32)
                for g in fast:
                    occ = IP.instanced_pallas_any_hit(
                        g, ro, rd, tmin_f, tmax_b, occ
                    )
                inst = slow
            occ = occ != 0
            if inst:
                ro2, rd2, tmin2, tmax2, n0 = _pad_rays(ro, rd, tmin, tmax_f, K)
                occ2 = jnp.concatenate(
                    [occ, jnp.zeros((ro2.shape[0] - n0,), bool)]
                ) if ro2.shape[0] != n0 else occ
                P = ro2.shape[0] // K
                ro_p = ro2.reshape(P, K, 3)
                rd_p = rd2.reshape(P, K, 3)
                tmin_p = tmin2.reshape(P, K)
                tmax_p = tmax2.reshape(P, K)
                occ_p = occ2.reshape(P, K)
                inv_d = _safe_inv(rd_p)
                for g in inst:
                    occ_p = _packet_anyhit_instanced(
                        g, ro_p, rd_p, tmin_p, tmax_p, occ_p, inv_d
                    )
                occ = occ_p.reshape(-1)[:n0]
            return occ

    ro, rd, tmin, tmax, n = _pad_rays(ro, rd, tmin, tmax, K)
    P = ro.shape[0] // K
    ro_p = ro.reshape(P, K, 3)
    rd_p = rd.reshape(P, K, 3)
    tmin_p = tmin.reshape(P, K)
    tmax_p = tmax.reshape(P, K)
    occluded = jnp.zeros((P, K), bool)
    inv_d = _safe_inv(rd_p)

    for g in accel["groups"]:
        if g["kind"] == "dense":
            t = _group_dense_t(g, ro_p, rd_p, tmin_p, tmax_p)
            occluded = occluded | jnp.any(t < BIG, axis=-1)
        elif g["kind"] == "instanced":
            occluded = _packet_anyhit_instanced(
                g, ro_p, rd_p, tmin_p, tmax_p, occluded, inv_d
            )
        else:
            occluded = _packet_anyhit_group(
                g, ro_p, rd_p, tmin_p, tmax_p, occluded, inv_d
            )
    return occluded.reshape(-1)[:n]
