"""Two-level instanced traversal as ONE Pallas kernel.

Replaces the dense (N, I) instance-enumeration rounds
(accel/instanced_pallas.py) whose memory is O(rays x instances) and whose
late rounds sweep the whole mesh kernel for a few live lanes.  This kernel
is the TPU shape of the reference's Embree instance geometry
(impl/accel/embree.cpp RTC_GEOMETRY_TYPE_INSTANCE + core/geometry.h:371-390):

One shared scalar stack per (8,128) ray block holds TAGGED entries
(id*4 + kind):

- kind 0, top node: SAH tree over instance world AABBs (SMEM).  Inner
  children push near-first; leaf children slab-test each instance's world
  AABB against the block and push survivors as kind-1 entries.
- kind 1, instance: broadcast the instance's 3x4 inverse transform from
  SMEM, write the block's local-frame rays into VMEM scratch (directions
  stay unnormalized so local t == world t), then push the mesh root.
- kind 2, mesh node: the supercell SAH descent of _make_sctree_kernel over
  the SHARED local-space mesh (HBM prim table, per-supercell DMA, 32-prim
  cell culling) using the scratch local rays, best-t pruned by the global
  best_t so instances explored after a hit are cheap.

LIFO order guarantees a mesh subtree finishes before the next instance
entry pops, so the scratch local-ray context is always consistent.  Entity
ids are the virtual  vbase + instance*stride + tri  scheme shared with the
XLA walk (accel/packet.py:_packet_traverse_instanced), so scene-side
decoding is untouched.
"""
from __future__ import annotations

import functools

import numpy as np

from pine_tpu.accel.pallas_traverse import (
    BIG,
    CELL32,
    K_LANE,
    K_SUB,
    SUPER,
    TREE_LEAF,
    _safe_inv,
    _sc_tree_layout,
    _test_triangle,
)

STACK_DEPTH = 192  # top tree + pending instances + mesh subtree; the push
# is bounded (overflow would silently drop subtrees), so kernel_supports
# refuses any scene whose exact worst case (_stack_need) exceeds this

# SMEM budget cap: ~100 B/instance (12 minv + 6 aabb + ~9 tree floats);
# 16384 instances ~ 1.6 MB, on par with the 2M-prim sctree assumption
INST_KERNEL_MAX = 16384


def _make_inst_kernel(n_prims, stride, vbase, any_hit, hbm, mxu_m=0):
    """hbm=True: prim table stays in HBM, taken supercells DMA into scratch.
    hbm=False (mesh fits VMEM, like the dense path's grid kernel): the whole
    table rides VMEM and tiles load directly — no per-supercell DMA latency,
    the dominant cost on small instanced meshes (~143 supercell visits per
    ray block on the 1024-rock field).

    mxu_m>0 (PINE_INST_KERNEL=mxu): the `rows` input is the shared mesh's
    supercell-major MXU coefficient table (mxu_sweep.build_mesh_tables);
    each taken supercell is tested per live sublane row with one
    (m*128, 8)^T x (8, 128) matmul over the instance's LOCAL rays — the
    local-ray feature matrices are rebuilt on every instance entry."""
    import os

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    probe = os.environ.get("PINE_INST_PROBE", "")  # perf triage only

    tiles_per_cell = CELL32 // 8
    cells_per_super = SUPER // CELL32
    if mxu_m:
        from pine_tpu.accel import mxu_sweep
        from pine_tpu.scene import shapes as _S

    def kernel(tboxes, tcnode, tcstart, tccount, iboxes, minv,
               mboxes, mcnode, mcstart, mccount, msc_order, mcell_boxes,
               msc_boxes, rows,
               ox, oy, oz, dx, dy, dz, tmn, tmx, bt_in, be_in,
               bt_out, be_out,
               bt_s, be_s, lox, loy, loz, ldx, ldy, ldz,
               livx, livy, livz, imask, *extra):
        if probe == "count":
            # WRONG RESULTS: pop / instance-entry / supercell-body /
            # cell-sweep counters, written over be_out rows 0-3 of each
            # block (scripts_inst_count.py)
            extra, cnt = extra[:-1], extra[-1]
            cnt[0] = 0
            cnt[1] = 0
            cnt[2] = 0
            cnt[3] = 0
        if mxu_m and hbm:
            row_buf, dma_sem, f_buf, stack, spq, cur = extra
        elif mxu_m:
            f_buf, stack, spq, cur = extra
            row_buf = rows
        elif hbm:
            row_buf, dma_sem, stack, spq, cur = extra
        else:
            stack, spq, cur = extra
            row_buf = rows
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        wivx = _safe_inv(dx[:])
        wivy = _safe_inv(dy[:])
        wivz = _safe_inv(dz[:])
        bt_s[:] = tmx[:] if any_hit else bt_in[:]
        be_s[:] = be_in[:]
        stack[0] = 0  # top root: 0*4 + kind 0

        def slab_mask(bx, base, o3, iv3):
            """Scalar SMEM box vs the whole (8,128) block: per-lane hit mask
            (near <= far with far clipped to the running best_t)."""
            lx, ly, lz = bx[base], bx[base + 1], bx[base + 2]
            ux, uy, uz = bx[base + 3], bx[base + 4], bx[base + 5]
            t0x, t1x = (lx - o3[0]) * iv3[0], (ux - o3[0]) * iv3[0]
            t0y, t1y = (ly - o3[1]) * iv3[1], (uy - o3[1]) * iv3[1]
            t0z, t1z = (lz - o3[2]) * iv3[2], (uz - o3[2]) * iv3[2]
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmn[:]),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt_s[:]),
            )
            return near <= far, near

        def slab(bx, base, o3, iv3, near_out=False):
            hit, near = slab_mask(bx, base, o3, iv3)
            if near_out:
                return jnp.any(hit), jnp.min(jnp.where(hit, near, BIG))
            return jnp.any(hit)

        def world_rays():
            return (ox[:], oy[:], oz[:]), (wivx, wivy, wivz)

        def local_rays():
            return (lox[:], loy[:], loz[:]), (livx[:], livy[:], livz[:])

        def do_super(si):
            """One mesh supercell: DMA prims, cull cells, test tiles —
            against the CURRENT instance's local rays.  A tree leaf holds
            up to TREE_LEAF supercells but per-instance blocks usually
            overlap only one or two: the supercell slab gate skips the DMA
            and all cell work for the others (measured ~2.5x fewer
            supercell bodies on the 1024-rock field)."""
            o3, iv3 = local_rays()
            if probe == "nosuper":
                slab(msc_boxes, si * 6, o3, iv3)
                return

            @pl.when(slab(msc_boxes, si * 6, o3, iv3))
            def _():
                _do_super_body(si, o3, iv3)

        def _do_super_body(si, o3, iv3):
            if probe == "count":
                cnt[2] = cnt[2] + 1
            if mxu_m:
                _do_super_body_mxu(si)
                return
            if hbm:
                cp = pltpu.make_async_copy(
                    rows.at[pl.ds(si * SUPER, SUPER), :], row_buf, dma_sem
                )
                cp.start()
            # per-lane cell masks, restricted to lanes that cut the CURRENT
            # instance's world AABB (imask, set at the kind-1 entry).  The
            # tightened BLOCK-level gate is the only use: per-row pl.when
            # gating was measured 4.4x SLOWER (d1 57->252 ms/call) — scalar
            # branches around (1,128) row ops swamp the saved sweeps.
            live0 = imask[:] > 0.0
            if any_hit:
                live0 = live0 & (be_s[:] == 0)
            cell_hits = []
            for k in range(cells_per_super):
                cm, _ = slab_mask(
                    mcell_boxes, (si * cells_per_super + k) * 6, o3, iv3
                )
                cell_hits.append(
                    jnp.any(cm & live0)
                    & (si * SUPER + k * CELL32 < n_prims)
                )
            if hbm:
                cp.wait()
            ent_base = vbase + cur[0] * stride

            def row_sweep(k, s):
                o = (lox[s:s + 1, :], loy[s:s + 1, :], loz[s:s + 1, :])
                d = (ldx[s:s + 1, :], ldy[s:s + 1, :], ldz[s:s + 1, :])
                tmin = tmn[s:s + 1, :]
                for tile in range(tiles_per_cell):
                    p0 = si * SUPER + k * CELL32 + tile * 8
                    buf_p0 = (k * CELL32 + tile * 8) if hbm else p0

                    def fetch(c, buf_p0=buf_p0):
                        return row_buf[pl.ds(buf_p0, 8), c:c + 1]

                    row_bt = bt_s[s:s + 1, :]
                    limit = tmx[s:s + 1, :] if any_hit else row_bt
                    tt = _test_triangle(fetch, o, d, tmin, limit)
                    pid = p0 + sub_iota
                    tt = jnp.where(pid < n_prims, tt, BIG)
                    if any_hit:
                        be_s[s:s + 1, :] = jnp.maximum(
                            be_s[s:s + 1, :],
                            jnp.max((tt < BIG).astype(jnp.int32),
                                    axis=0, keepdims=True),
                        )
                    else:
                        tb = jnp.min(tt, axis=0, keepdims=True)
                        eb = jnp.min(
                            jnp.where(tt == tb, ent_base + pid,
                                      jnp.int32(2 ** 30)),
                            axis=0, keepdims=True,
                        )
                        better = tb < row_bt
                        bt_s[s:s + 1, :] = jnp.where(better, tb, row_bt)
                        be_s[s:s + 1, :] = jnp.where(
                            better, eb, be_s[s:s + 1, :]
                        )

            for k in range(cells_per_super):
                @pl.when(cell_hits[k])
                def _(k=k):
                    if probe == "count":
                        cnt[3] = cnt[3] + 1
                    for s in range(K_SUB):
                        row_sweep(k, s)

        def _do_super_body_mxu(si):
            """Matmul leaf tests over the instance's local rays (f_buf)."""
            if hbm:
                cp = pltpu.make_async_copy(
                    rows.at[pl.ds(si * 8, 8), :], row_buf, dma_sem
                )
                cp.start()
                cp.wait()
                strip = row_buf[:, :]
            else:
                strip = row_buf[pl.ds(si * 8, 8), :]  # (8, m*SUPER)
            pid = si * SUPER + jax.lax.broadcasted_iota(
                jnp.int32, (SUPER, K_LANE), 0
            )
            pid_ok = pid < n_prims
            ent_base = vbase + cur[0] * stride
            for s in range(K_SUB):
                @pl.when(jnp.any(
                    ((tmx[s:s + 1, :] if any_hit else bt_s[s:s + 1, :])
                     > tmn[s:s + 1, :]) & (imask[s:s + 1, :] > 0.0)
                ))
                def _(s=s):
                    Fs = f_buf[s * 8: (s + 1) * 8, :]  # (8, 128) local rays
                    from pine_tpu.accel.mxu_sweep import mxu_precision

                    P = jax.lax.dot_general(
                        strip, Fs, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=mxu_precision(),
                    )
                    o = (lox[s:s + 1, :], loy[s:s + 1, :], loz[s:s + 1, :])
                    d = (ldx[s:s + 1, :], ldy[s:s + 1, :], ldz[s:s + 1, :])
                    odr = o[0] * d[0] + o[1] * d[1] + o[2] * d[2]
                    oor = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]
                    ddr = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                    row_bt = bt_s[s:s + 1, :]
                    limit = tmx[s:s + 1, :] if any_hit else row_bt

                    def val(v):
                        return P[v * SUPER:(v + 1) * SUPER, :]

                    tt = mxu_sweep._pair_t_vals(
                        _S.TRIANGLE, val, odr, oor, ddr, tmn[s:s + 1, :],
                        limit,
                    )
                    tt = jnp.where(pid_ok, tt, BIG)
                    if any_hit:
                        be_s[s:s + 1, :] = jnp.maximum(
                            be_s[s:s + 1, :],
                            jnp.max((tt < BIG).astype(jnp.int32),
                                    axis=0, keepdims=True),
                        )
                    else:
                        tb = jnp.min(tt, axis=0, keepdims=True)
                        eb = jnp.min(
                            jnp.where(tt == tb, ent_base + pid,
                                      jnp.int32(2 ** 30)),
                            axis=0, keepdims=True,
                        )
                        better = tb < row_bt
                        bt_s[s:s + 1, :] = jnp.where(better, tb, row_bt)
                        be_s[s:s + 1, :] = jnp.where(
                            better, eb, be_s[s:s + 1, :]
                        )

        def push(sp2, pred, entry):
            """Predicated bounded push; parked writes go to the sentinel
            slot STACK_DEPTH-1 (never popped: sp is clamped to DEPTH-2)."""
            at = jnp.where(pred, jnp.minimum(sp2, STACK_DEPTH - 2),
                           STACK_DEPTH - 1)
            stack[at] = entry
            return sp2 + pred.astype(jnp.int32)

        def body(sp):
            sp1 = sp - 1
            ent = stack[sp1]
            kind = ent & 3
            eid = ent >> 2
            spq[0] = sp1
            if probe == "count":
                cnt[0] = cnt[0] + 1

            @pl.when(kind == 0)
            def _():
                # top-tree node over instance world AABBs (world rays)
                o3, iv3 = world_rays()
                c0 = tcnode[eid * 2]
                c1 = tcnode[eid * 2 + 1]
                any0, tn0 = slab(tboxes, eid * 12, o3, iv3, near_out=True)
                any1, tn1 = slab(tboxes, eid * 12 + 6, o3, iv3, near_out=True)
                sp2 = sp1
                # inner children first (deepest in stack), far before near
                push0 = any0 & (c0 >= 0)
                push1 = any1 & (c1 >= 0)
                near0 = tn0 <= tn1
                first_c = jnp.where(near0, c1, c0)
                first_p = jnp.where(near0, push1, push0)
                second_c = jnp.where(near0, c0, c1)
                second_p = jnp.where(near0, push0, push1)
                sp2 = push(sp2, first_p, first_c << 2)
                sp2 = push(sp2, second_p, second_c << 2)
                # leaf children: per-instance world-AABB cull, push survivors
                # LAST so instances pop before other subtrees descend
                for k, anyk in ((0, any0), (1, any1)):
                    is_leaf = anyk & (tcnode[eid * 2 + k] < 0)
                    start = tcstart[eid * 2 + k]
                    cnt = tccount[eid * 2 + k]
                    for j in range(TREE_LEAF):
                        idx = start + j
                        ih = slab(iboxes, idx * 6, o3, iv3)
                        h = is_leaf & (j < cnt) & ih
                        sp2 = push(sp2, h, (idx << 2) | 1)
                spq[0] = jnp.minimum(sp2, STACK_DEPTH - 2)

            @pl.when(kind == 1)
            def _():
                # instance entry: write local-frame rays, push mesh root
                j = eid
                if probe in ("fakehit", "xform"):
                    # cost-decomposition probes: pretend every lane that cuts
                    # the instance AABB hits at the box entry (an upper bound
                    # on real pruning), skip the mesh subtree entirely.
                    # fakehit = top walk + leaf culls; xform adds the 9
                    # local-frame transform writes.
                    o3, iv3 = world_rays()
                    base = j * 6
                    lx, ly, lz = iboxes[base], iboxes[base + 1], iboxes[base + 2]
                    ux, uy, uz = iboxes[base + 3], iboxes[base + 4], iboxes[base + 5]
                    t0x, t1x = (lx - o3[0]) * iv3[0], (ux - o3[0]) * iv3[0]
                    t0y, t1y = (ly - o3[1]) * iv3[1], (uy - o3[1]) * iv3[1]
                    t0z, t1z = (lz - o3[2]) * iv3[2], (uz - o3[2]) * iv3[2]
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), tmn[:]),
                    )
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), bt_s[:]),
                    )
                    better = (near <= far) & (near < bt_s[:])
                    bt_s[:] = jnp.where(better, near, bt_s[:])
                    if probe == "xform":
                        def mv(c):
                            return minv[j * 12 + c]

                        lox[:] = mv(0) * ox[:] + mv(1) * oy[:] + mv(2) * oz[:] + mv(3)
                        loy[:] = mv(4) * ox[:] + mv(5) * oy[:] + mv(6) * oz[:] + mv(7)
                        loz[:] = mv(8) * ox[:] + mv(9) * oy[:] + mv(10) * oz[:] + mv(11)
                        ldx[:] = mv(0) * dx[:] + mv(1) * dy[:] + mv(2) * dz[:]
                        ldy[:] = mv(4) * dx[:] + mv(5) * dy[:] + mv(6) * dz[:]
                        ldz[:] = mv(8) * dx[:] + mv(9) * dy[:] + mv(10) * dz[:]
                        livx[:] = _safe_inv(ldx[:])
                        livy[:] = _safe_inv(ldy[:])
                        livz[:] = _safe_inv(ldz[:])
                    return

                # pop-time re-cull against the CURRENT best_t: instances were
                # AABB-culled at push time, but near-first LIFO means best_t
                # has tightened since — a stale instance dies here for one
                # slab instead of a transform + mesh-subtree descent.  The
                # surviving per-lane mask persists in imask: downstream cell
                # sweeps skip sublane rows none of whose lanes can reach this
                # instance (the dominant d1 cost — measured).
                o3w, iv3w = world_rays()
                im, _ = slab_mask(iboxes, j * 6, o3w, iv3w)
                if any_hit:
                    im = im & (be_s[:] == 0)

                @pl.when(jnp.any(im))
                def _():
                    if probe == "count":
                        cnt[1] = cnt[1] + 1
                    imask[:] = im.astype(jnp.float32)

                    def mv(c):
                        return minv[j * 12 + c]

                    lox[:] = mv(0) * ox[:] + mv(1) * oy[:] + mv(2) * oz[:] + mv(3)
                    loy[:] = mv(4) * ox[:] + mv(5) * oy[:] + mv(6) * oz[:] + mv(7)
                    loz[:] = mv(8) * ox[:] + mv(9) * oy[:] + mv(10) * oz[:] + mv(11)
                    ldx[:] = mv(0) * dx[:] + mv(1) * dy[:] + mv(2) * dz[:]
                    ldy[:] = mv(4) * dx[:] + mv(5) * dy[:] + mv(6) * dz[:]
                    ldz[:] = mv(8) * dx[:] + mv(9) * dy[:] + mv(10) * dz[:]
                    livx[:] = _safe_inv(ldx[:])
                    livy[:] = _safe_inv(ldy[:])
                    livz[:] = _safe_inv(ldz[:])
                    if mxu_m:
                        # per-row matmul feature matrices from the LOCAL rays;
                        # rebuilt on every instance entry (the mesh subtree
                        # pops before the next instance, so f_buf stays
                        # consistent)
                        for s in range(K_SUB):
                            for fi, ref in enumerate(
                                (ldx, ldy, ldz, lox, loy, loz)
                            ):
                                f_buf[s * 8 + fi: s * 8 + fi + 1, :] = (
                                    ref[s: s + 1, :]
                                )
                            f_buf[s * 8 + 6: s * 8 + 7, :] = jnp.ones(
                                (1, K_LANE), jnp.float32
                            )
                            f_buf[s * 8 + 7: s * 8 + 8, :] = jnp.zeros(
                                (1, K_LANE), jnp.float32
                            )
                    cur[0] = j
                    stack[sp1] = 2  # mesh root: node 0, kind 2
                    spq[0] = sp1 + 1

            @pl.when(kind == 2)
            def _():
                if probe == "nomesh":
                    return
                # mesh supercell-tree node (local rays)
                o3, iv3 = local_rays()
                c0 = mcnode[eid * 2]
                c1 = mcnode[eid * 2 + 1]
                any0, tn0 = slab(mboxes, eid * 12, o3, iv3, near_out=True)
                any1, tn1 = slab(mboxes, eid * 12 + 6, o3, iv3, near_out=True)

                @pl.when(any0 & (c0 < 0))
                def _():
                    start = mcstart[eid * 2]
                    cnt = mccount[eid * 2]
                    for j in range(TREE_LEAF):
                        @pl.when(j < cnt)
                        def _(j=j):
                            do_super(msc_order[start + j])

                @pl.when(any1 & (c1 < 0))
                def _():
                    start = mcstart[eid * 2 + 1]
                    cnt = mccount[eid * 2 + 1]
                    for j in range(TREE_LEAF):
                        @pl.when(j < cnt)
                        def _(j=j):
                            do_super(msc_order[start + j])

                push0 = any0 & (c0 >= 0)
                push1 = any1 & (c1 >= 0)
                near0 = tn0 <= tn1
                first_c = jnp.where(near0, c1, c0)
                first_p = jnp.where(near0, push1, push0)
                second_c = jnp.where(near0, c0, c1)
                second_p = jnp.where(near0, push0, push1)
                sp2 = sp1
                sp2 = push(sp2, first_p, (first_c << 2) | 2)
                sp2 = push(sp2, second_p, (second_c << 2) | 2)
                spq[0] = jnp.minimum(sp2, STACK_DEPTH - 2)

            sp_new = spq[0]
            if any_hit:
                done = (be_s[:] != 0) | (tmx[:] <= tmn[:])
                sp_new = jnp.where(jnp.all(done), 0, sp_new)
            return sp_new

        jax.lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))
        if any_hit:
            bt_out[:] = bt_in[:]
        else:
            bt_out[:] = bt_s[:]
        be_out[:] = be_s[:]
        if probe == "count":
            for ci in range(4):
                be_out[ci:ci + 1, :] = jnp.full((1, K_LANE), cnt[ci], jnp.int32)

    return kernel


@functools.lru_cache(maxsize=64)
def _compiled_inst_call(n_prims, e_pad, stride, vbase, any_hit, n_rows,
                        mxu_m=0, probe=""):
    # `probe` (PINE_INST_PROBE) is baked into the kernel by _make_inst_kernel;
    # it must key this cache or probe A/Bs re-time the first-compiled variant
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pine_tpu.accel.pallas_traverse import GRID_MAX_PRIMS

    hbm = e_pad > GRID_MAX_PRIMS
    grid = (n_rows // K_SUB,)
    ray_spec = pl.BlockSpec(
        (K_SUB, K_LANE), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    if hbm:
        table_spec = pl.BlockSpec(memory_space=pl.ANY)
    elif mxu_m:
        # whole supercell-major W table rides VMEM
        table_spec = pl.BlockSpec(
            (e_pad // SUPER * 8, mxu_m * SUPER), lambda i, *_: (0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        table_spec = pl.BlockSpec(
            (e_pad, K_LANE), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        )
    kernel = _make_inst_kernel(n_prims, stride, vbase, any_hit, hbm,
                               mxu_m=mxu_m)
    vec32 = pltpu.VMEM((K_SUB, K_LANE), jnp.float32)
    scratch = [
        vec32,                                    # bt_s
        pltpu.VMEM((K_SUB, K_LANE), jnp.int32),   # be_s
        vec32, vec32, vec32,                      # lox loy loz
        vec32, vec32, vec32,                      # ldx ldy ldz
        vec32, vec32, vec32,                      # livx livy livz
        vec32,                                    # imask (per-lane instance cut)
    ]
    if hbm:
        scratch += (
            [
                pltpu.VMEM((8, mxu_m * SUPER), jnp.float32),  # W strip
                pltpu.SemaphoreType.DMA(()),
            ]
            if mxu_m
            else [
                pltpu.VMEM((SUPER, K_LANE), jnp.float32),  # row_buf
                pltpu.SemaphoreType.DMA(()),
            ]
        )
    if mxu_m:
        scratch += [pltpu.VMEM((K_SUB * 8, K_LANE), jnp.float32)]  # f_buf
    scratch += [
        pltpu.SMEM((STACK_DEPTH,), jnp.int32),    # stack
        pltpu.SMEM((1,), jnp.int32),              # spq
        pltpu.SMEM((1,), jnp.int32),              # cur instance
    ]
    if probe == "count":
        scratch += [pltpu.SMEM((4,), jnp.int32)]  # pop/entry/body/cell counters
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=13,
        grid=grid,
        in_specs=[table_spec] + [ray_spec] * 10,
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, K_LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, K_LANE), jnp.int32),
        ),
        interpret=jax.default_backend() == "cpu",
    )


def inst_layout(g):
    """Flattened SMEM tables for the two-level kernel.  Host-side numpy at
    accel-build time (outside any trace — capture.py discipline)."""
    import jax.numpy as jnp

    if "_ik" in g:
        return g["_ik"]
    from pine_tpu.accel.pallas_traverse import _grid_layout

    tl = _sc_tree_layout(g["mesh"])
    sc_boxes = _grid_layout(g["mesh"])["sc_boxes"]
    npz = g["inst_np"]
    tb = np.concatenate(
        [np.asarray(npz["ic_lower"], np.float32),
         np.asarray(npz["ic_upper"], np.float32)], axis=-1
    )  # (M, 2, 6)
    # instance boxes padded with never-hit filler (leaf loop reads start+j
    # before gating on count)
    ib = np.asarray(npz["iboxes"], np.float32)
    pad = np.tile(np.array([[1, 1, 1, -1, -1, -1]], np.float32), (TREE_LEAF, 1))
    ib = np.concatenate([ib, pad])
    mv = np.asarray(npz["minv"], np.float32)
    mv = np.concatenate([mv, np.zeros((TREE_LEAF, 12), np.float32)])
    g["_ik"] = dict(
        tboxes=jnp.asarray(tb.reshape(-1)),
        tcnode=jnp.asarray(np.asarray(npz["ic_node"], np.int32).reshape(-1)),
        tcstart=jnp.asarray(np.asarray(npz["ic_start"], np.int32).reshape(-1)),
        tccount=jnp.asarray(np.asarray(npz["ic_count"], np.int32).reshape(-1)),
        iboxes=jnp.asarray(ib.reshape(-1)),
        minv=jnp.asarray(mv.reshape(-1)),
        mboxes=tl["boxes"], mcnode=tl["cnode"], mcstart=tl["cstart"],
        mccount=tl["ccount"], msc_order=tl["sc_order"],
        mcell_boxes=tl["cell_boxes"], msc_boxes=sc_boxes,
        table=tl["table"], n_prims=tl["n_prims"],
        e_pad=_grid_layout(g["mesh"])["e_pad"],
    )
    return g["_ik"]


def _stack_need(g):
    """Exact worst-case stack occupancy for this scene's trees.

    A top-tree descent of depth d_top parks at most one deferred sibling
    plus 2*TREE_LEAF culled instance entries per level; the instance pop
    adds a mesh-subtree descent (one deferred sibling per mesh level)."""
    from pine_tpu.accel.pallas_traverse import _tree_depth

    d_top = _tree_depth(np.asarray(g["inst_np"]["ic_node"], np.int32))
    d_mesh = _sc_tree_layout(g["mesh"])["depth"]
    return d_top * (1 + 2 * TREE_LEAF) + d_mesh + 4


def kernel_supports(g):
    from pine_tpu.accel.pallas_traverse import _grid_eligible
    from pine_tpu.scene import shapes as S

    return (
        g.get("kind") == "instanced"
        and g["tid"] == S.TRIANGLE
        and "inst_np" in g
        and g["n_inst"] <= INST_KERNEL_MAX
        and _grid_eligible(g["mesh"])
        and _stack_need(g) <= STACK_DEPTH
    )


def _query(g, ro, rd, tmin, tmax, best_t, best_e, any_hit):
    import os

    import jax.numpy as jnp

    lay = inst_layout(g)
    mxum = None
    if os.environ.get("PINE_INST_KERNEL", "vpu") == "mxu":
        from pine_tpu.accel import mxu_sweep

        # tables are prebuilt at accel-build time (packet.py hook)
        mxum = mxu_sweep.build_mesh_tables(g["mesh"], lay["e_pad"], SUPER)
    n = ro.shape[0]
    n_pad = ((n + K_SUB * K_LANE - 1) // (K_SUB * K_LANE)) * (K_SUB * K_LANE)
    R = n_pad // K_LANE

    def prep(x, fill):
        x = jnp.asarray(x, jnp.float32) if x.dtype != jnp.int32 else x
        if n_pad != n:
            x = jnp.concatenate([x, jnp.full((n_pad - n,), fill, x.dtype)])
        return x.reshape(R, K_LANE)

    args = (
        prep(ro[:, 0], 0.0), prep(ro[:, 1], 0.0), prep(ro[:, 2], 0.0),
        prep(rd[:, 0], 1.0), prep(rd[:, 1], 0.0), prep(rd[:, 2], 0.0),
        prep(tmin, 0.0), prep(tmax, -1.0),
        prep(best_t, -1.0), prep(best_e, 0),
    )
    call = _compiled_inst_call(
        lay["n_prims"], lay["e_pad"], g["stride"], g["vbase"], any_hit, R,
        mxu_m=(mxum["m"] if mxum else 0),
        probe=os.environ.get("PINE_INST_PROBE", ""),
    )
    out_t, out_e = call(
        lay["tboxes"], lay["tcnode"], lay["tcstart"], lay["tccount"],
        lay["iboxes"], lay["minv"],
        lay["mboxes"], lay["mcnode"], lay["mcstart"], lay["mccount"],
        lay["msc_order"], lay["mcell_boxes"], lay["msc_boxes"],
        mxum["Wm"] if mxum else lay["table"], *args,
    )
    return out_t.reshape(-1)[:n], out_e.reshape(-1)[:n]


def inst_kernel_intersect(g, ro, rd, tmin, best_t, best_e):
    """Closest hit; best_e out already carries FULL virtual entity ids."""
    return _query(g, ro, rd, tmin, best_t, best_t, best_e, any_hit=False)


def inst_kernel_any_hit(g, ro, rd, tmin, tmax, occ):
    """Occlusion; occ is the 0/1 int mask carried across groups."""
    _, occ = _query(g, ro, rd, tmin, tmax, tmax, occ, any_hit=True)
    return occ
