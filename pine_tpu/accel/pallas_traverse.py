"""Pallas TPU packet-traversal kernels (SURVEY.md §7 hard part 1).

One grid program = one packet of 1024 rays held as (8,128) f32 vregs.  BVH
nodes and primitive parameters are scalar-prefetched into SMEM, so the walk
is: scalar stack pop -> scalar AABB fetch -> vector slab test against all
1024 rays -> masked unrolled leaf tests (prim scalars broadcast from SMEM,
zero per-ray gathers) -> near-first scalar push.  This is the TPU shape of
the reference's per-ray stack walk (impl/accel/bvh.cpp:320-451) with the
packet generalization of hit8 (embree.cpp:54-65).

Per-type kernels keep every leaf loop monomorphic (no variant dispatch in
the hot path).  Groups whose shape type has no scalar test here, or whose
tables exceed the SMEM budget, fall back to accel/packet.py's XLA walk.
"""
from __future__ import annotations

import functools

import numpy as np

BIG = 1e30
STACK_DEPTH = 48
LEAF_MAX = 4  # matches the SAH builders
K_SUB, K_LANE = 8, 128  # rays per packet = 8*128
KP = K_SUB * K_LANE
SMEM_BUDGET = 512 * 1024  # bytes for nodes+prims of one group

# shape type ids (shapes.py) with a scalarized test below
from pine_tpu.scene import shapes as S


def _safe_inv(d):
    import jax.numpy as jnp

    return 1.0 / jnp.where(jnp.abs(d) < 1e-9, jnp.where(d < 0, -1e-9, 1e-9), d)


# --------------------------------------------------------------------------
# scalarized primitive tests: fetch(c) -> scalar param; rays as component
# vectors (8,128).  Return t with BIG where miss (tmin/tmax already applied).
# --------------------------------------------------------------------------

def _finish(t, ok, tmin, tmax):
    import jax.numpy as jnp

    return jnp.where(ok & (t > tmin) & (t < tmax), t, BIG)


def _test_rect(fetch, o, d, tmin, tmax):
    import jax.numpy as jnp

    px, py, pz = fetch(0), fetch(1), fetch(2)
    exx, exy, exz = fetch(3), fetch(4), fetch(5)
    eyx, eyy, eyz = fetch(6), fetch(7), fetch(8)
    nx, ny, nz = fetch(9), fetch(10), fetch(11)
    lx, ly = fetch(12), fetch(13)
    denom = d[0] * nx + d[1] * ny + d[2] * nz
    denom = jnp.where(denom == 0.0, 1e-12, denom)
    t = ((px - o[0]) * nx + (py - o[1]) * ny + (pz - o[2]) * nz) / denom
    hx = o[0] + t * d[0] - px
    hy = o[1] + t * d[1] - py
    hz = o[2] + t * d[2] - pz
    u = (hx * exx + hy * exy + hz * exz) / lx
    v = (hx * eyx + hy * eyy + hz * eyz) / ly
    ok = (jnp.abs(u) <= 0.5) & (jnp.abs(v) <= 0.5)
    return _finish(t, ok, tmin, tmax)


def _test_sphere(fetch, o, d, tmin, tmax):
    import jax.numpy as jnp

    cx, cy, cz, r = fetch(0), fetch(1), fetch(2), fetch(3)
    rx, ry, rz = o[0] - cx, o[1] - cy, o[2] - cz
    b = rx * d[0] + ry * d[1] + rz * d[2]
    cc = rx * rx + ry * ry + rz * rz - r * r
    disc = b * b - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t = jnp.where(t0 < tmin, -b + sq, t0)
    return _finish(t, disc > 0.0, tmin, tmax)


def _test_triangle(fetch, o, d, tmin, tmax):
    import jax.numpy as jnp

    v0x, v0y, v0z = fetch(0), fetch(1), fetch(2)
    e1x, e1y, e1z = fetch(3) - v0x, fetch(4) - v0y, fetch(5) - v0z
    e2x, e2y, e2z = fetch(6) - v0x, fetch(7) - v0y, fetch(8) - v0z
    tx, ty, tz = o[0] - v0x, o[1] - v0y, o[2] - v0z
    px = d[1] * e2z - d[2] * e2y
    py = d[2] * e2x - d[0] * e2z
    pz = d[0] * e2y - d[1] * e2x
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    det = px * e1x + py * e1y + pz * e1z
    inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    t = (qx * e2x + qy * e2y + qz * e2z) * inv
    u = (px * tx + py * ty + pz * tz) * inv
    v = (qx * d[0] + qy * d[1] + qz * d[2]) * inv
    ok = (det != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return _finish(t, ok, tmin, tmax)


def _test_cone(fetch, o, d, tmin, tmax):
    import jax.numpy as jnp

    ax, ay, az = fetch(0), fetch(1), fetch(2)
    nx, ny, nz = fetch(3), fetch(4), fetch(5)
    A2, h = fetch(6), fetch(10)
    ox, oy, oz = o[0] - ax, o[1] - ay, o[2] - az
    dn = d[0] * nx + d[1] * ny + d[2] * nz
    on = ox * nx + oy * ny + oz * nz
    dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    od = ox * d[0] + oy * d[1] + oz * d[2]
    oo = ox * ox + oy * oy + oz * oz
    a = -A2 * dn * dn + dd
    b = 2.0 * (-A2 * on * dn + od)
    c = -A2 * on * on + oo
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a == 0.0, 1e-6, a)
    t0 = (-b - sq) / (2.0 * a_safe)
    t = jnp.where(t0 < tmin, t0 + sq / a_safe, t0)
    height = on + t * dn
    ok = (disc > 0.0) & (height < 0.0) & (height >= -h)
    return _finish(t, ok, tmin, tmax)


def _test_aabb(fetch, o, d, tmin, tmax):
    import jax.numpy as jnp

    inv0 = _safe_inv(d[0])
    inv1 = _safe_inv(d[1])
    inv2 = _safe_inv(d[2])
    lx, ly, lz = fetch(0), fetch(1), fetch(2)
    ux, uy, uz = fetch(3), fetch(4), fetch(5)
    t0x, t1x = (lx - o[0]) * inv0, (ux - o[0]) * inv0
    t0y, t1y = (ly - o[1]) * inv1, (uy - o[1]) * inv1
    t0z, t1z = (lz - o[2]) * inv2, (uz - o[2]) * inv2
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), tmin),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), tmax),
    )
    ok = near <= far
    t = jnp.where(near > tmin, near, far)
    return _finish(t, ok, tmin, tmax)


def _test_obb(fetch, o, d, tmin, tmax):
    """bbox.cpp OBB::intersect — local slab then world-space t via hit point."""
    import jax.numpy as jnp

    lx, ly, lz = fetch(0), fetch(1), fetch(2)
    ux, uy, uz = fetch(3), fetch(4), fetch(5)
    m = [fetch(6 + i) for i in range(12)]  # world<-local (3x4)
    mi = [fetch(18 + i) for i in range(12)]  # local<-world (3x4)
    olx = mi[0] * o[0] + mi[1] * o[1] + mi[2] * o[2] + mi[3]
    oly = mi[4] * o[0] + mi[5] * o[1] + mi[6] * o[2] + mi[7]
    olz = mi[8] * o[0] + mi[9] * o[1] + mi[10] * o[2] + mi[11]
    dlx = mi[0] * d[0] + mi[1] * d[1] + mi[2] * d[2]
    dly = mi[4] * d[0] + mi[5] * d[1] + mi[6] * d[2]
    dlz = mi[8] * d[0] + mi[9] * d[1] + mi[10] * d[2]
    dn = jnp.sqrt(dlx * dlx + dly * dly + dlz * dlz)
    dn = jnp.maximum(dn, 1e-20)
    dlx, dly, dlz = dlx / dn, dly / dn, dlz / dn
    inv0, inv1, inv2 = _safe_inv(dlx), _safe_inv(dly), _safe_inv(dlz)
    t0x, t1x = (lx - olx) * inv0, (ux - olx) * inv0
    t0y, t1y = (ly - oly) * inv1, (uy - oly) * inv1
    t0z, t1z = (lz - olz) * inv2, (uz - olz) * inv2
    near = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
    )
    far = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.minimum(jnp.maximum(t0z, t1z), BIG),
    )
    ok = near <= far
    t_l = jnp.where(near > 0.0, near, far)
    plx = olx + t_l * dlx
    ply = oly + t_l * dly
    plz = olz + t_l * dlz
    pwx = m[0] * plx + m[1] * ply + m[2] * plz + m[3]
    pwy = m[4] * plx + m[5] * ply + m[6] * plz + m[7]
    pwz = m[8] * plx + m[9] * ply + m[10] * plz + m[11]
    t = jnp.sqrt(
        (pwx - o[0]) ** 2 + (pwy - o[1]) ** 2 + (pwz - o[2]) ** 2
    )
    return _finish(t, ok, tmin, tmax)


def _test_disk(fetch, o, d, tmin, tmax):
    import jax.numpy as jnp

    px, py, pz = fetch(0), fetch(1), fetch(2)
    nx, ny, nz = fetch(3), fetch(4), fetch(5)
    # disk rows are [p(3), n(3), u(3), v(3), r] (shapes.py Disk.params):
    # the radius lives at 12 (6 is u.x — caught by the mxu parity test)
    r = fetch(12)
    denom = d[0] * nx + d[1] * ny + d[2] * nz
    denom = jnp.where(denom == 0.0, 1e-12, denom)
    t = ((px - o[0]) * nx + (py - o[1]) * ny + (pz - o[2]) * nz) / denom
    hx = o[0] + t * d[0] - px
    hy = o[1] + t * d[1] - py
    hz = o[2] + t * d[2] - pz
    ok = hx * hx + hy * hy + hz * hz <= r * r
    return _finish(t, ok, tmin, tmax)


def _test_plane(fetch, o, d, tmin, tmax):
    import jax.numpy as jnp

    px, py, pz = fetch(0), fetch(1), fetch(2)
    nx, ny, nz = fetch(3), fetch(4), fetch(5)
    denom = d[0] * nx + d[1] * ny + d[2] * nz
    denom = jnp.where(denom == 0.0, 1e-12, denom)
    t = ((px - o[0]) * nx + (py - o[1]) * ny + (pz - o[2]) * nz) / denom
    return _finish(t, jnp.ones_like(t, bool), tmin, tmax)


def _test_cylinder(fetch, o, d, tmin, tmax):
    import jax.numpy as jnp

    px, py, pz = fetch(0), fetch(1), fetch(2)
    qx, qy, qz = fetch(3), fetch(4), fetch(5)
    nx, ny, nz = fetch(6), fetch(7), fetch(8)
    r = fetch(9)
    mx, my, mz = o[0] - px, o[1] - py, o[2] - pz
    dn = d[0] * nx + d[1] * ny + d[2] * nz
    vx, vy, vz = d[0] - dn * nx, d[1] - dn * ny, d[2] - dn * nz
    mn = mx * nx + my * ny + mz * nz
    wx, wy, wz = mx - mn * nx, my - mn * ny, mz - mn * nz
    a = vx * vx + vy * vy + vz * vz
    b = 2.0 * (vx * wx + vy * wy + vz * wz)
    c = wx * wx + wy * wy + wz * wz - r * r
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a == 0.0, 1e-6, a)
    t0 = (-b - sq) / (2.0 * a_safe)
    t = jnp.where(t0 < tmin, (-b + sq) / (2.0 * a_safe), t0)
    axial = mn + t * dn
    len_ax = (qx - px) * nx + (qy - py) * ny + (qz - pz) * nz
    ok = (disc >= 0.0) & (axial >= 0.0) & (axial <= len_ax)
    return _finish(t, ok, tmin, tmax)


PRIM_TESTS = {
    S.RECT: _test_rect,
    S.SPHERE: _test_sphere,
    S.TRIANGLE: _test_triangle,
    S.CONE: _test_cone,
    S.BOX_AABB: _test_aabb,
    S.BOX_OBB: _test_obb,
    S.DISK: _test_disk,
    S.PLANE: _test_plane,
    S.CYLINDER: _test_cylinder,
}


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _make_bvh_kernel(tid, width, any_hit):
    """Build the Pallas kernel body for one group's BVH walk."""
    import jax
    import jax.numpy as jnp

    test = PRIM_TESTS[tid]

    def kernel(boxes, cnode, cstart, ccount, rows,  # SMEM scalar-prefetch
               ox, oy, oz, dx, dy, dz, tmn, tmx, bt_in, be_in,  # VMEM (8,128)
               bt_out, be_out, stack):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        tmin = tmn[:]
        inv = (_safe_inv(d[0]), _safe_inv(d[1]), _safe_inv(d[2]))
        stack[0] = 0

        def slab_child(node, k, best_t):
            base = node * 12 + k * 6
            lx, ly, lz = boxes[base], boxes[base + 1], boxes[base + 2]
            ux, uy, uz = boxes[base + 3], boxes[base + 4], boxes[base + 5]
            t0x, t1x = (lx - o[0]) * inv[0], (ux - o[0]) * inv[0]
            t0y, t1y = (ly - o[1]) * inv[1], (uy - o[1]) * inv[1]
            t0z, t1z = (lz - o[2]) * inv[2], (uz - o[2]) * inv[2]
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), best_t),
            )
            hit = near <= far
            return hit, jnp.min(jnp.where(hit, near, BIG))

        def leaf(node, k, best_t, best_e):
            start = cstart[node * 2 + k]
            cnt = ccount[node * 2 + k]
            for j in range(LEAF_MAX):
                e = start + j

                def fetch(c):
                    return rows[e * width + c]

                tt = test(fetch, o, d, tmin, best_t)
                tt = jnp.where(j < cnt, tt, BIG)
                if any_hit:
                    # int32 carry: Mosaic mishandles i1 vregs through cond
                    best_e = jnp.maximum(best_e, (tt < BIG).astype(jnp.int32))
                else:
                    better = tt < best_t
                    best_t = jnp.where(better, tt, best_t)
                    best_e = jnp.where(better, e, best_e)
            return best_t, best_e

        def body(state):
            sp, best_t, best_e = state
            sp1 = sp - 1
            node = stack[sp1]
            c0 = cnode[node * 2]
            c1 = cnode[node * 2 + 1]
            hit0, tn0 = slab_child(node, 0, best_t)
            hit1, tn1 = slab_child(node, 1, best_t)
            any0 = jnp.any(hit0)
            any1 = jnp.any(hit1)

            # leaf children (unconditional masked compute; cnt=0 when not a
            # leaf hit keeps the math inert)
            do0 = any0 & (c0 < 0)
            do1 = any1 & (c1 < 0)
            best_t, best_e = jax.lax.cond(
                do0, lambda a, b: leaf(node, 0, a, b), lambda a, b: (a, b),
                best_t, best_e,
            )
            best_t, best_e = jax.lax.cond(
                do1, lambda a, b: leaf(node, 1, a, b), lambda a, b: (a, b),
                best_t, best_e,
            )

            # push inner children, far first
            push0 = any0 & (c0 >= 0)
            push1 = any1 & (c1 >= 0)
            near0 = tn0 <= tn1
            # far child first
            first_c = jnp.where(near0, c1, c0)
            first_p = jnp.where(near0, push1, push0)
            second_c = jnp.where(near0, c0, c1)
            second_p = jnp.where(near0, push0, push1)
            sp2 = sp1

            stack[jnp.where(first_p, sp2, STACK_DEPTH - 1)] = first_c
            sp2 = sp2 + first_p.astype(jnp.int32)
            stack[jnp.where(second_p, sp2, STACK_DEPTH - 1)] = second_c
            sp2 = sp2 + second_p.astype(jnp.int32)
            sp2 = jnp.minimum(sp2, STACK_DEPTH - 2)
            if any_hit:
                # drain once every RELEVANT lane is occluded (lanes with
                # tmax <= tmin ask no occlusion question — e.g. non-NEE
                # lanes masked with tmax=-1)
                done = (best_e != 0) | (tmx[:] <= tmn[:])
                sp2 = jnp.where(jnp.all(done), 0, sp2)
            return sp2, best_t, best_e

        def cond(state):
            sp, _, _ = state
            return sp > 0

        if any_hit:
            init = (jnp.int32(1), tmx[:], be_in[:])
            sp, best_t, occ = jax.lax.while_loop(cond, body, init)
            bt_out[:] = bt_in[:]
            be_out[:] = occ
        else:
            init = (jnp.int32(1), bt_in[:], be_in[:])
            sp, best_t, best_e = jax.lax.while_loop(cond, body, init)
            bt_out[:] = best_t
            be_out[:] = best_e

    return kernel


def _make_dense_kernel(tid, width, n_prims, any_hit, probe=False):
    """No-BVH variant: test every prim of a small group.

    A group-AABB slab test gates the whole unrolled sweep per (8,128) ray
    block: a block none of whose live lanes can reach the group's bounds
    within (tmin, current-limit) skips all n_prims tests (e.g. cbox wall
    blocks never touch the cone field on the floor; NEE blocks whose shadow
    rays all start above it skip too).  Dead lanes skip for free: closest-hit
    best_t starts at tmax (packet.py:853), so dead lanes carry limit<=tmin.

    probe=True (PINE_DENSE_PROBE=sweepmark, WRONG RESULTS, tests only):
    blocks whose sweep runs overwrite the outputs with a marker
    (best_t=-123, occ=2) so a culled block (bitwise input passthrough) is
    positively distinguishable from a sweep that ran and missed."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    test = PRIM_TESTS[tid]

    def kernel(gbox, rows, ox, oy, oz, dx, dy, dz, tmn, tmx, bt_in, be_in,
               bt_out, be_out):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        tmin = tmn[:]
        if any_hit:
            # Already-occluded lanes contribute an empty (tmin-1) slab window
            # so a block whose live lanes are all occluded culls whole.
            lim = jnp.where(be_in[:] == 0, tmx[:], tmin - 1.0)
        else:
            lim = bt_in[:]
        near, far = tmin, lim
        for a in range(3):
            inv = _safe_inv(d[a])
            t0 = (gbox[a] - o[a]) * inv
            t1 = (gbox[3 + a] - o[a]) * inv
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        bt_out[:] = bt_in[:]
        be_out[:] = be_in[:]

        @pl.when(jnp.any(near <= far))
        def _sweep():
            if probe:
                bt_out[:] = jnp.full_like(bt_in[:], -123.0)
                be_out[:] = jnp.full_like(be_in[:], 2)
                return
            if any_hit:
                occ = be_in[:]
                limit = tmx[:]
                for e in range(n_prims):
                    tt = test(lambda c: rows[e * width + c], o, d, tmin, limit)
                    occ = jnp.maximum(occ, (tt < BIG).astype(jnp.int32))
                be_out[:] = occ
            else:
                best_t = bt_in[:]
                best_e = be_in[:]
                for e in range(n_prims):
                    tt = test(lambda c: rows[e * width + c], o, d, tmin, best_t)
                    better = tt < best_t
                    best_t = jnp.where(better, tt, best_t)
                    best_e = jnp.where(better, e, best_e)
                bt_out[:] = best_t
                be_out[:] = best_e

    return kernel


SCD_CELL = 16  # prims per cull cell in the scdense kernel


def _make_scdense_kernel(tid, width, n_prims, any_hit):
    """Cell-culled dense kernel, prims broadcast from SMEM scalars.

    Every op is full-width (8,128): prim params load on the scalar core and
    broadcast for free, best_t/best_e updates are whole-block selects, and
    there are no cross-sublane reductions (the grid kernel pays all three).
    Work skips at two granularities — supercell (128 prims) then cell (16
    prims, SAH leaf order keeps them spatially tight) — via whole-block slab
    tests; any-hit additionally drains once every relevant lane is occluded.
    For analytic groups up to a few thousand prims this is the fastest shape
    under honest sync-dispatch timing (scripts_kernel_lab.py)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    test = PRIM_TESTS[tid]
    n_super = (n_prims + SUPER - 1) // SUPER
    cells_per_super = SUPER // SCD_CELL

    def kernel(sc_boxes, cell_boxes, rows,
               ox, oy, oz, dx, dy, dz, tmn, tmx, bt_in, be_in,
               bt_out, be_out, bt_s, be_s):
        invx = _safe_inv(dx[:])
        invy = _safe_inv(dy[:])
        invz = _safe_inv(dz[:])
        bt_s[:] = tmx[:] if any_hit else bt_in[:]
        be_s[:] = be_in[:]
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        tmin = tmn[:]

        def live_mask(bx, base):
            lx, ly, lz = bx[base], bx[base + 1], bx[base + 2]
            ux, uy, uz = bx[base + 3], bx[base + 4], bx[base + 5]
            t0x, t1x = (lx - o[0]) * invx, (ux - o[0]) * invx
            t0y, t1y = (ly - o[1]) * invy, (uy - o[1]) * invy
            t0z, t1z = (lz - o[2]) * invz, (uz - o[2]) * invz
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt_s[:]),
            )
            live = near <= far
            if any_hit:
                live = live & (be_s[:] == 0) & (tmx[:] > tmn[:])
            return live

        for si in range(n_super):
            @pl.when(jnp.any(live_mask(sc_boxes, si * 6)))
            def _(si=si):
                for ci in range(cells_per_super):
                    cell = si * cells_per_super + ci
                    e0 = cell * SCD_CELL
                    if e0 >= n_prims:
                        continue

                    @pl.when(jnp.any(live_mask(cell_boxes, cell * 6)))
                    def _(e0=e0):
                        for e in range(e0, min(e0 + SCD_CELL, n_prims)):
                            def fetch(c, e=e):
                                return rows[e * width + c]

                            limit = tmx[:] if any_hit else bt_s[:]
                            tt = test(fetch, o, d, tmin, limit)
                            if any_hit:
                                be_s[:] = jnp.maximum(
                                    be_s[:], (tt < BIG).astype(jnp.int32)
                                )
                            else:
                                better = tt < bt_s[:]
                                bt_s[:] = jnp.where(better, tt, bt_s[:])
                                be_s[:] = jnp.where(better, e, be_s[:])

        if any_hit:
            bt_out[:] = bt_in[:]
        else:
            bt_out[:] = bt_s[:]
        be_out[:] = be_s[:]

    return kernel


@functools.lru_cache(maxsize=256)
def _compiled_scdense_call(tid, width, n_prims, any_hit, n_rows):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    grid = (n_rows // K_SUB,)
    ray_spec = pl.BlockSpec(
        (K_SUB, K_LANE), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = _make_scdense_kernel(tid, width, n_prims, any_hit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[ray_spec] * 10,
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[
            pltpu.VMEM((K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((K_SUB, K_LANE), jnp.int32),
        ],
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


# --------------------------------------------------------------------------
# lattice kernel: regular 1-D/2-D prim fields (script loops — the README
# cbox's 21x20 cone floor, forests).  Prim params are AFFINE in the lattice
# indices (packet._detect_lattice), so the kernel never fetches a prim: each
# lane reconstructs the few candidate prims its ray passes near with two
# fmas per component.  The ray's clipped [near, far] segment is marched in
# windows short enough that a KxK integer window in the lattice's dual (u,v)
# coordinates covers every reachable cell; most camera/NEE blocks need one
# window of K*K tests instead of the dense kernel's full n_prims sweep
# (420 for the cbox floor).  No reference analogue: the reference hands
# fields like this to Embree's BVH (impl/accel/embree.cpp); on TPU the
# arithmetic reconstruction replaces the per-lane gathers a tree walk would
# need.
# --------------------------------------------------------------------------

def _make_lattice_kernel(tid, width, ni, nj, kwin, max_seg, any_hit):
    """Kernel body for one lattice group.

    Scalar-prefetch layout (latf, flat f32):
      [0:w)      base params (lattice cell (0,0))
      [w:2w)     dU  (param delta per +1 in i)
      [2w:3w)    dV  (param delta per +1 in j)
      [3w:3w+3)  gu  (dual spatial basis: x.gu - u0 == i at cell centers)
      [3w+3:+3)  gv
      [3w+6..]   u0, v0, r_u, r_v, cap_u, cap_v

    Closest-hit best_e is the LATTICE index k = i*nj + j; the caller gathers
    slot_of_k (ordinary XLA) to translate into the group's SAH row order.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    test = PRIM_TESTS[tid]
    ki_n = min(kwin, ni)
    kj_n = min(kwin, nj)

    def kernel(gbox, latf, ox, oy, oz, dx, dy, dz, tmn, tmx, bt_in, be_in,
               bt_out, be_out, bt_s, be_s):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        tmin = tmn[:]
        bt_s[:] = tmx[:] if any_hit else bt_in[:]
        be_s[:] = be_in[:]
        if any_hit:
            lim = jnp.where(be_in[:] == 0, tmx[:], tmin - 1.0)
        else:
            lim = bt_in[:]
        near, far = tmin, lim
        for a in range(3):
            inv = _safe_inv(d[a])
            t0 = (gbox[a] - o[a]) * inv
            t1 = (gbox[3 + a] - o[a]) * inv
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            far = jnp.minimum(far, jnp.maximum(t0, t1))
        live = near <= far

        w = width
        gu = (latf[3 * w], latf[3 * w + 1], latf[3 * w + 2])
        gv = (latf[3 * w + 3], latf[3 * w + 4], latf[3 * w + 5])
        u0, v0 = latf[3 * w + 6], latf[3 * w + 7]
        r_u, r_v = latf[3 * w + 8], latf[3 * w + 9]
        cap_u, cap_v = latf[3 * w + 10], latf[3 * w + 11]
        du = d[0] * gu[0] + d[1] * gu[1] + d[2] * gu[2]
        dv = d[0] * gv[0] + d[1] * gv[1] + d[2] * gv[2]
        ou = o[0] * gu[0] + o[1] * gu[1] + o[2] * gu[2] - u0
        ov = o[0] * gv[0] + o[1] * gv[1] + o[2] * gv[2] - v0
        seg = jnp.maximum(far - near, 0.0)
        n_seg = jnp.ceil(
            jnp.maximum(
                jnp.maximum(jnp.abs(du) * seg / cap_u,
                            jnp.abs(dv) * seg / cap_v),
                1.0,
            )
        )
        n_seg = jnp.where(live, n_seg, 0.0)
        dt = seg / jnp.maximum(n_seg, 1.0)

        for s in range(max_seg):
            if any_hit:
                act = (float(s) < n_seg) & (be_s[:] == 0)
            else:
                act = float(s) < n_seg

            @pl.when(jnp.any(act))
            def _(s=s, act=act):
                ta = near + float(s) * dt
                tb = near + float(s + 1) * dt
                ua, ub = ou + ta * du, ou + tb * du
                va, vb = ov + ta * dv, ov + tb * dv
                # candidate window: integer cells within r of the segment's
                # (u,v) interval; clip before the int cast (dead lanes carry
                # huge coordinates that would overflow int32)
                i_lo = jnp.clip(
                    jnp.floor(jnp.minimum(ua, ub) - r_u), -1e6, 1e6
                ).astype(jnp.int32)
                j_lo = jnp.clip(
                    jnp.floor(jnp.minimum(va, vb) - r_v), -1e6, 1e6
                ).astype(jnp.int32)
                for ki in range(ki_n):
                    ii = jnp.clip(i_lo + ki, 0, ni - 1)
                    fi = ii.astype(jnp.float32)
                    for kj in range(kj_n):
                        jj = jnp.clip(j_lo + kj, 0, nj - 1)
                        fj = jj.astype(jnp.float32)

                        def fetch(c, fi=fi, fj=fj):
                            return (
                                latf[c]
                                + fi * latf[w + c]
                                + fj * latf[2 * w + c]
                            )

                        limit = jnp.where(
                            act, tmx[:] if any_hit else bt_s[:], tmin - 1.0
                        )
                        tt = test(fetch, o, d, tmin, limit)
                        if any_hit:
                            be_s[:] = jnp.maximum(
                                be_s[:], (tt < BIG).astype(jnp.int32)
                            )
                        else:
                            better = tt < bt_s[:]
                            bt_s[:] = jnp.where(better, tt, bt_s[:])
                            be_s[:] = jnp.where(
                                better, ii * nj + jj, be_s[:]
                            )

        if any_hit:
            bt_out[:] = bt_in[:]
        else:
            bt_out[:] = bt_s[:]
        be_out[:] = be_s[:]

    return kernel


@functools.lru_cache(maxsize=64)
def _compiled_lattice_call(tid, width, ni, nj, kwin, max_seg, any_hit,
                           n_rows):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    grid = (n_rows // K_SUB,)
    ray_spec = pl.BlockSpec(
        (K_SUB, K_LANE), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    kernel = _make_lattice_kernel(tid, width, ni, nj, kwin, max_seg, any_hit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[ray_spec] * 10,
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[
            pltpu.VMEM((K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((K_SUB, K_LANE), jnp.int32),
        ],
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


def _lattice_smem(g):
    """Flatten the lattice model into the kernel's scalar-prefetch array +
    the k->slot translation table.  MUST run at accel-build time (outside
    any trace) — same capture discipline as _group_smem_arrays."""
    import jax.numpy as jnp

    lat = g["lattice"]
    if "_latf" in lat:
        return lat
    w = int(g["rows_np"].shape[1])
    base = np.zeros(w, np.float32)
    dU = np.zeros(w, np.float32)
    dV = np.zeros(w, np.float32)
    pw = lat["base"].shape[0]
    base[:pw], dU[:pw], dV[:pw] = lat["base"], lat["dU"], lat["dV"]
    tail = np.array(
        [lat["u0"], lat["v0"], lat["r_u"], lat["r_v"],
         lat["cap_u"], lat["cap_v"]],
        np.float32,
    )
    latf = np.concatenate([base, dU, dV, lat["gu"], lat["gv"], tail])
    lat["_latf"] = jnp.asarray(latf)
    lat["_slot"] = jnp.asarray(lat["slot_of_k"])
    # worst-case windows to cover any chord through the group box
    span_u = (lat["ni"] - 1) + 2 * lat["r_u"]
    span_v = (lat["nj"] - 1) + 2 * lat["r_v"]
    lat["_max_seg"] = max(
        1,
        int(np.ceil(max(span_u / lat["cap_u"], span_v / lat["cap_v"]))),
    )
    return lat


# --------------------------------------------------------------------------
# transposed grid kernel: prims ride SUBLANES via an (E,128) component table
# (vector loads, zero scalar broadcasts in the prim loop); rays ride LANES.
# Two-level AABB cull over leaf-ordered cells (16 prims) and supercells (128)
# prunes the prim tiles each 128-ray row must test.
# --------------------------------------------------------------------------

CELL = 16  # retained for layout docs; culling is supercell (128) + coarse (2048)
SUPER = 128     # prims per supercell (8 cells)


def _make_grid_kernel(tid, width, n_prims, any_hit, hbm=False, cells=False,
                      octorder=False, probe="", mxu_m=0):
    """Supercell-culled transposed dense kernel.

    State lives in VMEM scratch and all control flow is @pl.when predication
    (a lax.cond with vector carries costs ~1.5us in Mosaic — measured; scratch
    mutation makes branching nearly free).  Prim tiles load as (8,1) sublane
    vectors: zero scalar broadcasts in the prim loop.

    hbm=True (mesh-scale groups): the prim table stays in HBM and each TAKEN
    supercell's (SUPER,128) slice is DMA'd into a VMEM scratch buffer before
    its tile loop — VMEM holds only one supercell at a time, so triangle
    counts are bounded by HBM, not VMEM.

    cells=True: inside a taken supercell, cull again at CELL32-prim
    granularity (and per sublane-row) before testing tiles — a taken
    supercell otherwise tests all 8 rows x 16 tiles even when one cell
    overlaps the rays (honest-timing lab showed ~10x waste on coherent
    mesh blocks).

    octorder=True: scan coarse boxes and supercells near-to-far along each
    ray block's dominant direction octant (precomputed SMEM permutations,
    one per octant; the block's octant arrives as a per-block scalar).
    Near-first order shrinks best_t early, so later supercells fail their
    slab test and cost ~25 vector ops instead of a full 5k-op tile sweep —
    the scan equivalent of bvh.cpp's ordered descent.

    mxu_m>0 (PINE_MESH_KERNEL=mxu; implies hbm): the `rows` input is the
    supercell-major MXU coefficient table (mxu_sweep.build_mesh_tables,
    (n_super*8, m*SUPER)) instead of the prim rows; a taken supercell DMAs
    its (8, m*SUPER) strip and each live sublane row tests all SUPER prims
    with one (m*SUPER, 8)x(8, 128) matmul + vectorized epilogue — no scalar
    fetches at all.  Cell-level culling is subsumed (the matmul tests the
    whole supercell at once)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    test = PRIM_TESTS[tid]
    n_super = (n_prims + SUPER - 1) // SUPER
    tiles_per_super = SUPER // 8
    cells_per_super = SUPER // CELL32
    tiles_per_cell = CELL32 // 8
    if mxu_m:
        assert hbm and not cells, "mxu mode is the hbm mesh path"
        from pine_tpu.accel import mxu_sweep

    coarse_factor = 16
    n_super_pad = ((n_super + coarse_factor - 1) // coarse_factor) * coarse_factor
    n_coarse = n_super_pad // coarse_factor
    use_coarse = n_super > coarse_factor  # two-level culling for big groups

    if octorder and not use_coarse:
        raise ValueError("octorder requires the coarse level (hbm meshes)")

    def kernel(coarse_boxes, sc_boxes, cell_boxes, *rest):
        if octorder:
            c_order, s_order, blk_oct = rest[:3]
            rest = rest[3:]
        (rows, ox, oy, oz, dx, dy, dz, tmn, tmx, bt_in, be_in,
         bt_out, be_out, bt_s, be_s, *extra) = rest
        if mxu_m:
            row_buf, dma_sem, f_buf = extra
        elif hbm:
            row_buf, dma_sem = extra
        else:
            row_buf = rows
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        if mxu_m:
            # per-row ray feature matrices for the matmuls: f_buf rows
            # [s*8, s*8+8) = [dx,dy,dz,ox,oy,oz,1,0] of sublane row s's lanes
            for s in range(K_SUB):
                for fi, ref in enumerate((dx, dy, dz, ox, oy, oz)):
                    f_buf[s * 8 + fi: s * 8 + fi + 1, :] = ref[s: s + 1, :]
                f_buf[s * 8 + 6: s * 8 + 7, :] = jnp.ones(
                    (1, K_LANE), jnp.float32
                )
                f_buf[s * 8 + 7: s * 8 + 8, :] = jnp.zeros(
                    (1, K_LANE), jnp.float32
                )
        invx = _safe_inv(dx[:])
        invy = _safe_inv(dy[:])
        invz = _safe_inv(dz[:])
        bt_s[:] = tmx[:] if any_hit else bt_in[:]
        be_s[:] = be_in[:]

        def slab_any(bx, base, far_ref):
            lx, ly, lz = bx[base], bx[base + 1], bx[base + 2]
            ux, uy, uz = bx[base + 3], bx[base + 4], bx[base + 5]
            t0x, t1x = (lx - ox[:]) * invx, (ux - ox[:]) * invx
            t0y, t1y = (ly - oy[:]) * invy, (uy - oy[:]) * invy
            t0z, t1z = (lz - oz[:]) * invz, (uz - oz[:]) * invz
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmn[:]),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), far_ref),
            )
            return jnp.any(near <= far)

        def do_super(si, _):
            # cull: supercell AABB vs the whole (8,128) ray block
            base = si * 6
            lx, ly, lz = sc_boxes[base], sc_boxes[base + 1], sc_boxes[base + 2]
            ux, uy, uz = sc_boxes[base + 3], sc_boxes[base + 4], sc_boxes[base + 5]
            t0x, t1x = (lx - ox[:]) * invx, (ux - ox[:]) * invx
            t0y, t1y = (ly - oy[:]) * invy, (uy - oy[:]) * invy
            t0z, t1z = (lz - oz[:]) * invz, (uz - oz[:]) * invz
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmn[:]),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt_s[:]),
            )
            row_live = near <= far
            if any_hit:
                # drain: lanes already occluded (or asking no question) are
                # dead; a supercell none of whose live lanes overlap is skipped
                row_live = row_live & (be_s[:] == 0) & (tmx[:] > tmn[:])
            # padded supercells (coarse-level alignment) must never run: a
            # sorted slab test can't represent an empty box, so gate on index
            sc_hit = jnp.any(row_live) & (si < n_super)

            def test_tiles(si, live, tile0, n_tiles):
                """Test n_tiles 8-prim tiles, culling per sublane row."""
                for s in range(K_SUB):
                    # per-row cull: coherent ray blocks (tile-major primaries)
                    # often touch a cell with only some of their 8 rows
                    row_any = jnp.any(live[s : s + 1, :])

                    @pl.when(row_any)
                    def _(s=s):
                        o = (ox[s : s + 1, :], oy[s : s + 1, :], oz[s : s + 1, :])
                        d = (dx[s : s + 1, :], dy[s : s + 1, :], dz[s : s + 1, :])
                        tmin = tmn[s : s + 1, :]
                        for tile in range(tile0, tile0 + n_tiles):
                            p0 = si * SUPER + tile * 8
                            if hbm and use_coarse:
                                # whole coarse group resident: offset by the
                                # supercell's position within its parent
                                si_local = si - (si // coarse_factor) * coarse_factor
                                buf_p0 = si_local * SUPER + tile * 8
                            elif hbm:
                                buf_p0 = tile * 8
                            else:
                                buf_p0 = p0

                            def fetch(c, buf_p0=buf_p0):
                                return row_buf[pl.ds(buf_p0, 8), c : c + 1]  # (8,1)

                            row_bt = bt_s[s : s + 1, :]
                            limit = tmx[s : s + 1, :] if any_hit else row_bt
                            tt = test(fetch, o, d, tmin, limit)
                            pid = p0 + sub_iota
                            tt = jnp.where(pid < n_prims, tt, BIG)
                            if any_hit:
                                be_s[s : s + 1, :] = jnp.maximum(
                                    be_s[s : s + 1, :],
                                    jnp.max((tt < BIG).astype(jnp.int32), axis=0, keepdims=True),
                                )
                            else:
                                tb = jnp.min(tt, axis=0, keepdims=True)
                                eb = jnp.min(
                                    jnp.where(tt == tb, pid, jnp.int32(2**30)),
                                    axis=0, keepdims=True,
                                )
                                better = tb < row_bt
                                bt_s[s : s + 1, :] = jnp.where(better, tb, row_bt)
                                be_s[s : s + 1, :] = jnp.where(
                                    better, eb, be_s[s : s + 1, :]
                                )

            def test_super_mxu(si, live):
                """All SUPER prims vs each live sublane row: one matmul +
                epilogue per row; no per-prim fetches."""
                if use_coarse:
                    si_local = si - (si // coarse_factor) * coarse_factor
                else:
                    si_local = 0
                strip = row_buf[pl.ds(si_local * 8, 8), :]  # (8, m*SUPER)
                pid = si * SUPER + jax.lax.broadcasted_iota(
                    jnp.int32, (SUPER, K_LANE), 0
                )
                pid_ok = pid < n_prims
                for s in range(K_SUB):
                    row_any = jnp.any(live[s: s + 1, :])

                    @pl.when(row_any)
                    def _(s=s):
                        Fs = f_buf[s * 8: (s + 1) * 8, :]  # (8, 128)
                        # (m*SUPER, 128) pair values; lhs contracts on its
                        # leading dim (native MXU weight-stationary form);
                        # HIGHEST: f32 inputs must not round to bf16
                        from pine_tpu.accel.mxu_sweep import mxu_precision

                        P = jax.lax.dot_general(
                            strip, Fs, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=mxu_precision(),
                        )
                        o = (ox[s:s + 1, :], oy[s:s + 1, :], oz[s:s + 1, :])
                        d = (dx[s:s + 1, :], dy[s:s + 1, :], dz[s:s + 1, :])
                        odr = o[0] * d[0] + o[1] * d[1] + o[2] * d[2]
                        oor = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]
                        ddr = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                        row_bt = bt_s[s:s + 1, :]
                        limit = tmx[s:s + 1, :] if any_hit else row_bt

                        def val(v):
                            return P[v * SUPER:(v + 1) * SUPER, :]

                        tt = mxu_sweep._pair_t_vals(
                            tid, val, odr, oor, ddr, tmn[s:s + 1, :], limit
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
                                jnp.where(tt == tb, pid, jnp.int32(2 ** 30)),
                                axis=0, keepdims=True,
                            )
                            better = tb < row_bt
                            bt_s[s:s + 1, :] = jnp.where(better, tb, row_bt)
                            be_s[s:s + 1, :] = jnp.where(
                                better, eb, be_s[s:s + 1, :]
                            )

            if probe == "slabs":  # timing probe: culls only, no prim work
                return 0

            @pl.when(sc_hit)
            def _():
                if hbm and not use_coarse and probe != "nodma":
                    stride = 8 if mxu_m else SUPER  # W strip vs prim rows
                    cp = pltpu.make_async_copy(
                        rows.at[pl.ds(si * stride, stride), :], row_buf,
                        dma_sem,
                    )
                    cp.start()
                    cp.wait()
                if mxu_m:
                    test_super_mxu(si, row_live)
                elif not cells:
                    test_tiles(si, row_live, 0, tiles_per_super)
                else:
                    for k in range(cells_per_super):
                        cbase = (si * cells_per_super + k) * 6
                        clx, cly, clz = (
                            cell_boxes[cbase], cell_boxes[cbase + 1],
                            cell_boxes[cbase + 2],
                        )
                        cux, cuy, cuz = (
                            cell_boxes[cbase + 3], cell_boxes[cbase + 4],
                            cell_boxes[cbase + 5],
                        )
                        ct0x, ct1x = (clx - ox[:]) * invx, (cux - ox[:]) * invx
                        ct0y, ct1y = (cly - oy[:]) * invy, (cuy - oy[:]) * invy
                        ct0z, ct1z = (clz - oz[:]) * invz, (cuz - oz[:]) * invz
                        cnear = jnp.maximum(
                            jnp.maximum(jnp.minimum(ct0x, ct1x), jnp.minimum(ct0y, ct1y)),
                            jnp.maximum(jnp.minimum(ct0z, ct1z), tmn[:]),
                        )
                        cfar = jnp.minimum(
                            jnp.minimum(jnp.maximum(ct0x, ct1x), jnp.maximum(ct0y, ct1y)),
                            jnp.minimum(jnp.maximum(ct0z, ct1z), bt_s[:]),
                        )
                        cell_live = cnear <= cfar
                        if any_hit:
                            cell_live = cell_live & (be_s[:] == 0) & (tmx[:] > tmn[:])

                        @pl.when(jnp.any(cell_live))
                        def _(k=k, cell_live=cell_live):
                            test_tiles(si, cell_live, k * tiles_per_cell,
                                       tiles_per_cell)

            return 0

        if use_coarse:
            # outer cull over groups of 16 supercells (big meshes would
            # otherwise spend most cycles on per-supercell slab tests)
            if octorder:
                oct = blk_oct[pl.program_id(0)]

            def do_coarse(ci, _):
                if octorder:
                    ci = c_order[oct * n_coarse + ci]
                hit_c = slab_any(coarse_boxes, ci * 6, bt_s[:] if not any_hit else tmx[:])
                if any_hit:
                    hit_c = hit_c & jnp.any((be_s[:] == 0) & (tmx[:] > tmn[:]))

                @pl.when(hit_c)
                def _():
                    if hbm and probe != "nodma":
                        # one 16-supercell (1 MB) DMA per taken coarse group:
                        # per-supercell copies serialized ~100 start/wait
                        # stalls per block (measured via the probe decomp);
                        # batching trades a little spare HBM bandwidth for
                        # 16x fewer latency hits.  mxu mode copies the W
                        # strips instead (8 rows per supercell, m*SUPER wide)
                        stride = 8 if mxu_m else SUPER
                        cp = pltpu.make_async_copy(
                            rows.at[
                                pl.ds(ci * coarse_factor * stride,
                                      coarse_factor * stride), :,
                            ],
                            row_buf, dma_sem,
                        )
                        cp.start()
                        cp.wait()
                    if octorder:
                        def do_super_k(k, _):
                            return do_super(
                                s_order[oct * n_super_pad
                                        + ci * coarse_factor + k], 0
                            )

                        jax.lax.fori_loop(0, coarse_factor, do_super_k, 0)
                    else:
                        jax.lax.fori_loop(
                            ci * coarse_factor, (ci + 1) * coarse_factor,
                            do_super, 0,
                        )

                return 0

            jax.lax.fori_loop(0, n_coarse, do_coarse, 0)
        else:
            jax.lax.fori_loop(0, n_super, do_super, 0)
        if any_hit:
            bt_out[:] = bt_in[:]
        else:
            bt_out[:] = bt_s[:]
        be_out[:] = be_s[:]

    return kernel


# --------------------------------------------------------------------------
# supercell-tree kernel (mesh scale): SAH binary tree over 128-prim
# supercells walked with a shared scalar stack per (8,128) ray block —
# near-first, best-t pruned (the TPU shape of bvh.cpp:320-451's stack walk) —
# then 32-prim cell culling inside each DMA'd supercell.  The linear
# supercell scan this replaces touched ~48 supercells per block on grazing
# mesh rays (measured); the descent touches only the near ones.
# --------------------------------------------------------------------------

CELL32 = 32             # prims per cull cell (4 cells per supercell)
TREE_LEAF = 4           # supercells per tree leaf (sah_arrays LEAF_MAX)


def _make_sctree_kernel(tid, width, n_prims, any_hit):
    """Tree-descent kernel over HBM prim tables.

    Scalar-prefetch (SMEM): tree child boxes/links/leaf ranges, the
    supercell order permutation, and 32-prim cell AABBs.  Rays ride lanes;
    prims ride sublanes via (8,1) fetches from the DMA'd supercell buffer.
    State (best_t/best_e) lives in VMEM scratch; the while carry is one
    scalar sp so Mosaic keeps control flow on the scalar core."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    test = PRIM_TESTS[tid]
    tiles_per_cell = CELL32 // 8
    cells_per_super = SUPER // CELL32

    def kernel(boxes, cnode, cstart, ccount, sc_order, cell_boxes, rows,
               ox, oy, oz, dx, dy, dz, tmn, tmx, bt_in, be_in,
               bt_out, be_out, bt_s, be_s, row_buf, dma_sem, stack):
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        invx = _safe_inv(dx[:])
        invy = _safe_inv(dy[:])
        invz = _safe_inv(dz[:])
        bt_s[:] = tmx[:] if any_hit else bt_in[:]
        be_s[:] = be_in[:]
        stack[0] = 0

        def slab(bx, base, near_out=False):
            """Scalar box from SMEM vs the whole (8,128) block."""
            lx, ly, lz = bx[base], bx[base + 1], bx[base + 2]
            ux, uy, uz = bx[base + 3], bx[base + 4], bx[base + 5]
            t0x, t1x = (lx - ox[:]) * invx, (ux - ox[:]) * invx
            t0y, t1y = (ly - oy[:]) * invy, (uy - oy[:]) * invy
            t0z, t1z = (lz - oz[:]) * invz, (uz - oz[:]) * invz
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmn[:]),
            )
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), bt_s[:]),
            )
            hit = near <= far
            if near_out:
                return jnp.any(hit), jnp.min(jnp.where(hit, near, BIG))
            return jnp.any(hit)

        def do_super(si):
            """One supercell: DMA prims, cull 32-prim cells, test tiles."""
            cp = pltpu.make_async_copy(
                rows.at[pl.ds(si * SUPER, SUPER), :], row_buf, dma_sem
            )
            cp.start()
            # cell culling runs off SMEM while the DMA is in flight
            cell_hits = [
                slab(cell_boxes, (si * cells_per_super + k) * 6)
                & (si * SUPER + k * CELL32 < n_prims)
                for k in range(cells_per_super)
            ]
            cp.wait()
            for k in range(cells_per_super):
                @pl.when(cell_hits[k])
                def _(k=k):
                    for s in range(K_SUB):
                        o = (ox[s:s + 1, :], oy[s:s + 1, :], oz[s:s + 1, :])
                        d = (dx[s:s + 1, :], dy[s:s + 1, :], dz[s:s + 1, :])
                        tmin = tmn[s:s + 1, :]
                        for tile in range(tiles_per_cell):
                            buf_p0 = k * CELL32 + tile * 8
                            p0 = si * SUPER + buf_p0

                            def fetch(c, buf_p0=buf_p0):
                                return row_buf[pl.ds(buf_p0, 8), c:c + 1]

                            row_bt = bt_s[s:s + 1, :]
                            limit = tmx[s:s + 1, :] if any_hit else row_bt
                            tt = test(fetch, o, d, tmin, limit)
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
                                    jnp.where(tt == tb, pid, jnp.int32(2 ** 30)),
                                    axis=0, keepdims=True,
                                )
                                better = tb < row_bt
                                bt_s[s:s + 1, :] = jnp.where(better, tb, row_bt)
                                be_s[s:s + 1, :] = jnp.where(
                                    better, eb, be_s[s:s + 1, :]
                                )

        def leaf(node, k):
            start = cstart[node * 2 + k]
            cnt = ccount[node * 2 + k]
            for j in range(TREE_LEAF):
                @pl.when(j < cnt)
                def _(j=j):
                    do_super(sc_order[start + j])

        def body(sp):
            sp1 = sp - 1
            node = stack[sp1]
            c0 = cnode[node * 2]
            c1 = cnode[node * 2 + 1]
            any0, tn0 = slab(boxes, node * 12, near_out=True)
            any1, tn1 = slab(boxes, node * 12 + 6, near_out=True)

            @pl.when(any0 & (c0 < 0))
            def _():
                leaf(node, 0)

            @pl.when(any1 & (c1 < 0))
            def _():
                leaf(node, 1)

            # push inner children, far first so the near child pops next
            push0 = any0 & (c0 >= 0)
            push1 = any1 & (c1 >= 0)
            near0 = tn0 <= tn1
            first_c = jnp.where(near0, c1, c0)
            first_p = jnp.where(near0, push1, push0)
            second_c = jnp.where(near0, c0, c1)
            second_p = jnp.where(near0, push0, push1)
            sp2 = sp1
            stack[jnp.where(first_p, sp2, STACK_DEPTH - 1)] = first_c
            sp2 = sp2 + first_p.astype(jnp.int32)
            stack[jnp.where(second_p, sp2, STACK_DEPTH - 1)] = second_c
            sp2 = sp2 + second_p.astype(jnp.int32)
            sp2 = jnp.minimum(sp2, STACK_DEPTH - 2)
            if any_hit:
                done = (be_s[:] != 0) | (tmx[:] <= tmn[:])
                sp2 = jnp.where(jnp.all(done), 0, sp2)
            return sp2

        jax.lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))
        if any_hit:
            bt_out[:] = bt_in[:]
        else:
            bt_out[:] = bt_s[:]
        be_out[:] = be_s[:]

    return kernel


@functools.lru_cache(maxsize=256)
def _compiled_sctree_call(tid, width, n_prims, any_hit, n_rows):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    grid = (n_rows // K_SUB,)
    ray_spec = pl.BlockSpec(
        (K_SUB, K_LANE), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = pl.BlockSpec(memory_space=pl.ANY)
    kernel = _make_sctree_kernel(tid, width, n_prims, any_hit)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=[table_spec] + [ray_spec] * 10,
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[
            pltpu.VMEM((K_SUB, K_LANE), jnp.float32),
            pltpu.VMEM((K_SUB, K_LANE), jnp.int32),
            pltpu.VMEM((SUPER, K_LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        ],
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


def _sc_tree_layout(g):
    """Supercell SAH tree + 32-prim cell boxes for the HBM descent kernel.
    Host-side, at accel-build time (outside any trace)."""
    import jax.numpy as jnp

    if "_sctree" in g:
        return g["_sctree"]
    from pine_tpu.accel.unified import sah_arrays

    grid_l = _grid_layout(g)
    boxes = g["_prim_aabbs"]  # (E, 6) in leaf order
    E = boxes.shape[0]
    n_super = (E + SUPER - 1) // SUPER
    sb = np.zeros((n_super, 6), np.float32)
    for i in range(n_super):
        seg = boxes[i * SUPER: min((i + 1) * SUPER, E)]
        sb[i, 0:3] = seg[:, 0:3].min(0)
        sb[i, 3:6] = seg[:, 3:6].max(0)
    order, c_lower, c_upper, c_node, c_start, c_count = sah_arrays(
        sb[:, 0:3], sb[:, 3:6], (sb[:, 0:3] + sb[:, 3:6]) * 0.5
    )
    order = np.concatenate(
        [np.asarray(order, np.int32), np.zeros(TREE_LEAF, np.int32)]
    )  # pad: leaf loop reads start+j before gating on count
    tb = np.concatenate(
        [np.asarray(c_lower, np.float32), np.asarray(c_upper, np.float32)],
        axis=-1,
    )  # (M,2,6)
    n_cell = (E + CELL32 - 1) // CELL32
    cells_per_super = SUPER // CELL32
    cb = np.zeros((n_super * cells_per_super, 6), np.float32)
    cb[:, 0:3] = 1.0
    cb[:, 3:6] = -1.0  # never-hit filler; kernel also gates on prim index
    for i in range(n_cell):
        seg = boxes[i * CELL32: min((i + 1) * CELL32, E)]
        cb[i, 0:3] = seg[:, 0:3].min(0)
        cb[i, 3:6] = seg[:, 3:6].max(0)
    g["_sctree"] = dict(
        boxes=jnp.asarray(tb.reshape(-1)),
        cnode=jnp.asarray(np.asarray(c_node, np.int32).reshape(-1)),
        cstart=jnp.asarray(np.asarray(c_start, np.int32).reshape(-1)),
        ccount=jnp.asarray(np.asarray(c_count, np.int32).reshape(-1)),
        sc_order=jnp.asarray(order),
        cell_boxes=jnp.asarray(cb.reshape(-1)),
        table=grid_l["table"],
        n_prims=E,
        width=grid_l["width"],
        depth=_tree_depth(np.asarray(c_node, np.int32)),
    )
    return g["_sctree"]


def _tree_depth(cnode2):
    """Max root->leaf depth of a (M,2) child-index tree (<0 = leaf); host
    numpy.  Consumers size bounded traversal stacks from this."""
    cnode2 = cnode2.reshape(-1, 2)
    depth, frontier = 0, [0]
    while frontier:
        depth += 1
        frontier = [
            int(c) for n in frontier for c in cnode2[n] if c >= 0
        ]
    return depth


def _grid_layout(g):
    """Host-side transposed tables for the grid kernel.  MUST be called at
    accel-build time (outside any trace) — see _group_smem_arrays."""
    import jax.numpy as jnp

    if "_grid" in g:
        return g["_grid"]
    rows = np.asarray(g["rows_np"], np.float32)  # host copy: no d2h readback
    if g["kind"] == "bvh":
        rows = rows[: rows.shape[0] - LEAF_MAX]  # drop builder padding
    E, W = rows.shape
    E_pad = ((E + SUPER - 1) // SUPER) * SUPER
    if _grid_hbm(g):
        # hbm tables DMA one whole 16-supercell coarse group at a time:
        # align to the coarse stride so the last group's slice is in-bounds
        E_pad = ((E_pad + 16 * SUPER - 1) // (16 * SUPER)) * (16 * SUPER)
    table = np.zeros((E_pad, 128), np.float32)
    table[:E, :W] = rows
    # CRITICAL: pad with a replicated VALID row, not zeros.  Zero rows make
    # the tests divide by zero; producing a single NaN/Inf anywhere puts this
    # TPU into a ~1000x slow mode for the rest of the process (measured).
    table[E:, :W] = rows[0]
    # AABB per prim for cells: from the shape's own params we can't cheaply
    # recompute; use stored per-entity AABBs carried by the builder.
    boxes = g["_prim_aabbs"]  # (E, 6) lo,hi in leaf order
    n_super = E_pad // SUPER
    n_super_pad = ((n_super + 15) // 16) * 16
    sb = np.zeros((n_super_pad, 6), np.float32)
    sb[:, 0:3] = 1.0
    sb[:, 3:6] = -1.0  # empty box: never hit
    for i in range(n_super):
        seg = boxes[i * SUPER : min((i + 1) * SUPER, E)]
        if len(seg):
            sb[i, 0:3] = seg[:, 0:3].min(0)
            sb[i, 3:6] = seg[:, 3:6].max(0)
    # coarse level: groups of 16 supercells
    cb = np.zeros((n_super_pad // 16, 6), np.float32)
    cb[:, 0:3] = 1.0
    cb[:, 3:6] = -1.0
    for i in range(len(cb)):
        seg = sb[i * 16 : (i + 1) * 16]
        real = seg[seg[:, 0] <= seg[:, 3]]
        if len(real):
            cb[i, 0:3] = real[:, 0:3].min(0)
            cb[i, 3:6] = real[:, 3:6].max(0)
    def cell_aabbs(cell):
        n_cell = E_pad // cell
        fb = np.zeros((n_cell, 6), np.float32)
        fb[:, 0:3] = 1.0
        fb[:, 3:6] = -1.0
        for i in range((E + cell - 1) // cell):
            seg = boxes[i * cell : min((i + 1) * cell, E)]
            if len(seg):
                fb[i, 0:3] = seg[:, 0:3].min(0)
                fb[i, 3:6] = seg[:, 3:6].max(0)
        return jnp.asarray(fb.reshape(-1))

    def octant_orders(bx, segment=None):
        """Per-octant near-first visit orders by AABB centroid projected on
        the travel diagonal.  Empty (padded) boxes sort last.  segment=k
        sorts independently within each k-long run (supercells must stay
        under their coarse parent)."""
        m = len(bx)
        cxyz = (bx[:, 0:3] + bx[:, 3:6]) * 0.5
        empty = bx[:, 0] > bx[:, 3]
        orders = np.zeros((8, m), np.int32)
        for o in range(8):
            s = np.array([-1.0 if o & 1 else 1.0,
                          -1.0 if o & 2 else 1.0,
                          -1.0 if o & 4 else 1.0], np.float32)
            key = cxyz @ s
            key[empty] = np.inf
            if segment is None:
                orders[o] = np.argsort(key, kind="stable").astype(np.int32)
            else:
                for i in range(0, m, segment):
                    orders[o, i : i + segment] = i + np.argsort(
                        key[i : i + segment], kind="stable"
                    ).astype(np.int32)
        return jnp.asarray(orders.reshape(-1))

    g["_grid"] = dict(
        table=jnp.asarray(table),
        coarse_boxes=jnp.asarray(cb.reshape(-1)),
        sc_boxes=jnp.asarray(sb.reshape(-1)),
        # fine cull levels: SCD_CELL for scdense, CELL32 for the grid kernel
        scd_cell_boxes=cell_aabbs(SCD_CELL),
        cell32_boxes=cell_aabbs(CELL32),
        # near-first scan orders (one per direction octant): coarse boxes
        # globally, supercells within their 16-wide coarse segment
        c_order8=octant_orders(cb),
        s_order8=octant_orders(sb, segment=16),
        n_prims=E, width=W, e_pad=E_pad,
    )
    return g["_grid"]


@functools.lru_cache(maxsize=256)
def _compiled_grid_call(tid, width, n_prims, e_pad, any_hit, n_rows, hbm=False,
                        cells=False, octorder=False, probe="", mxu_m=0):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    grid = (n_rows // K_SUB,)
    ray_spec = pl.BlockSpec(
        (K_SUB, K_LANE), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    if hbm:
        table_spec = pl.BlockSpec(memory_space=pl.ANY)
    else:
        table_spec = pl.BlockSpec(
            (e_pad, K_LANE), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        )
    kernel = _make_grid_kernel(tid, width, n_prims, any_hit, hbm=hbm,
                               cells=cells, octorder=octorder, probe=probe,
                               mxu_m=mxu_m)
    scratch = [
        pltpu.VMEM((K_SUB, K_LANE), jnp.float32),
        pltpu.VMEM((K_SUB, K_LANE), jnp.int32),
    ]
    if mxu_m:
        n_super = (n_prims + SUPER - 1) // SUPER
        buf_rows = (16 * 8) if n_super > 16 else 8  # W strips, 8 rows/supercell
        scratch += [
            pltpu.VMEM((buf_rows, mxu_m * SUPER), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((K_SUB * 8, K_LANE), jnp.float32),  # f_buf
        ]
    elif hbm:
        n_super = (n_prims + SUPER - 1) // SUPER
        buf_rows = (16 * SUPER) if n_super > 16 else SUPER  # coarse-group DMA
        scratch += [
            pltpu.VMEM((buf_rows, K_LANE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6 if octorder else 3,
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


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------

GRID_MAX_PRIMS = 8192  # (E,128) f32 table <= 4 MB VMEM (above: HBM + DMA)
GRID_MAX_PRIMS_HBM = 2_000_000  # supercell boxes must fit SMEM
GRID_CELLS_MAX_PRIMS = 262_144  # CELL32 cull boxes <= ~192 KB of SMEM


def _grid_eligible(g):
    if g["tid"] not in PRIM_TESTS or "_prim_aabbs" not in g:
        return False
    return g["_prim_aabbs"].shape[0] <= GRID_MAX_PRIMS_HBM


def _grid_hbm(g):
    return g["_prim_aabbs"].shape[0] > GRID_MAX_PRIMS


def group_supports_pallas(g):
    """Eligibility: a scalar test exists and tables fit on-chip budgets."""
    if g.get("kind") == "instanced":
        return False  # two-level instancing runs the XLA packet walk
    if g["tid"] not in PRIM_TESTS:
        return False
    if g.get("lattice") is not None:
        return True  # params reconstructed arithmetically: no table budget
    if _grid_eligible(g):
        return True
    nbytes = g["rows"].size * 4
    if g["kind"] == "bvh":
        nbytes += g["c_lower"].size * 4 * 2 + g["c_node"].size * 4 * 3
    return nbytes <= SMEM_BUDGET


def _group_smem_arrays(g):
    """Flatten group tables into SMEM layout.  MUST be called at accel-build
    time (outside any trace): the jnp arrays land in the group dict where the
    capture walker (core/capture.py) finds them, so they reach jit as
    arguments — a captured device constant poisons the TPU dispatch path."""
    import jax.numpy as jnp

    if "_smem" in g:
        return g["_smem"]
    # use the host-side copies: reading back a device array (np.asarray on a
    # jnp array) ALSO poisons the dispatch path
    rows = np.asarray(g["rows_np"], np.float32)
    width = rows.shape[1]
    smem = dict(rows=jnp.asarray(rows.reshape(-1)), width=width)
    if g["kind"] == "bvh":
        nn = g["nodes_np"]
        cl = np.asarray(nn["c_lower"], np.float32)  # (M,2,3)
        cu = np.asarray(nn["c_upper"], np.float32)
        smem["boxes"] = jnp.asarray(np.concatenate([cl, cu], axis=-1).reshape(-1))
        smem["cnode"] = jnp.asarray(np.asarray(nn["c_node"], np.int32).reshape(-1))
        smem["cstart"] = jnp.asarray(np.asarray(nn["c_start"], np.int32).reshape(-1))
        smem["ccount"] = jnp.asarray(np.asarray(nn["c_count"], np.int32).reshape(-1))
    g["_smem"] = smem
    return smem


def _smem_gbox(g):
    """Group bounds for the dense kernel's per-block cull, computed lazily
    (only the dense call path reads it — bvh-kind groups skip it unless an
    env override forces them onto the dense sweep).  MUST be called at
    accel-build or first-query time outside a trace, same rule as
    _group_smem_arrays.  Groups without recorded prim AABBs get an unbounded
    box (cull never fires)."""
    import jax.numpy as jnp

    if "_smem_gbox" in g:
        return g["_smem_gbox"]
    pa = g.get("_prim_aabbs")
    if pa is not None and len(pa):
        pa = np.asarray(pa, np.float32)
        gbox = np.concatenate([pa[:, 0:3].min(0), pa[:, 3:6].max(0)])
    else:
        gbox = np.array([-BIG] * 3 + [BIG] * 3, np.float32)
    g["_smem_gbox"] = jnp.asarray(gbox)
    return g["_smem_gbox"]


@functools.lru_cache(maxsize=256)
def _compiled_call(tid, width, kind, n_prims, any_hit, n_rows, probe=False):
    """Build the pallas_call for a given group signature; n_rows = rays/128."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    grid = (n_rows // K_SUB,)
    # with scalar prefetch, index maps receive the scalar refs as extra args
    ray_spec = pl.BlockSpec(
        (K_SUB, K_LANE), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    n_ray_ops = 10  # ox..tmx, bt, be

    if kind == "bvh":
        kernel = _make_bvh_kernel(tid, width, any_hit)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[ray_spec] * n_ray_ops,
            out_specs=(ray_spec, ray_spec),
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        )
    else:
        kernel = _make_dense_kernel(tid, width, n_prims, any_hit, probe=probe)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # gbox, rows
            grid=grid,
            in_specs=[ray_spec] * n_ray_ops,
            out_specs=(ray_spec, ray_spec),
        )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, K_LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, K_LANE), jnp.int32),
        ),
        interpret=jax.default_backend() == "cpu",  # CPU: correctness only
    )
    return call


DENSE_DEFAULT_MAX = 512  # honest A/B (STATUS r4): dense beats grid <= ~0.5k


def _group_variant(g):
    """Default kernel choice for a group (overridable via env for A/B).

    Defaults come from honest sync-dispatch A/Bs on the real chip
    (scripts_render_ab.py / scripts_kernel_lab.py): small analytic groups run
    fastest as a straight SMEM-broadcast dense sweep (cbox 424-cone group:
    dense 3.66s vs grid 4.89s vs mxu 4.81s vs mxup 9.83s render wall);
    mid-size groups keep the culled grid kernel; mesh-scale (HBM) groups run
    the grid kernel's per-taken-supercell MXU matmul mode when the prim type
    has a coefficient table (terrain 12.0s vs 13.5s plain grid).

    Groups detected as regular lattices (packet._detect_lattice) default to
    the arithmetic-reconstruction lattice kernel at any size; the usual
    PINE_SMALL_KERNEL / PINE_MESH_KERNEL knobs still override for A/B, and
    PINE_LATTICE=0 disables detection at build time."""
    import os

    if g.get("lattice") is not None:
        ov = os.environ.get(
            "PINE_MESH_KERNEL"
            if (_grid_eligible(g) and _grid_hbm(g))
            else "PINE_SMALL_KERNEL"
        )
        if ov:
            return ov
        # honest cbox A/B (r5, scripts_render_ab.py cbox-lattice): at 420
        # prims the group-AABB-culled dense sweep ties the lattice march
        # (3.26s vs 3.34s render wall), so small fields keep dense; above
        # the dense cutoff the lattice kernel replaces the grid kernel's
        # table sweeps with ~K*K arithmetic tests per window regardless of
        # field size
        n = int(g["rows_np"].shape[0])
        if n > DENSE_DEFAULT_MAX:
            return "lattice"
    if _grid_eligible(g):
        if _grid_hbm(g):
            # r4 A/Bs (sorted terrain render wall): mxu-in-grid 12.0s vs
            # cell-culled grid scan 13.5s vs sctree 14.9s; grid also compiles
            # ~3x faster than sctree (40s vs 122s).  The matmul mode needs a
            # coefficient table for the prim type; fall back to the plain
            # grid scan for types without one.
            from pine_tpu.accel import mxu_sweep

            default = "mxu" if mxu_sweep.supports(g["tid"]) else "grid"
            return os.environ.get("PINE_MESH_KERNEL", default)
        small = os.environ.get("PINE_SMALL_KERNEL")
        if small:
            return small
        n = int(g["rows_np"].shape[0])
        return "dense" if n <= DENSE_DEFAULT_MAX else "grid"
    return g["kind"]  # smem bvh walk or smem dense


def pallas_group_query(g, ro, rd, tmin, tmax, best_t, best_e, any_hit=False,
                       variant=None):
    """Run one group's Pallas kernel over a flat wavefront.

    closest-hit: best_e carries LOCAL slot ids on input for this group's rows
    (caller translates via base); returns (best_t, best_e_local).
    any-hit: best_e in/out is the 0/1 occlusion flag; best_t passes through.
    variant: force a kernel ("grid", "sctree", "dense", "bvh"); None = auto.
    """
    import jax.numpy as jnp

    if variant is None:
        variant = _group_variant(g)
    mesh_mxu = False
    if variant in ("mxu", "mxup"):
        from pine_tpu.accel import mxu_sweep

        if mxu_sweep.supports(g["tid"]) and not _grid_hbm(g):
            # matmul formulation works on the flat wavefront directly (no
            # (8,128) packeting); the dot lowers to the MXU.  "mxu" = plain
            # XLA (pair matrix round-trips HBM); "mxup" = fused Pallas
            # (matmul + epilogue + reduction stay in VMEM)
            fn = (
                mxu_sweep.group_query_fused
                if variant == "mxup" else mxu_sweep.group_query
            )
            return fn(g, ro, rd, tmin, tmax, best_t, best_e, any_hit)
        if mxu_sweep.supports(g["tid"]) and _grid_eligible(g):
            # mesh scale (PINE_MESH_KERNEL=mxu): grid kernel with per-taken-
            # supercell matmul testing
            mesh_mxu = True
            variant = "grid"
        else:
            n_rows = int(g["rows_np"].shape[0])
            variant = "dense" if n_rows <= DENSE_DEFAULT_MAX else "grid"
    if variant == "lattice" and g.get("lattice") is None:
        # forced via env on a non-lattice group: fall back to the size default
        n_rows = int(g["rows_np"].shape[0])
        variant = "dense" if n_rows <= DENSE_DEFAULT_MAX else "grid"

    n = ro.shape[0]
    n_pad = ((n + KP - 1) // KP) * KP
    R = n_pad // K_LANE

    def prep(x, fill):
        x = jnp.asarray(x, jnp.float32) if x.dtype != jnp.int32 else x
        if n_pad != n:
            pad = jnp.full((n_pad - n,), fill, x.dtype)
            x = jnp.concatenate([x, pad])
        return x.reshape(R, K_LANE)

    args = (
        prep(ro[:, 0], 0.0), prep(ro[:, 1], 0.0), prep(ro[:, 2], 0.0),
        prep(rd[:, 0], 1.0), prep(rd[:, 1], 0.0), prep(rd[:, 2], 0.0),
        prep(tmin, 0.0), prep(tmax, -1.0),
        prep(best_t, -1.0), prep(best_e, 0),
    )
    if variant == "lattice":
        lat = _lattice_smem(g)
        call = _compiled_lattice_call(
            g["tid"], int(g["rows_np"].shape[1]), lat["ni"], lat["nj"],
            lat["K"], lat["_max_seg"], any_hit, R,
        )
        out_t, out_e = call(_smem_gbox(g), lat["_latf"], *args)
        out_t = out_t.reshape(-1)[:n]
        out_e = out_e.reshape(-1)[:n]
        if not any_hit:
            # kernel reports the LATTICE index k = i*nj + j; translate into
            # this group's SAH row order (ordinary XLA gather).  Lanes the
            # kernel did not improve hold a passthrough id and gather
            # garbage — the caller masks on t_new < best_t (see
            # packet_intersect), so only improved lanes' ids are consumed.
            slot = lat["_slot"]
            out_e = jnp.take(slot, jnp.clip(out_e, 0, slot.shape[0] - 1))
        return out_t, out_e
    if variant == "sctree":
        tl = _sc_tree_layout(g)
        call = _compiled_sctree_call(
            g["tid"], tl["width"], tl["n_prims"], any_hit, R
        )
        out_t, out_e = call(
            tl["boxes"], tl["cnode"], tl["cstart"], tl["ccount"],
            tl["sc_order"], tl["cell_boxes"], tl["table"], *args,
        )
        return out_t.reshape(-1)[:n], out_e.reshape(-1)[:n]
    if variant == "grid":
        import os

        grid_l = _grid_layout(g)
        # cell-level culling needs CELL32 boxes resident in SMEM; cap them
        cells = grid_l["n_prims"] <= GRID_CELLS_MAX_PRIMS
        hbm = _grid_hbm(g)
        mxum = None
        if mesh_mxu and hbm:
            from pine_tpu.accel import mxu_sweep

            # tables are prebuilt at accel-build time (packet.py hook);
            # this lookup must not create device arrays inside a trace
            mxum = mxu_sweep.build_mesh_tables(g, grid_l["e_pad"], SUPER)
            cells = False  # subsumed: the matmul tests the whole supercell
        # near-first octant-ordered scan: mesh-scale groups (which have the
        # coarse level the ordering rides on); PINE_OCTORDER=0 disables
        octorder = (
            hbm
            and grid_l["e_pad"] // SUPER > 16  # kernel's use_coarse condition
            and os.environ.get("PINE_OCTORDER", "1") != "0"
        )
        call = _compiled_grid_call(
            g["tid"], grid_l["width"], grid_l["n_prims"],
            grid_l["e_pad"], any_hit, R, hbm=hbm, cells=cells,
            octorder=octorder,
            # timing decomposition for the kernel lab ONLY (wrong results):
            # "slabs" = culls without prim work; "nodma" = prim work on a
            # stale buffer (no per-supercell DMA serialization)
            probe=os.environ.get("PINE_GRID_PROBE", ""),
            mxu_m=(mxum["m"] if mxum else 0),
        )
        table = mxum["Wm"] if mxum else grid_l["table"]
        if octorder:
            # dominant direction octant per (8,128)-ray block, from the
            # block's first lane (the coherence sort makes blocks
            # octant-uniform; boundary blocks just get a harmless order)
            n_blocks = R // K_SUB
            first = jnp.minimum(
                jnp.arange(n_blocks, dtype=jnp.int32) * KP, n - 1
            )
            d0 = rd[first]
            blk_oct = (
                (d0[:, 0] < 0).astype(jnp.int32)
                + 2 * (d0[:, 1] < 0).astype(jnp.int32)
                + 4 * (d0[:, 2] < 0).astype(jnp.int32)
            )
            out_t, out_e = call(
                grid_l["coarse_boxes"], grid_l["sc_boxes"],
                grid_l["cell32_boxes"], grid_l["c_order8"],
                grid_l["s_order8"], blk_oct, table, *args,
            )
        else:
            out_t, out_e = call(
                grid_l["coarse_boxes"], grid_l["sc_boxes"],
                grid_l["cell32_boxes"], table, *args,
            )
        return out_t.reshape(-1)[:n], out_e.reshape(-1)[:n]
    if variant == "scdense":
        grid_l = _grid_layout(g)
        smem = _group_smem_arrays(g)
        call = _compiled_scdense_call(
            g["tid"], smem["width"], grid_l["n_prims"], any_hit, R
        )
        out_t, out_e = call(
            grid_l["sc_boxes"], grid_l["scd_cell_boxes"], smem["rows"], *args
        )
        return out_t.reshape(-1)[:n], out_e.reshape(-1)[:n]

    import os as _os

    smem = _group_smem_arrays(g)
    call = _compiled_call(
        g["tid"], smem["width"], variant,
        0 if variant == "bvh" else int(g["rows_np"].shape[0]),
        any_hit, R,
        probe=(
            variant != "bvh"
            and _os.environ.get("PINE_DENSE_PROBE", "") == "sweepmark"
        ),
    )
    if variant == "bvh":
        out_t, out_e = call(
            smem["boxes"], smem["cnode"], smem["cstart"], smem["ccount"],
            smem["rows"], *args,
        )
    else:
        out_t, out_e = call(_smem_gbox(g), smem["rows"], *args)
    return out_t.reshape(-1)[:n], out_e.reshape(-1)[:n]
