"""Ray-primitive intersection as MXU matmuls (dense small-group sweeps).

The SMEM-broadcast dense kernel (pallas_traverse._make_dense_kernel) is a
pure-VPU sweep: every primitive costs ~35 unrolled vector ops plus 8 scalar
fetch+splat rounds, and the kernel-lab probe shows its real cost is ~250
VPU-cycles per prim-block — far above the arithmetic floor.  This module
moves the ray-primitive DOT PRODUCTS (the bulk of each analytic test, and
all of the fetch overhead) to the MXU: every supported test factors into

    per-pair values  =  F  @  W          (rays x 8) @ (8 x m*C) matmul
    t, ok            =  cheap vectorized epilogue over the (rays, C) pairs
    best             =  min / argmin over the primitive axis

where F = [d, o, 1, 0] per ray and W packs per-primitive coefficient
columns (built host-side at accel-build time).  Geometric identities fold
every per-primitive constant into W:

- cone (geometry.cpp:409-464): scaling the axis by sqrt(A2) absorbs the
  aperture A2 into the quadratic (a = d.d - (d.n')^2 etc.) and turns the
  height bound into h' = h*sqrt(A2);
- triangle: the plane+dual-edge-basis form (t from the geometric normal,
  u = (h-v0).s1 with s1 = (e2 x ng)/|ng|^2) replaces Moller-Trumbore,
  whose per-pair cross products are not bilinear in (ray, tri);
- rect/disk/plane/sphere: direct expansion of (o - p) dots.

Numerics: the matmul form computes o.n - p.n instead of (o - p).n, so
results differ from the VPU kernels in float ULPs (not bit-identical);
parity tests use tolerances.  Types whose tests are slab-based (AABB, OBB,
cylinder axis clamp) stay on the VPU kernels.

This is the plain-XLA formulation (matmul on the MXU, fused epilogue +
reduction from XLA); selected via PINE_SMALL_KERNEL=mxu for A/B against
the dense/scdense/grid kernels on the real chip.
"""
from __future__ import annotations

import functools

import numpy as np

from pine_tpu.scene import shapes as S


def mxu_precision():
    """Matmul precision for the intersection coefficient contractions.

    TPU matmuls round f32 inputs to bf16 by default — far outside the parity
    tolerance for intersection t.  HIGHEST (6 bf16 passes) recovers full f32;
    HIGH (3 passes) recovers ~f32 for well-conditioned 8-deep dots at up to
    2x the MXU throughput.  Honest r5 terrain A/B: wall 11.86 s (high) vs
    11.87 s (highest) with bit-identical images — the 8-deep contraction is
    nowhere near the terrain bottleneck, so the default stays exact and the
    knob exists for future matmul-bound scenes."""
    import os

    import jax

    return (
        jax.lax.Precision.HIGH
        if os.environ.get("PINE_MXU_PRECISION", "highest") == "high"
        else jax.lax.Precision.HIGHEST
    )

BIG = 1e30
RAY_FEATS = 8  # [dx,dy,dz, ox,oy,oz, 1, pad]

# per-type pair-value counts (columns of W are value-major: W[:, v*C:(v+1)*C])
MXU_M = {
    S.SPHERE: 2,
    S.RECT: 6,
    S.DISK: 4,
    S.PLANE: 2,
    S.TRIANGLE: 6,
    S.CONE: 5,
}


def supports(tid: int) -> bool:
    return tid in MXU_M


def _w_cols(C, vals):
    """Stack per-value (8, C) blocks into W (8, m*C)."""
    return np.concatenate(vals, axis=1).astype(np.float32)


def _lin(d_coef, o_coef, const):
    """One value column block: value = d.d_coef + o.o_coef + const."""
    C = const.shape[0]
    w = np.zeros((RAY_FEATS, C), np.float32)
    w[0:3] = d_coef.T
    w[3:6] = o_coef.T
    w[6] = const
    return w


def build_tables(g) -> dict:
    """Host-side W for a group; cached in g['_mxu'] (jnp array built OUTSIDE
    any trace so the capture walker passes it as a jit argument)."""
    if "_mxu" in g:
        return g["_mxu"]
    import jax.numpy as jnp

    W = _build_w(g["tid"], np.asarray(g["rows_np"], np.float64))
    g["_mxu"] = dict(W=jnp.asarray(W), m=MXU_M[g["tid"]], C=W.shape[1] // MXU_M[g["tid"]])
    return g["_mxu"]


def _build_w(tid, rows):
    """(8, m*C) coefficient table from f64 host rows (value-major)."""
    C = rows.shape[0]
    z3 = np.zeros((C, 3))
    z1 = np.zeros(C)

    if tid == S.CONE:
        # rows: [apex(3), n(3), A2, A, S, r, h, 0]
        apex, n, A2, h = rows[:, 0:3], rows[:, 3:6], rows[:, 6], rows[:, 10]
        sa = np.sqrt(np.maximum(A2, 0.0))
        np_ = n * sa[:, None]  # n' = sqrt(A2) * n
        W = _w_cols(C, [
            _lin(np_, z3, z1),                                   # dn'
            _lin(z3, np_, -(apex * np_).sum(1)),                 # on'
            _lin(apex, z3, z1),                                  # pd = p.d
            _lin(z3, -2.0 * apex, (apex * apex).sum(1)),         # op
            _lin(z3, z3, h * sa),                                # h'
        ])
    elif tid == S.SPHERE:
        # rows: [c(3), r]
        c, r = rows[:, 0:3], rows[:, 3]
        W = _w_cols(C, [
            _lin(c, z3, z1),                                     # cd = c.d
            _lin(z3, -2.0 * c, (c * c).sum(1) - r * r),          # op (incl -r^2)
        ])
    elif tid == S.RECT:
        # rows: [p(3), ex_hat(3), ey_hat(3), n(3), lx, ly, flip]
        p, n = rows[:, 0:3], rows[:, 9:12]
        exp = rows[:, 3:6] / np.maximum(rows[:, 12:13], 1e-20)   # ex_hat/lx
        eyp = rows[:, 6:9] / np.maximum(rows[:, 13:14], 1e-20)
        W = _w_cols(C, [
            _lin(z3, -n, (p * n).sum(1)),                        # tnum = p.n - o.n
            _lin(n, z3, z1),                                     # dn
            _lin(z3, exp, -(p * exp).sum(1)),                    # oex
            _lin(exp, z3, z1),                                   # dex
            _lin(z3, eyp, -(p * eyp).sum(1)),                    # oey
            _lin(eyp, z3, z1),                                   # dey
        ])
    elif tid == S.DISK:
        # rows: [p(3), n(3), u(3), v(3), r]
        p, n, r = rows[:, 0:3], rows[:, 3:6], rows[:, 12]
        W = _w_cols(C, [
            _lin(z3, -n, (p * n).sum(1)),                        # tnum
            _lin(n, z3, z1),                                     # dn
            _lin(p, z3, z1),                                     # pd
            _lin(z3, -2.0 * p, (p * p).sum(1) - r * r),          # op (incl -r^2)
        ])
    elif tid == S.PLANE:
        p, n = rows[:, 0:3], rows[:, 3:6]
        W = _w_cols(C, [
            _lin(z3, -n, (p * n).sum(1)),                        # tnum
            _lin(n, z3, z1),                                     # dn
        ])
    elif tid == S.TRIANGLE:
        # rows: [v0(3), v1(3), v2(3), n(3)]
        v0, v1, v2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
        e1, e2 = v1 - v0, v2 - v0
        ng = np.cross(e1, e2)
        ng2 = (ng * ng).sum(1)
        ok = ng2 > 1e-30
        inv = np.where(ok, 1.0 / np.maximum(ng2, 1e-30), 0.0)
        # degenerate tris: s1=s2=0 and ng=0 -> dng==0 -> miss (MT: det==0)
        ngz = np.where(ok[:, None], ng, 0.0)
        s1 = np.cross(e2, ng) * inv[:, None]
        s2 = np.cross(ng, e1) * inv[:, None]
        W = _w_cols(C, [
            _lin(ngz, z3, z1),                                   # dng
            _lin(z3, -ngz, (v0 * ngz).sum(1)),                   # tnum
            _lin(z3, s1, -(v0 * s1).sum(1)),                     # os1
            _lin(s1, z3, z1),                                    # ds1
            _lin(z3, s2, -(v0 * s2).sum(1)),                     # os2
            _lin(s2, z3, z1),                                    # ds2
        ])
    else:
        raise ValueError(f"mxu_sweep does not support tid {tid}")

    return W


def _pair_t(tid, P, m, C, odr, oor, ddr, tmin, limit):
    """Per-pair t (n, C) from the matmul result; BIG where miss."""
    def val(v):
        return P[:, v * C:(v + 1) * C]

    return _pair_t_vals(tid, val, odr, oor, ddr, tmin, limit)


def _pair_t_vals(tid, val, odr, oor, ddr, tmin, limit):
    """Epilogue on pair values fetched through `val(v)`: works for both the
    lanes-major (n, m*C) layout (val = column slice) and the mesh kernel's
    prims-major (m*SUPER, 128) layout (val = row-block slice)."""
    import jax.numpy as jnp

    if tid == S.CONE:
        dn, on, pd, op, hp = (val(v) for v in range(5))
        od = odr - pd
        oo = oor + op
        a = ddr - dn * dn
        b = 2.0 * (od - on * dn)
        c = oo - on * on
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        a_safe = jnp.where(a == 0.0, 1e-6, a)
        t0 = (-b - sq) / (2.0 * a_safe)
        t = jnp.where(t0 < tmin, t0 + sq / a_safe, t0)
        height = on + t * dn
        ok = (disc > 0.0) & (height < 0.0) & (height >= -hp)
    elif tid == S.SPHERE:
        cd, op = val(0), val(1)
        b = odr - cd
        cc = oor + op
        disc = b * b - cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t = jnp.where(t0 < tmin, -b + sq, t0)
        ok = disc > 0.0
    elif tid == S.RECT:
        tnum, dn, oex, dex, oey, dey = (val(v) for v in range(6))
        denom = jnp.where(dn == 0.0, 1e-12, dn)
        t = tnum / denom
        u = oex + t * dex
        v = oey + t * dey
        ok = (jnp.abs(u) <= 0.5) & (jnp.abs(v) <= 0.5)
    elif tid == S.DISK:
        tnum, dn, pd, op = (val(v) for v in range(4))
        denom = jnp.where(dn == 0.0, 1e-12, dn)
        t = tnum / denom
        # |o + t d - p|^2 - r^2 = (oo' - r^2) + 2 t od' + t^2 d.d
        f = (oor + op) + 2.0 * t * (odr - pd) + t * t * ddr
        ok = f <= 0.0
    elif tid == S.PLANE:
        tnum, dn = val(0), val(1)
        denom = jnp.where(dn == 0.0, 1e-12, dn)
        t = tnum / denom
        ok = jnp.ones_like(t, bool)
    elif tid == S.TRIANGLE:
        dng, tnum, os1, ds1, os2, ds2 = (val(v) for v in range(6))
        denom = jnp.where(dng == 0.0, 1e-12, dng)
        t = tnum / denom
        u = os1 + t * ds1
        v = os2 + t * ds2
        ok = (dng != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    else:
        raise ValueError(tid)
    return jnp.where(ok & (t > tmin) & (t < limit), t, BIG)


C_TILE = 128  # primitive columns per in-kernel matmul tile
KP = 1024  # rays per grid step (one (8,128)-block of lanes -> 1024 F rows)
INT_BIG = np.int32(2**30)


def build_tiled_tables(g) -> dict:
    """W re-laid out tile-major for the fused Pallas kernel: per C-tile of
    128 prims the m value-columns sit contiguous, so the kernel's tile loop
    slices one (8, m*128) strip per matmul.  Cached as g['_mxut']."""
    if "_mxut" in g:
        return g["_mxut"]
    import jax.numpy as jnp

    tab = build_tables(g)
    m, C = tab["m"], tab["C"]
    W = np.asarray(tab["W"])  # (8, m*C) value-major
    n_tiles = (C + C_TILE - 1) // C_TILE
    C_pad = n_tiles * C_TILE
    Wt = np.zeros((RAY_FEATS, n_tiles * m * C_TILE), np.float32)
    for ct in range(n_tiles):
        for v in range(m):
            src = W[:, v * C + ct * C_TILE: v * C + min((ct + 1) * C_TILE, C)]
            dst0 = (ct * m + v) * C_TILE
            Wt[:, dst0:dst0 + src.shape[1]] = src
    g["_mxut"] = dict(W=jnp.asarray(Wt), m=m, C=C, n_tiles=n_tiles, C_pad=C_pad)
    return g["_mxut"]


def build_mesh_tables(g, e_pad, super_sz) -> dict:
    """W for mesh-scale (HBM) groups, supercell-major: row block
    [si*8, si*8+8) holds supercell si's (8, m*super_sz) coefficient strip
    (value-major within the supercell), so the grid kernel DMAs one strip
    (or one 16-supercell coarse group of strips) alongside its slab culls
    and tests all `super_sz` prims with one MXU matmul per live sublane row.

    Rows beyond the real prim count replicate prim 0's coefficients (valid
    garbage — a NaN/Inf anywhere puts this TPU into a ~1000x slow mode; the
    kernel masks pad prims by index).  Cached as g['_mxum'].
    """
    if "_mxum" in g:
        return g["_mxum"]
    import jax.numpy as jnp

    from pine_tpu.accel.pallas_traverse import LEAF_MAX

    rows = np.asarray(g["rows_np"], np.float64)
    if g["kind"] == "bvh":
        # drop builder pad rows exactly as _grid_layout does: W prim order
        # must match the grid kernel's supercell/cell boxes and entity ids
        rows = rows[: rows.shape[0] - LEAF_MAX]
    m = MXU_M[g["tid"]]
    W = _build_w(g["tid"], rows)  # (8, m*C) value-major
    C = rows.shape[0]
    n_super = e_pad // super_sz
    Wp = np.empty((RAY_FEATS, m * e_pad), np.float32)
    for v in range(m):
        Wp[:, v * e_pad: v * e_pad + C] = W[:, v * C:(v + 1) * C]
        Wp[:, v * e_pad + C: (v + 1) * e_pad] = W[:, v * C: v * C + 1]
    # (8, m, n_super, S) -> (n_super, 8, m, S) -> (n_super*8, m*S)
    Wm = (
        Wp.reshape(RAY_FEATS, m, n_super, super_sz)
        .transpose(2, 0, 1, 3)
        .reshape(n_super * RAY_FEATS, m * super_sz)
    )
    g["_mxum"] = dict(Wm=jnp.asarray(Wm), m=m, C=C)
    return g["_mxum"]


def _make_fused_kernel(tid, m, C, n_tiles, any_hit):
    """Pallas kernel: per 1024-ray block, loop C-tiles of 128 prims; each
    tile is one (1024,8)@(8,m*128) MXU matmul + vectorized epilogue; the
    running per-lane best collapses to a final cross-lane min/argmin."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(w_ref, f_ref, sc_ref, bt_out, be_out):
        # passthrough first: all-dead blocks (limit <= tmin on every lane —
        # dead lanes carry -1, and the coherence sort packs them together)
        # skip the whole sweep via @pl.when
        tmin = sc_ref[:, 3:4]
        limit = sc_ref[:, 4:5]
        bt_out[:] = sc_ref[:, 5:6]
        be_out[:] = sc_ref[:, 6:7].astype(jnp.int32)

        @pl.when(jnp.any(limit > tmin))
        def _():
            F = f_ref[:]  # (KP, 8)
            # per-ray scalars: [odr, oor, ddr, tmin, limit, best_t, best_e]
            odr = sc_ref[:, 0:1]
            oor = sc_ref[:, 1:2]
            ddr = sc_ref[:, 2:3]
            bt_run = jnp.full((KP, C_TILE), BIG, jnp.float32)
            be_run = jnp.full((KP, C_TILE), INT_BIG, jnp.int32)
            lane = jax.lax.broadcasted_iota(jnp.int32, (KP, C_TILE), 1)
            for ct in range(n_tiles):
                strip = w_ref[:, ct * m * C_TILE:(ct + 1) * m * C_TILE]
                # HIGHEST: TPU matmul default rounds inputs to bf16;
                # intersection coefficients need the full f32 mantissa
                # (t errors would reach ~1e-2 relative, far outside the
                # parity tolerance)
                P = jnp.dot(
                    F, strip, preferred_element_type=jnp.float32,
                    precision=mxu_precision(),
                )
                t = _pair_t(
                    tid, P, m, C_TILE, odr, oor, ddr, tmin, limit
                )
                # pad prims (zero columns) produce garbage t: mask them
                if (ct + 1) * C_TILE > C:
                    t = jnp.where(lane < C - ct * C_TILE, t, BIG)
                better = t < bt_run
                bt_run = jnp.where(better, t, bt_run)
                be_run = jnp.where(better, ct * C_TILE + lane, be_run)
            if any_hit:
                occ = jnp.max(
                    jnp.where(bt_run < BIG, 1, 0), axis=1, keepdims=True
                )
                be_out[:] = jnp.maximum(
                    sc_ref[:, 6:7].astype(jnp.int32), occ
                )
            else:
                t_min = jnp.min(bt_run, axis=1, keepdims=True)
                e_min = jnp.min(
                    jnp.where(bt_run <= t_min, be_run, INT_BIG),
                    axis=1, keepdims=True,
                )
                bt_in = sc_ref[:, 5:6]
                be_in = sc_ref[:, 6:7].astype(jnp.int32)
                win = t_min < bt_in
                bt_out[:] = jnp.where(win, t_min, bt_in)
                be_out[:] = jnp.where(win, e_min, be_in)

    return kernel


@functools.lru_cache(maxsize=256)
def _compiled_fused_call(tid, m, C, n_tiles, any_hit, n_blocks):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_fused_kernel(tid, m, C, n_tiles, any_hit)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (RAY_FEATS, n_tiles * m * C_TILE), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((KP, RAY_FEATS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((KP, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * KP, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * KP, 1), jnp.int32),
        ),
        interpret=jax.default_backend() == "cpu",
    )


def group_query_fused(g, ro, rd, tmin, tmax, best_t, best_e, any_hit=False):
    """Fused-Pallas variant: matmul + epilogue + reduction in VMEM, one HBM
    round-trip for the whole sweep (PINE_SMALL_KERNEL=mxup)."""
    import jax.numpy as jnp

    tab = build_tiled_tables(g)
    tid, m, C, n_tiles = g["tid"], tab["m"], tab["C"], tab["n_tiles"]
    n = ro.shape[0]
    n_pad = ((n + KP - 1) // KP) * KP
    n_blocks = n_pad // KP

    def pad(x, fill):
        if n_pad == n:
            return x
        shape = (n_pad - n,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)])

    ro_p, rd_p = pad(ro, 0.0), pad(rd, 1.0)
    F = jnp.concatenate(
        [rd_p, ro_p, jnp.ones((n_pad, 1), jnp.float32),
         jnp.zeros((n_pad, 1), jnp.float32)], axis=1,
    )
    limit = tmax if any_hit else best_t
    sc = jnp.stack(
        [
            jnp.sum(ro_p * rd_p, axis=1),
            jnp.sum(ro_p * ro_p, axis=1),
            jnp.sum(rd_p * rd_p, axis=1),
            pad(tmin, 0.0),
            pad(limit, -1.0),
            pad(best_t, BIG),
            pad(best_e.astype(jnp.float32), 0.0),
            jnp.zeros(n_pad, jnp.float32),
        ],
        axis=1,
    )
    call = _compiled_fused_call(tid, m, C, n_tiles, any_hit, n_blocks)
    out_t, out_e = call(tab["W"], F, sc)
    return out_t[:n, 0], out_e[:n, 0]


def group_query(g, ro, rd, tmin, tmax, best_t, best_e, any_hit=False):
    """Flat-wavefront group sweep; same contract as pallas_group_query.

    closest-hit: (best_t, best_e_local); any-hit: best_e is the 0/1
    occlusion flag and best_t passes through.
    """
    import jax.numpy as jnp

    tab = build_tables(g)
    tid, m, C = g["tid"], tab["m"], tab["C"]
    n = ro.shape[0]

    F = jnp.concatenate(
        [rd, ro, jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 1), jnp.float32)],
        axis=1,
    )
    import jax

    # (n, m*C); HIGHEST keeps f32 inputs exact on the MXU (default is bf16)
    P = jnp.dot(
        F, tab["W"], preferred_element_type=jnp.float32,
        precision=mxu_precision(),
    )

    odr = jnp.sum(ro * rd, axis=1, keepdims=True)
    oor = jnp.sum(ro * ro, axis=1, keepdims=True)
    ddr = jnp.sum(rd * rd, axis=1, keepdims=True)
    tmin_c = tmin[:, None]
    limit = (tmax if any_hit else best_t)[:, None]

    t = _pair_t(tid, P, m, C, odr, oor, ddr, tmin_c, limit)  # (n, C)

    if any_hit:
        occ = jnp.max(jnp.where(t < BIG, 1, 0), axis=1)
        return best_t, jnp.maximum(best_e, occ)
    t_min = jnp.min(t, axis=1)
    e_min = jnp.argmin(t, axis=1).astype(best_e.dtype)
    better = t_min < best_t
    return (
        jnp.where(better, t_min, best_t),
        jnp.where(better, e_min, best_e),
    )
