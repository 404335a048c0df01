"""Honest instanced-kernel microbenchmark on the real chip.

Times inst_kernel_intersect / inst_kernel_any_hit directly (sync dispatch,
real fences), chaining K dependent calls in one jit program so XLA cannot
CSE them — per-call walls without the renderer around them.

Ray sets mirror scripts_inst_count.py: exact camera rays (d0), cosine
bounce rays from the real first hits (d1), NEE rays toward the bench light
(nee), plus the origin-major sorted variant of d1 (d1osort).

  python scripts_inst_lab.py [--big]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def build_raysets(scene, cscene, W, H, n=65536):
    import jax.numpy as jnp

    from pine_tpu.accel import packet as PK
    from pine_tpu.core.camera import gen_rays
    from pine_tpu.integrators.path import tile_order

    accel = cscene.unified
    perm = tile_order(W, H)[:n]
    ys, xs = np.divmod(perm, W)
    pf = jnp.stack(
        [(jnp.asarray(xs) + 0.5) / W, (jnp.asarray(ys) + 0.5) / H], -1
    )
    cp = scene.camera.params()
    ro, rd = gen_rays(cp, pf, jnp.zeros((n, 2), jnp.float32))
    tmin = np.zeros(n, np.float32)
    tmax = np.full(n, 1e30, np.float32)

    t, ent = PK.packet_intersect(
        accel, ro, rd, jnp.asarray(tmin), jnp.asarray(tmax)
    )
    t = np.asarray(t)
    hit = t < 1e30
    p = np.asarray(ro) + t[:, None] * np.asarray(rd)
    nrm = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (n, 1))
    _, nrm_j, _ = PK.instanced_surface_info(
        accel, jnp.asarray(ent), jnp.asarray(p),
        jnp.asarray(p), jnp.asarray(nrm), jnp.zeros((n, 2), jnp.float32),
    )
    nrm = np.asarray(nrm_j)

    rng = np.random.default_rng(3)
    u1, u2 = rng.random(n, np.float32), rng.random(n, np.float32)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    lx, ly = r * np.cos(phi), r * np.sin(phi)
    lz = np.sqrt(np.maximum(0, 1 - u1))
    up = np.where(np.abs(nrm[:, 1:2]) < 0.9, [[0, 1, 0]], [[1, 0, 0]])
    tx = np.cross(up, nrm)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-9)
    ty = np.cross(nrm, tx)
    d1 = (lx[:, None] * tx + ly[:, None] * ty + lz[:, None] * nrm).astype(
        np.float32
    )
    o1 = (p + 1e-3 * nrm).astype(np.float32)
    dead = ~hit
    t1max = np.where(dead, 0.0, 1e30).astype(np.float32)

    lp = np.stack(
        [rng.uniform(-6, 6, n), np.full(n, 30.0), 20 + rng.uniform(-6, 6, n)],
        -1,
    ).astype(np.float32)
    dn = lp - o1
    dist = np.linalg.norm(dn, axis=1, keepdims=True)
    dnee = (dn / np.maximum(dist, 1e-9)).astype(np.float32)
    tnee = np.where(dead, 0.0, dist[:, 0] - 1e-2).astype(np.float32)

    # origin-major sort of d1 (morton above octant) — the instanced winner
    import pine_tpu.scene.scene as SC

    lo = np.array([-30.0, -1.0, -10.0], np.float32)
    span = np.array([60.0, 32.0, 60.0], np.float32)
    q = np.clip(((o1 - lo) * (32.0 / span)).astype(np.int64), 0, 31)

    def spread(v):
        return np.asarray(
            SC._spread10(np.asarray(v, np.int32))
        ).astype(np.int64)

    m = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    dbin = (d1[:, 0] < 0) + 2 * (d1[:, 1] < 0) + 4 * (d1[:, 2] < 0)
    deadk = (t1max <= 0).astype(np.int64)
    po = np.argsort(dbin.astype(np.int64) | (m << 3) | (deadk << 18))

    # instance-major sort of d1: key = (dead, nearest-candidate instance,
    # direction octant).  Hypothesis (count probe): blocks become
    # instance-pure, entries/block drop ~5x and the union mesh walk shrinks.
    g0 = cscene.unified["inst_groups"][0]
    ib = np.asarray(g0["inst_np"]["iboxes"], np.float32)  # (I, 6)
    inv1 = 1.0 / np.where(np.abs(d1) < 1e-9,
                          np.where(d1 < 0, -1e-9, 1e-9), d1)
    n_inst = ib.shape[0]
    best_near = np.full(n, np.float32(1e30))
    best_inst = np.full(n, n_inst, np.int64)
    for c0 in range(0, n_inst, 128):
        bx = ib[c0:c0 + 128]
        t0 = (bx[None, :, 0:3] - o1[:, None, :]) * inv1[:, None, :]
        t1 = (bx[None, :, 3:6] - o1[:, None, :]) * inv1[:, None, :]
        near = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
        far = np.maximum(t0, t1).min(-1)
        near = np.where(near <= far, near, np.float32(1e30))
        nm = near.min(1)
        am = near.argmin(1) + c0
        upd = nm < best_near
        best_near = np.where(upd, nm, best_near)
        best_inst = np.where(upd, am, best_inst)
    pi = np.argsort(
        (deadk << 40) | (best_inst << 3) | dbin.astype(np.int64)
    )

    ro_np = np.asarray(ro)
    rd_np = np.asarray(rd)
    return [
        ("d0", ro_np, rd_np, tmin, tmax, False),
        ("d1", o1, d1, tmin, t1max, False),
        ("d1osort", o1[po], d1[po], tmin[po], t1max[po], False),
        ("d1isort", o1[pi], d1[pi], tmin[pi], t1max[pi], False),
        ("nee", o1, dnee, tmin, tnee, True),
    ]


CHAIN = int(os.environ.get("LAB_CHAIN", 8))


def run(g, raysets):
    import jax
    import jax.numpy as jnp

    from pine_tpu.accel.instanced_kernel import (
        inst_kernel_any_hit, inst_kernel_intersect,
    )

    for name, o, d, tmn, tmx, any_hit in raysets:
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        tmnj, tmxj = jnp.asarray(tmn), jnp.asarray(tmx)
        n = o.shape[0]

        if any_hit:
            def chain(oj, dj, tmnj, tmxj):
                occ = jnp.zeros(n, jnp.int32)
                for _ in range(CHAIN):
                    occ = inst_kernel_any_hit(
                        g, oj, dj, tmnj + occ.astype(jnp.float32) * 1e-30,
                        tmxj, occ * 0,
                    )
                return occ
        else:
            def chain(oj, dj, tmnj, tmxj):
                bt = tmxj
                be = jnp.full(n, -1, jnp.int32)
                for _ in range(CHAIN):
                    bt, be = inst_kernel_intersect(
                        g, oj, dj, tmnj, tmxj + bt * 1e-30, be * 0 - 1
                    )
                return bt, be

        f = jax.jit(chain)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(oj, dj, tmnj, tmxj))
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(oj, dj, tmnj, tmxj))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        if any_hit:
            hit_frac = float(np.mean(np.asarray(out) > 0))
        else:
            hit_frac = float(np.mean(np.asarray(out[0]) < 5e29))
        print(json.dumps({
            "set": name, "any_hit": any_hit,
            "per_call_ms": round(wall / CHAIN * 1e3, 2),
            "mrays": round(n * CHAIN / wall / 1e6, 2),
            "compile_s": round(compile_s, 1),
            "hit_frac": round(hit_frac, 3),
        }), flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pine_tpu.core.device import engage_sync_dispatch, wait_for_device

    if not wait_for_device(300.0):
        print(json.dumps({"error": "device unreachable"}))
        return

    from bench_instanced import H, W, build_scene
    from pine_tpu.accel.instanced_kernel import kernel_supports

    engage_sync_dispatch()
    n_side = 101 if "--big" in sys.argv else 32
    scene, n_tris, n_inst = build_scene(n_side)
    cscene = scene.compile()
    (g,) = [x for x in cscene.unified["groups"] if x["kind"] == "instanced"]
    assert kernel_supports(g)
    print(json.dumps({"scene": f"instanced {n_inst}x{n_tris}tri"}), flush=True)
    raysets = build_raysets(scene, cscene, W, H)
    run(g, raysets)


if __name__ == "__main__":
    main()
