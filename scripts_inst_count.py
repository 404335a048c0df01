"""Count supercell bodies / cell sweeps per block in the instanced kernel
(PINE_INST_PROBE=count — WRONG RESULTS, triage only) on realistic ray sets:

  d0        exact camera rays of the bench config, tile-major render order
  d1        cosine bounce rays spawned from the REAL first hits (XLA-walk
            ground truth for t/normals), same lane order as the renderer
            would carry them (no resort)
  nee       shadow rays from the same hits toward the bench's light rect
  d1sort    d1 re-packed by the (dead, octant, morton) coherence sort
  d1osort   d1 re-packed origin-major (morton above direction)

Per set: total supercell bodies, cell sweeps, bodies per live block, and the
honest query wall — the decomposition that decides sort-vs-layout for the
instanced gap (REF_BENCH: reference wins 6.6x here).

  python scripts_inst_count.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _counts_from_be(be, n_rows):
    """Harvest per-block counters written over be rows 0-3 by the probe:
    (pops, instance entries, supercell bodies, cell sweeps)."""
    be = np.asarray(be[: n_rows * 128]).reshape(n_rows, 128)
    return tuple(int(be[ci::8, 0].sum()) for ci in range(4))


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pine_tpu.core.device import engage_sync_dispatch, wait_for_device

    if not wait_for_device(300.0):
        print(json.dumps({"error": "device unreachable"}))
        return

    import jax
    import jax.numpy as jnp

    from bench_instanced import DEPTH, SPP, H, W, build_scene
    from pine_tpu.accel import packet as PK
    from pine_tpu.accel.instanced_kernel import (
        inst_kernel_any_hit, inst_kernel_intersect, kernel_supports,
    )
    from pine_tpu.core.camera import gen_rays
    from pine_tpu.integrators.path import tile_order
    from pine_tpu.scene.scene import _ray_sort_perm

    engage_sync_dispatch()
    scene, n_tris, n_inst = build_scene()
    cscene = scene.compile()
    accel = cscene.unified
    (g,) = [x for x in accel["groups"] if x["kind"] == "instanced"]
    assert kernel_supports(g)

    n = 65536  # one render chunk worth of lanes
    perm = tile_order(W, H)[:n]
    ys, xs = np.divmod(perm, W)
    pf = jnp.stack(
        [(jnp.asarray(xs) + 0.5) / W, (jnp.asarray(ys) + 0.5) / H], -1
    )
    cp = scene.camera.params()
    ro, rd = gen_rays(cp, pf, jnp.zeros((n, 2), jnp.float32))
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)

    # ground-truth first hits through the full accel (all groups)
    t, ent = PK.packet_intersect(accel, ro, rd, tmin, tmax)
    t, ent = np.asarray(t), np.asarray(ent)
    hit = t < 1e30
    p = np.asarray(ro) + t[:, None] * np.asarray(rd)
    # geometric normals: instanced tris via the overlay, plane fallback +Y
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
    d1 = (
        lx[:, None] * tx + ly[:, None] * ty + lz[:, None] * nrm
    ).astype(np.float32)
    o1 = (p + 1e-3 * nrm).astype(np.float32)
    dead = ~hit  # missed lanes carry empty windows, like the renderer
    t1min = np.zeros(n, np.float32)
    t1max = np.where(dead, 0.0, 1e30).astype(np.float32)

    # NEE rays toward the bench light rect at y=30
    lp = np.stack(
        [
            rng.uniform(-6, 6, n), np.full(n, 30.0), 20 + rng.uniform(-6, 6, n)
        ], -1
    ).astype(np.float32)
    dn = lp - o1
    dist = np.linalg.norm(dn, axis=1, keepdims=True)
    dnee = (dn / np.maximum(dist, 1e-9)).astype(np.float32)
    tnee = np.where(dead, 0.0, dist[:, 0] - 1e-2).astype(np.float32)

    def osort_perm(ro_, rd_, tmn_, tmx_):
        """Origin-major re-pack: morton above direction octant."""
        import pine_tpu.scene.scene as SC

        q = jnp.clip(
            ((ro_ - cscene.sort_lo) * (32.0 / cscene.sort_span)).astype(
                jnp.int32
            ), 0, 31,
        )
        m = (
            SC._spread10(q[:, 0]) | (SC._spread10(q[:, 1]) << 1)
            | (SC._spread10(q[:, 2]) << 2)
        )
        dbin = (
            (rd_[:, 0] < 0).astype(jnp.int32)
            + 2 * (rd_[:, 1] < 0).astype(jnp.int32)
            + 4 * (rd_[:, 2] < 0).astype(jnp.int32)
        )
        deadk = (tmx_ <= tmn_).astype(jnp.int32)
        key = dbin | (m << 3) | (deadk << 18)
        return jnp.argsort(key)

    n_rows = n // 128

    def run(label, ro_, rd_, tmn_, tmx_, any_hit=False):
        ro_, rd_ = jnp.asarray(ro_), jnp.asarray(rd_)
        tmn_, tmx_ = jnp.asarray(tmn_), jnp.asarray(tmx_)
        # honest wall without the probe
        os.environ.pop("PINE_INST_PROBE", None)
        if any_hit:
            occ0 = jnp.zeros(n, jnp.int32)
            out = inst_kernel_any_hit(g, ro_, rd_, tmn_, tmx_, occ0)
            jax.block_until_ready(out)
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = inst_kernel_any_hit(g, ro_, rd_, tmn_, tmx_, occ0)
                jax.block_until_ready(out)
                walls.append(time.perf_counter() - t0)
        else:
            bt0 = jnp.asarray(tmx_)
            be0 = jnp.full(n, -1, jnp.int32)
            out = inst_kernel_intersect(g, ro_, rd_, tmn_, bt0, be0)
            jax.block_until_ready(out)
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = inst_kernel_intersect(g, ro_, rd_, tmn_, bt0, be0)
                jax.block_until_ready(out)
                walls.append(time.perf_counter() - t0)
        wall_ms = min(walls) * 1e3
        # counted run (results wrong, counters in be)
        os.environ["PINE_INST_PROBE"] = "count"
        if any_hit:
            be = inst_kernel_any_hit(
                g, ro_, rd_, tmn_, tmx_, jnp.zeros(n, jnp.int32)
            )
        else:
            _, be = inst_kernel_intersect(
                g, ro_, rd_, tmn_, jnp.asarray(tmx_), jnp.full(n, -1, jnp.int32)
            )
        jax.block_until_ready(be)
        pops, entries, bodies, cells = _counts_from_be(np.asarray(be), n_rows)
        os.environ.pop("PINE_INST_PROBE", None)
        live_blocks = int(
            (np.asarray(tmx_) > np.asarray(tmn_)).reshape(-1, 1024).any(1).sum()
        )
        print(json.dumps({
            "set": label, "wall_ms": round(wall_ms, 1),
            "pops": pops, "entries": entries,
            "bodies": bodies, "cells": cells,
            "blocks_live": live_blocks * (n // 65536 or 1),
            "pops_per_block": round(pops / max(1, n // 1024), 1),
            "entries_per_block": round(entries / max(1, n // 1024), 1),
            "bodies_per_block": round(bodies / max(1, n // 1024), 1),
            "us_per_pop": round(wall_ms * 1e3 / max(1, pops), 2),
        }), flush=True)

    # world bounds for the sorts
    cscene.sort_lo, cscene.sort_span = (
        np.asarray([-30.0, -1.0, -10.0], np.float32),
        np.asarray([60.0, 32.0, 60.0], np.float32),
    )

    print(json.dumps({
        "scene": f"instanced {n_inst}x{n_tris}tri, {n} lanes",
        "hit_frac": round(float(hit.mean()), 3),
    }), flush=True)

    run("d0", ro, rd, tmin, tmax)
    run("d1", o1, d1, t1min, t1max)
    run("nee", o1, dnee, t1min, tnee, any_hit=True)

    ps, _ = _ray_sort_perm(
        jnp.asarray(o1), jnp.asarray(d1), jnp.asarray(t1min),
        jnp.asarray(t1max), jnp.asarray(cscene.sort_lo),
        jnp.asarray(cscene.sort_span),
    )
    ps = np.asarray(ps)
    run("d1sort", o1[ps], d1[ps], t1min[ps], t1max[ps])

    po = np.asarray(osort_perm(
        jnp.asarray(o1), jnp.asarray(d1), jnp.asarray(t1min),
        jnp.asarray(t1max),
    ))
    run("d1osort", o1[po], d1[po], t1min[po], t1max[po])
    pn = np.asarray(osort_perm(
        jnp.asarray(o1), jnp.asarray(dnee), jnp.asarray(t1min),
        jnp.asarray(tnee),
    ))
    run("neeosort", o1[pn], dnee[pn], t1min[pn], tnee[pn], any_hit=True)


if __name__ == "__main__":
    main()
