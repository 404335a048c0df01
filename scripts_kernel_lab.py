"""Honest per-kernel traversal microbenchmark on the real chip.

Times each traversal kernel variant directly (sync dispatch mode, real
fences), separating fixed dispatch overhead from per-call device time by
chaining K dependent calls inside one jit program (outputs feed the next
call's best_t/best_e, so XLA cannot CSE the chain).

Workloads:
  cone420   - the cbox 441-cone floor group (the cbox render's hot group)
  terrain   - the 99,458-tri terrain mesh group (bench_mesh's hot group)
Ray sets: coherent (camera-like fan) and incoherent (random sphere dirs).

Usage: python scripts_kernel_lab.py [workload ...]
Prints one JSON line per (workload, variant, rayset).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import os

N_RAYS = int(os.environ.get("LAB_RAYS", 65536))
CHAIN = int(os.environ.get("LAB_CHAIN", 8))


def synth_rays(n, mode, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    c = (lo + hi) * 0.5
    ext = (hi - lo) * 0.5
    if mode == "coherent":
        # pinhole fan from outside the scene towards a grid on the far face
        eye = c + np.array([0.0, 0.3, -2.2]) * ext
        side = int(np.ceil(np.sqrt(n)))
        u = (np.arange(side, dtype=np.float32) + 0.5) / side * 2 - 1
        X, Y = np.meshgrid(u, u, indexing="xy")
        tgt = np.stack(
            [c[0] + X.ravel() * ext[0], c[1] + Y.ravel() * ext[1],
             np.full(side * side, hi[2], np.float32)], -1
        )[:n]
        o = np.tile(eye.astype(np.float32), (n, 1))
        d = tgt - o
    elif mode == "local":
        # models a post-coherence-sort block: each 1024-ray block shares an
        # origin cell (1/16 of the scene span) and a direction octant
        blocks = (n + 1023) // 1024
        centers = rng.uniform(lo, hi, (blocks, 3)).astype(np.float32)
        octs = rng.integers(0, 2, (blocks, 3)).astype(np.float32) * 2 - 1
        o = np.repeat(centers, 1024, axis=0)[:n]
        o = o + rng.uniform(-1, 1, (n, 3)).astype(np.float32) * ext / 16
        d = np.abs(rng.normal(size=(n, 3)).astype(np.float32))
        d = d * np.repeat(octs, 1024, axis=0)[:n]
    else:
        o = rng.uniform(lo - 0.1 * ext, hi + 0.1 * ext, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
    d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    return o.astype(np.float32), d.astype(np.float32)


def build_cone_group():
    from pine_tpu.prl.interp import Interpreter
    from bench import CBOX_PRL

    itp = Interpreter()
    itp.run(CBOX_PRL, "<lab:cbox>")
    scene = itp.get_var("scene")
    cs = scene.compile()
    groups = cs.unified["groups"]
    g = max(groups, key=lambda g: g["rows_np"].shape[0])
    lo = g["_prim_aabbs"][:, 0:3].min(0)
    hi = g["_prim_aabbs"][:, 3:6].max(0)
    return g, lo, hi


def build_terrain_group():
    from bench_mesh import build_scene

    scene = build_scene()
    cs = scene.compile()
    groups = cs.unified["groups"]
    g = max(groups, key=lambda g: g["rows_np"].shape[0])
    lo = g["_prim_aabbs"][:, 0:3].min(0)
    hi = g["_prim_aabbs"][:, 3:6].max(0)
    return g, lo, hi


def run_variant(g, variant, raysets, label, any_hit=False):
    """raysets: list of (name, o, d).  One compile per variant, reused."""
    import jax
    import jax.numpy as jnp

    from pine_tpu.accel.pallas_traverse import BIG, pallas_group_query

    from pine_tpu.accel import pallas_traverse as PT

    # build table layouts EAGERLY (outside jit): layouts cache jnp arrays in
    # the group dict, and arrays created inside a trace leak as tracers
    if variant in ("grid", "scdense"):
        PT._grid_layout(g)
    if variant == "sctree":
        PT._sc_tree_layout(g)
    if variant in ("dense", "bvh", "scdense"):
        PT._group_smem_arrays(g)

    n = raysets[0][1].shape[0]
    tmin = jnp.full((n,), 1e-3, jnp.float32)
    tmax = jnp.full((n,), BIG, jnp.float32)
    be0 = jnp.zeros((n,), jnp.int32)

    def chain(oj, dj, tmin, tmax):
        bt = tmax
        be = be0
        for _ in range(CHAIN):
            # each link's best_t input mixes in the previous link's output at
            # 1e-30 scale: numerically a fresh query, but data-dependent so
            # XLA cannot CSE the repeated calls
            bt, be = pallas_group_query(
                g, oj, dj, tmin, tmax, tmax + bt * 1e-30, be * 0,
                any_hit=any_hit, variant=variant,
            )
        return bt, be

    f = jax.jit(chain)
    compile_s = None
    for rayset, o, d in raysets:
        oj = jnp.asarray(o)
        dj = jnp.asarray(d)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(oj, dj, tmin, tmax))
        if compile_s is None:
            compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(oj, dj, tmin, tmax))
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        per_call_ms = wall / CHAIN * 1e3
        mrays = n * CHAIN / wall / 1e6
        hit_frac = float(np.mean(np.asarray(out[0]) < BIG * 0.5)) \
            if not any_hit else float(np.mean(np.asarray(out[1]) > 0))
        print(json.dumps({
            "workload": label, "variant": variant, "rays": rayset,
            "any_hit": any_hit, "n_prims": int(g["rows_np"].shape[0]),
            "per_call_ms": round(per_call_ms, 3), "mrays": round(mrays, 1),
            "wall_s": round(wall, 4), "compile_s": round(compile_s, 1),
            "hit_frac": round(hit_frac, 3),
        }), flush=True)


def main():
    import jax

    from pine_tpu.core.device import dispatch_overhead_ms, engage_sync_dispatch

    engage_sync_dispatch()
    print(json.dumps({
        "backend": jax.default_backend(),
        "dispatch_overhead_ms": round(dispatch_overhead_ms(), 1),
    }), flush=True)

    sel = set(sys.argv[1:]) or {"cone420", "terrain"}

    workloads = []
    if "cone420" in sel:
        workloads.append(
            ("cone420", build_cone_group, ("grid", "dense", "bvh", "scdense"))
        )
    if "terrain" in sel:
        workloads.append(("terrain", build_terrain_group, ("grid", "sctree")))

    for label, build, variants in workloads:
        g, lo, hi = build()
        raysets = [
            (name,) + synth_rays(N_RAYS, name, lo, hi)
            for name in ("coherent", "incoherent", "local")
        ]
        for variant in variants:
            if os.environ.get("LAB_VARIANTS") and \
                    variant not in os.environ["LAB_VARIANTS"].split(","):
                continue
            try:
                run_variant(g, variant, raysets, label)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "workload": label, "variant": variant,
                    "error": repr(e)[:300],
                }), flush=True)


if __name__ == "__main__":
    main()
