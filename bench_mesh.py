"""Mesh-scale benchmark: ~99k-triangle terrain, 640x640, BlueSampler(16),
PathIntegrator depth 4 (BASELINE.json "room.glb/house.pine mesh+BVH" config —
the reference ships no house.glb, so the mesh is a deterministic synthetic
terrain at the same triangle count).

Prints ONE JSON line like bench.py.  Same measurement discipline as
bench.py (revised round 4): synchronous dispatch mode is engaged up front
(core/device.engage_sync_dispatch) so block_until_ready truly fences and
walls are real — earlier rounds' async-mode walls were dispatch-only.
"""
from __future__ import annotations

import json
import sys
import time

W = H = 640
SPP = 16
DEPTH = 4
BASELINE_MRAYS = 300.0  # BASELINE.json north star applies to mesh scenes too
GRID = 224  # (GRID-1)^2 * 2 = 99458 triangles


def make_terrain(grid=GRID, size=8.0, amp=1.2, seed=7):
    """Deterministic fbm-ish heightfield mesh -> (vertices, indices)."""
    import numpy as np

    xs = np.linspace(-size / 2, size / 2, grid, dtype=np.float32)
    zs = np.linspace(0.0, size, grid, dtype=np.float32)
    X, Z = np.meshgrid(xs, zs, indexing="xy")
    rng = np.random.default_rng(seed)
    Y = np.zeros_like(X)
    for octave in range(5):
        f = 2.0 ** octave
        ph = rng.uniform(0, 2 * np.pi, 4)
        Y += (amp / f) * (
            np.sin(f * X * 1.3 + ph[0]) * np.cos(f * Z * 0.9 + ph[1])
            + 0.5 * np.sin(f * (X + Z) * 0.7 + ph[2]) * np.cos(f * (X - Z) * 1.1 + ph[3])
        )
    V = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(grid * grid, dtype=np.uint32).reshape(grid, grid)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    F = np.concatenate(
        [np.stack([a, b, c], -1), np.stack([b, d, c], -1)]
    ).astype(np.uint32)
    return V, F


def build_scene():
    import numpy as np

    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.scene import materials as M, shapes as S
    from pine_tpu.scene.scene import Scene

    V, F = make_terrain()
    scene = Scene()
    scene.add("ground", M.Diffuse([0.75, 0.7, 0.6]))
    scene.add(S.Mesh(V, F), "ground")
    scene.add(
        S.Rect([0.0, 6.0, 4.0], [1.5, 0, 0], [0, 0, 1.5]),
        M.Emissive(np.asarray([300.0, 290.0, 260.0], np.float32)),
    )
    # camera low inside the valley: the mesh fills the whole frame (an empty
    # background would flatter the Mray/s — miss lanes die at depth 0)
    hmax = float(V[:, 1].max())
    scene.set(
        ThinLenCamera(
            Film([W, H], "uncharted2"), [0.0, hmax * 0.55, 0.8], [0.5, 0.2, 5.5], 0.7
        )
    )
    return scene


def main():
    import os as _os

    from pine_tpu.core.device import wait_for_device

    if not wait_for_device(float(_os.environ.get("PINE_DEVICE_TIMEOUT", "900"))):
        # honest failure record instead of a process hung in backend init
        print(json.dumps({
            "metric": "terrain 99458tri 640x640x16spp path-depth4 throughput",
            "value": 0.0, "unit": "Mray/s", "vs_baseline": 0.0,
            "error": "device initialization timed out (TPU tunnel unreachable)",
        }))
        _os._exit(2)

    import jax
    import numpy as np

    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront

    scene = build_scene()
    cscene = scene.compile()
    sampler = BlueSampler(SPP)
    n_tris = 2 * (GRID - 1) * (GRID - 1)

    from pine_tpu.core.device import dispatch_overhead_ms, engage_sync_dispatch

    engage_sync_dispatch()  # real fences from here on (scripts_backend_probe.py)
    t0 = time.perf_counter()
    img, stats = render_wavefront(
        cscene, scene.camera, W, H, sampler, SPP, DEPTH, return_stats=True
    )
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - t0  # VERDICT r3 weak #5: track it
    overhead_ms = dispatch_overhead_ms()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        img, stats = render_wavefront(
            cscene, scene.camera, W, H, sampler, SPP, DEPTH, return_stats=True
        )
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    wall = min(times)

    # ---- timing done ----
    traced_rays = float(np.asarray(stats["traced_rays"]))
    mrays = traced_rays / wall / 1e6
    img_np = np.asarray(img)

    try:
        from pine_tpu.core import color
        from pine_tpu.io.image_io import save_image

        save_image(
            "bench_terrain.png", np.asarray(color.uncharted2_filmic(img)), invert_y=True
        )
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": f"terrain {n_tris}tri 640x640x16spp path-depth4 throughput",
                "value": round(mrays, 2),
                "unit": "Mray/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
                "wall_s": round(wall, 4),
                "compile_s": round(compile_s, 1),
                "dispatch_mode": "sync",
                "dispatch_overhead_ms": round(overhead_ms, 1),
                "traced_rays": int(traced_rays),
                "n_triangles": n_tris,
                "finite": bool(np.isfinite(img_np).all()),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
