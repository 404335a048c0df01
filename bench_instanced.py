"""Instancing benchmark: instances of a 4802-triangle rock mesh rendered
through the lazy two-level accel in O(mesh) memory.  Prints ONE JSON line
like bench.py for the primary config (32x32 = 1024 instances, ~4.9M
effective tris); pass --big for the 101x101 = 10201-instance config (~49M
effective tris) that exceeds the old dense path's 4096-instance cap.

Same measurement discipline as bench.py (revised round 4): synchronous
dispatch mode is engaged up front (core/device.engage_sync_dispatch) so
block_until_ready truly fences and walls are real — earlier rounds'
async-mode walls were dispatch-only.  compile_s records the first render
(compile included) separately from the steady wall clock.
"""
from __future__ import annotations

import json
import sys
import time

W = H = 512
SPP = 4
DEPTH = 3
BASELINE_MRAYS = 300.0
GRID = 50  # (GRID-1)^2 * 2 = 4802 tris per instance
N_SIDE = 32  # 32*32 = 1024 instances


def make_rock(grid=GRID, seed=5):
    """Bumpy ellipsoid mesh (deterministic)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    th = np.linspace(0, np.pi, grid, dtype=np.float32)
    ph = np.linspace(0, 2 * np.pi, grid, dtype=np.float32)
    T, P = np.meshgrid(th, ph, indexing="ij")
    r = 1.0 + 0.25 * (
        np.sin(3 * T + 1.3) * np.cos(4 * P)
        + 0.5 * np.sin(7 * T) * np.sin(5 * P + 0.7)
    )
    V = np.stack(
        [r * np.sin(T) * np.cos(P), 0.8 * r * np.cos(T), r * np.sin(T) * np.sin(P)],
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    idx = np.arange(grid * grid, dtype=np.uint32).reshape(grid, grid)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    F = np.concatenate(
        [np.stack([a, b, c], -1), np.stack([b, d, c], -1)]
    ).astype(np.uint32)
    return V, F


def build_scene(n_side=N_SIDE):
    import numpy as np

    import pine_tpu.scene.scene as scene_mod
    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.scene import materials as M, shapes as S
    from pine_tpu.scene.scene import Scene

    V, F = make_rock()
    scene = Scene()
    scene.add(S.Plane([0, -0.1, 0], [0, 1, 0]), M.Diffuse([0.55, 0.5, 0.45]))
    inst = S.InstancedShape(S.Mesh(V, F))
    mat = M.Diffuse([0.6, 0.55, 0.5])
    rng = np.random.default_rng(11)
    for i in range(n_side):
        for j in range(n_side):
            m = np.eye(4, dtype=np.float32)
            s = 0.35 + 0.25 * rng.random()
            m[:3, :3] *= s
            m[0, 3] = (i - n_side / 2) * 1.6 + rng.uniform(-0.3, 0.3)
            m[1, 3] = 0.8 * s
            m[2, 3] = j * 1.6 + 2.0 + rng.uniform(-0.3, 0.3)
            inst.add(m, mat)
    assert len(inst.instances) * len(F) > scene_mod.FLATTEN_LIMIT  # lazy path
    scene.add(inst)
    scene.add(
        S.Rect([0, 30, 20], [6, 0, 0], [0, 0, 6]),
        M.Emissive(np.asarray([400.0, 390.0, 360.0], np.float32)),
    )
    hcam = 6.0
    scene.set(
        ThinLenCamera(
            Film([W, H], "uncharted2"), [0.0, hcam, -6.0], [0.0, 0.5, 14.0], 0.7
        )
    )
    return scene, len(F), len(inst.instances)


def main():
    import os as _os

    from pine_tpu.core.device import wait_for_device

    if not wait_for_device(float(_os.environ.get("PINE_DEVICE_TIMEOUT", "900"))):
        # honest failure record instead of a process hung in backend init
        print(json.dumps({
            "metric": "instanced two-level throughput",
            "value": 0.0, "unit": "Mray/s", "vs_baseline": 0.0,
            "error": "device initialization timed out (TPU tunnel unreachable)",
        }))
        _os._exit(2)

    import jax
    import numpy as np

    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront

    n_side = 101 if "--big" in sys.argv else N_SIDE
    scene, n_tris, n_inst = build_scene(n_side)
    cscene = scene.compile()
    assert cscene.unified.get("inst_groups"), "lazy instancing not active"
    sampler = BlueSampler(SPP)

    from pine_tpu.core.device import dispatch_overhead_ms, engage_sync_dispatch

    engage_sync_dispatch()  # real fences from here on (scripts_backend_probe.py)
    t0 = time.perf_counter()
    img, stats = render_wavefront(
        cscene, scene.camera, W, H, sampler, SPP, DEPTH, return_stats=True
    )
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - t0
    overhead_ms = dispatch_overhead_ms()

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        img, stats = render_wavefront(
            cscene, scene.camera, W, H, sampler, SPP, DEPTH, return_stats=True
        )
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    wall = min(times)

    traced_rays = float(np.asarray(stats["traced_rays"]))
    mrays = traced_rays / wall / 1e6
    img_np = np.asarray(img)
    try:
        from pine_tpu.core import color
        from pine_tpu.io.image_io import save_image

        save_image(
            "bench_instanced_big.png" if n_side != N_SIDE else "bench_instanced.png",
            np.asarray(color.uncharted2_filmic(img)),
            invert_y=True,
        )
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": (
                    f"instanced {n_inst}x{n_tris}tri "
                    f"({n_inst * n_tris / 1e6:.1f}M effective) "
                    f"{W}x{H}x{SPP}spp depth{DEPTH} throughput"
                ),
                "value": round(mrays, 2),
                "unit": "Mray/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
                "wall_s": round(wall, 4),
                "compile_s": round(compile_s, 1),
                "dispatch_mode": "sync",
                "dispatch_overhead_ms": round(overhead_ms, 1),
                "traced_rays": int(traced_rays),
                "finite": bool(np.isfinite(img_np).all()),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
