"""Decompose the honest cbox render wall: depth/NEE sweep on the real chip.

Each config reuses the same scene; differences in wall-clock attribute cost
to the pieces the config removes (NEE anyhit rounds, deeper bounces).

  python scripts_render_decomp.py            # cbox
  python scripts_render_decomp.py terrain    # terrain mesh scene
  python scripts_render_decomp.py instanced  # 1024-rock instanced scene
"""
from __future__ import annotations

import json
import sys
import time

W = H = 640
SPP = 16


def main():
    import jax
    import numpy as np

    from pine_tpu.core.device import dispatch_overhead_ms, engage_sync_dispatch
    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront

    if "terrain" in sys.argv[1:]:
        from bench_mesh import build_scene

        scene = build_scene()
        label = "terrain"
    elif "instanced" in sys.argv[1:]:
        import bench_instanced as BI

        scene, _, _ = BI.build_scene()
        label = "instanced"
        global W, H, SPP
        W, H, SPP = BI.W, BI.H, BI.SPP
    else:
        from bench import CBOX_PRL
        from pine_tpu.prl.interp import Interpreter

        itp = Interpreter()
        itp.run(CBOX_PRL, "<decomp:cbox>")
        scene = itp.get_var("scene")
        label = "cbox"

    cscene = scene.compile()
    cam = scene.camera
    sampler = BlueSampler(SPP)

    engage_sync_dispatch()
    print(json.dumps({
        "backend": jax.default_backend(), "scene": label,
        "dispatch_overhead_ms": round(dispatch_overhead_ms(), 1),
    }), flush=True)

    for depth, nee in ((4, True), (4, False), (2, False), (1, False)):
        t0 = time.perf_counter()
        img, stats = render_wavefront(
            cscene, cam, W, H, sampler, SPP, depth,
            nee=nee, return_stats=True,
        )
        jax.block_until_ready(img)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            img, stats = render_wavefront(
                cscene, cam, W, H, sampler, SPP, depth,
                nee=nee, return_stats=True,
            )
            jax.block_until_ready(img)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        traced = float(np.asarray(stats["traced_rays"]))
        print(json.dumps({
            "scene": label, "depth": depth, "nee": nee,
            "wall_s": round(wall, 3), "compile_s": round(compile_s, 1),
            "traced_rays": int(traced),
            "mrays": round(traced / wall / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
