"""Honest render-level A/B of kernel + coherence-sort choices (real chip).

One process, sync dispatch, shared scene build; each config is a fresh
compiled program (the render cache keys on the env knobs).

  python scripts_render_ab.py cbox     # sort x small-kernel grid
  python scripts_render_ab.py terrain  # sort x mesh-kernel grid
"""
from __future__ import annotations

import json
import os
import sys
import time

W = H = 640
SPP = 16
DEPTH = 4


def run(scene, cam, label, configs, w=W, h=H, spp=SPP, depth=DEPTH):
    import jax
    import numpy as np

    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront

    cscene = scene.compile()
    sampler = BlueSampler(spp)
    ref_img = None

    for cfg in configs:
        for k, v in cfg.items():
            os.environ[k] = v
        t0 = time.perf_counter()
        img, stats = render_wavefront(
            cscene, cam, w, h, sampler, spp, depth, return_stats=True
        )
        jax.block_until_ready(img)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            img, stats = render_wavefront(
                cscene, cam, w, h, sampler, spp, depth, return_stats=True
            )
            jax.block_until_ready(img)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        traced = float(np.asarray(stats["traced_rays"]))
        img_np = np.asarray(img)
        if ref_img is None:
            ref_img = img_np
        max_dev = float(np.max(np.abs(img_np - ref_img)))
        print(json.dumps({
            "scene": label, **cfg,
            "wall_s": round(wall, 3), "compile_s": round(compile_s, 1),
            "mrays": round(traced / wall / 1e6, 2),
            "traced_rays": int(traced),
            "max_dev_vs_first": round(max_dev, 6),
            "finite": bool(np.isfinite(img_np).all()),
        }), flush=True)


def main():
    import jax

    from pine_tpu.core.device import dispatch_overhead_ms, engage_sync_dispatch

    engage_sync_dispatch()
    print(json.dumps({
        "backend": jax.default_backend(),
        "dispatch_overhead_ms": round(dispatch_overhead_ms(), 1),
    }), flush=True)

    which = sys.argv[1] if len(sys.argv) > 1 else "cbox"
    if which == "cbox":
        from bench import CBOX_PRL
        from pine_tpu.prl.interp import Interpreter

        itp = Interpreter()
        itp.run(CBOX_PRL, "<ab:cbox>")
        scene = itp.get_var("scene")
        configs = [
            {"PINE_SORT_RAYS": "0", "PINE_SMALL_KERNEL": "dense"},
            {"PINE_SORT_RAYS": "0", "PINE_SMALL_KERNEL": "mxu"},
            {"PINE_SORT_RAYS": "0", "PINE_SMALL_KERNEL": "mxup"},
            {"PINE_SORT_RAYS": "1", "PINE_SMALL_KERNEL": "mxup"},
        ]
        run(scene, scene.camera, "cbox", configs)
    elif which == "instanced":
        # two-level kernel: VPU leaf tests vs MXU matmul leaves, and the
        # coherence sort's effect (instanced scenes default it ON via
        # heavy_traversal) — bench_instanced's exact scene/config
        from bench_instanced import DEPTH as IDEPTH, H as IH, SPP as ISPP, W as IW, build_scene

        scene, _, _ = build_scene()
        configs = [
            {"PINE_SORT_RAYS": "1", "PINE_INST_KERNEL": "vpu"},
            {"PINE_SORT_RAYS": "1", "PINE_INST_KERNEL": "mxu"},
            {"PINE_SORT_RAYS": "0", "PINE_INST_KERNEL": "vpu"},
        ]
        run(scene, scene.camera, "instanced", configs,
            w=IW, h=IH, spp=ISPP, depth=IDEPTH)
        return
    elif which == "instanced-sort":
        # r5: origin-major instance binning (scene._ray_sort_perm
        # mode="origin") vs no sort — the octant-major key already measured
        # a LOSS here (r4: 10.2s vs 6.6s); the count probe said bin by
        # instance instead
        from bench_instanced import DEPTH as IDEPTH, H as IH, SPP as ISPP, W as IW, build_scene

        scene, _, _ = build_scene()
        configs = [
            {"PINE_SORT_RAYS": "auto", "PINE_SORT_MODE": "off",
             "PINE_INST_KERNEL": "vpu"},
            {"PINE_SORT_RAYS": "auto", "PINE_SORT_MODE": "origin",
             "PINE_INST_KERNEL": "vpu"},
        ]
        run(scene, scene.camera, "instanced", configs,
            w=IW, h=IH, spp=ISPP, depth=IDEPTH)
    elif which == "cbox-lattice":
        # lattice arithmetic-reconstruction kernel vs the dense sweep on the
        # 420-cone floor group (the main cbox cost center per the kernel lab)
        from bench import CBOX_PRL
        from pine_tpu.prl.interp import Interpreter

        itp = Interpreter()
        itp.run(CBOX_PRL, "<ab:cbox>")
        scene = itp.get_var("scene")
        configs = [
            {"PINE_SORT_RAYS": "0", "PINE_SMALL_KERNEL": "dense"},
            {"PINE_SORT_RAYS": "0", "PINE_SMALL_KERNEL": "lattice"},
            {"PINE_SORT_RAYS": "1", "PINE_SMALL_KERNEL": "lattice"},
        ]
        run(scene, scene.camera, "cbox", configs)
    elif which == "cbox-scd":
        # cell-culled dense sweep: culls only fire on spatially-compact ray
        # blocks, so it is measured with and without the coherence sort
        from bench import CBOX_PRL
        from pine_tpu.prl.interp import Interpreter

        itp = Interpreter()
        itp.run(CBOX_PRL, "<ab:cbox>")
        scene = itp.get_var("scene")
        configs = [
            {"PINE_SORT_RAYS": "0", "PINE_SMALL_KERNEL": "dense"},
            {"PINE_SORT_RAYS": "0", "PINE_SMALL_KERNEL": "scdense"},
            {"PINE_SORT_RAYS": "1", "PINE_SMALL_KERNEL": "scdense"},
        ]
        run(scene, scene.camera, "cbox", configs)
    else:
        from bench_mesh import build_scene

        scene = build_scene()
        configs = [
            {"PINE_SORT_RAYS": "1", "PINE_MESH_KERNEL": "grid"},
            {"PINE_SORT_RAYS": "1", "PINE_MESH_KERNEL": "mxu"},
            {"PINE_SORT_RAYS": "0", "PINE_MESH_KERNEL": "mxu"},
        ]
        run(scene, scene.camera, "terrain", configs)


if __name__ == "__main__":
    main()
