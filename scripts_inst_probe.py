"""Decompose the instanced render wall via the kernel's PINE_INST_PROBE
modes (WRONG IMAGES — timing triage only).

  full    — the real kernel (baseline wall)
  nomesh  — kind-2 entries return immediately: top-tree walk + instance
            culls + local-frame transforms, zero mesh work
  fakehit — instance entries fake a hit at the AABB near plane and skip
            the mesh subtree: top walk + leaf culls only
  xform   — fakehit plus the 9 local-frame transform writes
  nosuper — mesh subtree walks, but each supercell only slab-tests (no
            DMA, no prim tests)

Walls attribute: (full - nosuper) = prim tests + DMA; (nosuper - nomesh)
= mesh-tree node slabs + supercell slabs; (nomesh - xform) = mesh-root
push bookkeeping; (xform - fakehit) = transforms.

  python scripts_inst_probe.py [--big]
"""
from __future__ import annotations

import json
import os
import sys
import time

MODES = ("full", "nomesh", "nosuper", "xform", "fakehit")


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pine_tpu.core.device import wait_for_device

    if not wait_for_device(300.0):
        print(json.dumps({"error": "device unreachable"}))
        return

    import jax

    from bench_instanced import DEPTH, SPP, H, W, build_scene
    from pine_tpu.core.device import dispatch_overhead_ms, engage_sync_dispatch
    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront

    n_side = 101 if "--big" in sys.argv else 32
    scene, n_tris, n_inst = build_scene(n_side)
    cscene = scene.compile()
    sampler = BlueSampler(SPP)
    engage_sync_dispatch()
    print(json.dumps({
        "scene": f"instanced {n_inst}x{n_tris}tri {W}x{H}x{SPP}spp d{DEPTH}",
        "dispatch_overhead_ms": round(dispatch_overhead_ms(), 1),
    }), flush=True)

    for mode in MODES:
        if mode == "full":
            os.environ.pop("PINE_INST_PROBE", None)
        else:
            os.environ["PINE_INST_PROBE"] = mode
        t0 = time.perf_counter()
        img = render_wavefront(cscene, scene.camera, W, H, sampler, SPP, DEPTH)
        jax.block_until_ready(img)
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            img = render_wavefront(
                cscene, scene.camera, W, H, sampler, SPP, DEPTH
            )
            jax.block_until_ready(img)
            walls.append(time.perf_counter() - t0)
        print(json.dumps({
            "mode": mode, "wall_s": round(min(walls), 3),
            "compile_s": round(compile_s, 1),
        }), flush=True)
    os.environ.pop("PINE_INST_PROBE", None)


if __name__ == "__main__":
    main()
