"""Terrain grid/mxu kernel decomposition on the real chip.

For each kernel variant (mxu = the mesh default, grid = plain tile scan)
and each PINE_GRID_PROBE mode:

  full   — the real kernel
  nodma  — prim work on a stale buffer (no per-coarse-group DMA)
  slabs  — culls only, no prim work at all

(full - nodma) = DMA cost; (nodma - slabs) = prim tests; slabs = culls.
WRONG RESULTS for probe modes — timing triage only.

  python scripts_terrain_probe.py
"""
from __future__ import annotations

import json
import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax  # noqa: F401

    from pine_tpu.core.device import engage_sync_dispatch, wait_for_device

    if not wait_for_device(300.0):
        print(json.dumps({"error": "device unreachable"}))
        return
    engage_sync_dispatch()
    from scripts_kernel_lab import build_terrain_group, run_variant, synth_rays

    g, lo, hi = build_terrain_group()
    raysets = [
        (nm,) + synth_rays(65536, nm, lo, hi) for nm in ("local", "coherent")
    ]
    for variant in ("mxu", "grid"):
        for probe in ("", "nodma", "slabs"):
            os.environ["PINE_GRID_PROBE"] = probe
            print(json.dumps(
                {"variant": variant, "probe": probe or "full"}
            ), flush=True)
            run_variant(g, variant, raysets, "terrain")
    os.environ.pop("PINE_GRID_PROBE", None)


if __name__ == "__main__":
    main()
