"""Grid-kernel timing decomposition on the real chip (PINE_GRID_PROBE)."""
import json, os, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from pine_tpu.core.device import engage_sync_dispatch
    engage_sync_dispatch()
    from scripts_kernel_lab import build_terrain_group, synth_rays, run_variant

    g, lo, hi = build_terrain_group()
    raysets = [(nm,) + synth_rays(65536, nm, lo, hi) for nm in ("local", "coherent")]
    for probe in ("", "nodma", "slabs"):
        os.environ["PINE_GRID_PROBE"] = probe
        print(json.dumps({"probe": probe or "full"}), flush=True)
        run_variant(g, "grid", raysets, "terrain")

if __name__ == "__main__":
    main()
