"""Stretch-config benchmark (BASELINE.json configs[4]): the chromatic
heterogeneous cloud in the Cornell box at 1920x1080 x 256 spp, depth 6.

Scene is scripts_cloud.py's (gallery parity with the reference's
cbox-with-chromatic-cloud.png): a 96^3 synthesized cumulus VDB with
per-channel sigma_a/sigma_s, CloudPF, delta-tracking with in-medium
multiple scattering.  spp runs in host-side batches (the TPU worker kills
programs past ~30 s); compile_s records the first-batch wall (compile
included), wall_s the full 256-spp render after warm-up.

Prints ONE JSON line like bench.py; writes CLOUD_BENCH.json next to it and
bench_cloud.png as the visual check.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

W, H = 1920, 1080
SPP = 256
DEPTH = 6
BATCH = 16
CHUNK = 16384


def build_scene():
    import numpy as np

    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.io.nvdb import write_nvdb_dense
    from pine_tpu.scene import materials as M, shapes as S
    from pine_tpu.scene.media import CloudPhaseFunction, VDBMedium
    from pine_tpu.scene.scene import Scene

    from scripts_cloud import make_cloud

    dens = make_cloud(96)
    path = tempfile.mktemp(suffix=".nvdb")
    write_nvdb_dense(path, dens)

    sc = Scene()
    sc.add("white", M.Diffuse([0.9, 0.9, 0.9]))
    sc.add("red", M.Diffuse([0.9, 0.2, 0.1]))
    sc.add("green", M.Diffuse([0.25, 0.8, 0.1]))
    sc.add(S.Rect([0, 0, 1], [2, 0, 0], [0, 0, 2]), "white")
    sc.add(S.Rect([0, 2, 1], [2, 0, 0], [0, 0, 2]), "white")
    sc.add(S.Rect([0, 1, 2], [2, 0, 0], [0, 2, 0]), "white")
    sc.add(S.Rect([-1, 1, 1], [0, 0, 2], [0, 2, 0]), "red")
    sc.add(S.Rect([1, 1, 1], [0, 0, 2], [0, 2, 0]), "green")
    sc.add(S.BoxAABB([-0.75, 0.0, 0.9], [-0.45, 1.45, 1.25]), "white")
    sc.add(S.BoxAABB([0.1, 0.0, 1.0], [0.75, 0.62, 1.7]), "white")
    sc.add(
        S.Rect([0, 1.98, 1.0], [0.35, 0, 0], [0, 0, 0.35]),
        M.Emissive([42.0, 40.0, 37.0]),
    )
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.diag([1.7, 0.9, 1.3]).astype(np.float32)
    m[:3, 3] = [-0.85, 0.95, 0.45]
    sc.add(
        VDBMedium(
            path, m, CloudPhaseFunction(0.65),
            [1.2, 2.2, 4.0],
            [38.0, 30.0, 22.0],
        )
    )
    sc.set(
        ThinLenCamera(Film([W, H], "uncharted2"), [0, 1.0, -2.6], [0, 1.0, 1.0], 0.44)
    )
    return sc


def render(cs, scene, sampler, spp, t_budget=None):
    import jax

    from pine_tpu.integrators.path import render_wavefront

    acc = None
    done = 0
    for off in range(0, spp, BATCH):
        b = min(BATCH, spp - off)
        img = render_wavefront(
            cs, scene.camera, W, H, sampler, b, DEPTH,
            chunk=CHUNK, sample_offset=off,
        )
        acc = img if acc is None else acc + img
        done += 1
    img = acc / done
    jax.block_until_ready(img)
    return img


def main():
    import os as _os

    from pine_tpu.core.device import wait_for_device

    if not wait_for_device(float(_os.environ.get("PINE_DEVICE_TIMEOUT", "900"))):
        # honest failure record instead of a process hung in backend init
        print(json.dumps({
            "metric": "chromatic cloud 1920x1080x256spp throughput",
            "value": 0.0, "unit": "Mray/s", "vs_baseline": 0.0,
            "error": "device initialization timed out (TPU tunnel unreachable)",
        }))
        _os._exit(2)

    import numpy as np

    from pine_tpu.core.device import engage_sync_dispatch
    from pine_tpu.core.samplers import BlueSampler

    engage_sync_dispatch()  # real fences (scripts_backend_probe.py)
    scene = build_scene()
    cs = scene.compile()
    sampler = BlueSampler(SPP)

    t0 = time.perf_counter()
    render(cs, scene, sampler, BATCH)  # compile + one batch
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    img = render(cs, scene, sampler, SPP)
    wall = time.perf_counter() - t0

    img_np = np.asarray(img)
    # camera samples x (<=DEPTH extension + NEE/scatter shadow) is the upper
    # bound; report honest camera-sample throughput plus wall (the stretch
    # metric is the wall-clock at the full config)
    samples = W * H * SPP
    rec = {
        "metric": f"chromatic cloud {W}x{H}x{SPP}spp depth{DEPTH} wall",
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": None,
        "msamples_per_s": round(samples / wall / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "finite": bool(np.isfinite(img_np).all()),
        "source": "bench_cloud.py on 1 real TPU chip",
    }
    print(json.dumps(rec))
    with open(os.path.join(os.path.dirname(__file__), "CLOUD_BENCH.json"), "w") as f:
        json.dump(rec, f)
        f.write("\n")
    try:
        from pine_tpu.core import color
        from pine_tpu.io.image_io import save_image

        save_image(
            "bench_cloud.png", np.asarray(color.uncharted2_filmic(img)),
            invert_y=True,
        )
    except Exception:
        pass


if __name__ == "__main__":
    sys.exit(main())
