"""Gallery: chromatic VDB cloud inside the Cornell box — the reference's
gallery/cbox-with-chromatic-cloud.png capability (VDBMedium + per-channel
sigma_s + multiple scattering).  Synthesizes a turbulent cumulus density
grid, renders with the PathIntegrator, saves images/chromatic_cloud.png."""
from __future__ import annotations

import numpy as np

from scripts_explosion import fbm3


def make_cloud(n=96):
    g = (np.mgrid[0:n, 0:n, 0:n].astype(np.float32) / n) - 0.5
    x, y, z = g
    turb = fbm3((n, n, n), octaves=6, seed=7)
    # cumulus: a few overlapping puff lobes, eroded by fbm
    lobes = [
        ((0.0, 0.05, 0.0), 0.33), ((-0.22, -0.02, 0.08), 0.22),
        ((0.2, -0.04, -0.1), 0.24), ((0.05, 0.18, -0.05), 0.2),
        ((-0.1, 0.12, -0.15), 0.17),
    ]
    d = np.zeros_like(x)
    for (cx, cy, cz), r in lobes:
        rr = np.sqrt((x - cx) ** 2 + ((y - cy) * 1.35) ** 2 + (z - cz) ** 2)
        d = np.maximum(d, np.clip((r - rr) * 9, 0, 1))
    dens = np.clip(d * np.clip(0.55 + 0.8 * turb, 0, 1.4) - 0.08, 0, 1).astype(
        np.float32
    ) * 1.5
    # flat-ish cloud base
    dens *= np.clip((y + 0.32) * 9, 0, 1)
    return dens


def main():
    import tempfile

    import jax

    from pine_tpu.core import color
    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront
    from pine_tpu.io.image_io import save_image
    from pine_tpu.io.nvdb import write_nvdb_dense
    from pine_tpu.scene import materials as M, shapes as S
    from pine_tpu.scene.media import CloudPhaseFunction, VDBMedium
    from pine_tpu.scene.scene import Scene

    dens = make_cloud(96)
    path = tempfile.mktemp(suffix=".nvdb")
    write_nvdb_dense(path, dens)

    sc = Scene()
    sc.add("white", M.Diffuse([0.9, 0.9, 0.9]))
    sc.add("red", M.Diffuse([0.9, 0.2, 0.1]))
    sc.add("green", M.Diffuse([0.25, 0.8, 0.1]))
    # cornell box (cbox.pine layout: x in [-1,1], y in [0,2], z in [0,2])
    sc.add(S.Rect([0, 0, 1], [2, 0, 0], [0, 0, 2]), "white")   # floor
    sc.add(S.Rect([0, 2, 1], [2, 0, 0], [0, 0, 2]), "white")   # ceiling
    sc.add(S.Rect([0, 1, 2], [2, 0, 0], [0, 2, 0]), "white")   # back
    sc.add(S.Rect([-1, 1, 1], [0, 0, 2], [0, 2, 0]), "red")    # left
    sc.add(S.Rect([1, 1, 1], [0, 0, 2], [0, 2, 0]), "green")   # right
    sc.add(S.BoxAABB([-0.75, 0.0, 0.9], [-0.45, 1.45, 1.25]), "white")  # pillar
    sc.add(S.BoxAABB([0.1, 0.0, 1.0], [0.75, 0.62, 1.7]), "white")      # box
    sc.add(
        S.Rect([0, 1.98, 1.0], [0.35, 0, 0], [0, 0, 0.35]),
        M.Emissive([42.0, 40.0, 37.0]),
    )
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.diag([1.7, 0.9, 1.3]).astype(np.float32)
    m[:3, 3] = [-0.85, 0.95, 0.45]
    # chromatic scattering/absorption: warm-scattering, blue-absorbing cloud
    sc.add(
        VDBMedium(
            path, m, CloudPhaseFunction(0.65),
            [1.2, 2.2, 4.0],      # sigma_a per channel
            [38.0, 30.0, 22.0],   # sigma_s per channel (chromatic albedo)
        )
    )
    W = H = 360
    sc.set(ThinLenCamera(Film([W, H], "uncharted2"), [0, 1.0, -2.6], [0, 1.0, 1.0], 0.44))
    # spp batched host-side (TPU worker execution watchdog; see explosion)
    cs = sc.compile()
    acc = None
    SPP, BATCH = 256, 32
    for off in range(0, SPP, BATCH):
        img = render_wavefront(
            cs, sc.camera, W, H, BlueSampler(SPP), BATCH, 6,
            chunk=16384, sample_offset=off,
        )
        acc = img if acc is None else acc + img
    img = acc / (SPP // BATCH)
    jax.block_until_ready(img)
    save_image(
        "images/chromatic_cloud.png",
        np.asarray(color.uncharted2_filmic(img)), invert_y=True,
    )
    print("saved images/chromatic_cloud.png")


if __name__ == "__main__":
    main()
