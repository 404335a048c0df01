"""Gallery: emissive VDB explosion (the reference's explosion-start.png
capability — flames + temperature grids driving blackbody emission during
delta tracking).  Synthesizes a turbulent fireball volume, renders with the
PathIntegrator on whatever device JAX picks, saves images/explosion.png."""
from __future__ import annotations

import numpy as np


def fbm3(shape, octaves=5, seed=3):
    """Cheap value-noise fbm on a grid (deterministic)."""
    rng = np.random.default_rng(seed)
    n = shape[0]
    out = np.zeros(shape, np.float32)
    for o in range(octaves):
        res = max(2, 2 ** (o + 1))
        coarse = rng.standard_normal((res + 1,) * 3).astype(np.float32)
        idx = np.linspace(0, res, n, endpoint=False)
        i0 = idx.astype(np.int32)
        f = (idx - i0).astype(np.float32)
        f = f * f * (3 - 2 * f)

        def lerp_axis(a, ax):
            sl0 = [slice(None)] * 3
            sl1 = [slice(None)] * 3
            g0 = a.take(i0, axis=ax)
            g1 = a.take(i0 + 1, axis=ax)
            shape_f = [1, 1, 1]
            shape_f[ax] = n
            ff = f.reshape(shape_f)
            return g0 * (1 - ff) + g1 * ff

        g = lerp_axis(lerp_axis(lerp_axis(coarse, 0), 1), 2)
        out += g * (0.6 ** o)
    return out


def make_explosion(n=96):
    g = (np.mgrid[0:n, 0:n, 0:n].astype(np.float32) / n) - 0.5
    x, y, z = g
    # mushroom: head sphere up top + stem column, displaced by fbm
    turb = fbm3((n, n, n), seed=11)
    r_head = np.sqrt(x * x + (y - 0.18) ** 2 * 1.4 + z * z)
    r_stem = np.sqrt(x * x + z * z) * 2.2 + np.clip(-(y + 0.05), 0, 1) * 0.4
    head = np.clip((0.26 + 0.10 * turb) - r_head, 0, 1) * 9
    stem = np.clip((0.12 + 0.07 * turb) - r_stem, 0, 1) * 8 * (y < 0.22)
    dens = np.clip(head + stem, 0, 1.6).astype(np.float32)
    heat = fbm3((n, n, n), seed=23)
    core = np.clip((0.20 + 0.08 * heat) - r_head, 0, 1) * 4 + np.clip(
        (0.10 + 0.05 * heat) - r_stem, 0, 1
    ) * 5
    flame = (np.clip(core, 0, 1) * dens).astype(np.float32)
    temp = np.clip(0.5 + 0.8 * np.clip(core, 0, 1) + 0.15 * heat, 0.0, 1.6).astype(
        np.float32
    )
    return dens, flame, temp


def main():
    import tempfile

    from pine_tpu.core import color
    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront
    from pine_tpu.io.image_io import save_image
    from pine_tpu.io.nvdb import write_nvdb_multi
    from pine_tpu.scene import materials as M, shapes as S
    from pine_tpu.scene.media import CloudPhaseFunction, VDBMedium
    from pine_tpu.scene.scene import Scene

    dens, flame, temp = make_explosion(72)
    path = tempfile.mktemp(suffix=".nvdb")
    write_nvdb_multi(path, {"density": dens, "flames": flame, "temperature": temp})

    m = np.eye(4, dtype=np.float32)
    m[:3, :3] *= np.diag([2.4, 2.4, 2.4]).astype(np.float32)
    m[:3, 3] = [-1.2, 0.0, -1.2]

    sc = Scene()
    sc.add("floor", M.Diffuse([0.45, 0.42, 0.4]))
    sc.add(S.Rect([0, 0, 0], [12, 0, 0], [0, 0, 12]), "floor")
    sc.add(S.Rect([0, 0.01, 6], [12, 0, 0], [0, 10, 0], True), "floor")  # backdrop
    sc.add(
        S.Rect([-4, 7, -6], [2.5, 0, 0], [0, 0, 2.5]),
        M.Emissive([16.0, 15.0, 14.0]),
    )
    sc.add(
        VDBMedium(path, m, CloudPhaseFunction(0.6), [6.0, 6.0, 6.0], [4.0, 4.0, 4.0],
                  3.0, 0.9)
    )
    W = H = 400
    sc.set(ThinLenCamera(Film([W, H], "uncharted2"), [0, 1.6, -4.6], [0, 1.1, 0], 0.3))

    import jax

    # spp batched host-side: one fused 256-spp grid-media chunk program
    # runs past the TPU worker's ~30 s execution watchdog
    cs = sc.compile()
    acc = None
    SPP, BATCH = 256, 32
    for off in range(0, SPP, BATCH):
        img = render_wavefront(
            cs, sc.camera, W, H, BlueSampler(SPP), BATCH, 5,
            chunk=16384, sample_offset=off,
        )
        acc = img if acc is None else acc + img
    img = acc / (SPP // BATCH)
    jax.block_until_ready(img)
    save_image("images/explosion.png", np.asarray(color.uncharted2_filmic(img)), invert_y=True)
    print("saved images/explosion.png")


if __name__ == "__main__":
    main()
