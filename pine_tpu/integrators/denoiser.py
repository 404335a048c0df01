"""Denoiser (parity+: impl/integrator/denoiser.cpp + core/denoise.cpp).

The reference renders albedo/normal aux buffers and calls OIDN — whose body
is entirely commented out (denoise.cpp:8-45), so the reference `denoise()` is
a no-op.  We render the same aux buffers and apply a real edge-aware à-trous
wavelet filter (SVGF-style single-frame variant) guided by albedo and normal,
so `denoise(scene)` actually denoises.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pine_tpu.core import camera as camera_mod


def render_aux(cscene, cam, W, H):
    """First-hit albedo and shading normal at pixel centers
    (denoiser.cpp:16-23)."""
    from pine_tpu.core.capture import bind, collect_device_arrays
    from pine_tpu.scene import material_eval

    cam_params = cam.params()
    arrays, setters = collect_device_arrays((cscene, cam_params))
    n = W * H
    ys, xs = np.divmod(np.arange(n, dtype=np.int64), W)

    def fn(vals):
        with bind(setters, vals):
            f32 = jnp.float32
            pf = (jnp.asarray(np.stack([xs, ys], -1), f32) + 0.5) / jnp.asarray(
                [W, H], f32
            )
            ro, rd = camera_mod.gen_rays(cam_params, pf, jnp.full((n, 2), 0.5))
            t, gidx, hit, mesh_tri = cscene.intersect(
                ro, rd, jnp.zeros((n,), f32), jnp.full((n,), 3.0e38, f32)
            )
            t_hit = jnp.where(hit, t, 1.0)
            hp = ro + t_hit[:, None] * rd
            p_s, ns, uv = cscene.surface_info(gidx, hp, mesh_tri)
            ctx = dict(p=p_s, n=ns, uv=uv)
            mat_idx = cscene.g_mat_dev[jnp.clip(gidx, 0, cscene.n_global - 1)]
            state = material_eval.eval_bxdf_state(
                cscene, mat_idx, ctx, -rd,
                jnp.full((n,), 0.5, f32), jnp.full((n,), 0.5, f32), 0.0,
                jnp.zeros((n,), bool),
            )
            albedo = jnp.where(hit[:, None], state["albedo"], 0.0)
            normal = jnp.where(hit[:, None], ns, 0.0)
            return albedo.reshape(H, W, 3), normal.reshape(H, W, 3)

    return jax.jit(fn)(arrays)


def atrous_denoise(color, albedo, normal, iterations=4,
                   sigma_c=0.5, sigma_a=0.25, sigma_n=0.3):
    """Edge-aware à-trous wavelet filtering (jnp, jittable)."""
    color = jnp.asarray(color, jnp.float32)
    albedo = jnp.asarray(albedo, jnp.float32)
    normal = jnp.asarray(normal, jnp.float32)
    kern1d = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0  # B3 spline
    taps = [(i - 2, j - 2, float(kern1d[i] * kern1d[j])) for i in range(5) for j in range(5)]

    out = color
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), jnp.float32)
        for dy, dx, k in taps:
            sy, sx = dy * step, dx * step
            c = jnp.roll(out, (sy, sx), axis=(0, 1))
            a = jnp.roll(albedo, (sy, sx), axis=(0, 1))
            nn = jnp.roll(normal, (sy, sx), axis=(0, 1))
            w_c = jnp.exp(-jnp.sum((c - out) ** 2, -1, keepdims=True) / (sigma_c**2))
            w_a = jnp.exp(-jnp.sum((a - albedo) ** 2, -1, keepdims=True) / (sigma_a**2))
            ndot = jnp.sum(nn * normal, -1, keepdims=True)
            w_n = jnp.maximum(ndot, 0.0) ** 8
            w = k * w_c * w_a * (w_n + 1e-3)
            acc = acc + w * c
            wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-8)
    return out


def denoise_scene(scene):
    """PRL ``denoise(scene)`` (program_context.cpp:117-119): filters the
    film in place using freshly rendered aux buffers."""
    cscene = scene.compile()
    cam = scene.camera
    film = cam.film
    W, H = film.width, film.height
    albedo, normal = render_aux(cscene, cam, W, H)
    color = jnp.asarray(film.pixels[..., :3])
    out = jax.jit(atrous_denoise)(color, albedo, normal)
    film.set_rgb(out)  # device array: readback deferred to save-flush
    return film


class DenoiseIntegrator:
    def __init__(self, *a):
        pass

    def render(self, scene):
        return denoise_scene(scene)
