"""Ambient-occlusion integrator (parity: impl/integrator/ao.cpp).

The reference shoots 8 fixed directions per sample through `hit8` packets;
the wavefront form shoots the same 8-direction frame per (pixel,sample) lane —
the N-wide wavefront subsumes the 8-wide SIMD packets (SURVEY.md §2.10).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pine_tpu.core import camera as camera_mod
from pine_tpu.core.ray import offset_ray_origin
from pine_tpu.core.sampling import uniform_hemisphere
from pine_tpu.core.vecmath import face_forward, to_world

FLOAT_MAX = float(np.finfo(np.float32).max)


class AOIntegrator:
    def __init__(self, sampler, radius=None):
        self.sampler = sampler
        self.radius = radius  # None = scene-diagonal based

    def render(self, scene):
        cscene = scene.compile()
        cam = scene.camera
        film = cam.film
        W, H = film.width, film.height
        spp = self.sampler.spp
        lo, up = scene.get_aabb()
        radius = self.radius or float(np.linalg.norm(up - lo) / 2)
        sampler = self.sampler
        n = W * H
        cam_params = cam.params()

        def render_fn():
            ys, xs = jnp.divmod(jnp.arange(n, dtype=jnp.int32), W)

            def body(i, acc):
                jitter = sampler.u2(xs, ys, i, 0)
                p_film = (jnp.stack([xs, ys], -1).astype(jnp.float32) + jitter) / jnp.asarray(
                    [W, H], jnp.float32
                )
                ro, rd = camera_mod.gen_rays(cam_params, p_film, sampler.u2(xs, ys, i, 2))
                t, gidx, hitm, mesh_tri = cscene.intersect(
                    ro, rd, jnp.zeros((n,)), jnp.full((n,), FLOAT_MAX)
                )
                hp = ro + t[:, None] * rd
                p_s, ns, uv = cscene.surface_info(gidx, hp, mesh_tri)
                ns = face_forward(ns, -rd)
                occ = jnp.zeros((n,), jnp.float32)
                for k in range(8):
                    u = sampler.u2(xs, ys, i, 4 + 2 * k)
                    d_local = uniform_hemisphere(u)
                    d = to_world(ns, d_local)
                    so = offset_ray_origin(p_s, ns)
                    blocked = cscene.any_hit(
                        so, d, jnp.zeros((n,)), jnp.full((n,), radius)
                    )
                    occ = occ + jnp.where(blocked, 0.0, 1.0)
                ao = jnp.where(hitm, occ / 8.0, 1.0)
                return acc + jnp.stack([ao, ao, ao], -1)

            total = jax.lax.fori_loop(0, spp, body, jnp.zeros((n, 3), jnp.float32))
            return (total / spp).reshape(H, W, 3)

        img = jax.jit(render_fn)()
        film.set_rgb(img)  # device array: readback deferred to save-flush
        return film
