"""Single-scatter homogeneous-volume test integrator
(parity: impl/integrator/vol.cpp:14-35).

The reference is a self-contained analytic check: a point source at
Lp=(0,1,4) inside an infinite homogeneous medium (sigma_s=1, sigma_a=0);
radiance along each camera ray comes from the closed-form single-scatter
integral using the exponential-integral approximation E1 (vol.cpp:16-21).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pine_tpu.core import camera as camera_mod

LP = np.array([0.0, 1.0, 4.0], np.float32)  # vol.cpp:13
SIGMA_S = 1.0
SIGMA_A = 0.0
SIGMA_T = SIGMA_S + SIGMA_A


def _E1(x):
    """Swamee-Ohija-style E1 approximation (vol.cpp:16-21); x > 0."""
    x = jnp.maximum(x, 1e-6)
    A = jnp.log((0.56146 / x + 0.65) * (1.0 + x))
    B = x**4 * jnp.exp(7.7 * x) * (2.0 + x) ** 3.7
    return (A ** -7.7 + B) ** -0.13


def vol_radiance(ro, rd):
    """Closed-form single scatter toward the point source (vol.cpp:23-35)."""
    lp = jnp.asarray(LP)
    b = -2.0 * jnp.sum((lp - ro) * rd, -1)
    c = jnp.sum((lp - ro) ** 2, -1)
    delta = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(-delta, 1e-12))
    t0 = (-b - sq) / 2.0
    t1 = (-b + sq) / 2.0
    # The reference feeds E1 negative arguments (vol.cpp:34 is an unfinished
    # experiment, LOG call and all); we evaluate on |t| and keep the positive
    # orientation of the difference quotient so radiance peaks at the source.
    I = (
        jnp.exp(-SIGMA_T * t0) * _E1(jnp.maximum(SIGMA_S * jnp.abs(t0), 1e-6))
        - jnp.exp(-SIGMA_T * t1) * _E1(jnp.maximum(SIGMA_T * jnp.abs(t1), 1e-6))
    ) / jnp.maximum(t1 - t0, 1e-6)
    out = (SIGMA_S / SIGMA_T) * I
    return jnp.maximum(out, 0.0)[:, None] * jnp.ones((1, 3), jnp.float32)


class VolIntegrator:
    """PRL: VolIntegrator(sampler) (program_context.cpp:64-67)."""

    def __init__(self, sampler):
        self.sampler = sampler

    def render(self, scene):
        cam = scene.camera
        film = cam.film
        W, H = film.width, film.height
        n = W * H
        cam_params = cam.params()
        ys, xs = np.divmod(np.arange(n, dtype=np.int64), W)
        pf = (jnp.asarray(np.stack([xs, ys], -1), jnp.float32) + 0.5) / jnp.asarray(
            [W, H], jnp.float32
        )
        ro, rd = camera_mod.gen_rays(cam_params, pf, jnp.full((n, 2), 0.5))
        img = jax.jit(vol_radiance)(ro, rd).reshape(H, W, 3)
        film.set_rgb(img)  # device array: readback deferred to save-flush
        return film
