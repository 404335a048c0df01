"""Ray utilities (parity: src/pine/core/ray.h).

Rays are SoA: origin (N,3), direction (N,3), tmin (N,), tmax (N,).
``offset_ray_origin`` reproduces the reference's watertight integer-ULP offset
(ray.h:26-39) with jnp bit views.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FLOAT_MAX = float(np.finfo(np.float32).max)


def offset_ray_origin(p, n):
    """Offset p along n by a few ULPs to avoid self-intersection (ray.h:26-39)."""
    origin = 1.0 / 32.0
    float_scale = 1.0 / 65536.0
    int_scale = 256.0

    p = jnp.asarray(p, jnp.float32)
    of_i = (int_scale * n).astype(jnp.int32)
    p_i_bits = p.view(jnp.int32) + jnp.where(p < 0.0, -of_i, of_i)
    p_i = p_i_bits.view(jnp.float32)
    return jnp.where(jnp.abs(p) < origin, p + n * float_scale, p_i)


def spawn_ray(p, n, wo, distance=FLOAT_MAX):
    """(ray.h:41-49): offset origin, tmax = distance * (1 - 1e-3)."""
    o = offset_ray_origin(p, n)
    tmax = distance * (1.0 - 1e-3)
    return o, wo, tmax
