"""Tone mapping and color utilities (parity: src/pine/core/color.cpp)."""
from __future__ import annotations

import jax.numpy as jnp

from pine_tpu.core.vecmath import Pi


def uncharted2_filmic(v):
    """Uncharted2 filmic curve (color.cpp:6-13), batched over (...,3)."""
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30

    def mapping(x):
        return (x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F) - E / F

    white = mapping(jnp.float32(11.2))
    return mapping(v * 2.0) / white


def aces(x):
    """ACES approximation (color.cpp:15-23)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    r = (x * (a * x + b)) / (x * (c * x + d) + e)
    return jnp.clip(r, 0.0, 1.0)


TONE_MAPPERS = {"uncharted2": uncharted2_filmic, "aces": aces, "none": lambda x: x}


def luminance(color):
    return (
        color[..., 0] * 0.212671 + color[..., 1] * 0.715160 + color[..., 2] * 0.072169
    )


def color_map(v):
    """Blue->green->red heat map (color.cpp:25-35), vectorized."""
    c0 = jnp.zeros(3)
    c1 = jnp.array([0.0, 0.0, 0.5])
    c2 = jnp.array([0.0, 1.0, 0.0])
    c3 = jnp.array([1.0, 0.0, 0.0])
    v = jnp.asarray(v)[..., None]
    seg0 = c0 + (c1 - c0) * (v * 3.0)
    seg1 = c1 + (c2 - c1) * ((v - 1 / 3) * 3.0)
    seg2 = c2 + (c3 - c2) * ((v - 2 / 3) * 3.0)
    hot = jnp.concatenate([v, jnp.zeros_like(v), jnp.zeros_like(v)], axis=-1)
    out = jnp.where(v < 1 / 3, seg0, jnp.where(v < 2 / 3, seg1, jnp.where(v < 1.0, seg2, hot)))
    return out


def srgb_encode(v):
    """Linear -> display encode used by Array2d::from (array.h:37-44): 1/2.2 gamma."""
    return jnp.power(jnp.clip(v, 0.0, 1.0), 1.0 / 2.2)


def srgb_decode(v):
    return jnp.power(jnp.clip(v, 0.0, 1.0), 2.2)
