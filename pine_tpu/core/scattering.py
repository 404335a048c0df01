"""Shading-frame scattering math, batched (parity: src/pine/core/scattering.h).

All directions are in the local shading frame (z == geometric normal).  All
functions are branch-free vectorized forms of the reference's scalar helpers so
they run dense across a ray wavefront on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from pine_tpu.core.sampling import sample_disk_polar
from pine_tpu.core.vecmath import Pi, dot, dotk, length_squared, safe_normalize

EPS = 1e-7


def cos_theta(w):
    return w[..., 2]


def cos2_theta(w):
    return w[..., 2] ** 2


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def sin2_theta(w):
    return 1.0 - cos2_theta(w)


def tan2_theta(w):
    return sin2_theta(w) / jnp.maximum(cos2_theta(w), EPS)


def cos_phi(w):
    sin_t = jnp.sqrt(jnp.maximum(sin2_theta(w), 0.0))
    return jnp.where(sin_t == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.maximum(sin_t, EPS), -1.0, 1.0))


def sin_phi(w):
    sin_t = jnp.sqrt(jnp.maximum(sin2_theta(w), 0.0))
    return jnp.where(sin_t == 0.0, 1.0, jnp.clip(w[..., 1] / jnp.maximum(sin_t, EPS), -1.0, 1.0))


def same_hemisphere(w0, w1):
    return w0[..., 2] * w1[..., 2] > 0.0


def face_normal(v):
    """Flip v into the +z hemisphere (scattering.h FaceNormal)."""
    return jnp.where(v[..., 2:3] < 0.0, -v, v)


def reflect_z(w):
    """Mirror reflection about local z axis."""
    return w * jnp.array([-1.0, -1.0, 1.0], w.dtype)


def reflect(wi, n):
    return 2.0 * dotk(wi, n) * n - wi


def refract(wi, n, eta):
    """Snell refraction (scattering.h Refract). Returns (ok, wt, etap).

    eta is the relative IOR of the surface (n side); handles rays from either
    side by flipping, exactly as the reference.
    """
    cos_i = dot(n, wi)
    flip = cos_i < 0.0
    eta_eff = jnp.where(flip, 1.0 / eta, eta)
    cos_i = jnp.abs(cos_i)
    n_eff = jnp.where(flip[..., None], -n, n)
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i**2)
    sin2_t = sin2_i / eta_eff**2
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wt = -wi / eta_eff[..., None] + (cos_i / eta_eff - cos_t)[..., None] * n_eff
    return ok, wt, eta_eff


def fr_dielectric(cos_i, eta):
    """Dielectric Fresnel (scattering.h FrDielectric), vectorized."""
    flip = cos_i < 0.0
    eta = jnp.where(flip, 1.0 / eta, eta)
    cos_i = jnp.abs(cos_i)
    sin2_i = 1.0 - cos_i**2
    sin2_t = sin2_i / eta**2
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_parl = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, EPS)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, EPS)
    return jnp.where(tir, 1.0, (r_parl**2 + r_perp**2) / 2.0)


def fr_schlick(f0, cos_t):
    return f0 + (1.0 - f0) * jnp.power(jnp.maximum(1.0 - cos_t, 0.0), 5.0)[..., None]


# ---- Trowbridge-Reitz (GGX) microfacet distribution -------------------------
# Isotropic-only vectorized port of scattering.h TrowbridgeReitzDistribution
# (the reference always constructs it with alphaX == alphaY == roughness^2).


def ggx_d(alpha, wm):
    tan2 = tan2_theta(wm)
    cos4 = cos2_theta(wm) ** 2
    e = tan2 * ((cos_phi(wm) / alpha) ** 2 + (sin_phi(wm) / alpha) ** 2)
    d = 1.0 / jnp.maximum(Pi * alpha * alpha * cos4 * (1.0 + e) ** 2, EPS)
    return jnp.where(cos4 < 1e-6, 0.0, d)


def ggx_lambda(alpha, w):
    tan2 = tan2_theta(w)
    alpha2 = (cos_phi(w) * alpha) ** 2 + (sin_phi(w) * alpha) ** 2
    return (jnp.sqrt(1.0 + alpha2 * tan2) - 1.0) / 2.0


def ggx_g1(alpha, w):
    return 1.0 / (1.0 + ggx_lambda(alpha, w))


def ggx_g(alpha, wi, wo):
    return 1.0 / (1.0 + ggx_lambda(alpha, wi) + ggx_lambda(alpha, wo))


def ggx_d_g(alpha, wi, wm, wo):
    return ggx_d(alpha, wm) * ggx_g(alpha, wi, wo)


def ggx_d_visible(alpha, w, wm):
    """Visible-normal density D_w(wm) (scattering.h D(w, wm))."""
    return (
        ggx_g1(alpha, w)
        / jnp.maximum(abs_cos_theta(w), EPS)
        * ggx_d(alpha, wm)
        * jnp.abs(dot(w, wm))
    )


def ggx_pdf(alpha, w, wm):
    return jnp.maximum(ggx_d_visible(alpha, w, wm), EPS)


def ggx_sample_wm(alpha, w, u):
    """Sample a visible microfacet normal (scattering.h SampleWm, Heitz VNDF)."""
    a = alpha[..., None]
    wh = safe_normalize(jnp.concatenate([a * w[..., :2], w[..., 2:3]], axis=-1))
    wh = face_normal(wh)
    z_axis = jnp.zeros_like(wh).at[..., 2].set(1.0)
    t1 = jnp.where(
        (wh[..., 2] < 0.99999)[..., None],
        safe_normalize(jnp.cross(z_axis, wh)),
        jnp.zeros_like(wh).at[..., 0].set(1.0),
    )
    t2 = jnp.cross(wh, t1)
    p = sample_disk_polar(u)
    h = jnp.sqrt(jnp.maximum(1.0 - p[..., 0] ** 2, 0.0))
    py = (1.0 - (1.0 + wh[..., 2]) / 2.0) * h + (1.0 + wh[..., 2]) / 2.0 * p[..., 1]
    p = jnp.stack([p[..., 0], py], axis=-1)
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - length_squared(p)))
    nh = p[..., 0:1] * t1 + p[..., 1:2] * t2 + pz[..., None] * wh
    return safe_normalize(
        jnp.concatenate(
            [a * nh[..., :2], jnp.maximum(1e-6, nh[..., 2:3])], axis=-1
        )
    )
