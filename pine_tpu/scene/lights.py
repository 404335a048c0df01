"""Lights (parity: src/pine/core/light.h/.cpp, lightsampler.cpp).

Host-side light objects; the wavefront NEE pass iterates over the (small,
static) light list and masks by the per-lane uniformly-chosen light index —
the TPU form of UniformLightSampler's dynamic variant dispatch.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pine_tpu.core.sampling import uniform_sphere
from pine_tpu.core.vecmath import Pi, dot, length, safe_normalize
from pine_tpu.scene import nodes as N

FLOAT_MAX = float(np.finfo(np.float32).max)


class Light:
    is_delta = False

    def sample(self, p, u2, u1, ctx):
        """Batched: p (N,3), u2 (N,2), u1 (N,) -> dict(le,wo,distance,pdf,valid)."""
        raise NotImplementedError


class PointLight(Light):
    is_delta = True

    def __init__(self, position, color):
        self.position = np.asarray(position, np.float32)
        self.color = np.asarray(color, np.float32)

    def sample(self, p, u2, u1, ctx):
        d = jnp.asarray(self.position) - p
        dist = length(d)
        wo = d / jnp.maximum(dist[..., None], 1e-20)
        return dict(
            le=jnp.broadcast_to(jnp.asarray(self.color), p.shape),
            wo=wo,
            distance=dist,
            pdf=dist**2,
            valid=jnp.ones(dist.shape, bool),
        )


class SpotLight(Light):
    is_delta = True

    def __init__(self, position, direction, color, falloff_radian, cutoff_additional_radian=0.0):
        self.position = np.asarray(position, np.float32)
        self.direction = np.asarray(direction, np.float64)
        self.direction = (self.direction / np.linalg.norm(self.direction)).astype(np.float32)
        self.color = np.asarray(color, np.float32)
        self.falloff_cos = float(np.cos(falloff_radian))
        self.cutoff_cos = float(np.cos(falloff_radian + cutoff_additional_radian))

    def sample(self, p, u2, u1, ctx):
        d = jnp.asarray(self.position) - p
        dist = length(d)
        wo = d / jnp.maximum(dist[..., None], 1e-20)
        cos = -dot(wo, jnp.asarray(self.direction))
        denom = max(self.falloff_cos - self.cutoff_cos, 1e-9)
        scale = jnp.where(
            cos > self.falloff_cos,
            1.0,
            jnp.where(cos > self.cutoff_cos, (cos - self.cutoff_cos) / denom, 0.0),
        )
        return dict(
            le=jnp.asarray(self.color) * scale[..., None],
            wo=wo,
            distance=dist,
            pdf=dist**2,
            valid=cos > self.cutoff_cos,
        )


class DirectionalLight(Light):
    is_delta = True

    def __init__(self, direction, color):
        d = np.asarray(direction, np.float64)
        self.direction = (d / np.linalg.norm(d)).astype(np.float32)
        self.color = np.asarray(color, np.float32)

    def sample(self, p, u2, u1, ctx):
        n = p.shape[0]
        return dict(
            le=jnp.broadcast_to(jnp.asarray(self.color), (n, 3)),
            wo=jnp.broadcast_to(jnp.asarray(self.direction), (n, 3)),
            distance=jnp.full((n,), 1e10, jnp.float32),
            pdf=jnp.ones((n,), jnp.float32),
            valid=jnp.ones((n,), bool),
        )


class AreaLight(Light):
    """Emissive geometry (light.cpp:55-69); `shape` is the host Shape and
    `material` the Emissive material whose color node is evaluated at the
    sampled point."""

    is_delta = False

    def __init__(self, shape, material, global_idx):
        self.shape = shape
        self.material = material
        self.global_idx = int(global_idx)

    def sample(self, p, u2, u1, ctx):
        from pine_tpu.scene import intersect as I

        n = p.shape[0]
        params = jnp.asarray(self.shape.params())
        rows = jnp.broadcast_to(params, (n,) + params.shape)
        ss = I.SAMPLE[self.shape.type_id](rows, p, u2)
        ectx = dict(p=ss["p"], n=ss["n"], uv=jnp.zeros((n, 2), jnp.float32))
        le = N.eval_vec3_node(self.material.color, ectx, n)
        # emissive only from the front face (material.h le: dot(wo, n) >= 0)
        front = dot(-ss["w"], ss["n"]) >= 0.0
        valid = front & (ss["pdf"] > 0.0) & jnp.any(le > 0.0, axis=-1)
        return dict(
            le=le, wo=ss["w"], distance=ss["distance"], pdf=ss["pdf"], valid=valid
        )


class EnvironmentLight(Light):
    """Base for Sky/Atmosphere/ImageSky: color(wo) + pdf(wo) for MIS."""

    def color(self, wo):
        raise NotImplementedError

    def pdf(self, wo):
        raise NotImplementedError


class Sky(EnvironmentLight):
    """Gradient sky (color.cpp sky_color; light.cpp:71-86)."""

    def __init__(self, sun_color):
        self.sun_color = np.asarray(sun_color, np.float32)

    def color(self, wo):
        t = wo[..., 1:2] / 2 + 0.7
        warm = jnp.asarray([1.0, 0.8, 0.6])
        cool = jnp.asarray([0.6, 0.8, 1.0])
        return jnp.asarray(self.sun_color) * jnp.square(warm + (cool - warm) * t)

    def pdf(self, wo):
        return jnp.full(wo.shape[:-1], 1.0 / (4 * Pi), jnp.float32)

    def sample(self, p, u2, u1, ctx):
        wo = uniform_sphere(u2)
        n = p.shape[0]
        return dict(
            le=self.color(wo),
            wo=wo,
            distance=jnp.full((n,), FLOAT_MAX, jnp.float32),
            pdf=jnp.full((n,), 1.0 / (4 * Pi), jnp.float32),
            valid=jnp.ones((n,), bool),
        )
