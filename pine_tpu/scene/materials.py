"""Materials (parity: src/pine/core/material.h/.cpp).

Host-side material objects carry node-typed parameters; at shading time the
wavefront evaluates every scene material's parameter nodes for all lanes and
selects by material index (dense masked dispatch — XLA folds constant nodes to
broadcasts so the common all-constant case is free).

Material -> BXDF selection (material.cpp:9-29) is stochastic for Uber and
Subsurface; the wavefront draws those decisions from the lane's sampler dims
and emits a per-lane BXDF tag + (albedo, roughness, ior) params.
"""
from __future__ import annotations

import numpy as np

from pine_tpu.scene import nodes as N

# Material tags
EMISSIVE = 0
DIFFUSE = 1
METAL = 2
GLOSSY = 3
GLASS = 4
UBER = 5
SUBSURFACE = 6

# BXDF tags (bxdf.h:140 variant order)
BX_DIFFUSE = 0
BX_CONDUCTOR = 1
BX_REFRACTIVE = 2
BX_REFR_DIELECTRIC = 3
BX_DIFF_DIELECTRIC = 4
BX_BSSRDF = 5


class Material:
    tag: int = -1

    def is_emissive(self):
        return self.tag == EMISSIVE


class Emissive(Material):
    tag = EMISSIVE

    def __init__(self, color):
        self.color = N._as_node(color)


class Diffuse(Material):
    tag = DIFFUSE

    def __init__(self, albedo):
        self.albedo = N._as_node(albedo)


class Metal(Material):
    tag = METAL

    def __init__(self, albedo, roughness):
        self.albedo = N._as_node(albedo)
        self.roughness = N._as_node(roughness)


class Glossy(Material):
    tag = GLOSSY

    def __init__(self, albedo, roughness, ior=1.4):
        self.albedo = N._as_node(albedo)
        self.roughness = N._as_node(roughness)
        self.ior = N._as_node(ior)


class Glass(Material):
    tag = GLASS

    def __init__(self, albedo, roughness, ior=1.4):
        self.albedo = N._as_node(albedo)
        self.roughness = N._as_node(roughness)
        self.ior = N._as_node(ior)


class Uber(Material):
    tag = UBER

    def __init__(self, albedo, roughness, metallic=0.0, transmission=0.0, ior=1.45):
        self.albedo = N._as_node(albedo)
        self.roughness = N._as_node(roughness)
        self.metallic = N._as_node(metallic)
        self.transmission = N._as_node(transmission)
        self.ior = float(ior)


class Subsurface(Material):
    tag = SUBSURFACE

    def __init__(self, albedo, roughness, sigma_s):
        self.albedo = N._as_node(albedo)
        self.roughness = N._as_node(roughness)
        sig = np.asarray(
            N.constant_value(sigma_s) if not isinstance(sigma_s, N.Node) else sigma_s.value,
            np.float32,
        ).reshape(-1)
        self.sigma_s = np.broadcast_to(sig, (3,)).astype(np.float32).copy()
        self.ior = 1.4
