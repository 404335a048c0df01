"""Material -> per-lane BXDF state (parity: material.h/.cpp sample_bxdf).

Evaluates every scene material's parameter nodes densely and selects by the
lane's material slot; stochastic lobe choices (Uber metallic/transmission,
Subsurface Fresnel) consume the lane's sampler dims, exactly mirroring
material.cpp:9-29 but vectorized.
"""
from __future__ import annotations

import jax.numpy as jnp

from pine_tpu.core.scattering import fr_dielectric
from pine_tpu.core.vecmath import dot
from pine_tpu.scene import materials as M
from pine_tpu.scene import nodes as N


def eval_bxdf_state(cscene, mat_idx, ctx, wi_world, u_a, u_b, min_roughness, diffused):
    """Returns (bxdf_state dict, is_emissive_lane bool array).

    ctx: dict(p,n,uv) at the hit; u_a/u_b: (N,) uniforms for lobe choices;
    min_roughness: scalar (0.6); diffused: (N,) bool (diffuse_length > 0).
    """
    n_l = wi_world.shape[0]
    tag = jnp.zeros((n_l,), jnp.int32)
    albedo = jnp.zeros((n_l, 3), jnp.float32)
    roughness = jnp.zeros((n_l,), jnp.float32)
    ior = jnp.full((n_l,), 1.4, jnp.float32)
    sigma_s = jnp.zeros((n_l, 3), jnp.float32)
    minr = jnp.where(diffused, min_roughness, 0.0)

    for slot, mat in enumerate(cscene.materials):
        m = mat_idx == slot
        m3 = m[:, None]
        if mat.tag == M.EMISSIVE:
            continue
        if mat.tag == M.DIFFUSE:
            alb = N.eval_vec3_node(mat.albedo, ctx, n_l)
            tag = jnp.where(m, M.BX_DIFFUSE, tag)
            albedo = jnp.where(m3, alb, albedo)
        elif mat.tag == M.METAL:
            alb = N.eval_vec3_node(mat.albedo, ctx, n_l)
            r = jnp.maximum(N.eval_scalar_node(mat.roughness, ctx, n_l), minr)
            tag = jnp.where(m, M.BX_CONDUCTOR, tag)
            albedo = jnp.where(m3, alb, albedo)
            roughness = jnp.where(m, r, roughness)
        elif mat.tag == M.GLOSSY:
            alb = N.eval_vec3_node(mat.albedo, ctx, n_l)
            r = jnp.maximum(N.eval_scalar_node(mat.roughness, ctx, n_l), minr)
            i = N.eval_scalar_node(mat.ior, ctx, n_l)
            tag = jnp.where(m, M.BX_DIFF_DIELECTRIC, tag)
            albedo = jnp.where(m3, alb, albedo)
            roughness = jnp.where(m, r, roughness)
            ior = jnp.where(m, i, ior)
        elif mat.tag == M.GLASS:
            alb = N.eval_vec3_node(mat.albedo, ctx, n_l)
            r = jnp.maximum(N.eval_scalar_node(mat.roughness, ctx, n_l), minr)
            i = N.eval_scalar_node(mat.ior, ctx, n_l)
            tag = jnp.where(m, M.BX_REFR_DIELECTRIC, tag)
            albedo = jnp.where(m3, alb, albedo)
            roughness = jnp.where(m, r, roughness)
            ior = jnp.where(m, i, ior)
        elif mat.tag == M.UBER:
            alb = N.eval_vec3_node(mat.albedo, ctx, n_l)
            r = N.eval_scalar_node(mat.roughness, ctx, n_l)
            metallic = N.eval_scalar_node(mat.metallic, ctx, n_l)
            transmission = N.eval_scalar_node(mat.transmission, ctx, n_l)
            pick_metal = u_a < metallic
            pick_trans = u_b < transmission
            t = jnp.where(
                pick_metal,
                M.BX_CONDUCTOR,
                jnp.where(pick_trans, M.BX_REFR_DIELECTRIC, M.BX_DIFF_DIELECTRIC),
            )
            tag = jnp.where(m, t, tag)
            albedo = jnp.where(m3, alb, albedo)
            roughness = jnp.where(m, r, roughness)
            ior = jnp.where(m, mat.ior, ior)
        elif mat.tag == M.SUBSURFACE:
            alb = N.eval_vec3_node(mat.albedo, ctx, n_l)
            r = jnp.maximum(N.eval_scalar_node(mat.roughness, ctx, n_l), minr)
            fr = fr_dielectric(dot(wi_world, ctx["n"]), mat.ior)
            t = jnp.where(
                u_a < fr,
                M.BX_REFRACTIVE,
                jnp.where(diffused, M.BX_DIFFUSE, M.BX_BSSRDF),
            )
            tag = jnp.where(m, t, tag)
            albedo = jnp.where(m3, alb, albedo)
            roughness = jnp.where(m & (u_a < fr), r, roughness)
            ior = jnp.where(m, mat.ior, ior)
            sigma_s = jnp.where(
                m3, jnp.asarray(mat.sigma_s, jnp.float32)[None, :], sigma_s
            )
        else:
            raise ValueError(f"unknown material tag {mat.tag}")

    return dict(tag=tag, albedo=albedo, roughness=roughness, ior=ior, sigma_s=sigma_s)
