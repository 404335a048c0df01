"""ReSTIR direct-illumination integrator
(parity+: impl/integrator/restir.cpp:36-127).

The reference builds initial samples, a temporal reservoir grid and a spatial
reuse pass — then its radiance body and final gather are commented out, so it
renders nothing from the reservoirs.  This implementation runs the complete
pipeline dense on the wavefront:

1. first-hit G-buffer from camera rays;
2. M candidate light samples per pixel -> weighted reservoir sampling with
   target p_hat = luminance of the unshadowed contribution (ReSample::
   target_pdf, restir.cpp:39);
3. visibility check on the winning sample (biased-visibility ReSTIR, like the
   reference's spatial pass, restir.cpp:113-117);
4. spatial reuse rounds merging random neighbors gated on normal/depth
   similarity (restir.cpp:103-105);
5. shading with W = w_sum / (M * p_hat(y)), plus emissive/env on direct hits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pine_tpu.core import camera as camera_mod
from pine_tpu.core import rng
from pine_tpu.core.ray import offset_ray_origin
from pine_tpu.core.vecmath import dot, face_forward, to_local
from pine_tpu.integrators import path as path_mod
from pine_tpu.scene import bxdf as bxdf_mod
from pine_tpu.scene import material_eval

M_CANDIDATES = 8
SPATIAL_ROUNDS = 2
SPATIAL_TAPS = 4
SPATIAL_RADIUS = 16


def luminance(c):
    return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722


class RestirIntegrator:
    """PRL: RestirIntegrator(sampler, max_path_length)
    (program_context.cpp:108-113); DI only, like the reference skeleton."""

    def __init__(self, sampler, max_path_length=2):
        self.sampler = sampler
        self.max_path_length = int(max_path_length)

    def render(self, scene):
        cscene = scene.compile()
        cam = scene.camera
        film = cam.film
        W, H = film.width, film.height
        img = render_restir(cscene, cam, W, H, self.sampler, self.sampler.spp)
        film.set_rgb(img)  # device array: readback deferred to save-flush
        return film


def render_restir(cscene, cam, W, H, sampler, spp):
    from pine_tpu.core.capture import bind, collect_device_arrays

    if getattr(cscene, "grid_media", None):
        from pine_tpu.core.log import WARNING

        WARNING(
            "RestirIntegrator renders grid (VDB) media with a "
            "single-scatter approximation (multiple in-medium scattering "
            "truncated); PathIntegrator traces them fully."
        )
    cam_params = cam.params()
    arrays, setters = collect_device_arrays((cscene, sampler, cam_params))
    n = W * H
    ys_np, xs_np = np.divmod(np.arange(n, dtype=np.int64), W)
    xs = jnp.asarray(xs_np, jnp.int32)
    ys = jnp.asarray(ys_np, jnp.int32)

    def fn(xs, ys, vals):
        with bind(setters, vals):
            def body(si, acc):
                return acc + _restir_sample(
                    cscene, cam_params, xs, ys, W, H, sampler, si
                )

            total = jax.lax.fori_loop(
                0, spp, body, jnp.zeros((n, 3), jnp.float32)
            )
            return total / spp

    return jax.jit(fn)(xs, ys, arrays).reshape(H, W, 3)


def _restir_sample(cscene, cam_params, xs, ys, W, H, sampler, si):
    f32 = jnp.float32
    n = xs.shape[0]
    n_lights = len(cscene.lights)

    jitter = sampler.u2(xs, ys, si, 0)
    p_film = (jnp.stack([xs, ys], -1).astype(f32) + jitter) / jnp.asarray([W, H], f32)
    ro, rd = camera_mod.gen_rays(cam_params, p_film, sampler.u2(xs, ys, si, 2))
    t, gidx, hit, mesh_tri = cscene.intersect(
        ro, rd, jnp.zeros((n,), f32), jnp.full((n,), 3.0e38, f32)
    )
    t_hit = jnp.where(hit, t, 1.0)
    hp = ro + t_hit[:, None] * rd
    p_s, ns, uv = cscene.surface_info(gidx, hp, mesh_tri)
    ctx = dict(p=p_s, n=ns, uv=uv)
    wi_world = -rd

    # homogeneous-media terms of the camera segment (transmittance applies
    # to everything arriving through it; in-scatter adds unconditionally)
    if cscene.media or getattr(cscene, "grid_media", None):
        seg_tr0, seg_sc0 = path_mod.segment_medium_terms(
            cscene, ro, rd, jnp.where(hit, t, 1e8), jnp.ones((n,), bool),
            xs, ys, sampler, si, 8 + M_CANDIDATES * 4, include_grid=True,
        )
    else:
        seg_tr0 = jnp.ones((n, 3), f32)
        seg_sc0 = jnp.zeros((n, 3), f32)

    L = seg_sc0
    emis = cscene.is_emissive_lane(gidx) & hit
    if cscene.emissive_globals:
        le = cscene.emissive_le(gidx, ctx, wi_world)
        L = L + jnp.where(emis[:, None], le * seg_tr0, 0.0)
    if cscene.env_light is not None:
        L = L + jnp.where(
            (~hit)[:, None], cscene.env_light.color(rd) * seg_tr0, 0.0
        )
    shade = hit & ~emis
    if n_lights == 0:
        return L

    mat_idx = cscene.g_mat_dev[jnp.clip(gidx, 0, cscene.n_global - 1)]
    u_mat = sampler.u2(xs, ys, si, 4)
    state = material_eval.eval_bxdf_state(
        cscene, mat_idx, ctx, wi_world, u_mat[:, 0], u_mat[:, 1], 0.0,
        jnp.zeros((n,), bool),
    )
    wi = to_local(ns, wi_world)

    def raw_contrib(ls):
        """Unshadowed contribution WITHOUT the sampling pdf (ReSample::Lo)."""
        wo_l = to_local(ns, ls["wo"])
        f_l, _ = bxdf_mod.f_and_pdf(state, wi, wo_l)
        cosine = jnp.abs(dot(ls["wo"], ns))
        contrib = ls["le"] * f_l * cosine[:, None]
        return jnp.where(ls["valid"][:, None], contrib, 0.0)

    # ---- weighted reservoir sampling over M candidates (restir.cpp:48-65):
    # w_i = p_hat(x_i) / p(x_i), winner kept with probability w_i / wsum
    r_wsum = jnp.zeros((n,), f32)
    r_C = jnp.zeros((n, 3), f32)  # raw contribution of the winner
    r_wo = jnp.zeros((n, 3), f32)
    r_dist = jnp.ones((n,), f32)
    for m in range(M_CANDIDATES):
        dim = 8 + m * 4
        u_sel = sampler.u1(xs, ys, si, dim)
        u_l2 = sampler.u2(xs, ys, si, dim + 1)
        ls = path_mod.sample_one_light(cscene, p_s, u_sel, u_l2, ctx)
        C_i = raw_contrib(ls)
        phat_i = luminance(C_i)
        w_i = phat_i / jnp.maximum(ls["pdf"], 1e-20)
        w_i = jnp.where(ls["valid"] & (ls["pdf"] > 0), w_i, 0.0)
        r_wsum = r_wsum + w_i
        u_keep = sampler.u1(xs, ys, si, dim + 3)
        take = u_keep < w_i / jnp.maximum(r_wsum, 1e-20)
        r_C = jnp.where(take[:, None], C_i, r_C)
        r_wo = jnp.where(take[:, None], ls["wo"], r_wo)
        r_dist = jnp.where(take, ls["distance"], r_dist)
    r_phat = luminance(r_C)
    r_M = jnp.full((n,), float(M_CANDIDATES), f32)

    # visibility of the winner (biased-visibility reuse, restir.cpp:113-117)
    so = offset_ray_origin(p_s, face_forward(ns, r_wo))
    occ = cscene.any_hit(so, r_wo, jnp.zeros((n,), f32), r_dist * (1.0 - 1e-3))
    if cscene.media or getattr(cscene, "grid_media", None):
        # media attenuate the realized contribution, NOT the RIS target
        # p_hat (which stays unshadowed like the occlusion convention), so
        # L_di = C*tr * wsum/(M*p_hat) carries the attenuation through
        r_C = r_C * cscene.transmittance(so, r_wo, r_dist)
    r_phat = jnp.where(occ, 0.0, r_phat)
    r_W = jnp.where(
        r_phat > 0.0, r_wsum / jnp.maximum(r_M * r_phat, 1e-20), 0.0
    )

    # ---- spatial reuse (restir.cpp:98-126): merge w_in = p_hat*W_n*M_n -----
    depth_buf = t_hit
    for rnd in range(SPATIAL_ROUNDS):
        for tap in range(SPATIAL_TAPS):
            salt = jnp.uint32(3000 + rnd * 97 + tap)
            ox = (rng.uniform(xs.astype(jnp.uint32), ys.astype(jnp.uint32),
                              jnp.uint32(si), salt) - 0.5) * (2 * SPATIAL_RADIUS)
            oy = (rng.uniform(xs.astype(jnp.uint32), ys.astype(jnp.uint32),
                              jnp.uint32(si), salt + jnp.uint32(1)) - 0.5) * (2 * SPATIAL_RADIUS)
            qx = jnp.clip(xs + ox.astype(jnp.int32), 0, W - 1)
            qy = jnp.clip(ys + oy.astype(jnp.int32), 0, H - 1)
            q = (qy * W + qx).astype(jnp.int32)
            # neighbor gating on normal/depth similarity (restir.cpp:103-105)
            ok_n = jnp.sum(ns * ns[q], axis=-1) > 0.995
            ok_t = jnp.abs(depth_buf - depth_buf[q]) < 0.1
            ok = ok_n & ok_t & shade & shade[q]
            w_in = jnp.where(ok, r_phat[q] * r_W[q] * r_M[q], 0.0)
            new_wsum = r_wsum + w_in
            u_keep = rng.uniform(
                xs.astype(jnp.uint32), ys.astype(jnp.uint32), jnp.uint32(si),
                salt + jnp.uint32(7),
            )
            take = (u_keep < w_in / jnp.maximum(new_wsum, 1e-20)) & ok
            r_C = jnp.where(take[:, None], r_C[q], r_C)
            r_wsum = new_wsum
            r_M = r_M + jnp.where(ok, r_M[q], 0.0)
            r_phat = jnp.where(take, r_phat[q], r_phat)
        r_W = jnp.where(
            r_phat > 0.0, r_wsum / jnp.maximum(r_M * r_phat, 1e-20), 0.0
        )

    L_di = r_C * r_W[:, None]
    return L + seg_tr0 * jnp.where(shade[:, None], L_di, 0.0)
