"""CachedPathIntegrator: radiance caching in a dense spatial grid
(parity: impl/integrator/cachedpath.cpp).

The reference's ``SpatialTree`` of atomic flux bins (cachedpath.cpp:15-53)
maps directly to a dense jnp grid with scatter-add.  Two phases
(cachedpath.cpp:105-133):

- **learning** (spp/4): plain path tracing; every vertex's outgoing radiance
  ``lo`` is binned at its hit cell.  The recursion's per-vertex ``lo`` is
  recovered wavefront-style with a reverse sweep over per-depth records
  (lo_v = nee_v + thr_v * (emit_{v+1} + lo_{v+1})).
- **render** (spp): same walk, but once the previous bounce was non-delta and
  depth >= starting_depth, the path terminates into a jittered cache lookup
  (cachedpath.cpp:168-170).

Media: homogeneous segments ride the shared segment_medium_terms
(transmittance + pre-diffuse equiangular single scatter); grid (VDB) media
are delta-tracked FIRST-CLASS medium vertices in both phases
(_grid_medium_events/_grid_medium_nee, the wavefront path's structure):
NEE from the medium point with MIS vs the phase pdf, a phase-sampled
continuation, multiple in-medium scattering to max_path_length.  Medium
vertices are NOT binned into the cache and never terminate into it — the
cache holds surface outgoing radiance (cachedpath.cpp:168).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pine_tpu.core import camera as camera_mod
from pine_tpu.core.ray import offset_ray_origin
from pine_tpu.core.sampling import balance_heuristic
from pine_tpu.core.vecmath import dot, face_forward, to_local, to_world
from pine_tpu.integrators import path as path_mod
from pine_tpu.scene import bxdf as bxdf_mod
from pine_tpu.scene import material_eval

FLOAT_MAX = path_mod.FLOAT_MAX
MIN_ROUGHNESS = path_mod.MIN_ROUGHNESS


class SpatialGrid:
    """Dense (X,Y,Z) flux/count grid (cachedpath.cpp SpatialTree)."""

    def __init__(self, lo, hi, max_axis_resolution):
        lo = np.asarray(lo, np.float32)
        hi = np.asarray(hi, np.float32)
        diag = np.maximum(hi - lo, 1e-6)
        res = np.maximum(
            (max_axis_resolution * diag / diag.max()).astype(np.int32), 1
        )
        self.res = tuple(int(r) for r in res)
        self.lo = lo - 1e-4
        self.inv_diag = 1.0 / (diag + 2e-4)
        self.tight_lo = lo
        self.tight_hi = hi
        self.cell_size = diag / res

    def n_cells(self):
        return self.res[0] * self.res[1] * self.res[2]

    def cell_of(self, p):
        rel = (p - jnp.asarray(self.lo)) * jnp.asarray(self.inv_diag)
        res = jnp.asarray(self.res, jnp.int32)
        ijk = jnp.clip((rel * res.astype(jnp.float32)).astype(jnp.int32), 0, res - 1)
        return (ijk[:, 0] * self.res[1] + ijk[:, 1]) * self.res[2] + ijk[:, 2]

    def jittered_cell_of(self, p, u3):
        """flux_estimate's jittered lookup (cachedpath.cpp:37-41)."""
        p = p + (u3 - 0.5) * jnp.asarray(self.cell_size, jnp.float32)
        p = jnp.clip(p, jnp.asarray(self.tight_lo), jnp.asarray(self.tight_hi))
        return self.cell_of(p)


class CachedPathIntegrator:
    """PRL: CachedPathIntegrator(sampler, max_path_length[, max_axis_resolution
    [, starting_depth]]) (program_context.cpp:83-93)."""

    def __init__(self, sampler, max_path_length, max_axis_resolution=128,
                 starting_depth=1):
        if max_path_length <= 0:
            raise ValueError(
                f"`CachedPathIntegrator` expect `max_path_length` to be positive, got {max_path_length}"
            )
        if max_axis_resolution <= 0:
            raise ValueError(
                f"`CachedPathIntegrator` expect `max_axis_resolution` to be positive, got {max_axis_resolution}"
            )
        if starting_depth < 0:
            raise ValueError(
                f"`CachedPathIntegrator` expect `starting_depth` to be non-negative, got {starting_depth}"
            )
        self.sampler = sampler
        self.max_path_length = int(max_path_length)
        self.max_axis_resolution = int(max_axis_resolution)
        self.starting_depth = int(starting_depth)

    def render(self, scene):
        cscene = scene.compile()
        cam = scene.camera
        film = cam.film
        W, H = film.width, film.height
        img = render_cached(
            cscene, cam, W, H, self.sampler, self.sampler.spp,
            self.max_path_length, self.max_axis_resolution, self.starting_depth,
        )
        film.set_rgb(img)  # device array: readback deferred to save-flush
        return film


def render_cached(cscene, cam, W, H, sampler, spp, max_depth,
                  max_axis_resolution=128, starting_depth=1):
    from pine_tpu.core.capture import bind, collect_device_arrays

    lo, hi = cscene.scene.get_aabb()
    grid = SpatialGrid(lo, hi, max_axis_resolution)
    n = W * H
    cam_params = cam.params()
    learning_spp = max(spp // 4, 1)
    render_spp = max(spp, 1)

    arrays, setters = collect_device_arrays((cscene, sampler, cam_params))
    ys_np, xs_np = np.divmod(np.arange(n, dtype=np.int64), W)
    xs = jnp.asarray(xs_np, jnp.int32)
    ys = jnp.asarray(ys_np, jnp.int32)

    def learn(xs, ys, vals):
        with bind(setters, vals):
            flux = jnp.zeros((grid.n_cells(), 3), jnp.float32)
            count = jnp.zeros((grid.n_cells(),), jnp.float32)

            def body(i, carry):
                flux, count = carry
                recs = _trace_recorded(
                    cscene, cam_params, xs, ys, W, H, sampler, i, max_depth, grid
                )
                # reverse sweep: lo_v = nee_v + thr_v * arriving_{v+1} where
                # arriving through a segment = its in-scatter + transmittance
                # times (emissive/env on the segment + the far vertex's lo)
                lo_next = jnp.zeros((xs.shape[0], 3), jnp.float32)
                for d in range(max_depth - 2, -1, -1):
                    lo_v = recs["nee"][d] + recs["thr"][d] * (
                        recs["seg_sc"][d + 1] + recs["seg_tr"][d + 1] * (
                            recs["emit"][d + 1] + lo_next
                        )
                    )
                    m = recs["valid"][d]
                    flux = flux.at[recs["cell"][d]].add(
                        jnp.where(m[:, None], lo_v, 0.0)
                    )
                    count = count.at[recs["cell"][d]].add(m.astype(jnp.float32))
                    lo_next = lo_v
                return flux, count

            return jax.lax.fori_loop(
                0, learning_spp, body,
                (jnp.zeros((grid.n_cells(), 3), jnp.float32),
                 jnp.zeros((grid.n_cells(),), jnp.float32)),
            )

    flux, count = jax.jit(learn)(xs, ys, arrays)
    cache = flux / jnp.maximum(count, 1.0)[:, None]

    def rendr(xs, ys, vals, cache):
        with bind(setters, vals):
            def body(i, acc):
                return acc + _trace_with_cache(
                    cscene, cam_params, xs, ys, W, H, sampler, i, max_depth,
                    grid, cache, starting_depth,
                )

            total = jax.lax.fori_loop(
                0, render_spp, body, jnp.zeros((xs.shape[0], 3), jnp.float32)
            )
            return total / render_spp

    img = jax.jit(rendr)(xs, ys, arrays, cache)
    return img.reshape(H, W, 3)


def _grid_medium_events(cscene, ro, rd, t, hitm, alive, seg_sc, depth,
                        max_depth, xs, ys, sampler, sample_index, mdim):
    """Delta-tracked first-class medium-vertex events for one depth
    (path.py's grid block in record-and-sweep form; medium.cpp:204-251).

    -> (med_scatter, med_p, med_rd, med_pdf, med_w, med_masks, seg_sc,
    alive): scatter mask + point, phase continuation direction/pdf, the
    chromatic tracking weight, per-medium masks (for phase evaluation),
    seg_sc grown by blackbody emission, and alive with absorbed lanes
    killed.  The tracking chain rides hash randomness keyed per lane; the
    phase draw rides sampler dim mdim+15."""
    n = ro.shape[0]
    f32 = jnp.float32
    gm = getattr(cscene, "grid_media", None) or []
    med_scatter = jnp.zeros((n,), bool)
    med_p, med_rd = ro, rd
    med_pdf = jnp.zeros((n,), f32)
    med_w = jnp.ones((n, 3), f32)
    med_masks = []
    if not gm or depth + 1 >= max_depth:
        return (med_scatter, med_p, med_rd, med_pdf, med_w, med_masks,
                seg_sc, alive)
    from pine_tpu.core import rng as _rng
    from pine_tpu.scene.media_track import grid_sample_scatter

    seg_limit = jnp.where(hitm, t, jnp.full((n,), FLOAT_MAX, f32))
    key = _rng.hash_combine(
        xs.astype(jnp.uint32), ys.astype(jnp.uint32),
        jnp.uint32(sample_index), jnp.uint32(7600 + depth),
    )
    u_ph = sampler.u2(xs, ys, sample_index, mdim + 15)
    for gi, med in enumerate(gm):
        sc_m, ts_m, w_m, abs_m, le_m = grid_sample_scatter(
            med, ro, rd, seg_limit, key + jnp.uint32(gi)
        )
        em_gate = alive & ~med_scatter
        sc_m = sc_m & em_gate
        abs_m = abs_m & em_gate & ~sc_m
        if getattr(med, "emissive", False):
            seg_sc = seg_sc + jnp.where(em_gate[:, None], le_m, 0.0)
        alive = alive & ~abs_m
        p_m = ro + ts_m[:, None] * rd
        wo_m, pdf_m = med.pf.sample(-rd, u_ph)
        med_p = jnp.where(sc_m[:, None], p_m, med_p)
        med_rd = jnp.where(sc_m[:, None], wo_m, med_rd)
        med_pdf = jnp.where(sc_m, pdf_m, med_pdf)
        med_w = jnp.where(sc_m[:, None], w_m, med_w)
        med_scatter = med_scatter | sc_m
        med_masks.append(sc_m)
    return (med_scatter, med_p, med_rd, med_pdf, med_w, med_masks,
            seg_sc, alive)


def _grid_medium_nee(cscene, p_m, rd, med_masks, med_scatter, xs, ys,
                     sampler, sample_index, mdim):
    """Shadow-tested NEE at medium vertices, MIS vs the phase pdf (the
    continuation gathers le with MIS at the next depth, path.py style).

    -> contribution (N,3) WITHOUT the tracking weight or caller
    throughput."""
    n = p_m.shape[0]
    f32 = jnp.float32
    gm = getattr(cscene, "grid_media", None) or []
    if not gm or len(cscene.lights) == 0:
        return jnp.zeros((n, 3), f32)
    u_sel = sampler.u1(xs, ys, sample_index, mdim + 12)
    u_l2 = sampler.u2(xs, ys, sample_index, mdim + 13)
    mctx = dict(p=p_m, n=rd, uv=jnp.zeros((n, 2), f32))
    ls = path_mod.sample_one_light(cscene, p_m, u_sel, u_l2, mctx)
    do_m = med_scatter & ls["valid"] & (ls["pdf"] > 0.0)
    occ = cscene.any_hit(
        p_m, ls["wo"], jnp.full((n,), 1e-4, f32),
        jnp.where(do_m, ls["distance"] * (1.0 - 1e-3), -1.0),
    )
    tr_l = cscene.transmittance(p_m, ls["wo"], ls["distance"])
    cos_m = jnp.sum(-rd * ls["wo"], -1)
    f_p = jnp.zeros((n,), f32)
    for gi, med in enumerate(gm):
        f_p = jnp.where(med_masks[gi], med.pf.p(cos_m), f_p)
    mis_m = jnp.where(ls["is_delta"], 1.0, balance_heuristic(ls["pdf"], f_p))
    contrib = ls["le"] * tr_l * (
        f_p * mis_m / jnp.maximum(ls["pdf"], 1e-20)
    )[:, None]
    return jnp.where((do_m & ~occ)[:, None], contrib, 0.0)


def _vertex_setup(cscene, cam_params, xs, ys, W, H, sampler, sample_index):
    f32 = jnp.float32
    jitter = sampler.u2(xs, ys, sample_index, 0)
    u_lens = sampler.u2(xs, ys, sample_index, 2)
    p_film = (jnp.stack([xs, ys], -1).astype(f32) + jitter) / jnp.asarray([W, H], f32)
    return camera_mod.gen_rays(cam_params, p_film, u_lens)


def _trace_recorded(cscene, cam_params, xs, ys, W, H, sampler, sample_index,
                    max_depth, grid):
    """Learning-phase forward pass: per-depth records for the reverse sweep."""
    n = xs.shape[0]
    f32 = jnp.float32
    ro, rd = _vertex_setup(cscene, cam_params, xs, ys, W, H, sampler, sample_index)
    alive = jnp.ones((n,), bool)
    prev_pdf = jnp.zeros((n,), f32)
    prev_delta = jnp.ones((n,), bool)
    diffused = jnp.zeros((n,), bool)
    tmin = jnp.zeros((n,), f32)
    n_lights = len(cscene.lights)

    recs = dict(
        nee=[jnp.zeros((n, 3), f32)] * max_depth,
        thr=[jnp.zeros((n, 3), f32)] * max_depth,
        emit=[jnp.zeros((n, 3), f32)] * max_depth,
        cell=[jnp.zeros((n,), jnp.int32)] * max_depth,
        valid=[jnp.zeros((n,), bool)] * max_depth,
        # homogeneous-media terms of the segment into vertex d
        seg_tr=[jnp.ones((n, 3), f32)] * max_depth,
        seg_sc=[jnp.zeros((n, 3), f32)] * max_depth,
    )

    for depth in range(max_depth):
        dim = 4 + depth * 16
        t, gidx, hitm, mesh_tri = cscene.intersect(
            ro, rd, tmin, jnp.full((n,), FLOAT_MAX, f32)
        )
        hitm = hitm & alive
        t_hit = jnp.where(hitm, t, 1.0)
        if cscene.media or getattr(cscene, "grid_media", None):
            # the per-depth 16-dim budget is full, so medium draws live in
            # a region past every per-depth dim (media-free scenes draw
            # nothing there: goldens unchanged).  Grid media become
            # first-class medium vertices below, so the segment terms stay
            # homogeneous-only.
            mdim = 4 + max_depth * 16 + depth * 24
            recs["seg_tr"][depth], recs["seg_sc"][depth] = (
                path_mod.segment_medium_terms(
                    cscene, ro, rd, jnp.where(hitm, t, 1e8), alive,
                    xs, ys, sampler, sample_index, mdim - 10,
                    scatter_mask=alive & ~diffused, include_grid=False,
                )
            )
        else:
            mdim = 0

        (med_scatter, med_p, med_rd, med_pdf, med_w, med_masks,
         recs["seg_sc"][depth], alive) = _grid_medium_events(
            cscene, ro, rd, t, hitm, alive, recs["seg_sc"][depth],
            depth, max_depth, xs, ys, sampler, sample_index, mdim,
        )

        # emissive/env arriving along this segment (no beta: handled by sweep)
        emit = jnp.zeros((n, 3), f32)
        if cscene.env_light is not None:
            le_env = cscene.env_light.color(rd)
            mis = jnp.where(
                prev_delta, 1.0,
                balance_heuristic(prev_pdf, cscene.env_light.pdf(rd)),
            )
            emit = emit + jnp.where(
                (alive & ~hitm & ~med_scatter)[:, None],
                le_env * mis[:, None], 0.0,
            )

        hp = ro + t_hit[:, None] * rd
        p_s, ns, uv = cscene.surface_info(gidx, hp, mesh_tri)
        ctx = dict(p=p_s, n=ns, uv=uv)
        wi_world = -rd

        emis = cscene.is_emissive_lane(gidx) & hitm & ~med_scatter
        if cscene.emissive_globals:
            le = cscene.emissive_le(gidx, ctx, wi_world)
            light_pdf = cscene.light_pdf_at_hit(gidx, ro, rd, t_hit, ns)
            mis = jnp.where(prev_delta, 1.0, balance_heuristic(prev_pdf, light_pdf))
            emit = emit + jnp.where(emis[:, None], le * mis[:, None], 0.0)
        recs["emit"][depth] = emit

        alive = (hitm & ~emis & ~med_scatter) | med_scatter
        surf = alive & ~med_scatter
        if depth + 1 >= max_depth:
            break

        mat_idx = cscene.g_mat_dev[jnp.clip(gidx, 0, cscene.n_global - 1)]
        u_mat = sampler.u2(xs, ys, sample_index, dim + 3)
        state = material_eval.eval_bxdf_state(
            cscene, mat_idx, ctx, wi_world, u_mat[:, 0], u_mat[:, 1],
            MIN_ROUGHNESS, diffused,
        )
        wi = to_local(ns, wi_world)

        if n_lights > 0:
            u_sel = sampler.u1(xs, ys, sample_index, dim + 0)
            u_light = sampler.u2(xs, ys, sample_index, dim + 1)
            ls = path_mod.sample_one_light(cscene, p_s, u_sel, u_light, ctx)
            contrib, _ = path_mod.nee_contribution(
                cscene, p_s, ns, state, wi, ls, surf
            )
            nee_med = _grid_medium_nee(
                cscene, med_p, rd, med_masks, med_scatter,
                xs, ys, sampler, sample_index, mdim,
            )
            recs["nee"][depth] = jnp.where(
                med_scatter[:, None], med_w * nee_med, contrib
            )

        u_wm = sampler.u2(xs, ys, sample_index, dim + 5)
        u_fr = sampler.u1(xs, ys, sample_index, dim + 7)
        u_cos = sampler.u2(xs, ys, sample_index, dim + 8)
        bs = bxdf_mod.sample(state, wi, u_wm, u_fr, u_cos)
        wo_world = to_world(ns, bs["wo"])
        cosine = jnp.abs(dot(wo_world, ns))
        thr = bs["f"] * (cosine / jnp.maximum(bs["pdf"], 1e-20))[:, None]
        # medium continuation throughput = mit->W (phase sampling is exact:
        # f/pdf = 1, like the wavefront path's beta *= w_m)
        recs["thr"][depth] = jnp.where(
            med_scatter[:, None], med_w,
            jnp.where((surf & bs["valid"])[:, None], thr, 0.0),
        )
        recs["cell"][depth] = grid.cell_of(p_s)
        # bin only SURFACE vertices into the cache (the render phase
        # terminates surface paths into it, cachedpath.cpp:168); medium lo
        # still flows through the lo chain via thr/nee
        recs["valid"][depth] = surf

        alive = (surf & bs["valid"]) | med_scatter
        prev_pdf = jnp.where(med_scatter, med_pdf, bs["pdf"])
        prev_delta = jnp.where(med_scatter, False, bs["is_delta_sample"])
        diffused = diffused | (surf & bs["valid"] & ~bs["is_delta_sample"])
        ro = jnp.where(
            med_scatter[:, None], med_p,
            offset_ray_origin(p_s, face_forward(ns, wo_world)),
        )
        rd = jnp.where(med_scatter[:, None], med_rd, wo_world)
        tmin = jnp.where(med_scatter, 1e-4, 0.0)

    return recs


def _trace_with_cache(cscene, cam_params, xs, ys, W, H, sampler, sample_index,
                      max_depth, grid, cache, starting_depth):
    """Render-phase walk: terminate into the cache at eligible vertices
    (cachedpath.cpp:168-170)."""
    n = xs.shape[0]
    f32 = jnp.float32
    ro, rd = _vertex_setup(cscene, cam_params, xs, ys, W, H, sampler, sample_index)
    L = jnp.zeros((n, 3), f32)
    beta = jnp.ones((n, 3), f32)
    alive = jnp.ones((n,), bool)
    prev_pdf = jnp.zeros((n,), f32)
    prev_delta = jnp.ones((n,), bool)
    diffused = jnp.zeros((n,), bool)
    tmin = jnp.zeros((n,), f32)
    n_lights = len(cscene.lights)

    for depth in range(max_depth):
        dim = 4 + depth * 16
        t, gidx, hitm, mesh_tri = cscene.intersect(
            ro, rd, tmin, jnp.full((n,), FLOAT_MAX, f32)
        )
        hitm = hitm & alive
        t_hit = jnp.where(hitm, t, 1.0)
        med_scatter = jnp.zeros((n,), bool)
        med_p, med_rd = ro, rd
        med_pdf = jnp.zeros((n,), f32)
        med_w = jnp.ones((n, 3), f32)
        med_masks = []
        if cscene.media or getattr(cscene, "grid_media", None):
            # in-scatter uses beta at segment start; everything arriving
            # through the segment (env/emissive/vertex) sees seg_tr.  Grid
            # media produce first-class medium vertices (the events helper),
            # so the segment terms stay homogeneous-only.
            mdim = 4 + max_depth * 16 + depth * 24
            seg_tr_d, seg_sc_d = path_mod.segment_medium_terms(
                cscene, ro, rd, jnp.where(hitm, t, 1e8), alive,
                xs, ys, sampler, sample_index, mdim - 10,
                scatter_mask=alive & ~diffused, include_grid=False,
            )
            (med_scatter, med_p, med_rd, med_pdf, med_w, med_masks,
             seg_sc_d, alive) = _grid_medium_events(
                cscene, ro, rd, t, hitm, alive, seg_sc_d,
                depth, max_depth, xs, ys, sampler, sample_index, mdim,
            )
            L = L + beta * seg_sc_d
            beta = beta * seg_tr_d

        if cscene.env_light is not None:
            le_env = cscene.env_light.color(rd)
            mis = jnp.where(
                prev_delta, 1.0,
                balance_heuristic(prev_pdf, cscene.env_light.pdf(rd)),
            )
            L = L + jnp.where(
                (alive & ~hitm & ~med_scatter)[:, None],
                beta * le_env * mis[:, None], 0.0,
            )

        hp = ro + t_hit[:, None] * rd
        p_s, ns, uv = cscene.surface_info(gidx, hp, mesh_tri)
        ctx = dict(p=p_s, n=ns, uv=uv)
        wi_world = -rd

        emis = cscene.is_emissive_lane(gidx) & hitm & ~med_scatter
        if cscene.emissive_globals:
            le = cscene.emissive_le(gidx, ctx, wi_world)
            light_pdf = cscene.light_pdf_at_hit(gidx, ro, rd, t_hit, ns)
            mis = jnp.where(prev_delta, 1.0, balance_heuristic(prev_pdf, light_pdf))
            L = L + jnp.where(emis[:, None], beta * le * mis[:, None], 0.0)

        alive = (hitm & ~emis & ~med_scatter) | med_scatter
        surf = alive & ~med_scatter
        if depth + 1 >= max_depth:
            break

        # cache termination at SURFACE vertices only (cachedpath.cpp:168:
        # !pv.is_delta && length >= start; the cache holds surface lo)
        use_cache = surf & ~prev_delta & (depth >= starting_depth)
        if depth >= starting_depth:
            u3 = jnp.stack(
                [sampler.u1(xs, ys, sample_index, dim + 10 + k) for k in range(3)], -1
            )
            cell = grid.jittered_cell_of(p_s, u3)
            L = L + jnp.where(use_cache[:, None], beta * cache[cell], 0.0)
            alive = alive & ~use_cache
            surf = surf & ~use_cache

        mat_idx = cscene.g_mat_dev[jnp.clip(gidx, 0, cscene.n_global - 1)]
        u_mat = sampler.u2(xs, ys, sample_index, dim + 3)
        state = material_eval.eval_bxdf_state(
            cscene, mat_idx, ctx, wi_world, u_mat[:, 0], u_mat[:, 1],
            MIN_ROUGHNESS, diffused,
        )
        wi = to_local(ns, wi_world)

        if n_lights > 0:
            u_sel = sampler.u1(xs, ys, sample_index, dim + 0)
            u_light = sampler.u2(xs, ys, sample_index, dim + 1)
            ls = path_mod.sample_one_light(cscene, p_s, u_sel, u_light, ctx)
            contrib, _ = path_mod.nee_contribution(
                cscene, p_s, ns, state, wi, ls, surf
            )
            L = L + beta * contrib
        if getattr(cscene, "grid_media", None) and n_lights > 0:
            nee_med = _grid_medium_nee(
                cscene, med_p, rd, med_masks, med_scatter,
                xs, ys, sampler, sample_index, mdim,
            )
            L = L + jnp.where(
                med_scatter[:, None], beta * med_w * nee_med, 0.0
            )

        u_wm = sampler.u2(xs, ys, sample_index, dim + 5)
        u_fr = sampler.u1(xs, ys, sample_index, dim + 7)
        u_cos = sampler.u2(xs, ys, sample_index, dim + 8)
        bs = bxdf_mod.sample(state, wi, u_wm, u_fr, u_cos)
        wo_world = to_world(ns, bs["wo"])
        cosine = jnp.abs(dot(wo_world, ns))
        thr = bs["f"] * (cosine / jnp.maximum(bs["pdf"], 1e-20))[:, None]
        surf = surf & bs["valid"]
        alive = surf | med_scatter
        beta = jnp.where(surf[:, None], beta * thr, beta)
        beta = jnp.where(med_scatter[:, None], beta * med_w, beta)
        prev_pdf = jnp.where(med_scatter, med_pdf, bs["pdf"])
        prev_delta = jnp.where(med_scatter, False, bs["is_delta_sample"])
        diffused = diffused | (surf & ~bs["is_delta_sample"])
        ro = jnp.where(
            med_scatter[:, None], med_p,
            offset_ray_origin(p_s, face_forward(ns, wo_world)),
        )
        rd = jnp.where(med_scatter[:, None], med_rd, wo_world)
        tmin = jnp.where(med_scatter, 1e-4, 0.0)

    return L  # reference cachedpath has no firefly clamp
