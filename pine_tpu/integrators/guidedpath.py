"""GuidedPathIntegrator: "Practical Path Guiding" on TPU
(parity: impl/integrator/guidedpath.cpp:21-301 + spatial_tree.h:30-355).

The reference's adaptive binary SpatialTree of directional QuadTrees becomes
the TPU shape (SURVEY.md §7.7): a fixed spatial grid where every cell owns a
DxD equal-area directional histogram (phi x cos-theta; uniform_sphere
mapping).  Training scatter-adds ``avg(Li)*mis/pdf/prob`` flux into
(cell, bin); sampling draws a bin by two-level inverse-CDF and jitters inside
it; pdf(w) = flux_bin/flux_total * D^2/(4pi).

Per vertex (guidedpath.cpp:190-255): NEE + a dedicated BSDF ray for emissive
hits (with MIS vs the light pdf) + a one-sample-MIS continuation choosing
between the learned distribution (prob_a = 0.5 after iteration 0) and BSDF
sampling.  Iterations follow the reference's spp-doubling IterativeScheme
with inverse-variance frame blending and outlier-rejected variance
(guidedpath.cpp:21-117); all accumulation stays on device.

Structures (PINE_GUIDE_STRUCT): "tree" (default) is the reference's adaptive
spatial octree of directional quadtrees in flat-arena form
(pine_tpu/integrators/guiding_tree.py, spatial_tree.h:30-355) — spatial
leaves split at n_samples > spatial_ratio*sqrt(iter_spp*n_pixels)
(guidedpath.cpp:113), quadtrees subdivide >1%-flux quadrants, training adds
flux along the quadtree descent path at a footprint-jittered position, and
each iteration samples from the previous iteration's frozen snapshot.
"grid" keeps the round-2 fixed spatial grid + DxD histogram.

Deviations (documented): a DEFENSIVE uniform-sphere mixture (12.5%) guards
both structures against undertrained distributions (the reference relies
only on RR); the reference's non-compensated Russian roulette on low-pdf
guided samples (guidedpath.cpp:141-143) IS applied at depth > 1 exactly as
the reference does — uncompensated, so the estimator shares the reference's
slight bias in exchange for killing noisy-histogram fireflies.

Media: every segment (continuation, dedicated BSDF ray, camera ray, shadow
rays) applies transmittance — analytic for homogeneous media, and for grid
(VDB) media the delta-tracking events themselves carry it.  Homogeneous
media add pre-diffuse equiangular single scatter with NEE + a one-bounce
phase continuation (path_mod.segment_medium_terms).  Grid media produce
FIRST-CLASS medium vertices (guidedpath.cpp:126-165): a delta-tracked
scatter event makes the lane's vertex this depth the medium point — NEE
from it at weight 1 (its continuation gathers no le, so light sampling is
the sole estimator, guidedpath.cpp:129-134), a guided-vs-phase
one-sample-MIS continuation drawn from the guide at the medium position
(guide.traverse(mit->p), guidedpath.cpp:136), and the continuation flux
trains the guide there — so multiple in-medium scattering is traced to
max_path_length exactly like surface bounces.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pine_tpu.core import camera as camera_mod
from pine_tpu.core.ray import offset_ray_origin
from pine_tpu.core.sampling import balance_heuristic
from pine_tpu.core.vecmath import Pi, dot, face_forward, to_local, to_world
from pine_tpu.integrators import path as path_mod
from pine_tpu.integrators.cachedpath import SpatialGrid
from pine_tpu.scene import bxdf as bxdf_mod
from pine_tpu.scene import material_eval

FLOAT_MAX = path_mod.FLOAT_MAX
MIN_ROUGHNESS = path_mod.MIN_ROUGHNESS
DIR_RES = 16  # directional histogram is DIR_RES x DIR_RES (phi x cos-theta)
DEFENSIVE = 0.125  # uniform-sphere mixture weight in the learned distribution
DIM_STRIDE = 24  # per-depth sampler dims (guided needs two BSDF draws)


def dir_to_square(w):
    """Equal-area sphere -> unit square (sampling.h uniform_sphere inverse)."""
    phi = jnp.arctan2(w[:, 1], w[:, 0])
    u = jnp.where(phi < 0, phi + 2 * Pi, phi) / (2 * Pi)
    v = (1.0 - w[:, 2]) * 0.5
    return jnp.stack([jnp.clip(u, 0.0, 1.0 - 1e-6), jnp.clip(v, 0.0, 1.0 - 1e-6)], -1)


def square_to_dir(sq):
    phi = 2 * Pi * sq[..., 0]
    z = 1.0 - 2.0 * sq[..., 1]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def dir_bin(w):
    sq = dir_to_square(w)
    ij = jnp.clip((sq * DIR_RES).astype(jnp.int32), 0, DIR_RES - 1)
    return ij[:, 0] * DIR_RES + ij[:, 1]


class DirectionalGuide:
    """(cells, D*D) flux histogram with two-level inverse-CDF sampling."""

    def __init__(self, grid: SpatialGrid):
        self.grid = grid

    def sample(self, hist_rows, u2, u_def):
        """hist_rows (N, D*D) per-lane cell histograms -> (wo, pdf, valid).

        Defensive mixture: with probability DEFENSIVE the direction is drawn
        uniformly over the sphere (and pdf() mixes accordingly), so a badly
        trained histogram can never create unbounded weights."""
        n = hist_rows.shape[0]
        uniform_dir = square_to_dir(u2)
        h = hist_rows.reshape(n, DIR_RES, DIR_RES)
        total = jnp.sum(h, axis=(1, 2))
        valid = total > 0.0
        marg = jnp.sum(h, axis=2)  # (N, D) over phi rows
        cdf_r = jnp.cumsum(marg, axis=1) / jnp.maximum(total, 1e-20)[:, None]
        r = jnp.sum((u2[:, 0:1] > cdf_r).astype(jnp.int32), axis=1)
        r = jnp.clip(r, 0, DIR_RES - 1)
        row = jnp.take_along_axis(h, r[:, None, None], axis=1)[:, 0, :]  # (N,D)
        row_sum = jnp.take_along_axis(marg, r[:, None], axis=1)[:, 0]
        cdf_c = jnp.cumsum(row, axis=1) / jnp.maximum(row_sum, 1e-20)[:, None]
        # reuse the residual of u0 within its row for stratified jitter
        c = jnp.sum((u2[:, 1:2] > cdf_c).astype(jnp.int32), axis=1)
        c = jnp.clip(c, 0, DIR_RES - 1)
        p_bin = jnp.take_along_axis(row, c[:, None], axis=1)[:, 0] / jnp.maximum(
            total, 1e-20
        )
        # jitter inside the bin from the CDF residuals
        cdf_r_lo = jnp.where(
            r > 0, jnp.take_along_axis(cdf_r, jnp.maximum(r - 1, 0)[:, None], 1)[:, 0], 0.0
        )
        cdf_r_hi = jnp.take_along_axis(cdf_r, r[:, None], 1)[:, 0]
        ju = (u2[:, 0] - cdf_r_lo) / jnp.maximum(cdf_r_hi - cdf_r_lo, 1e-12)
        cdf_c_lo = jnp.where(
            c > 0, jnp.take_along_axis(cdf_c, jnp.maximum(c - 1, 0)[:, None], 1)[:, 0], 0.0
        )
        cdf_c_hi = jnp.take_along_axis(cdf_c, c[:, None], 1)[:, 0]
        jv = (u2[:, 1] - cdf_c_lo) / jnp.maximum(cdf_c_hi - cdf_c_lo, 1e-12)
        sq = jnp.stack(
            [
                (r.astype(jnp.float32) + jnp.clip(ju, 0.0, 1.0 - 1e-6)) / DIR_RES,
                (c.astype(jnp.float32) + jnp.clip(jv, 0.0, 1.0 - 1e-6)) / DIR_RES,
            ],
            -1,
        )
        wo = square_to_dir(sq)
        use_uniform = u_def < DEFENSIVE
        wo = jnp.where(use_uniform[:, None], uniform_dir, wo)
        pdf = self.pdf(hist_rows, wo)
        return wo, pdf, valid & (pdf > 0.0)

    def pdf(self, hist_rows, w):
        total = jnp.sum(hist_rows, axis=1)
        b = dir_bin(w)
        p_bin = jnp.take_along_axis(hist_rows, b[:, None], axis=1)[:, 0]
        hist_pdf = jnp.where(
            total > 0.0,
            p_bin / jnp.maximum(total, 1e-20) * (DIR_RES * DIR_RES) / (4 * Pi),
            0.0,
        )
        return (1.0 - DEFENSIVE) * hist_pdf + DEFENSIVE / (4 * Pi)


class TreeGuide:
    """Device-side adapter over the adaptive arenas (guiding_tree.py); the
    arrays themselves travel through jit as arguments in `gstate`.  Bounds
    stay as NUMPY constants (embedded at trace time like SpatialGrid's) — a
    pre-committed device array captured in the traced program would poison
    this TPU's dispatch path (see core/capture.py)."""

    def __init__(self, gt):
        from pine_tpu.integrators import guiding_tree as gtree

        self._m = gtree
        self.lo = np.asarray(gt.lo, np.float32)
        self.inv_diag = np.asarray(gt.inv_diag, np.float32)
        self.foot0 = float(gt.footprint0)
        self.clamp_lo = np.asarray(gt.tight_lo, np.float32)
        self.clamp_hi = np.asarray(gt.tight_hi, np.float32)

    def lookup(self, gstate, p):
        """-> (dtree root, spatial leaf, footprint) per lane."""
        return self._m.stree_lookup(
            gstate["schild"], gstate["sdroot"], self.lo, self.inv_diag,
            jnp.float32(self.foot0), p,
        )

    def lookup_train(self, gstate, p, foot, u3):
        """Footprint-jittered training lookup (spatial_tree.h add_sample)."""
        pj = jnp.clip(p + foot[:, None] * (u3 - 0.5), self.clamp_lo, self.clamp_hi)
        return self.lookup(gstate, pj)

    def sample(self, gstate, droot, u2, u_def):
        sq, _, tree_valid = self._m.dtree_sample(
            gstate["dchild"], gstate["dflux"], droot, u2
        )
        wo_tree = square_to_dir(sq)
        uniform_dir = square_to_dir(u2)
        use_uniform = u_def < DEFENSIVE
        wo = jnp.where(use_uniform[:, None], uniform_dir, wo_tree)
        pdf = self.pdf(gstate, droot, wo)
        valid = jnp.where(use_uniform, True, tree_valid) & (pdf > 0.0)
        return wo, pdf, valid

    def pdf(self, gstate, droot, w):
        pdf_sq = self._m.dtree_pdf(
            gstate["dchild"], gstate["dflux"], droot, dir_to_square(w)
        )
        return (1.0 - DEFENSIVE) * pdf_sq / (4 * Pi) + DEFENSIVE / (4 * Pi)

    def add(self, gstate, droot, leaf, sq, flux, mask):
        gstate = dict(gstate)
        gstate["dcoll"] = self._m.dtree_add(
            gstate["dcoll"], gstate["dchild"], droot, sq, flux, mask
        )
        gstate["scount"] = gstate["scount"].at[leaf].add(
            jnp.where(mask, 1.0, 0.0)
        )
        return gstate


class GuidedPathIntegrator:
    """PRL: GuidedPathIntegrator(sampler, max_path_length)
    (program_context.cpp:95-100)."""

    def __init__(self, sampler, max_path_length, max_axis_resolution=32):
        if max_path_length <= 0:
            raise ValueError(
                f"`GuidedPathIntegrator` expect `max_path_length` to be positive, got {max_path_length}"
            )
        self.sampler = sampler
        self.max_path_length = int(max_path_length)
        self.max_axis_resolution = int(max_axis_resolution)

    def render(self, scene):
        cscene = scene.compile()
        cam = scene.camera
        film = cam.film
        W, H = film.width, film.height
        img = render_guided(
            cscene, cam, W, H, self.sampler, self.sampler.spp,
            self.max_path_length, self.max_axis_resolution,
        )
        film.set_rgb(img)  # device array: readback deferred to save-flush
        return film


def iterative_scheme(spp, batch_size=1):
    """spp-doubling iteration plan (guidedpath.cpp IterativeScheme)."""
    iters = []
    current, iter_spp, i = 0, 2, 0
    while True:
        next_spp = iter_spp * 2 if (i + 1) % batch_size == 0 else iter_spp
        remaining = spp - current
        final = iter_spp + next_spp // 4 > remaining
        if final:
            iter_spp = max(remaining, 1)
        iters.append(dict(number=i, sample_index=current, spp=iter_spp, is_final=final))
        if final:
            break
        current += iter_spp
        iter_spp = next_spp
        i += 1
    return iters


def render_guided(cscene, cam, W, H, sampler, spp, max_depth,
                  max_axis_resolution=32):
    import os

    from pine_tpu.core.capture import bind, collect_device_arrays

    lo, hi = cscene.scene.get_aabb()
    # medium vertices are guided too (guidedpath.cpp:136): the guide's
    # spatial bounds must cover media volumes, which can extend past the
    # geometry AABB (a floating cloud would otherwise clamp to boundary
    # leaves)
    for med in list(getattr(cscene, "grid_media", None) or []) + list(
        cscene.media or []
    ):
        mlo, mhi = med.get_aabb()
        lo = np.minimum(lo, np.asarray(mlo, np.float32))
        hi = np.maximum(hi, np.asarray(mhi, np.float32))
    n = W * H
    struct = os.environ.get("PINE_GUIDE_STRUCT", "tree")
    if struct == "tree":
        from pine_tpu.integrators.guiding_tree import GuidingTree

        # guidedpath.cpp:72-75: initial_samples = n_pixels, spatial_k = 4000
        gt = GuidingTree(lo, hi, n_initial_samples=n, spatial_k=4000)
        guide = TreeGuide(gt)
        spatial_ratio = max(4000.0 / float(np.sqrt(n)), 1.0)
        grid = None
    else:
        gt = None
        grid = SpatialGrid(lo, hi, max_axis_resolution)
        guide = DirectionalGuide(grid)
    cam_params = cam.params()
    arrays, setters = collect_device_arrays((cscene, sampler, cam_params))
    ys_np, xs_np = np.divmod(np.arange(n, dtype=np.int64), W)
    xs = jnp.asarray(xs_np, jnp.int32)
    ys = jnp.asarray(ys_np, jnp.int32)

    def one_iteration(xs, ys, vals, gstate, sample0, iter_spp, prob_a, train):
        with bind(setters, vals):
            def body(i, carry):
                acc, acc2, gstate = carry
                L, gstate = _trace_guided(
                    cscene, cam_params, xs, ys, W, H, sampler, sample0 + i,
                    max_depth, grid, guide, gstate, prob_a, train,
                )
                return acc + L, acc2 + L * L, gstate

            acc, acc2, gstate = jax.lax.fori_loop(
                0, iter_spp, body,
                (jnp.zeros((n, 3), jnp.float32), jnp.zeros((n, 3), jnp.float32), gstate),
            )
            inv = 1.0 / iter_spp
            I = acc * inv
            var = (acc2 - acc * acc * inv) / max(iter_spp - 1, 1) * inv
            # outlier-rejected variance (guidedpath.cpp:292-298)
            v = jnp.mean(var, axis=1)
            v_sorted = jnp.sort(v)
            keep = int(n * (1.0 - 1e-5))
            var_mean = jnp.mean(v_sorted[:keep])
            return I, var_mean, gstate

    # sample0 is traced (dynamic) so iterations reuse compiles; only distinct
    # (iter_spp, prob_a, train) combos trigger recompilation
    jit_iter = jax.jit(one_iteration, static_argnames=("iter_spp", "prob_a", "train"))

    if gt is not None:
        gstate = gt.device_state()
    else:
        gstate = {
            "hist": jnp.zeros((grid.n_cells(), DIR_RES * DIR_RES), jnp.float32)
        }
    acc_I = jnp.zeros((n, 3), jnp.float32)
    acc_w = jnp.zeros((), jnp.float32)
    for it in iterative_scheme(spp):
        prob_a = 0.5 if it["number"] > 0 else 0.0
        I, var_mean, gstate = jit_iter(
            xs, ys, arrays, gstate,
            jnp.int32(it["sample_index"]), iter_spp=it["spp"], prob_a=prob_a,
            train=not it["is_final"],
        )
        if gt is not None and not it["is_final"]:
            # one readback per iteration (ordinary in sync-dispatch mode),
            # then host-side refinement and a fresh arena export
            gt.absorb(np.asarray(gstate["dcoll"]), np.asarray(gstate["scount"]))
            gt.refine(spatial_ratio * float(np.sqrt(it["spp"] * n)))
            gstate = gt.device_state()
        # Deviation from guidedpath.cpp:105-110: iterations blend by sample
        # count, not inverse variance.  With the small early iterations the
        # per-iteration variance estimate correlates with its realized value
        # and inverse-variance weighting measured 7x worse MSE (heavy-tailed
        # estimators); spp weighting is unbiased and matched plain path.
        w = jnp.float32(it["spp"]) + 0.0 * var_mean
        acc_I = (acc_I * acc_w + I * w) / jnp.maximum(acc_w + w, 1e-20)
        acc_w = acc_w + w
    global _LAST_TREE
    _LAST_TREE = gt  # test introspection: the trained adaptive structure
    return acc_I.reshape(H, W, 3)


_LAST_TREE = None  # set by render_guided in tree mode (None in grid mode)


def _trace_guided(cscene, cam_params, xs, ys, W, H, sampler, sample_index,
                  max_depth, grid, guide, gstate, prob_a, train):
    tree_mode = isinstance(guide, TreeGuide)
    n = xs.shape[0]
    f32 = jnp.float32
    jitter = sampler.u2(xs, ys, sample_index, 0)
    u_lens = sampler.u2(xs, ys, sample_index, 2)
    p_film = (jnp.stack([xs, ys], -1).astype(f32) + jitter) / jnp.asarray([W, H], f32)
    ro, rd = camera_mod.gen_rays(cam_params, p_film, u_lens)

    alive = jnp.ones((n,), bool)
    diffused = jnp.zeros((n,), bool)
    tmin = jnp.zeros((n,), f32)
    n_lights = len(cscene.lights)

    depths = max_depth - 1
    rec_nee = [jnp.zeros((n, 3), f32)] * depths
    rec_bsemis = [jnp.zeros((n, 3), f32)] * depths
    rec_thr = [jnp.zeros((n, 3), f32)] * depths
    rec_cell = [jnp.zeros((n,), jnp.int32)] * depths  # grid cell | dtree root
    rec_bin = [jnp.zeros((n,), jnp.int32)] * depths
    rec_leaf = [jnp.zeros((n,), jnp.int32)] * depths  # spatial leaf (tree)
    rec_sq = [jnp.zeros((n, 2), jnp.float32)] * depths  # dir square (tree)
    rec_w = [jnp.zeros((n,), f32)] * depths
    rec_valid = [jnp.zeros((n,), bool)] * depths
    # homogeneous-media terms of the segment INTO vertex d (d=0: camera ray):
    # transmittance + equiangular in-segment scatter (guidedpath.cpp:126-165
    # handles medium vertices; see the module deviation note)
    seg_tr = [jnp.ones((n, 3), f32)] * depths
    seg_sc = [jnp.zeros((n, 3), f32)] * depths
    L0 = jnp.zeros((n, 3), f32)

    for depth in range(depths):
        dim = 4 + depth * DIM_STRIDE
        t, gidx, hitm, mesh_tri = cscene.intersect(
            ro, rd, tmin, jnp.full((n,), FLOAT_MAX, f32)
        )
        hitm = hitm & alive
        t_hit = jnp.where(hitm, t, 1.0)
        if cscene.media:
            # own 24-dim/depth region past the per-depth DIM_STRIDE blocks
            # (segment_medium_terms consumes [base+10, base+21]).  Grid media
            # are NOT folded in here: they produce first-class medium
            # vertices below (guidedpath.cpp:126-165), so the segment terms
            # stay homogeneous-only (grid extinction rides the tracking
            # events, not tr).
            seg_tr[depth], seg_sc[depth] = path_mod.segment_medium_terms(
                cscene, ro, rd, jnp.where(hitm, t, 1e8), alive,
                xs, ys, sampler, sample_index,
                4 + depths * DIM_STRIDE + depth * 24 - 10,
                scatter_mask=alive & ~diffused, include_grid=False,
            )

        # ---- grid media: delta-tracked first-class medium vertices
        # (guidedpath.cpp:126-165).  A scattering lane's vertex THIS depth is
        # the medium point: NEE from it (weight 1 — the guided medium
        # continuation gathers no le, so light sampling is the sole
        # estimator) + a guided-vs-phase one-sample-MIS continuation whose
        # flux trains the guide at the medium position.  Absorption kills the
        # lane; pass-through lanes carry the stochastic transmittance.
        gm = getattr(cscene, "grid_media", None) or []
        med_scatter = jnp.zeros((n,), bool)
        med_p = jnp.zeros((n, 3), f32)
        med_w = jnp.ones((n, 3), f32)
        med_masks = []
        if gm:
            from pine_tpu.core import rng as _rng
            from pine_tpu.scene.media_track import grid_sample_scatter

            seg_limit = jnp.where(hitm, t, jnp.full((n,), FLOAT_MAX, f32))
            key = _rng.hash_combine(
                xs.astype(jnp.uint32), ys.astype(jnp.uint32),
                jnp.uint32(sample_index), jnp.uint32(7300 + depth),
            )
            for gi, med in enumerate(gm):
                sc_m, ts_m, w_m, abs_m, le_m = grid_sample_scatter(
                    med, ro, rd, seg_limit, key + jnp.uint32(gi)
                )
                # a lane scatters at most once per segment; medium k must not
                # re-scatter (or clobber) a lane medium j<k took
                em_gate = alive & ~med_scatter
                sc_m = sc_m & em_gate
                abs_m = abs_m & em_gate & ~sc_m
                if getattr(med, "emissive", False):
                    # blackbody emission along the tracking walk joins the
                    # in-segment source term (medium.cpp:233-249)
                    seg_sc[depth] = seg_sc[depth] + jnp.where(
                        em_gate[:, None], le_m, 0.0
                    )
                alive = alive & ~abs_m
                med_p = jnp.where(sc_m[:, None], ro + ts_m[:, None] * rd, med_p)
                med_w = jnp.where(sc_m[:, None], w_m, med_w)
                med_scatter = med_scatter | sc_m
                med_masks.append(sc_m)

        # env/emissive only on the camera ray (guidedpath.cpp:168-176),
        # attenuated through media (Lo += Tr * ..., guidedpath.cpp:167-176)
        if depth == 0:
            if cscene.env_light is not None:
                L0 = L0 + jnp.where(
                    (alive & ~hitm & ~med_scatter)[:, None],
                    cscene.env_light.color(rd) * seg_tr[0], 0.0,
                )
        hp = ro + t_hit[:, None] * rd
        p_s, ns, uv = cscene.surface_info(gidx, hp, mesh_tri)
        ctx = dict(p=p_s, n=ns, uv=uv)
        wi_world = -rd
        emis = cscene.is_emissive_lane(gidx) & hitm & ~med_scatter
        if depth == 0 and cscene.emissive_globals:
            le = cscene.emissive_le(gidx, ctx, wi_world)
            L0 = L0 + jnp.where(emis[:, None], le * seg_tr[0], 0.0)

        alive = (hitm & ~emis & ~med_scatter) | med_scatter
        surf = alive & ~med_scatter

        mat_idx = cscene.g_mat_dev[jnp.clip(gidx, 0, cscene.n_global - 1)]
        u_mat = sampler.u2(xs, ys, sample_index, dim + 3)
        state = material_eval.eval_bxdf_state(
            cscene, mat_idx, ctx, wi_world, u_mat[:, 0], u_mat[:, 1],
            MIN_ROUGHNESS, diffused,
        )
        wi = to_local(ns, wi_world)
        bxdf_delta = bxdf_mod.is_delta(state)

        # ---- NEE (one light sample + one shadow query for BOTH vertex
        # kinds; medium and surface events are exclusive per lane) ----
        if n_lights > 0:
            u_sel = sampler.u1(xs, ys, sample_index, dim + 0)
            u_light = sampler.u2(xs, ys, sample_index, dim + 1)
            pv_nee = jnp.where(med_scatter[:, None], med_p, p_s)
            ls = path_mod.sample_one_light(
                cscene, pv_nee, u_sel, u_light,
                dict(p=pv_nee, n=ns, uv=uv),
            )
            do_s = surf & ls["valid"] & ~bxdf_delta & (ls["pdf"] > 0.0)
            do_m = med_scatter & ls["valid"] & (ls["pdf"] > 0.0)
            so = jnp.where(
                med_scatter[:, None], med_p,
                offset_ray_origin(p_s, face_forward(ns, ls["wo"])),
            )
            occluded = cscene.any_hit(
                so, ls["wo"], jnp.where(med_scatter, 1e-4, 0.0),
                jnp.where(do_s | do_m, ls["distance"] * (1.0 - 1e-3), -1.0),
            )
            tr_l = (
                cscene.transmittance(so, ls["wo"], ls["distance"])
                if (cscene.media or gm) else jnp.ones((n, 3), f32)
            )
            wo_l = to_local(ns, ls["wo"])
            f_l, pdf_l = bxdf_mod.f_and_pdf(state, wi, wo_l)
            cos_l = jnp.abs(dot(ls["wo"], ns))
            mis_l = jnp.where(
                ls["is_delta"], 1.0, balance_heuristic(ls["pdf"], pdf_l)
            )
            c_surf = ls["le"] * f_l * (
                cos_l / jnp.maximum(ls["pdf"], 1e-20) * mis_l
            )[:, None]
            # medium vertex: phase f, weight 1 (no MIS) — the medium
            # continuation gathers no le (guidedpath.cpp:129-134)
            f_pm = jnp.zeros((n,), f32)
            cos_pm = jnp.sum(-rd * ls["wo"], -1)
            for gi, med in enumerate(gm):
                f_pm = jnp.where(med_masks[gi], med.pf.p(cos_pm), f_pm)
            c_med = med_w * ls["le"] * (
                f_pm / jnp.maximum(ls["pdf"], 1e-20)
            )[:, None]
            contrib = jnp.where(med_scatter[:, None], c_med, c_surf) * tr_l
            rec_nee[depth] = jnp.where(
                ((do_s | do_m) & ~occluded)[:, None], contrib, 0.0
            )

        # ---- dedicated BSDF ray for emissive hits (guidedpath.cpp:212-239) --
        u_wm = sampler.u2(xs, ys, sample_index, dim + 5)
        u_fr = sampler.u1(xs, ys, sample_index, dim + 7)
        u_cos = sampler.u2(xs, ys, sample_index, dim + 8)
        bs = bxdf_mod.sample(state, wi, u_wm, u_fr, u_cos)
        bs_wo = to_world(ns, bs["wo"])
        bs_cos = jnp.abs(dot(bs_wo, ns))
        bs_o = offset_ray_origin(p_s, face_forward(ns, bs_wo))
        bt, bgidx, bhit, bmesh = cscene.intersect(
            bs_o, bs_wo, jnp.zeros((n,), f32), jnp.full((n,), FLOAT_MAX, f32)
        )
        bt_hit = jnp.where(bhit, bt, 1.0)
        bsemis = jnp.zeros((n, 3), f32)
        # the dedicated ray's segment attenuates through media like every
        # other segment (transmittance(), integrator.cpp:75-81); ratio
        # tracking covers grid media
        b_tr = (
            cscene.transmittance(bs_o, bs_wo, jnp.where(bhit, bt, 1e8))
            if (cscene.media or getattr(cscene, "grid_media", None))
            else jnp.ones((n, 3), f32)
        )
        if cscene.emissive_globals:
            bhp = bs_o + bt_hit[:, None] * bs_wo
            bp, bn, buv = cscene.surface_info(bgidx, bhp, bmesh)
            bctx = dict(p=bp, n=bn, uv=buv)
            b_emis = cscene.is_emissive_lane(bgidx) & bhit
            ble = cscene.emissive_le(bgidx, bctx, -bs_wo)
            blpdf = cscene.light_pdf_at_hit(bgidx, bs_o, bs_wo, bt_hit, bn)
            bmis = jnp.where(bxdf_delta, 1.0, balance_heuristic(bs["pdf"], blpdf))
            bsemis = bsemis + jnp.where(
                b_emis[:, None],
                ble * b_tr
                * (bs_cos * bmis / jnp.maximum(bs["pdf"], 1e-20))[:, None] * bs["f"],
                0.0,
            )
        if cscene.env_light is not None:
            epdf = cscene.env_light.pdf(bs_wo)
            emis_env = jnp.where(bxdf_delta, 1.0, balance_heuristic(bs["pdf"], epdf))
            bsemis = bsemis + jnp.where(
                (~bhit)[:, None],
                cscene.env_light.color(bs_wo) * b_tr
                * (bs_cos * emis_env / jnp.maximum(bs["pdf"], 1e-20))[:, None] * bs["f"],
                0.0,
            )
        rec_bsemis[depth] = jnp.where((surf & bs["valid"])[:, None], bsemis, 0.0)

        # ---- one-sample-MIS continuation: guided vs BSDF ------------------
        u_pick = sampler.u1(xs, ys, sample_index, dim + 10)
        u_guide = sampler.u2(xs, ys, sample_index, dim + 11)
        u_def = sampler.u1(xs, ys, sample_index, dim + 13)
        # the guided distribution lives at the VERTEX position — the medium
        # point for medium lanes (guidedpath.cpp:136 guide.traverse(mit->p))
        pv = jnp.where(med_scatter[:, None], med_p, p_s)
        if tree_mode:
            droot, _, foot = guide.lookup(gstate, pv)
            g_wo, g_pdf, g_valid = guide.sample(gstate, droot, u_guide, u_def)
        else:
            cell = grid.cell_of(pv)
            hist_rows = gstate["hist"][cell]
            g_wo, g_pdf, g_valid = guide.sample(hist_rows, u_guide, u_def)
        # the reference's uncompensated Russian roulette on low-pdf guided
        # samples (guidedpath.cpp:141-143): rr = max(pdf, 0.05) for vertices
        # past length 1; slightly biased by construction but kills the
        # noisy-histogram fireflies that otherwise dominate variance
        if depth > 1:
            u_rr = sampler.u1(xs, ys, sample_index, dim + 19)
            rr = jnp.maximum(g_pdf, 0.05)
            g_valid = g_valid & ((rr >= 1.0) | (u_rr < rr))
        # guide only lobes whose f is bounded when evaluated at arbitrary
        # directions: rough-transmissive f has a 1/(cos_i cos_t) singularity
        # that guided (non-microfacet) sampling would hit at fixed probability
        from pine_tpu.scene.materials import BX_REFR_DIELECTRIC, BX_REFRACTIVE

        transmissive = (state["tag"] == BX_REFRACTIVE) | (
            state["tag"] == BX_REFR_DIELECTRIC
        )
        # delta/transmissive gating is a SURFACE concern; medium lanes always
        # mix guided with phase sampling (guidedpath.cpp:138 prob_a)
        pa = jnp.where((bxdf_delta | transmissive) & ~med_scatter, 0.0, prob_a)
        chose_guided = u_pick < pa  # branch choice is by probability alone;
        # a failed guided sample wastes the path (guidedpath.cpp:229 nullopt)
        use_guide = chose_guided & g_valid

        # second independent bxdf sample for the continuation branch
        u_wm2 = sampler.u2(xs, ys, sample_index, dim + 14)
        u_fr2 = sampler.u1(xs, ys, sample_index, dim + 16)
        u_cos2 = sampler.u2(xs, ys, sample_index, dim + 17)
        bs2 = bxdf_mod.sample(state, wi, u_wm2, u_fr2, u_cos2)
        b_wo = to_world(ns, bs2["wo"])
        # medium alternative branch: phase sample (exclusive events, so the
        # bxdf dims are safely reused; guidedpath.cpp:155 pg.sample)
        ph_wo, ph_pdf = b_wo, jnp.zeros((n,), f32)
        for gi, med in enumerate(gm):
            w_s, p_s_pdf = med.pf.sample(-rd, u_wm2)
            ph_wo = jnp.where(med_masks[gi][:, None], w_s, ph_wo)
            ph_pdf = jnp.where(med_masks[gi], p_s_pdf, ph_pdf)
        alt_wo = jnp.where(med_scatter[:, None], ph_wo, b_wo)
        alt_pdf = jnp.where(med_scatter, ph_pdf, bs2["pdf"])
        alt_valid = jnp.where(med_scatter, ph_pdf > 0.0, bs2["valid"])

        wo_world = jnp.where(use_guide[:, None], g_wo, alt_wo)
        wo_local = to_local(ns, wo_world)
        f_g, pdf_b_at = bxdf_mod.f_and_pdf(state, wi, wo_local)
        # phase value == phase pdf at the chosen direction (HG-family PFs
        # sample exactly); evaluated per owning medium
        f_ph_at = jnp.zeros((n,), f32)
        cos_ph = jnp.sum(-rd * wo_world, -1)
        for gi, med in enumerate(gm):
            f_ph_at = jnp.where(med_masks[gi], med.pf.p(cos_ph), f_ph_at)
        cosine = jnp.where(med_scatter, 1.0, jnp.abs(dot(wo_world, ns)))
        if tree_mode:
            guide_pdf_at = guide.pdf(gstate, droot, wo_world)
        else:
            guide_pdf_at = guide.pdf(hist_rows, wo_world)
        alt_pdf_at = jnp.where(med_scatter, f_ph_at, pdf_b_at)

        # guided branch weight: f*cos/g_pdf * mis / pa
        mis_g = balance_heuristic(pa * g_pdf, (1 - pa) * alt_pdf_at)
        w_g = (cosine * mis_g / jnp.maximum(g_pdf, 1e-20) /
               jnp.maximum(pa, 1e-6))
        thr_g = jnp.where(med_scatter[:, None], f_ph_at[:, None], f_g) \
            * w_g[:, None]
        # alternative (bsdf | phase) branch weight
        mis_b = jnp.where(
            bxdf_delta & ~med_scatter, 1.0,
            balance_heuristic((1 - pa) * alt_pdf, pa * guide_pdf_at),
        )
        w_b = (cosine * mis_b / jnp.maximum(alt_pdf, 1e-20) /
               jnp.maximum(1 - pa, 1e-6))
        thr_b = jnp.where(med_scatter[:, None], f_ph_at[:, None], bs2["f"]) \
            * w_b[:, None]

        cont_valid = jnp.where(chose_guided, g_valid, alt_valid) & alive
        thr = jnp.where(use_guide[:, None], thr_g, thr_b)
        # the chromatic tracking weight (mit->W) scales the whole medium
        # vertex contribution but NOT the training flux (the reference trains
        # on avg(Li)*mis/pdf/prob, guidedpath.cpp:148,161)
        thr = jnp.where(med_scatter[:, None], med_w * thr, thr)
        w_train = jnp.where(use_guide, w_g, w_b) / jnp.maximum(cosine, 1e-6)

        rec_thr[depth] = jnp.where(cont_valid[:, None], thr, 0.0)
        if tree_mode:
            # training flux lands at a footprint-jittered position
            # (spatial_tree.h:331-336 add_sample)
            u_jit2 = sampler.u2(xs, ys, sample_index, dim + 20)
            u_jit1 = sampler.u1(xs, ys, sample_index, dim + 22)
            u3 = jnp.concatenate([u_jit2, u_jit1[:, None]], axis=1)
            troot, tleaf, _ = guide.lookup_train(gstate, pv, foot, u3)
            rec_cell[depth] = troot
            rec_leaf[depth] = tleaf
            rec_sq[depth] = dir_to_square(wo_world)
        else:
            rec_cell[depth] = cell
            rec_bin[depth] = dir_bin(wo_world)
        rec_w[depth] = jnp.where(
            cont_valid & ~(bxdf_delta & ~med_scatter & ~use_guide), w_train, 0.0
        )
        rec_valid[depth] = alive

        alive = cont_valid
        diffused = diffused | (alive & ~med_scatter & ~bs2["is_delta_sample"])
        ro = jnp.where(
            med_scatter[:, None], med_p,
            offset_ray_origin(p_s, face_forward(ns, wo_world)),
        )
        rd = wo_world
        tmin = jnp.where(med_scatter, 1e-4, 0.0)

    # ---- reverse sweep: per-vertex incident radiance + training flux ------
    Li_next = jnp.zeros((n, 3), f32)  # radiance leaving vertex d+1
    gstate = dict(gstate)
    for d in range(depths - 1, -1, -1):
        # radiance ARRIVING at vertex d along the continuation: the next
        # segment's in-scatter plus its transmittance times lo_{d+1}
        # (the reference's recursive radiance() includes these terms)
        if d + 1 < depths:
            lo_next = seg_sc[d + 1] + seg_tr[d + 1] * Li_next
        else:
            lo_next = Li_next
        # flux sample: avg(Li_{d+1}) * w  (guidedpath.cpp:238,251)
        if train:
            flux = jnp.mean(lo_next, axis=1) * rec_w[d]
            if tree_mode:
                # count every recorded sample (spatial_tree.h:335 n_samples);
                # zero flux adds nothing to the quadtree by construction
                m = rec_valid[d] & (rec_w[d] > 0.0)
                gstate = guide.add(
                    gstate, rec_cell[d], rec_leaf[d], rec_sq[d], flux, m
                )
            else:
                m = rec_valid[d] & (flux > 0.0)
                flat = rec_cell[d] * (DIR_RES * DIR_RES) + rec_bin[d]
                gstate["hist"] = gstate["hist"].reshape(-1).at[flat].add(
                    jnp.where(m, flux, 0.0)
                ).reshape(gstate["hist"].shape)
        lo_d = rec_nee[d] + rec_bsemis[d] + rec_thr[d] * lo_next
        Li_next = lo_d
    if depths > 0:
        # camera segment: in-scatter reaches the film unconditionally; the
        # first vertex's radiance arrives through the segment transmittance
        L = L0 + seg_sc[0] + seg_tr[0] * jnp.where(
            rec_valid[0][:, None], Li_next, 0.0
        )
    else:
        L = L0
    return L, gstate
