"""PRL builtin registry (parity: src/pine/core/program_context.cpp:23-125 and
the per-module *_context registrations; names per SURVEY.md Appendix A).

The reference resolves overloads through a typed signature table
(context.h find_f); here each name maps to one Python callable that dispatches
on argument types/arity — same visible behavior, no codegen.
"""
from __future__ import annotations

import math as pymath

import numpy as np

from pine_tpu.prl.values import (
    PrlMat,
    PrlVec,
    is_int_value,
    make_vec,
    prl_to_string,
    to_float_vec,
    xp,
)

Pi = float(np.pi)


def _data(x):
    return x.data if isinstance(x, (PrlVec, PrlMat)) else x


def _isvec(x):
    return isinstance(x, PrlVec)


def _np_or_jnp(*args):
    return xp(*args)


def _scalar_fn(np_fn):
    """Elementwise fn applying to scalars and vecs alike."""

    def fn(x):
        if _isvec(x):
            return PrlVec(np_fn(x.data))
        r = np_fn(x)
        return float(r) if isinstance(r, (np.floating, np.ndarray)) and np.ndim(r) == 0 else r

    return fn


class Array2dValue:
    """PRL Array2d* / Image value: numpy or jnp (H,W,C) or (H,W)."""

    def __init__(self, data, srgb_source=False):
        self.data = data
        self.srgb_source = srgb_source

    def size(self):
        h, w = self.data.shape[:2]
        return PrlVec(np.asarray([w, h], np.int32), True)

    def get(self, p):
        x, y = int(p.data[0]), int(p.data[1])
        v = self.data[y, x]
        if np.ndim(v) == 0:
            return float(v)
        return PrlVec(np.asarray(v, np.float32))

    def set(self, p, v):
        x, y = int(p.data[0]), int(p.data[1])
        self.data = np.asarray(self.data)
        self.data[y, x] = _data(v)


def make_registry(interp):
    """Build {name: callable}; `interp` is the owning Interpreter."""
    from pine_tpu.core import camera as camera_mod
    from pine_tpu.core import rng as rng_mod
    from pine_tpu.core import samplers as samplers_mod
    from pine_tpu.core.film import Film
    from pine_tpu.core.vecmath import (
        look_at as _look_at,
        rotate as _rotate,
        rotate_x as _rx,
        rotate_y as _ry,
        rotate_z as _rz,
        scale as _scale,
        translate as _translate,
    )
    from pine_tpu.scene import lights as L
    from pine_tpu.scene import materials as M
    from pine_tpu.scene import nodes as N
    from pine_tpu.scene import shapes as S
    from pine_tpu.scene.scene import Scene

    reg = {}

    def register(name):
        def deco(fn):
            reg[name] = fn
            return fn

        return deco

    # ---- printing ----------------------------------------------------------
    @register("print")
    def _print(*args):
        interp.out("".join(prl_to_string(a) for a in args))

    @register("println")
    def _println(*args):
        interp.out("".join(prl_to_string(a) for a in args))

    # ---- constants (registered as plain globals) ---------------------------
    interp.globals.declare("Pi", Pi)
    interp.globals.declare("E", float(np.e))
    interp.globals.declare("X", PrlVec([1.0, 0.0, 0.0]))
    interp.globals.declare("Y", PrlVec([0.0, 1.0, 0.0]))
    interp.globals.declare("Z", PrlVec([0.0, 0.0, 1.0]))

    # ---- scalar & vector math (math.cpp, vecmath.cpp) ----------------------
    def _nodeish(*args):
        return any(isinstance(a, N.Node) for a in args)

    @register("min")
    def _min(*args):
        if _nodeish(*args):
            raise TypeError("min over nodes is not registered in PRL")
        m = _np_or_jnp(*args)
        if len(args) == 1 and _isvec(args[0]):
            return float(m.min(args[0].data))
        if all(not _isvec(a) for a in args):
            r = args[0]
            for a in args[1:]:
                r = m.minimum(r, a) if m is not np else min(r, a)
            return r
        vs = [_data(a) for a in args]
        r = vs[0]
        for v in vs[1:]:
            r = m.minimum(r, v)
        return PrlVec(r)

    @register("max")
    def _max(*args):
        m = _np_or_jnp(*args)
        if len(args) == 1 and _isvec(args[0]):
            return float(m.max(args[0].data))
        if all(not _isvec(a) for a in args):
            r = args[0]
            for a in args[1:]:
                r = m.maximum(r, a) if m is not np else max(r, a)
            return r
        vs = [_data(a) for a in args]
        r = vs[0]
        for v in vs[1:]:
            r = m.maximum(r, v)
        return PrlVec(r)

    @register("abs")
    def _abs(x):
        if _isvec(x):
            return PrlVec(_np_or_jnp(x).abs(x.data), x.is_int)
        return abs(x) if not hasattr(x, "aval") else _np_or_jnp(x).abs(x)

    @register("clamp")
    def _clamp(x, lo, hi):
        m = _np_or_jnp(x, lo, hi)
        if _isvec(x):
            return PrlVec(m.clip(x.data, _data(lo), _data(hi)))
        r = m.clip(x, _data(lo), _data(hi))
        return float(r) if m is np else r

    @register("lerp")
    def _lerp(t, a, b):
        if _nodeish(t, a, b):
            return N.Lerp(_to_node(t), _to_node(a), _to_node(b))
        m = _np_or_jnp(t, a, b)
        ad, bd, td = _data(a), _data(b), _data(t)
        r = ad + (bd - ad) * td
        if _isvec(a) or _isvec(b):
            return PrlVec(r)
        return float(r) if m is np and np.ndim(r) == 0 else r

    reg["sqr"] = lambda x: (
        N.Unary("s", x) if isinstance(x, N.Node) else (PrlVec(_data(x) * _data(x), getattr(x, "is_int", False)) if _isvec(x) else x * x)
    )

    @register("sqrt")
    def _sqrt(x):
        if isinstance(x, N.Node):
            return N.Unary("r", x)
        m = _np_or_jnp(x)
        if _isvec(x):
            return PrlVec(m.sqrt(x.data))
        return float(m.sqrt(x)) if m is np else m.sqrt(x)

    @register("fract")
    def _fract(x):
        if isinstance(x, N.Node):
            return N.Unary("f", x)
        m = _np_or_jnp(x)
        if _isvec(x):
            return PrlVec(x.data - m.floor(x.data))
        r = x - m.floor(x)
        return float(r) if m is np else r

    @register("floor")
    def _floor(x):
        m = _np_or_jnp(x)
        if _isvec(x):
            return PrlVec(m.floor(x.data))
        return float(m.floor(x)) if m is np else m.floor(x)

    @register("ceil")
    def _ceil(x):
        m = _np_or_jnp(x)
        if _isvec(x):
            return PrlVec(m.ceil(x.data))
        return float(m.ceil(x)) if m is np else m.ceil(x)

    @register("powi")
    def _powi(b, e):
        return int(b**e)

    @register("pow")
    def _pow(b, e):
        m = _np_or_jnp(b, e)
        if _isvec(b):
            return PrlVec(m.power(b.data.astype(np.float32) if b.is_int and m is np else b.data, _data(e)))
        r = m.power(b, e)
        return float(r) if m is np else r

    for nm, f in [
        ("exp", "exp"), ("log2", "log2"), ("log", "log"), ("log10", "log10"),
        ("sin", "sin"), ("cos", "cos"), ("tan", "tan"), ("acos", "arccos"),
        ("asin", "arcsin"), ("sinh", "sinh"), ("cosh", "cosh"), ("tanh", "tanh"),
    ]:
        def make(fname):
            def fn(x):
                m = _np_or_jnp(x)
                func = getattr(m, fname)
                if _isvec(x):
                    return PrlVec(func(x.data.astype(np.float32) if x.is_int and m is np else x.data))
                r = func(x)
                return float(r) if m is np else r

            return fn

        reg[nm] = make(f)

    @register("atan2")
    def _atan2(y, x):
        m = _np_or_jnp(y, x)
        r = m.arctan2(y, x)
        return float(r) if m is np else r

    @register("normalize")
    def _normalize(v):
        m = _np_or_jnp(v)
        d = v.data
        n = m.sqrt(m.sum(d * d, -1))
        return PrlVec(d / (n[..., None] if hasattr(n, "ndim") and getattr(n, "ndim", 0) else n))

    @register("length")
    def _length(v, _ignored=None):
        m = _np_or_jnp(v)
        d = _data(v)
        r = m.sqrt(m.sum(d * d, -1))
        return float(r) if m is np and np.ndim(r) == 0 else r

    @register("distance")
    def _distance(a, b):
        return _length(PrlVec(_data(a) - _data(b)))

    @register("dot")
    def _dot(a, b):
        m = _np_or_jnp(a, b)
        r = m.sum(_data(a) * _data(b), -1)
        return float(r) if m is np and np.ndim(r) == 0 else r

    @register("cross")
    def _cross(a, b):
        m = _np_or_jnp(a, b)
        return PrlVec(m.cross(_data(a), _data(b)))

    @register("sum")
    def _sum(v):
        m = _np_or_jnp(v)
        r = m.sum(_data(v), -1)
        return float(r) if m is np and np.ndim(r) == 0 else r

    @register("max_value")
    def _max_value(v):
        m = _np_or_jnp(v)
        r = m.max(_data(v), -1) if m is not np else np.max(_data(v), -1)
        return float(r) if m is np and np.ndim(r) == 0 else r

    @register("min_value")
    def _min_value(v):
        m = _np_or_jnp(v)
        r = m.min(_data(v), -1) if m is not np else np.min(_data(v), -1)
        return float(r) if m is np and np.ndim(r) == 0 else r

    @register("max_axis")
    def _max_axis(v):
        return int(np.argmax(_data(v)))

    @register("min_axis")
    def _min_axis(v):
        return int(np.argmin(_data(v)))

    # ---- vec/mat constructors ----------------------------------------------
    def vec_ctor(n, is_int):
        def fn(*args):
            m = _np_or_jnp(*args)
            if len(args) == 1:
                a = args[0]
                if _isvec(a):
                    d = a.data[..., :n]
                    if is_int:
                        d = d.astype(np.int32 if m is np else None) if m is np else d.astype("int32")
                    else:
                        d = d.astype(np.float32) if m is np else d.astype("float32")
                    return PrlVec(d, is_int)
                if m is np:
                    return PrlVec(
                        np.full(n, a, np.int32 if is_int else np.float32), is_int
                    )
                import jax.numpy as jnp

                av = jnp.asarray(a, jnp.int32 if is_int else jnp.float32)
                if av.ndim:
                    return PrlVec(
                        jnp.broadcast_to(av[..., None], av.shape + (n,)), is_int
                    )
                return PrlVec(jnp.full((n,), av), is_int)
            comps = list(args)
            flat = []
            for c in comps:
                if _isvec(c):
                    for i in range(c.n):
                        flat.append(c.subscript(i))
                else:
                    flat.append(c)
            v = make_vec(flat[:n] if len(flat) >= n else flat)
            if not is_int:
                v = to_float_vec(v)
                return v
            m2 = _np_or_jnp(v)
            return PrlVec(v.data.astype(np.int32) if m2 is np else v.data.astype("int32"), True)

        return fn

    for n in (2, 3, 4):
        reg[f"vec{n}"] = vec_ctor(n, False)
        reg[f"vec{n}i"] = vec_ctor(n, True)

    def mat_ctor(n):
        def fn(*cols):
            m = _np_or_jnp(*cols)
            stacked = (np.stack if m is np else __import__("jax.numpy", fromlist=["stack"]).stack)(
                [_data(c) for c in cols], -1
            )
            return PrlMat(stacked)

        return fn

    reg["mat2"] = mat_ctor(2)
    reg["mat3"] = mat_ctor(3)

    @register("mat4")
    def _mat4(*cols):
        if len(cols) == 1 and isinstance(cols[0], PrlMat):
            return cols[0]
        return mat_ctor(4)(*cols)

    @register("identity3x3")
    def _id3():
        return PrlMat(np.eye(3, dtype=np.float32))

    @register("identity4x4")
    def _id4():
        return PrlMat(np.eye(4, dtype=np.float32))

    @register("transpose")
    def _transpose(m):
        mod = _np_or_jnp(m)
        return PrlMat(mod.swapaxes(m.data, -1, -2))

    @register("determinant")
    def _det(m):
        return float(np.linalg.det(np.asarray(m.data)))

    @register("inverse")
    def _inverse(m):
        mod = _np_or_jnp(m)
        if mod is np:
            return PrlMat(np.linalg.inv(np.asarray(m.data, np.float64)).astype(np.float32))
        import jax.numpy as jnp

        return PrlMat(jnp.linalg.inv(m.data))

    @register("solve")
    def _solve(m, b):
        return PrlVec(np.linalg.solve(np.asarray(m.data), np.asarray(_data(b))).astype(np.float32))

    # transform builders (host-side numpy mats)
    reg["rotate_x"] = lambda r: PrlMat(_rx(float(r)))
    reg["rotate_y"] = lambda r: PrlMat(_ry(float(r)))
    reg["rotate_z"] = lambda r: PrlMat(_rz(float(r)))
    reg["rotate"] = lambda v: PrlMat(_rotate(_data(v)))
    reg["translate"] = lambda *a: PrlMat(
        _translate(_data(a[0]) if len(a) == 1 else [a[0], a[1], a[2]])
    )

    @register("scale")
    def _scale_fn(*a):
        if len(a) == 1 and not _isvec(a[0]):
            return PrlMat(_scale([a[0]] * 3))
        return PrlMat(_scale(_data(a[0]) if len(a) == 1 else [a[0], a[1], a[2]]))

    reg["look_at"] = reg["lookat"] = lambda f, t: PrlMat(_look_at(_data(f), _data(t)))

    @register("coordinate_system")
    def _coord(n):
        from pine_tpu.core.vecmath import coordinate_system

        import jax.numpy as jnp

        t, b = coordinate_system(jnp.asarray(_data(n), jnp.float32))
        return PrlMat(np.stack([np.asarray(t), np.asarray(b), np.asarray(_data(n))], -1))

    # spherical helpers
    from pine_tpu.core import sampling as smp
    from pine_tpu.core import vecmath as vm

    import jax.numpy as jnp  # used only under trace; numpy arrays pass through

    def wrap_vecfn(fn, out_vec=True):
        def f(*args):
            r = fn(*[jnp.asarray(_data(a), jnp.float32) if not np.isscalar(a) else a for a in args])
            if out_vec:
                return PrlVec(np.asarray(r) if _np_or_jnp(*args) is np else r)
            return float(r) if _np_or_jnp(*args) is np else r

        return f

    reg["spherical_to_cartesian"] = lambda phi, *rest: PrlVec(
        np.asarray(
            vm.spherical_to_cartesian(
                jnp.float32(phi),
                jnp.sin(jnp.float32(rest[-1])) if len(rest) == 1 else jnp.float32(rest[0]),
                jnp.cos(jnp.float32(rest[-1])) if len(rest) == 1 else jnp.float32(rest[1]),
            )
        )
    )
    reg["unit_square_to_cartesian"] = wrap_vecfn(vm.unit_square_to_cartesian)
    reg["cartesian_to_spherical"] = wrap_vecfn(vm.cartesian_to_spherical)
    reg["cartesian_to_unit_square"] = wrap_vecfn(vm.cartesian_to_unit_square)
    reg["sample_disk_polar"] = wrap_vecfn(smp.sample_disk_polar)
    reg["sample_disk_concentric"] = wrap_vecfn(smp.sample_disk_concentric)
    reg["cosine_weighted_hemisphere"] = wrap_vecfn(smp.cosine_weighted_hemisphere)
    reg["uniform_sphere"] = wrap_vecfn(smp.uniform_sphere)
    reg["uniform_hemisphere"] = wrap_vecfn(smp.uniform_hemisphere)
    reg["inverse_uniform_sphere"] = wrap_vecfn(
        lambda d: vm.cartesian_to_spherical(d) / jnp.asarray([2 * Pi, Pi])
    )
    reg["inverse_uniform_hemisphere"] = wrap_vecfn(
        lambda d: jnp.stack([vm.phi2pi(d[..., 0], d[..., 1]) / (2 * Pi), jnp.arccos(d[..., 2])], -1)
    )

    # ---- RNG (rng.cpp) -----------------------------------------------------
    _global_rng = rng_mod.RNG(0)

    reg["RNG"] = lambda *a: rng_mod.RNG(int(a[0]) if a else 0)
    reg["srand"] = lambda s: _global_rng.seed(int(s))
    reg["randf"] = lambda *a: float(
        (a[0] if a else _global_rng).uniformf()
    )
    reg["rand2f"] = lambda *a: PrlVec((a[0] if a else _global_rng).uniform2f())
    reg["rand3f"] = lambda *a: PrlVec((a[0] if a else _global_rng).uniform3f())
    reg["nextf"] = lambda rng: float(rng.uniformf())
    reg["next2f"] = lambda rng: PrlVec(rng.uniform2f())
    reg["next3f"] = lambda rng: PrlVec(rng.uniform3f())

    # ---- noise (node.cpp pnoise/fbm) ---------------------------------------
    from pine_tpu.core import noise as noise_mod

    def _noise_call(fn, x, arg2):
        m = _np_or_jnp(x, arg2)
        r = fn(jnp.asarray(_data(x), jnp.float32), arg2)
        if m is np:
            r = np.asarray(r)
            return float(r) if r.ndim == 0 else PrlVec(r)
        return r if np.ndim(r) == 0 or getattr(r, "ndim", 0) <= 1 else PrlVec(r)

    reg["pnoise"] = lambda x, seed=0: _noise_call(lambda p, s: noise_mod._perlin_any(p, int(_as_static_int(s))), x, seed)
    reg["pnoise2d"] = lambda x, seed=0: _noise_call(
        lambda p, s: jnp.stack([noise_mod._perlin_any(p, int(_as_static_int(s))), noise_mod._perlin_any(p, int(_as_static_int(s)) + 1)], -1), x, seed
    )
    reg["pnoise3d"] = lambda x, seed=0: _noise_call(
        lambda p, s: jnp.stack([noise_mod._perlin_any(p, int(_as_static_int(s)) + k) for k in range(3)], -1), x, seed
    )
    reg["fbm"] = lambda x, octaves: (
        N.Noisef(x, octaves) if _nodeish(x, octaves) else _noise_call(lambda p, o: noise_mod.fbm(p, o), x, octaves)
    )
    reg["fbm2d"] = lambda x, octaves: _noise_call(lambda p, o: noise_mod.fbm2d(p, o), x, octaves)
    reg["fbm3d"] = lambda x, octaves: (
        N.Noise3f(x, octaves) if _nodeish(x, octaves) else _noise_call(lambda p, o: noise_mod.fbm3d(p, o), x, octaves)
    )

    # ---- texture nodes (node.cpp) ------------------------------------------
    def _to_node(x):
        if isinstance(x, N.Node):
            return x
        if _isvec(x):
            return N.Constant(np.asarray(x.data, np.float32))
        if isinstance(x, (int, float)):
            return N.Constant(float(x))
        if isinstance(x, Array2dValue):
            return N.Texture(N.UV(), x.data)
        raise TypeError(f"cannot convert {x!r} to a texture node")

    reg["Position"] = lambda: N.Position()
    reg["Normal"] = lambda: N.Normal()
    reg["UV"] = lambda: N.UV()
    reg["Checkerboard"] = lambda p=None, ratio=0.5: N.Checkerboard(
        _to_node(p) if p is not None else N.UV(), float(ratio)
    )
    reg["Noisef"] = lambda p, octaves: N.Noisef(_to_node(p), _to_node(octaves))
    reg["Noise3f"] = lambda p, octaves: N.Noise3f(_to_node(p), _to_node(octaves))
    reg["Texture"] = lambda p, image: N.Texture(
        _to_node(p), image.data if isinstance(image, Array2dValue) else image
    )
    reg["Function"] = lambda f: N.Function(f.as_node_fn())
    reg["Vec3"] = lambda *a: N.ToVec3(*[_to_node(x) for x in a])
    reg["Comp"] = lambda p, i: N.Component(_to_node(p), int(i))

    # ---- materials (material.cpp) ------------------------------------------
    def matarg(x):
        """Material parameters are Node-typed (Node3f/Nodef)."""
        if isinstance(x, N.Node):
            return x
        if _isvec(x):
            return N.Constant(np.asarray(to_float_vec(x).data, np.float32))
        if isinstance(x, Array2dValue):
            return N.Texture(N.UV(), x.data)
        return N.Constant(float(x))

    reg["Emissive"] = lambda color: M.Emissive(matarg(color))
    reg["Diffuse"] = lambda albedo: M.Diffuse(matarg(albedo))
    reg["Metal"] = lambda albedo, rough: M.Metal(matarg(albedo), matarg(rough))
    reg["Glossy"] = lambda albedo, rough, ior=1.4: M.Glossy(
        matarg(albedo), matarg(rough), matarg(ior)
    )
    reg["Glass"] = lambda albedo, rough, ior=1.4: M.Glass(
        matarg(albedo), matarg(rough), matarg(ior)
    )
    reg["Subsurface"] = lambda albedo, rough, sigma_s: M.Subsurface(
        matarg(albedo), matarg(rough), np.asarray(_data(to_float_vec(sigma_s)), np.float32)
        if _isvec(sigma_s)
        else np.full(3, float(sigma_s), np.float32)
    )
    reg["Uber"] = lambda albedo, rough, metallic=0.0, transmission=0.0, ior=1.45: M.Uber(
        matarg(albedo), matarg(rough), matarg(metallic), matarg(transmission), float(ior)
    )

    # ---- shapes (geometry.cpp:901-946) -------------------------------------
    reg["Sphere"] = lambda c, r: S.Sphere(_data(to_float_vec(c)), float(r))
    reg["Plane"] = lambda p, n: S.Plane(_data(to_float_vec(p)), _data(to_float_vec(n)))
    reg["Disk"] = lambda p, n, r: S.Disk(
        _data(to_float_vec(p)), _data(to_float_vec(n)), float(r)
    )
    reg["Line"] = lambda p0, p1, t: S.Line(
        _data(to_float_vec(p0)), _data(to_float_vec(p1)), float(t)
    )
    reg["Rect"] = lambda p, ex, ey, flip=False: S.Rect(
        _data(to_float_vec(p)), _data(to_float_vec(ex)), _data(to_float_vec(ey)), bool(flip)
    )
    reg["Cone"] = lambda p, n, r, h: S.Cone(
        _data(to_float_vec(p)), _data(to_float_vec(n)), float(r), float(h)
    )
    reg["Cylinder"] = lambda p0, p1, r: S.Cylinder(
        _data(to_float_vec(p0)), _data(to_float_vec(p1)), float(r)
    )
    reg["Triangle"] = lambda a, b, c: S.Triangle(
        _data(to_float_vec(a)), _data(to_float_vec(b)), _data(to_float_vec(c))
    )
    reg["AABB"] = lambda lo, up: S.BoxAABB(_data(to_float_vec(lo)), _data(to_float_vec(up)))
    reg["OBB"] = lambda aabb, m: S.BoxOBB(aabb, m.data)

    @register("Box")
    def _box(*a):
        if len(a) == 2 and isinstance(a[0], S.BoxAABB):
            return S.BoxOBB(a[0], a[1].data)
        if len(a) == 2:
            return S.BoxAABB(_data(to_float_vec(a[0])), _data(to_float_vec(a[1])))
        return S.BoxOBB(
            S.BoxAABB(_data(to_float_vec(a[0])), _data(to_float_vec(a[1]))), a[2].data
        )

    @register("SDF")
    def _sdf(*a):
        if len(a) == 3:
            center, half, fn = a
            return S.SDFShape(
                _data(to_float_vec(center)), _data(to_float_vec(half)), fn.as_jax_vec3_to_f32()
            )
        aabb, fn = a
        c = (aabb.lower + aabb.upper) / 2
        h = (aabb.upper - aabb.lower) / 2
        return S.SDFShape(c, h, fn.as_jax_vec3_to_f32())

    @register("heightmap")
    def _heightmap(*a):
        if len(a) == 1 and isinstance(a[0], str):
            from pine_tpu.io.image_io import load_image

            img = load_image(a[0])
            return S.heightmap_from_array(img[..., 0].T)
        size, fn = a
        w, h = int(size.data[0]), int(size.data[1])
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        X, Yg = np.meshgrid(xs, ys, indexing="ij")
        coords = np.stack([X, Yg], -1).reshape(-1, 2)
        import jax

        vals = np.asarray(jax.jit(lambda uv: _data(fn(PrlVec(uv))))(coords))
        return S.heightmap_from_array(vals.reshape(w, h))

    @register("Mesh")
    def _mesh(filename):
        from pine_tpu.io.gltf import mesh_from_glb

        return mesh_from_glb(filename)

    @register("Instancing")
    def _instancing(mesh):
        # geometry.cpp:941-946: Instancing(Mesh) + .add(mat4, Material)
        return S.InstancedShape(mesh)

    # ---- lights (light.cpp:174-186) ----------------------------------------
    reg["PointLight"] = lambda p, c: L.PointLight(_data(to_float_vec(p)), _data(to_float_vec(c)))
    reg["SpotLight"] = lambda p, d, c, falloff, cutoff=0.0: L.SpotLight(
        _data(to_float_vec(p)), _data(to_float_vec(d)), _data(to_float_vec(c)), float(falloff), float(cutoff)
    )
    reg["DirectionalLight"] = lambda d, c: L.DirectionalLight(
        _data(to_float_vec(d)), _data(to_float_vec(c))
    )
    reg["Sky"] = lambda c: L.Sky(_data(to_float_vec(c)))

    @register("Atmosphere")
    def _atmosphere(sun_dir, sun_color):
        from pine_tpu.scene.env_lights import Atmosphere

        return Atmosphere(_data(to_float_vec(sun_dir)), _data(to_float_vec(sun_color)))

    @register("ImageSky")
    def _imagesky(image, tint=None, elevation=0.0, rotation=0.0):
        from pine_tpu.scene.env_lights import ImageSky

        return ImageSky(
            np.asarray(image.data, np.float32),
            np.ones(3, np.float32) if tint is None else _data(to_float_vec(tint)),
            float(elevation),
            float(rotation),
        )

    # ---- media (medium.cpp:342-354) ----------------------------------------
    @register("HgPF")
    def _hgpf(g=0.0):
        from pine_tpu.scene.media import HgPhaseFunction

        return HgPhaseFunction(float(g))

    @register("Hg2PF")
    def _hg2pf(g0, g1, w):
        from pine_tpu.scene.media import TwoLobeHgPhaseFunction

        return TwoLobeHgPhaseFunction(float(g0), float(g1), float(w))

    @register("CloudPF")
    def _cloudpf(d=0.5):
        from pine_tpu.scene.media import CloudPhaseFunction

        return CloudPhaseFunction(float(d))

    @register("HomoMedium")
    def _homomedium(shape, pf, sigma_a, sigma_s):
        from pine_tpu.scene.media import HomogeneousMedium

        return HomogeneousMedium(
            shape, pf, _data(to_float_vec(sigma_a)), _data(to_float_vec(sigma_s))
        )

    @register("VDBMedium")
    def _vdbmedium(filename, transform, pf, sigma_a, sigma_s, *rest):
        # medium.cpp:152: VDBMedium(file, transform, pf, sigma_a, sigma_s
        #                           [, blackbody_intensity, temperature_scale])
        from pine_tpu.scene.media import VDBMedium

        return VDBMedium(
            str(filename), _data(transform) if hasattr(transform, "data") else transform,
            pf, _data(to_float_vec(sigma_a)), _data(to_float_vec(sigma_s)),
            *[float(r) for r in rest],
        )

    # ---- camera / film (camera.cpp:40-45, film.cpp:97-120) -----------------
    reg["Uncharted2"] = lambda: "uncharted2"
    reg["ACES"] = lambda: "aces"

    @register("Film")
    def _film(size, tone_mapper="uncharted2"):
        return Film((int(size.data[0]), int(size.data[1])), tone_mapper)

    @register("ThinLenCamera")
    def _camera(film, from_p, to_p, fov, len_radius=0.0, focus_distance=1.0):
        return camera_mod.ThinLenCamera(
            film,
            _data(to_float_vec(from_p)),
            _data(to_float_vec(to_p)),
            float(fov),
            float(len_radius),
            float(focus_distance),
        )

    @register("film")
    def _film_of(cam=None):
        """Film of a camera; script idiom: ``scene.camera.film()`` (film.cpp:97-120)."""
        if cam is None:
            raise TypeError(
                "film() takes the camera — write `scene.camera.film()`"
            )
        return cam.film

    # ---- samplers (sampler.cpp:167-200) ------------------------------------
    reg["UniformSampler"] = lambda spp: samplers_mod.UniformSampler(int(spp))
    reg["HaltonSampler"] = lambda spp: samplers_mod.HaltonSampler(int(spp))
    reg["SobolSampler"] = lambda spp: samplers_mod.SobolSampler(int(spp))
    reg["BlueSampler"] = lambda spp: samplers_mod.BlueSampler(int(spp))

    # ---- integrators (program_context.cpp:54-118) --------------------------
    from pine_tpu.integrators.path import PathIntegrator

    reg["PathIntegrator"] = lambda sampler, max_len: PathIntegrator(sampler, int(max_len))

    @register("AOIntegrator")
    def _ao(sampler, radius=None):
        from pine_tpu.integrators.ao import AOIntegrator

        return AOIntegrator(sampler, None if radius is None else float(radius))

    @register("VolIntegrator")
    def _vol(*a):
        from pine_tpu.integrators.vol import VolIntegrator

        return VolIntegrator(*a)

    @register("RandomWalkIntegrator")
    def _rw(sampler, max_len):
        from pine_tpu.integrators.randomwalk import RandomWalkIntegrator

        return RandomWalkIntegrator(sampler, int(max_len))

    @register("CachedPathIntegrator")
    def _cached(sampler, max_len, resolution=128, starting_depth=1):
        from pine_tpu.integrators.cachedpath import CachedPathIntegrator

        return CachedPathIntegrator(sampler, int(max_len), int(resolution), int(starting_depth))

    @register("GuidedPathIntegrator")
    def _guided(sampler, max_len, *rest):
        from pine_tpu.integrators.guidedpath import GuidedPathIntegrator

        return GuidedPathIntegrator(sampler, int(max_len))

    @register("MltIntegrator")
    def _mlt(avg_spp, max_len):
        # PRL signature is MltIntegrator(spp: int, max_path_length)
        # (program_context.cpp:103-106) — no sampler argument
        from pine_tpu.integrators.mlt import MltIntegrator

        return MltIntegrator(int(avg_spp), int(max_len))

    @register("RestirIntegrator")
    def _restir(sampler, max_len):
        from pine_tpu.integrators.restir import RestirIntegrator

        return RestirIntegrator(sampler, int(max_len))

    @register("MicroRenderGI")
    def _micro(point_count=2048, *a):
        from pine_tpu.integrators.micro_render import MicroRenderIntegrator

        return MicroRenderIntegrator(int(point_count))

    @register("render")
    def _render(integrator, scene):
        return integrator.render(scene)

    @register("denoise")
    def _denoise(scene):
        from pine_tpu.integrators.denoiser import denoise_scene

        return denoise_scene(scene)

    # ---- scene (scene.cpp:64-81, program_context.cpp:120-124) --------------
    reg["Scene"] = lambda: Scene()

    @register("add")
    def _add(target, *args):
        if isinstance(target, Scene):
            return target.add(*args)
        # Instancing.add etc.
        return target.add(*args)

    @register("set")
    def _set(scene, x):
        return scene.set(x)

    @register("get_aabb")
    def _get_aabb(scene):
        lo, up = scene.get_aabb()
        return S.BoxAABB(lo, up)

    @register("load")
    def _load(scene, filename, m=None):
        from pine_tpu.io.gltf import load_glb_into_scene

        load_glb_into_scene(
            scene, filename, np.eye(4, dtype=np.float32) if m is None else np.asarray(m.data)
        )

    @register("quick_render")
    def _quick_render(scene, from_p, to_p, filename):
        cam = camera_mod.ThinLenCamera(
            Film((640, 480)), _data(to_float_vec(from_p)), _data(to_float_vec(to_p)), 0.5
        )
        scene.set(cam)
        PathIntegrator(samplers_mod.BlueSampler(4), 4).render(scene)
        cam.film.save(filename)

    @register("save")
    def _save(target, filename, invert_y=False):
        from pine_tpu.io.image_io import save_image

        if isinstance(target, Film):
            target.save(filename)
            return
        arr = np.asarray(target.data if isinstance(target, Array2dValue) else target)
        save_image(filename, arr, invert_y=bool(invert_y), encode_srgb=True)

    # ---- arrays / draw (array.cpp) -----------------------------------------
    for nm in ("Array2df", "Array2d2f", "Array2d3f", "Array2d4f", "Array2d3u8", "Array2d4u8"):
        ch = {"f": 1, "2f": 2, "3f": 3, "4f": 4, "3u8": 3, "4u8": 4}[nm[7:]]

        def actor(ch=ch):
            def fn(size):
                w, h = int(size.data[0]), int(size.data[1])
                shape = (h, w) if ch == 1 else (h, w, ch)
                return Array2dValue(np.zeros(shape, np.float32))

            return fn

        reg[nm] = actor()

    @register("size")
    def _size(x):
        if isinstance(x, Array2dValue):
            return x.size()
        raise TypeError("size() expects an image/array")

    @register("draw")
    def _draw(size, frag):
        import jax

        w, h = int(size.data[0]), int(size.data[1])
        xs = np.arange(w, dtype=np.float32)
        ys = np.arange(h, dtype=np.float32)
        X, Yg = np.meshgrid(xs, ys, indexing="xy")
        coords = (np.stack([X, Yg], -1).reshape(-1, 2) + 0.5) / np.asarray(
            [w, h], np.float32
        )
        f = frag.as_jax_fragment()
        img = np.asarray(jax.jit(f)(coords)).reshape(h, w, 3)
        return Array2dValue(img)

    @register("load_image")
    def _load_image(filename):
        from pine_tpu.io.image_io import load_image

        return Array2dValue(load_image(filename), srgb_source=True)

    @register("mse")
    def _mse(a, b):
        da = np.asarray(a.data, np.float32)
        db = np.asarray(b.data, np.float32)
        return float(np.mean((da - db) ** 2))

    @register("rmse")
    def _rmse(ref, b):
        da = np.asarray(ref.data, np.float32)
        db = np.asarray(b.data, np.float32)
        return float(np.sqrt(np.mean(((da - db) / np.maximum(np.abs(da), 1e-2)) ** 2)))

    # ---- parallel (parallel.cpp:10-15) -------------------------------------
    @register("parallel_for")
    def _parallel_for(n, f):
        for i in range(int(n)):
            f(i)

    @register("parallel_for2d")
    def _parallel_for2d(size, f):
        w, h = int(size.data[0]), int(size.data[1])
        for y in range(h):
            for x in range(w):
                f(PrlVec(np.asarray([x, y], np.int32), True))

    # aliases used by ops for node arithmetic
    reg["_to_node"] = _to_node
    return reg


def _as_static_int(x):
    if hasattr(x, "aval"):
        raise TypeError("noise seed must be static")
    return int(x)
