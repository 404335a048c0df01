"""PRL runtime values.

The reference compiles PRL to native code with C++ value types (vec3, mat4...).
Here scene-building code evaluates eagerly over numpy, while lambdas passed to
``draw``/``SDF``/texture nodes re-evaluate under a jax trace — the same
interpreter code paths serve both because every numeric op dispatches on
whether a jax tracer is involved (``xp()``).
"""
from __future__ import annotations

import numpy as np


def _is_traced(x):
    import jax

    return isinstance(x, jax.core.Tracer) or isinstance(x, jax.Array)


def xp(*vals):
    """Pick numpy or jax.numpy depending on operands."""
    for v in vals:
        data = v.data if isinstance(v, (PrlVec, PrlMat)) else v
        if _is_traced(data):
            import jax.numpy as jnp

            return jnp
    return np


def is_int_value(x):
    if isinstance(x, bool):
        return False
    if isinstance(x, (int, np.integer)):
        return True
    d = getattr(x, "dtype", None)
    return d is not None and np.issubdtype(d, np.integer)


class PrlVec:
    """vec2/3/4 (+ integer variants). data is a length-n array or tracer."""

    __slots__ = ("data", "is_int")

    def __init__(self, data, is_int=False):
        if isinstance(data, (list, tuple)):
            data = np.asarray(data, np.int32 if is_int else np.float32)
        self.data = data
        self.is_int = bool(is_int)

    @property
    def n(self):
        return int(self.data.shape[-1])

    # component access
    def get_x(self):
        return _unwrap_scalar(self.data[..., 0], self.is_int)

    def get_y(self):
        return _unwrap_scalar(self.data[..., 1], self.is_int)

    def get_z(self):
        return _unwrap_scalar(self.data[..., 2], self.is_int)

    def get_w(self):
        return _unwrap_scalar(self.data[..., 3], self.is_int)

    def member(self, name):
        idx = {"x": 0, "y": 1, "z": 2, "w": 3}[name]
        return _unwrap_scalar(self.data[..., idx], self.is_int)

    def set_member(self, name, value):
        idx = {"x": 0, "y": 1, "z": 2, "w": 3}[name]
        m = xp(self, value)
        if m is np:
            self.data = np.array(self.data, copy=True)
            self.data[..., idx] = value
        else:
            import jax.numpy as jnp

            self.data = jnp.asarray(self.data).at[..., idx].set(value)

    def subscript(self, i):
        return _unwrap_scalar(self.data[..., int(i)] if isinstance(i, (int, np.integer)) else self.data[..., i], self.is_int)

    def set_subscript(self, i, value):
        m = xp(self, value)
        if m is np:
            self.data = np.array(self.data, copy=True)
            self.data[..., int(i)] = value
        else:
            import jax.numpy as jnp

            self.data = jnp.asarray(self.data).at[..., int(i)].set(value)

    def copy(self):
        d = self.data
        return PrlVec(np.array(d, copy=True) if isinstance(d, np.ndarray) else d, self.is_int)

    def __repr__(self):
        return f"PrlVec({self.data}, int={self.is_int})"


class PrlMat:
    """mat2/3/4 stored as (n,n) with math convention m[row, col]; the PRL
    members .x/.y/.z/.w are COLUMNS (vecmath.h mat = column vectors)."""

    __slots__ = ("data",)

    def __init__(self, data):
        if isinstance(data, (list, tuple)):
            data = np.asarray(data, np.float32)
        self.data = data

    @property
    def n(self):
        return int(self.data.shape[-1])

    def member(self, name):
        idx = {"x": 0, "y": 1, "z": 2, "w": 3}[name]
        return PrlVec(self.data[..., :, idx])

    def set_member(self, name, value):
        idx = {"x": 0, "y": 1, "z": 2, "w": 3}[name]
        v = value.data if isinstance(value, PrlVec) else value
        m = xp(self, value)
        if m is np:
            self.data = np.array(self.data, copy=True)
            self.data[..., :, idx] = v
        else:
            import jax.numpy as jnp

            self.data = jnp.asarray(self.data).at[..., :, idx].set(v)

    def subscript(self, i):
        return PrlVec(self.data[..., :, int(i)])

    def copy(self):
        d = self.data
        return PrlMat(np.array(d, copy=True) if isinstance(d, np.ndarray) else d)

    def __repr__(self):
        return f"PrlMat({self.data})"


def _unwrap_scalar(x, is_int):
    """numpy 0-d -> python scalar; tracers stay as-is."""
    if isinstance(x, np.ndarray) and x.ndim == 0:
        return int(x) if is_int else float(x)
    if isinstance(x, (np.floating,)):
        return float(x)
    if isinstance(x, (np.integer,)):
        return int(x)
    return x


def make_vec(components):
    """[a,b,c] literal -> vec (int variant iff all components are ints;
    jit.cpp Vector::emit).  Under batched tracing, scalar components
    broadcast to the lane shape of the traced ones."""
    allint = all(is_int_value(c) for c in components)
    m = xp(*components)
    comps = [c.data if isinstance(c, PrlVec) else c for c in components]
    if m is np:
        arr = np.asarray(comps, np.int32 if allint else np.float32).T if any(
            np.ndim(c) for c in comps
        ) else np.asarray(comps, np.int32 if allint else np.float32)
    else:
        import jax.numpy as jnp

        dt = jnp.int32 if allint else jnp.float32
        comps = [jnp.asarray(c, dt) for c in comps]
        shape = np.broadcast_shapes(*[c.shape for c in comps])
        comps = [jnp.broadcast_to(c, shape) for c in comps]
        arr = jnp.stack(comps, -1)
    return PrlVec(arr, allint)


def to_float_vec(v):
    if isinstance(v, PrlVec) and v.is_int:
        m = xp(v)
        return PrlVec(v.data.astype(m.float32 if m is not np else np.float32), False)
    return v


def prl_to_string(x):
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, float):
        return f"{x:g}"
    if isinstance(x, PrlVec):
        return "[" + ", ".join(prl_to_string(_unwrap_scalar(x.data[..., i], x.is_int)) for i in range(x.n)) + "]"
    if isinstance(x, PrlMat):
        return "[" + "; ".join(prl_to_string(x.subscript(i)) for i in range(x.n)) + "]"
    if isinstance(x, np.floating):
        return f"{float(x):g}"
    return str(x)
