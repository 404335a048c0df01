"""Procedural texture nodes (parity: src/pine/core/node.h/.cpp).

The reference boxes node trees in ``Mnode`` variants dispatched per evaluation.
Here a node is a Python object whose ``eval(ctx)`` emits jnp expressions; at
scene-prepare time the whole tree traces into the jit render program (constant
folding is free, textures become device gathers).  ctx is a dict with batched
``p`` (N,3), ``n`` (N,3), ``uv`` (N,2).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pine_tpu.core import noise as noise_mod


def _as_node(x, want_vec3=None):
    if isinstance(x, Node):
        return x
    return Constant(x)


class Node:
    def eval(self, ctx):
        raise NotImplementedError

    # operator sugar mirroring node.cpp registrations
    def __add__(self, o):
        return Binary("+", self, _as_node(o))

    def __radd__(self, o):
        return Binary("+", _as_node(o), self)

    def __sub__(self, o):
        return Binary("-", self, _as_node(o))

    def __rsub__(self, o):
        return Binary("-", _as_node(o), self)

    def __mul__(self, o):
        return Binary("*", self, _as_node(o))

    def __rmul__(self, o):
        return Binary("*", _as_node(o), self)

    def __truediv__(self, o):
        return Binary("/", self, _as_node(o))

    def __rtruediv__(self, o):
        return Binary("/", _as_node(o), self)

    def __pow__(self, o):
        return Binary("^", self, _as_node(o))

    def __neg__(self):
        return Unary("-", self)

    def is_constant(self):
        return False


class Constant(Node):
    def __init__(self, value):
        self.value = np.asarray(value, np.float32)

    def eval(self, ctx):
        return jnp.asarray(self.value)

    def is_constant(self):
        return True


class Position(Node):
    def eval(self, ctx):
        return ctx["p"]


class Normal(Node):
    def eval(self, ctx):
        return ctx["n"]


class UV(Node):
    def eval(self, ctx):
        uv = ctx["uv"]
        return jnp.concatenate([uv, jnp.zeros_like(uv[..., :1])], axis=-1)


class Binary(Node):
    def __init__(self, op, a, b):
        self.op, self.a, self.b = op, _as_node(a), _as_node(b)

    def eval(self, ctx):
        a, b = self.a.eval(ctx), self.b.eval(ctx)
        if self.op == "+":
            return a + b
        if self.op == "-":
            return a - b
        if self.op == "*":
            return a * b
        if self.op == "/":
            return a / b
        if self.op == "^":
            return jnp.power(a, b)
        raise ValueError(self.op)


class Unary(Node):
    OPS = {
        "-": lambda x: -x,
        "a": jnp.abs,
        "s": lambda x: x * x,
        "r": jnp.sqrt,
        "f": lambda x: x - jnp.floor(x),
    }

    def __init__(self, op, a):
        self.op, self.a = op, _as_node(a)

    def eval(self, ctx):
        return self.OPS[self.op](self.a.eval(ctx))


class Lerp(Node):
    """lerp(t, a, b) (node.cpp registration)."""

    def __init__(self, t, a, b):
        self.t, self.a, self.b = _as_node(t), _as_node(a), _as_node(b)

    def eval(self, ctx):
        t = self.t.eval(ctx)
        a = self.a.eval(ctx)
        b = self.b.eval(ctx)
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
        if t.ndim == 1 and a.ndim == 1 and a.shape[0] == 3 and t.shape[0] != 3:
            # per-lane t blending constant colors: lift to (N,3)
            a, b, t = a[None, :], b[None, :], t[:, None]
        elif t.ndim > 0 and a.ndim > t.ndim:
            t = t[..., None]
        return a + (b - a) * t


class Checkerboard(Node):
    """(node.cpp:15-18): x = fract(p) - ratio; 1 if x.x*x.y*x.z > 0."""

    def __init__(self, p=None, ratio=0.5):
        self.p = _as_node(p) if p is not None else UV()
        self.ratio = float(ratio)

    def eval(self, ctx):
        p = self.p.eval(ctx)
        x = (p - jnp.floor(p)) - self.ratio
        return (x[..., 0] * x[..., 1] * x[..., 2] > 0.0).astype(jnp.float32)


class Noisef(Node):
    def __init__(self, p, octaves):
        self.p, self.octaves = _as_node(p), _as_node(octaves)

    def eval(self, ctx):
        return noise_mod.fbm(self.p.eval(ctx), self.octaves.eval(ctx))


class Noise3f(Node):
    def __init__(self, p, octaves):
        self.p, self.octaves = _as_node(p), _as_node(octaves)

    def eval(self, ctx):
        return noise_mod.fbm3d(self.p.eval(ctx), self.octaves.eval(ctx))


class Texture(Node):
    """Image lookup by fract(p.xy) (node.cpp NodeImage)."""

    def __init__(self, p, image):
        self.p = _as_node(p) if p is not None else UV()
        self.image = jnp.asarray(np.asarray(image, np.float32))

    def eval(self, ctx):
        p = self.p.eval(ctx)
        uv = p[..., :2] - jnp.floor(p[..., :2])
        h, w = self.image.shape[:2]
        x = jnp.minimum((uv[..., 0] * w).astype(jnp.int32), w - 1)
        y = jnp.minimum((uv[..., 1] * h).astype(jnp.int32), h - 1)
        return self.image[y, x]


class Component(Node):
    def __init__(self, p, index):
        self.p, self.index = _as_node(p), int(index)

    def eval(self, ctx):
        return self.p.eval(ctx)[..., self.index]


class ToVec3(Node):
    def __init__(self, *args):
        self.args = [_as_node(a) for a in args]

    def eval(self, ctx):
        vals = [self.args[0].eval(ctx)] if len(self.args) == 1 else [a.eval(ctx) for a in self.args]
        if len(vals) == 1:
            v = vals[0]
            return jnp.stack([v, v, v], axis=-1)
        return jnp.stack(vals, axis=-1)


class Function(Node):
    """Wraps a traced script lambda f(ctx_dict)->value (node.h NodeFunction;
    in the reference these are JIT-compiled PRL closures)."""

    def __init__(self, fn):
        self.fn = fn

    def eval(self, ctx):
        return self.fn(ctx)


def eval_scalar_node(node, ctx, n_lanes):
    """Evaluate a float node broadcast to (N,)."""
    v = _as_node(node).eval(ctx)
    v = jnp.asarray(v, jnp.float32)
    if v.ndim == 0:
        return jnp.broadcast_to(v, (n_lanes,))
    return v.reshape(n_lanes)


def eval_vec3_node(node, ctx, n_lanes):
    """Evaluate a color node broadcast to (N,3)."""
    v = _as_node(node).eval(ctx)
    v = jnp.asarray(v, jnp.float32)
    if v.ndim == 0:
        return jnp.broadcast_to(v, (n_lanes, 3))
    if v.shape == (3,):
        return jnp.broadcast_to(v, (n_lanes, 3))
    if v.ndim == 1:
        return jnp.broadcast_to(v[:, None], (n_lanes, 3))
    return v.reshape(n_lanes, 3)


def node_is_constant(node):
    return not isinstance(node, Node) or node.is_constant()


def constant_value(node):
    if isinstance(node, Constant):
        return node.value
    return np.asarray(node, np.float32)
