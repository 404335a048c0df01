"""Data-dependent control flow inside device-traced PRL lambdas.

The reference JIT compiles arbitrary script control flow to native code
(jit.cpp:1303-1445), so SDF distance functions and draw() fragments may
contain `while` loops and `if`s whose conditions depend on runtime values.
Under the jax trace bridge those conditions are batched tracers; this module
lowers them to XLA control flow:

- `while` / C-style `for` with a traced condition -> one `lax.while_loop`
  whose carry is every variable the loop body mutates, plus a per-lane
  `active` mask (lanes exit independently; finished lanes keep computing but
  their updates are masked out — the wavefront convention).
- `if`/`else if`/`else` with traced conditions -> every branch executes on a
  snapshot of the mutated variables and the results merge with `where`
  (chain semantics: the first true condition wins).  Early `return` is
  supported when EVERY branch (including `else`) returns; the merged value
  propagates as the lambda's return.

Restrictions (documented in API.md): `break`/`continue`/`return` inside a
traced *loop* are not supported (fold the exit test into the condition);
variables may not change type or shape across iterations/branches; branch
bodies must be pure math (side effects like `print` run for all branches).
"""
from __future__ import annotations

import numpy as np

from pine_tpu.prl import ast as A
from pine_tpu.prl.values import PrlMat, PrlVec


class _Missing:
    pass


MISSING = _Missing()


# ---------------------------------------------------------------------------
# static analysis: which names does a statement subtree mutate?
# ---------------------------------------------------------------------------

def _root_id(node):
    while isinstance(node, (A.Member, A.Subscript)):
        node = node.base
    return node.name if isinstance(node, A.Id) else None


def assigned_names(node, out=None):
    """Names mutated anywhere in `node` (liberal: includes shadowed ones —
    carrying an extra live variable through the loop is harmless)."""
    if out is None:
        out = set()
    k = type(node)
    if k is A.Decl:
        # 'declare' creates an iteration-local; 'assign_if_exist' may mutate
        # an outer cell.  'ref' aliases: mutations through the alias hit the
        # target, so include the target's root id as well.
        if node.kind == "assign_if_exist":
            out.add(node.name)
        elif node.kind == "ref":
            r = _root_id(node.expr)
            if r:
                out.add(r)
        assigned_names(node.expr, out)
    elif k is A.Binary:
        if node.op in ("+=", "-=", "*=", "/=", "%="):
            r = _root_id(node.a)
            if r:
                out.add(r)
        assigned_names(node.a, out)
        assigned_names(node.b, out)
    elif k is A.Unary:
        if node.op in ("preinc", "predec", "postinc", "postdec"):
            r = _root_id(node.e)
            if r:
                out.add(r)
        assigned_names(node.e, out)
    elif k is A.ExprStmt:
        assigned_names(node.expr, out)
    elif k is A.Block:
        for e in node.elems:
            assigned_names(e, out)
    elif k is A.While:
        assigned_names(node.cond, out)
        assigned_names(node.body, out)
    elif k is A.For:
        assigned_names(node.init, out)
        assigned_names(node.cond, out)
        assigned_names(node.inc, out)
        assigned_names(node.body, out)
    elif k is A.IfChain:
        for c in node.conds:
            assigned_names(c, out)
        for b in node.blocks:
            assigned_names(b, out)
        if node.else_block is not None:
            assigned_names(node.else_block, out)
    elif k is A.Call:
        for a in node.args:
            assigned_names(a, out)
    elif k in (A.Member, A.Subscript):
        assigned_names(node.base, out)
        if k is A.Subscript:
            assigned_names(node.index, out)
    elif k is A.VecLit:
        for e in node.elems:
            assigned_names(e, out)
    elif k is A.ReturnStmt and node.expr is not None:
        assigned_names(node.expr, out)
    # Lambda/FnDef/ClassDef bodies have their own scopes: not descended.
    return out


# ---------------------------------------------------------------------------
# carry packing: env cells <-> pytree of jnp leaves
# ---------------------------------------------------------------------------

def _leafable(v):
    import jax

    if isinstance(v, (bool, int, float, np.integer, np.floating, np.bool_)):
        return True
    if isinstance(v, np.ndarray):
        return True
    if isinstance(v, jax.Array) or isinstance(v, jax.core.Tracer):
        return True
    return False


class CarrySpec:
    """Bidirectional mapping between a set of env cells and a leaf tuple."""

    def __init__(self, names, env, batch_shape, err):
        self.err = err
        self.batch = tuple(batch_shape)
        self.entries = []  # (name, cell, kind, is_int)
        for name in sorted(names):
            cell = env.find(name)
            if cell is None:
                continue
            v = cell.get()
            if isinstance(v, PrlVec):
                self.entries.append((name, cell, "vec", v.is_int))
            elif isinstance(v, PrlMat):
                self.entries.append((name, cell, "mat", False))
            elif _leafable(v):
                self.entries.append((name, cell, "num", False))
            # anything else (scene handles, strings, objects) is not carried

    def _promote(self, x):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        b = self.batch
        if b and (x.ndim == 0 or x.shape[: len(b)] != b):
            x = jnp.broadcast_to(x, b + x.shape)
        return x

    def pack(self):
        leaves = []
        for name, cell, kind, _ in self.entries:
            v = cell.get()
            if kind == "vec":
                if not isinstance(v, PrlVec):
                    self.err(f"variable `{name}` changed type under traced control flow")
                leaves.append(self._promote(v.data))
            elif kind == "mat":
                if not isinstance(v, PrlMat):
                    self.err(f"variable `{name}` changed type under traced control flow")
                leaves.append(self._promote(v.data))
            else:
                if not _leafable(v):
                    self.err(f"variable `{name}` changed type under traced control flow")
                leaves.append(self._promote(v))
        return tuple(leaves)

    def unpack(self, leaves):
        for (name, cell, kind, is_int), leaf in zip(self.entries, leaves):
            if kind == "vec":
                cell.set(PrlVec(leaf, is_int))
            elif kind == "mat":
                cell.set(PrlMat(leaf))
            else:
                cell.set(leaf)

    def check_stable(self, new, old):
        for (name, *_), n, o in zip(self.entries, new, old):
            if n.shape != o.shape or n.dtype != o.dtype:
                self.err(
                    f"variable `{name}` changed shape/dtype inside traced control "
                    f"flow ({o.dtype}{list(o.shape)} -> {n.dtype}{list(n.shape)}); "
                    "keep loop variables type-stable (e.g. initialize with 0.0, "
                    "not 0, when they become floats)"
                )


def _as_mask(v, err):
    import jax.numpy as jnp

    d = v.data if isinstance(v, (PrlVec, PrlMat)) else v
    m = jnp.asarray(d)
    if m.dtype != jnp.bool_:
        m = m != 0
    return m


def _mwhere(mask, new, old):
    import jax.numpy as jnp

    mm = mask.reshape(mask.shape + (1,) * (new.ndim - mask.ndim))
    return jnp.where(mm, new, old)


# ---------------------------------------------------------------------------
# lowerings
# ---------------------------------------------------------------------------

def trace_while(interp, first_cond, cond_node, body_block, inc_node, env):
    """Lower a traced `while`/C-`for` to lax.while_loop.  `first_cond` is the
    already-evaluated (traced) condition value for the current state."""
    import jax
    import jax.numpy as jnp

    from pine_tpu.prl.interp import BreakEx, ContinueEx, PRLRuntimeError, ReturnEx

    def err(msg):
        raise PRLRuntimeError(msg)

    names = assigned_names(body_block)
    if inc_node is not None:
        assigned_names(inc_node, names)
    assigned_names(cond_node, names)  # `while (i++ < n)` style conditions
    mask0 = _as_mask(first_cond, err)
    spec = CarrySpec(names, env, mask0.shape, err)
    init = spec.pack()
    spec.unpack(init)

    def body_fun(state):
        active, carry = state
        spec.unpack(carry)
        try:
            interp.exec_block(body_block, env)
            if inc_node is not None:
                interp.eval(inc_node, env)
        except (BreakEx, ContinueEx):
            err(
                "break/continue inside a data-dependent (traced) loop is not "
                "supported; fold the exit test into the loop condition"
            )
        except ReturnEx:
            err(
                "return inside a data-dependent (traced) loop is not supported; "
                "assign to a variable and return after the loop"
            )
        new = spec.pack()
        spec.check_stable(new, carry)
        merged = tuple(_mwhere(active, n, o) for n, o in zip(new, carry))
        spec.unpack(merged)
        c = _as_mask(interp.eval(cond_node, env), err)
        c = jnp.broadcast_to(c, active.shape)
        return active & c, merged

    final_active, final = jax.lax.while_loop(
        lambda s: jnp.any(s[0]), body_fun, (mask0, init)
    )
    spec.unpack(final)


def trace_ifchain(interp, conds, blocks, else_block, env):
    """Lower a traced if/else-if/else chain: run each branch on a snapshot,
    merge mutated variables (and early returns) with `where`.

    `conds` are the already-evaluated condition VALUES (first one traced;
    later ones may be concrete — they broadcast)."""
    import jax.numpy as jnp

    from pine_tpu.prl.interp import BreakEx, ContinueEx, PRLRuntimeError, ReturnEx

    def err(msg):
        raise PRLRuntimeError(msg)

    masks = [_as_mask(c, err) for c in conds]
    batch = jnp.broadcast_shapes(*[m.shape for m in masks])
    masks = [jnp.broadcast_to(m, batch) for m in masks]

    names = set()
    for b in blocks:
        assigned_names(b, names)
    if else_block is not None:
        assigned_names(else_block, names)
    spec = CarrySpec(names, env, batch, err)
    snapshot = spec.pack()

    outs, rets = [], []
    branch_bodies = list(blocks) + ([else_block] if else_block is not None else [])
    for blk in branch_bodies:
        spec.unpack(snapshot)
        ret = MISSING
        try:
            interp.exec_block(blk, env)
        except (BreakEx, ContinueEx):
            err(
                "break/continue through a data-dependent (traced) if is not "
                "supported"
            )
        except ReturnEx as r:
            ret = r.value
        outs.append(spec.pack())
        rets.append(ret)

    n_ret = sum(1 for r in rets if r is not MISSING)
    if n_ret:
        if n_ret != len(rets) or else_block is None:
            err(
                "under a traced if, either every branch (including else) must "
                "return, or none may; mixed early returns are not supported"
            )
        # merge return values, last (else) branch as the base
        merged = _promote_ret(rets[-1], batch, err)
        for m, r in zip(reversed(masks), reversed(_promote_all(rets[:-1], batch, err))):
            merged = _merge_vals(m, r, merged, err)
        spec.unpack(snapshot)
        raise ReturnEx(merged)

    base = outs[-1] if else_block is not None else snapshot
    branch_outs = outs[: len(masks)]
    merged = base
    for m, o in zip(reversed(masks), reversed(branch_outs)):
        spec.check_stable(o, merged)
        merged = tuple(_mwhere(m, n, old) for n, old in zip(o, merged))
    spec.unpack(merged)


def _promote_ret(v, batch, err):
    import jax.numpy as jnp

    if isinstance(v, PrlVec):
        d = jnp.asarray(v.data)
        if batch and d.shape[: len(batch)] != tuple(batch):
            d = jnp.broadcast_to(d, tuple(batch) + d.shape)
        return PrlVec(d, v.is_int)
    if isinstance(v, PrlMat):
        return v
    if v is None:
        return None
    d = jnp.asarray(v)
    if batch and (d.ndim == 0 or d.shape[: len(batch)] != tuple(batch)):
        d = jnp.broadcast_to(d, tuple(batch) + d.shape)
    return d


def _promote_all(vals, batch, err):
    return [_promote_ret(v, batch, err) for v in vals]


def _merge_vals(mask, a, b, err):
    if (a is None) != (b is None):
        err("branches of a traced if return inconsistent values")
    if a is None:
        return None
    if isinstance(a, PrlVec) or isinstance(b, PrlVec):
        if not (isinstance(a, PrlVec) and isinstance(b, PrlVec)):
            err("branches of a traced if return different types")
        return PrlVec(_mwhere(mask, a.data, b.data), a.is_int and b.is_int)
    return _mwhere(mask, a, b)
