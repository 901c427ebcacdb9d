"""Functional transforms: engine-driven grad + whole-graph XLA compilation.

This is the TPU-native evolution of the reference's toposort cache
(minidiff/caching.py): where the reference memoizes a traversal *order* and
still executes the backward op-by-op in Python, ``md.jit`` runs the entire
Tensor program — forward build, backward sweep, optimizer update, all of it —
on JAX tracers, so the whole thing lowers to one fused XLA executable.  The
per-op Python overhead (reference call stack minidiff/ops/wrapping.py:153-173
per scalar op) is paid once at trace time and never again.

``grad`` / ``value_and_grad`` use the tape engine (OpNode.backward), NOT
jax.grad — composing them under ``md.jit`` demonstrates that the tape's
reverse sweep lowers to the same XLA graph jax's own AD would emit.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
import minidiff_tpu.backend as backend

if TYPE_CHECKING:
    from typing import Any, Callable, Optional, Sequence, Tuple, Union


def _is_tensor(x: "Any") -> bool:
    return isinstance(x, md.Tensor)


def _tree_detach(tree: "Any", allow_grad: bool) -> "Any":
    import jax

    return jax.tree.map(
        lambda t: t.detach(allow_grad=allow_grad) if _is_tensor(t) else t,
        tree,
        is_leaf=_is_tensor,
    )


def _tree_grads(tree: "Any") -> "Any":
    import jax

    return jax.tree.map(
        lambda t: t.grad if _is_tensor(t) else None, tree, is_leaf=_is_tensor
    )


def value_and_grad(
    fn: "Callable[..., md.Tensor]", argnums: "Union[int, Sequence[int]]" = 0,
    has_aux: bool = False,
):
    """Engine-driven value_and_grad: fresh leaves, tape build, backward sweep.

    ``argnums`` entries may be Tensors or pytrees of Tensors; returned grads
    mirror their structure.  Non-selected args pass through untouched (their
    allow_grad flags decide whether they also accumulate grads).
    ``has_aux=True``: ``fn`` returns (loss, aux); the wrapper returns
    ``((loss, aux), grads)`` with gradients of the loss only.
    """
    single = isinstance(argnums, int)
    nums = (argnums,) if single else tuple(argnums)

    def wrapper(*args: "Any", **kwargs: "Any"):
        copies = list(args)
        for i in nums:
            copies[i] = _tree_detach(args[i], allow_grad=True)
        with md.enable_grad(True):
            out = fn(*copies, **kwargs)
            aux = None
            if has_aux:
                out, aux = out
            out.backward()
        grads = tuple(_tree_grads(copies[i]) for i in nums)
        value = (out, aux) if has_aux else out
        return value, (grads[0] if single else grads)

    return wrapper


def vjp(fn: "Callable[..., md.Tensor]", *primals: "Any"):
    """jax.vjp-style: returns (out, vjp_fn) with vjp_fn(cotangent) -> grads.

    The tape is built once; each ``vjp_fn`` call replays the reverse sweep
    (cleanup_mode="keep") seeded with the given cotangent, so multiple
    cotangents against one forward are cheap.  Grads mirror the primal
    pytrees; ``None`` where a leaf was unreachable from the output.
    """
    import jax

    copies = tuple(_tree_detach(p, allow_grad=True) for p in primals)
    with md.enable_grad(True):
        out = fn(*copies)

    def vjp_fn(cotangent: "Any"):
        ct = cotangent if isinstance(cotangent, md.Tensor) else md.Tensor(cotangent)
        if out.op_node is not None:
            out.op_node.backward(
                ct.astype(out.dtype), cleanup_mode="keep", reset_grads=True,
                root_output=out,
            )
            grads = tuple(_tree_grads(c) for c in copies)
        else:
            # fn passed a primal leaf straight through (identity/selection):
            # the cotangent flows to THAT leaf, zero-structure elsewhere
            ct_cast = ct.astype(out.dtype)
            grads = tuple(
                jax.tree.map(
                    lambda leaf: ct_cast if leaf is out else None,
                    c, is_leaf=_is_tensor,
                )
                for c in copies
            )
        return grads[0] if len(copies) == 1 else grads

    return out.detach(), vjp_fn


def grad(fn: "Callable[..., md.Tensor]", argnums: "Union[int, Sequence[int]]" = 0,
         has_aux: bool = False):
    vag = value_and_grad(fn, argnums, has_aux=has_aux)

    def wrapper(*args: "Any", **kwargs: "Any"):
        value, grads = vag(*args, **kwargs)
        return (grads, value[1]) if has_aux else grads

    return wrapper


def jvp(fn: "Callable[[md.Tensor], md.Tensor]"):
    """Forward-mode directional derivative via double backward.

    The tape is reverse-mode only, so jvp uses the classic
    forward-over-reverse trick: with g(u) = J^T u (one backward, linear in
    u), a second backward of <g(u), v> with respect to u yields J v.
    Evaluated at u = 0, so it is exact for any f.  Returns (f(x), J v).
    """

    def wrapper(x: "md.Tensor", v: "md.Tensor"):
        x = x.detach(allow_grad=True)
        with md.enable_grad(True):
            y = fn(x)
            u = md.zeros_like(y).detach(allow_grad=True)
            s = md.sum(u * y)
            s.backward(allow_higher_order=True)
            g = x.grad  # J^T u, still on tape (linear in u)
            if g is None:  # output independent of x -> zero tangent
                return y.detach(), md.zeros_like(y)
            t = md.sum(g * v.detach())
            t.backward()
        # u absent from the second tape (fn linear in x) -> J v is constant 0
        tangent = u.grad if u.grad is not None else md.zeros_like(y)
        return y.detach(), tangent

    return wrapper


def hessian(fn: "Callable[[md.Tensor], md.Tensor]"):
    """Full Hessian of a scalar function (BASELINE config 3).

    On the XLA backend the n basis directions are batched through ONE traced
    hvp program with ``jax.vmap`` — the whole Hessian is a single device
    computation instead of n sequential double-backwards (the TPU-first
    formulation; ~n-fold fewer dispatches).  The numpy oracle keeps the
    explicit per-direction loop (same math, eager).
    """

    def wrapper(x: "md.Tensor"):
        n = int(x.size)
        hv = hvp(fn)
        if backend.backend_name() == "xla":
            import jax
            import jax.numpy as jnp

            def hvp_raw(v_raw):
                return hv(x, md.Tensor(v_raw))._data

            eye = jnp.eye(n, dtype=x._data.dtype).reshape(
                (n,) + tuple(int(d) for d in x.shape))
            return md.Tensor(jax.vmap(hvp_raw)(eye))
        rows = []
        for i in range(n):
            e = np.zeros(n)
            e[i] = 1.0
            rows.append(hv(x, md.Tensor(e.reshape(x.shape))))
        return md.stack(rows)

    return wrapper


def hvp(fn: "Callable[[md.Tensor], md.Tensor]"):
    """Hessian-vector product via double backward (tape re-tracing).

    Mirrors the README's higher-order pattern: the first backward runs with
    ``allow_higher_order=True`` so the gradient itself carries a tape, then
    d(g·v)/dx is a second engine sweep.
    """

    def wrapper(x: "md.Tensor", v: "md.Tensor") -> "md.Tensor":
        x = x.detach(allow_grad=True)
        with md.enable_grad(True):
            out = fn(x)
            out.backward(allow_higher_order=True)
            g = x.grad
            if g is None:
                return md.zeros_like(x)
            # The second tape (of <g, v>) may not reference x at all when fn
            # is affine; backward's reset only touches ITS traversal, so clear
            # x.grad explicitly or the first-order gradient would be returned
            # as a bogus "Hessian-vector product".
            x.grad = None
            s = md.sum(g * v.detach())
            s.backward()
        return x.grad if x.grad is not None else md.zeros_like(x)

    return wrapper


def _is_dynamic_leaf(x: "Any") -> bool:
    import jax

    return isinstance(
        x, (md.Tensor, jax.Array, np.ndarray, np.generic, int, float, complex, bool)
    )


def jit(
    fn: "Callable[..., Any]",
    in_shardings: "Any" = None,
    out_shardings: "Any" = None,
    donate: bool = False,
    donate_argnums: "Optional[Sequence[int]]" = None,
):
    """Compile a Tensor program into a single XLA executable.

    The wrapped ``fn`` may build tapes, call ``backward()``, mutate leaf
    ``._data`` (optimizer steps) — anything the eager engine supports except
    data-dependent Python control flow.  Tensor leaves in args/kwargs are
    unwrapped to raw arrays, the program is traced once per (structure,
    allow_grad flags, shapes/dtypes), and replays as compiled XLA.

    Notes:
    * XLA backend only (there is nothing to compile on the NumPy oracle).
    * Returned Tensors are detached results (no tape survives compilation).
    * Library RNG draws inside ``fn`` become trace-time constants.
    * ``in_shardings`` / ``out_shardings`` (pytrees of jax shardings aligned
      with the flattened tensor leaves / outputs) ride through to jax.jit —
      this is how minidiff_tpu.parallel expresses dp/tp over a Mesh.
    * ``donate=True`` donates EVERY input buffer; ``donate_argnums``
      restricts donation to the listed positional args (e.g. params and
      optimizer state but not the batch) — the right tool for train steps,
      where donating batch tensors risks deleting buffers the caller reuses.
    """
    import jax

    if backend.backend_name() != "xla":
        raise RuntimeError("md.jit requires the xla backend")

    if in_shardings is not None and (donate or donate_argnums):
        raise ValueError(
            "md.jit: in_shardings cannot be combined with donation — the "
            "sharding pytree aligns with the non-donated leaves only"
        )
    cache: dict = {}
    donate_set = frozenset(donate_argnums or ())

    def wrapper(*args: "Any", **kwargs: "Any"):
        # no is_leaf: Tensor is not a registered pytree node, so it is a
        # natural leaf and the flatten stays on jax's C fast path (a Python
        # is_leaf callback costs ~2x the whole dispatch for small trees)
        leaves, treedef = jax.tree.flatten((args, kwargs))
        if donate_set:
            # which top-level positional arg owns each leaf, in flatten order
            # (kwargs leaves come after all args and are never donated)
            arg_of_leaf = []
            for pos, a in enumerate(args):
                arg_of_leaf += [pos] * jax.tree.structure(a).num_leaves
            arg_of_leaf += [-1] * (len(leaves) - len(arg_of_leaf))
        meta = []
        dynamic = []
        donated = []
        for j, leaf in enumerate(leaves):
            to_donate = donate_set and arg_of_leaf[j] in donate_set
            if _is_tensor(leaf):
                meta.append(("tensor", leaf.allow_grad, bool(to_donate)))
                (donated if to_donate else dynamic).append(leaf._data)
            elif _is_dynamic_leaf(leaf):
                meta.append(("array", None, bool(to_donate)))
                (donated if to_donate else dynamic).append(leaf)
            else:
                # hashable non-array (str, dtype, shape tuple, ...) → static
                meta.append(("static", leaf, False))
        meta = tuple(meta)
        key = (treedef, meta)

        try:
            hit = key in cache
        except TypeError as e:
            raise TypeError(
                "md.jit arguments must be Tensors, arrays, numbers, or "
                f"hashable statics; got an unhashable static leaf: {e}"
            ) from None
        if not hit:

            def pure(don: "list", dyn: "list") -> "Any":
                it = iter(dyn)
                it_don = iter(don)
                rebuilt = []
                for m in meta:
                    kind, info, is_don = m
                    src = it_don if is_don else it
                    if kind == "tensor":
                        rebuilt.append(md.Tensor(next(src), allow_grad=info))
                    elif kind == "array":
                        rebuilt.append(next(src))
                    else:
                        rebuilt.append(info)
                a, k = jax.tree.unflatten(treedef, rebuilt)
                out = fn(*a, **k)
                return jax.tree.map(
                    lambda t: t._data if _is_tensor(t) else t, out, is_leaf=_is_tensor
                )

            jit_kwargs: dict = {}
            if in_shardings is not None:
                # shardings apply to the non-donated leaf list (donation and
                # explicit input shardings are not combined)
                jit_kwargs["in_shardings"] = (None, in_shardings)
            if out_shardings is not None:
                jit_kwargs["out_shardings"] = out_shardings
            if donate or donate_set:
                jit_kwargs["donate_argnums"] = (0, 1) if donate else (0,)
            cache[key] = jax.jit(pure, **jit_kwargs)

        out_raw = cache[key](donated, dynamic)
        return jax.tree.map(
            lambda r: md.Tensor(r) if isinstance(r, jax.Array) else r, out_raw
        )

    wrapper._cache = cache  # exposed for tests / cache inspection
    return wrapper


_remat_counter = __import__("itertools").count()


def remat(fn: "Callable[..., md.Tensor]") -> "Callable[..., md.Tensor]":
    """Rematerialization: don't store ``fn``'s intermediate tape; recompute it
    inside the VJP (the tape-engine analog of ``jax.checkpoint``).

    The wrapped segment runs its forward under ``no_grad`` — none of its
    intermediates join the caller's graph — and registers ONE tape node whose
    VJPs rerun ``fn`` once on barrier-protected fresh leaves and backward the
    fresh sub-tape seeded with the incoming cotangent (one shared recompute
    serves every input's grad).

    Where it pays: the EAGER engine — the segment's tape is never built, so
    its intermediate tensors are collectable immediately (classic gradient
    checkpointing; the reachable-tape test shows 2 vs 6 tensors for a 4-op
    segment).  Under ``md.jit`` on TPU, measurements show XLA's own
    rematerialization pass usually schedules the un-remat'd program at equal
    or lower peak temp than the barrier-pinned recompute — prefer plain
    md.jit there unless profiling says otherwise.

    First-order only through the segment: a backward with
    ``allow_higher_order=True`` that reaches a remat node raises
    NotImplementedError (its grads cannot re-tape, and recording them as
    constants would silently drop second derivatives).  Inputs must all be
    Tensors.
    """
    from minidiff_tpu.ops import wrapping

    def forward(*inputs: "Any", **kwargs: "Any") -> "md.Tensor":
        with md.no_grad():
            out = fn(*inputs, **kwargs)
        return out.detach()

    forward._structural_id = ("remat", next(_remat_counter))  # never recycled

    def _barrier(inputs: "Sequence[md.Tensor]") -> "list":
        # Without a barrier XLA CSEs the recompute against the forward pass
        # and keeps the residuals alive anyway — the same reason
        # jax.checkpoint lowers through optimization_barrier.
        if backend.backend_name() != "xla":
            return [t.detach(allow_grad=True) for t in inputs]
        import jax

        fresh_data = jax.lax.optimization_barrier(tuple(t._data for t in inputs))
        return [md.Tensor(d, allow_grad=True) for d in fresh_data]

    def wrapper(*inputs: "Any", **kwargs: "Any") -> "md.Tensor":
        # ONE recompute serves every input's VJP: the engine calls the grad
        # functions sequentially with the same cotangent object, so the first
        # call does the fresh forward+backward and the rest read from it
        # (a per-input recompute behind barriers would defeat CSE and run the
        # segment n_inputs times).
        memo: dict = {}

        def run_all(seg_inputs, grad):
            if memo.get("grad") is not grad:
                fresh = _barrier(seg_inputs)
                with md.enable_grad(True):
                    out2 = fn(*fresh, **kwargs)
                out2.op_node.backward(grad.detach(), cleanup_mode="destroy")
                memo["grad"] = grad
                memo["grads"] = [f.grad for f in fresh]
            return memo["grads"]

        def make_grad(i: int):
            def grad_fn(*args_and_grad: "Any", **kw: "Any") -> "md.Tensor":
                if md.grad_allowed_():
                    # a higher-order sweep would record these grads as
                    # constants and silently DROP the segment's second
                    # derivatives — refuse instead (VERDICT r1 item 4)
                    raise NotImplementedError(
                        "md.remat: gradients of a remat segment cannot "
                        "re-tape, so backward(allow_higher_order=True) "
                        "through it is unsupported — drop md.remat from "
                        "this graph or take first-order gradients"
                    )
                *seg_inputs, grad = args_and_grad
                g = run_all(seg_inputs, grad)[i]
                return g if g is not None else md.zeros_like(seg_inputs[i])

            return grad_fn

        op = wrapping.create_op_func(
            forward_func=forward,
            grad_funcs=[make_grad(i) for i in range(len(inputs))],
            kwargs_to_grads=True,
            tensor_only=True,
            op_name=f"remat({getattr(fn, '__name__', 'fn')})",
        )
        return op(*inputs, **kwargs)

    return wrapper


_scan_counter = __import__("itertools").count()


def scan(step: "Callable"):
    """Differentiable sequential loop that compiles to ONE ``lax.scan``.

    ``step(carry, x, *params) -> (carry, y)`` written in framework ops (all
    single Tensors).  ``scan(step)(init, xs, *params)`` returns
    ``(final_carry, ys)`` where xs/ys carry a leading time axis.

    This is the TPU-first answer to Python-loop recurrences: a T-step loop
    unrolled through the tape produces a T-times-larger program (compile
    time and code size grow with T), while md.scan lowers to a single
    rolled ``lax.scan`` whose compile time is independent of T.  The VJP is
    jax's reverse-scan transpose, staged into the same program under
    ``md.jit``; first-order only through the loop on xla — a
    higher-order backward reaching the scan raises NotImplementedError
    (the numpy backend's eager scan re-tapes and supports it).
    Outputs are exposed as two tape ops sharing one forward expression —
    XLA CSEs the twin scans under jit; grads from both accumulate.

    On the numpy backend the loop runs eagerly op-by-op instead (full tape,
    higher-order capable) with identical semantics.
    """
    scan_id = next(_scan_counter)

    def scanned(init: "md.Tensor", xs: "md.Tensor", *params: "md.Tensor"):
        if backend.backend_name() != "xla":
            if xs.shape[0] == 0:
                # the ys shape is unknowable without tracing step (XLA infers
                # it abstractly; the eager oracle cannot)
                raise ValueError(
                    "md.scan over empty xs is not supported on the numpy "
                    "backend"
                )
            carry = init
            ys = []
            for t in range(xs.shape[0]):
                carry, y = step(carry, xs[t], *params)
                ys.append(md.expand_dims(y, 0))
            return carry, md.concat(ys, axis=0)

        import jax
        import jax.numpy as jnp

        from minidiff_tpu.ops import wrapping

        def raw_fn(init_r, xs_r, *param_r):
            def body(c, x):
                with md.no_grad():
                    c2, y = step(
                        md.Tensor(c), md.Tensor(x),
                        *[md.Tensor(p) for p in param_r]
                    )
                return c2._data, y._data

            return jax.lax.scan(body, init_r, xs_r)

        n_inputs = 2 + len(params)
        memo: dict = {}
        fwd_memo: dict = {}

        def _shared_forward(raws: tuple):
            # the carry and ys ops share ONE scan execution per input set
            # (the raw operands stay alive across both op calls, so ids are
            # stable); without this, eager callers pay the scan twice
            fkey = tuple(id(r) for r in raws)
            if fwd_memo.get("key") != fkey:
                fwd_memo["key"] = fkey
                fwd_memo["val"] = raw_fn(*raws)
            return fwd_memo["val"]

        def make_forward(which: int):
            def forward(*inputs: "Any") -> "md.Tensor":
                c, ys_out = _shared_forward(tuple(t._data for t in inputs))
                return md.Tensor(c if which == 0 else ys_out)

            forward._structural_id = ("scan", scan_id, which)
            forward.__name__ = "scan_carry" if which == 0 else "scan_ys"
            return forward

        def make_grad(which: int, i: int):
            def grad_fn(*args_and_grad: "Any") -> "md.Tensor":
                if md.grad_allowed_():
                    raise NotImplementedError(
                        "md.scan: the lax.scan VJP cannot re-tape, so "
                        "backward(allow_higher_order=True) through a "
                        "scanned loop is unsupported on the xla backend "
                        "(the numpy backend's eager scan supports it)"
                    )
                *inputs, grad = args_and_grad
                key = which
                if key not in memo or memo[key][0] is not grad:
                    outs, vjp_fn = jax.vjp(
                        raw_fn, *(t._data for t in inputs)
                    )
                    c_out, ys_out = outs
                    if which == 0:
                        ct = (grad._data.astype(c_out.dtype),
                              jnp.zeros_like(ys_out))
                    else:
                        ct = (jnp.zeros_like(c_out),
                              grad._data.astype(ys_out.dtype))
                    memo[key] = (grad, vjp_fn(ct))
                return md.Tensor(memo[key][1][i])

            return grad_fn

        op_c = wrapping.create_op_func(
            make_forward(0),
            [make_grad(0, i) for i in range(n_inputs)],
            tensor_only=True, op_name="scan_carry",
        )
        op_y = wrapping.create_op_func(
            make_forward(1),
            [make_grad(1, i) for i in range(n_inputs)],
            tensor_only=True, op_name="scan_ys",
        )
        return op_c(init, xs, *params), op_y(init, xs, *params)

    return scanned


_cond_counter = __import__("itertools").count()


def cond(true_fn: "Callable", false_fn: "Callable"):
    """Differentiable data-dependent branch that compiles to ``lax.cond``.

    ``cond(true_fn, false_fn)(pred, *operands)`` evaluates ONE branch
    (both written in framework ops over single Tensors, returning one
    Tensor of a common shape/dtype).  ``pred`` may be:

    * a scalar bool **Tensor** — the branch choice stays data-dependent
      inside the compiled program (the TPU-first point: no host sync, no
      retrace when the predicate flips between calls of one ``md.jit``
      program);
    * a Python bool — resolved immediately (at trace time under jit),
      costing nothing.

    Gradients flow through the TAKEN branch only (the untaken branch's
    cotangent is zero — ``jax.vjp`` of ``lax.cond`` transposes to a cond
    over the branch VJPs); ``pred`` itself is non-differentiable.  On the
    numpy backend the chosen branch simply runs eagerly (full tape,
    higher-order capable); on xla a higher-order backward through the
    staged cond raises NotImplementedError, matching md.scan's contract.
    """
    cond_id = next(_cond_counter)

    def branched(pred: "Any", *operands: "md.Tensor") -> "md.Tensor":
        if not isinstance(pred, md.Tensor):
            return true_fn(*operands) if bool(pred) else false_fn(*operands)
        if backend.backend_name() != "xla":
            chosen = true_fn if bool(pred.item()) else false_fn
            return chosen(*operands)

        import jax
        import jax.numpy as jnp

        from minidiff_tpu.ops import wrapping

        def raw_fn(pred_r, *op_r):
            def run(fn):
                def br(*xs):
                    with md.no_grad():
                        return fn(*[md.Tensor(x) for x in xs])._data

                return br

            return jax.lax.cond(
                jnp.asarray(pred_r).astype(bool).reshape(()),
                run(true_fn), run(false_fn), *op_r,
            )

        memo: dict = {}

        def forward(*inputs: "Any") -> "md.Tensor":
            return md.Tensor(raw_fn(*(t._data for t in inputs)))

        forward._structural_id = ("cond", cond_id)
        forward.__name__ = "cond"

        def make_grad(i: int):
            def grad_fn(*args_and_grad: "Any") -> "md.Tensor":
                if md.grad_allowed_():
                    raise NotImplementedError(
                        "md.cond: the lax.cond VJP cannot re-tape, so "
                        "backward(allow_higher_order=True) through a staged "
                        "branch is unsupported on the xla backend (the "
                        "numpy backend's eager branch supports it)"
                    )
                *inputs, grad = args_and_grad
                if memo.get("grad") is not grad:
                    out, vjp_fn = jax.vjp(raw_fn, *(t._data for t in inputs))
                    memo["grad"] = grad
                    memo["cts"] = vjp_fn(grad._data.astype(out.dtype))
                return md.Tensor(memo["cts"][i])

            return grad_fn

        # slot 0 (pred) is non-differentiable: backprop skips it silently
        op = wrapping.create_op_func(
            forward,
            [None] + [make_grad(i) for i in range(1, 1 + len(operands))],
            tensor_only=True, op_name="cond",
        )
        return op(pred, *operands)

    return branched


def while_loop(cond_fn: "Callable", body_fn: "Callable"):
    """Non-differentiable data-dependent loop compiling to ``lax.while_loop``.

    ``while_loop(cond_fn, body_fn)(init, *params)`` iterates
    ``carry = body_fn(carry, *params)`` while ``cond_fn(carry, *params)``
    is true (a scalar bool Tensor) and returns the final carry.  The trip
    count is data-dependent, so reverse-mode AD is impossible by
    construction (nothing bounds the tape) — the result joins the graph as
    a NON-differentiable op, exactly like the reference's
    ``is_differentiable=False`` ops: backprop skips it silently.  Use
    ``md.scan`` when you need gradients through a loop.

    On the numpy backend the loop runs as an eager Python ``while`` under
    no_grad with identical semantics.
    """

    def looped(init: "md.Tensor", *params: "md.Tensor") -> "md.Tensor":
        if backend.backend_name() != "xla":
            with md.no_grad():
                carry = init
                while bool(cond_fn(carry, *params).item()):
                    carry = body_fn(carry, *params)
            return carry.detach()

        import jax

        from minidiff_tpu.ops import wrapping

        def raw_fn(init_r, *param_r):
            def as_md(c):
                return md.Tensor(c), [md.Tensor(p) for p in param_r]

            def cond_r(c):
                with md.no_grad():
                    t, ps = as_md(c)
                    return cond_fn(t, *ps)._data.reshape(())

            def body_r(c):
                with md.no_grad():
                    t, ps = as_md(c)
                    return body_fn(t, *ps)._data

            return jax.lax.while_loop(cond_r, body_r, init_r)

        def forward(*inputs: "Any") -> "md.Tensor":
            return md.Tensor(raw_fn(*(t._data for t in inputs)))

        forward.__name__ = "while_loop"
        op = wrapping.create_op_func(
            forward, [None] * (1 + len(params)), is_differentiable=False,
            tensor_only=True, op_name="while_loop",
        )
        return op(init, *params)

    return looped


def lower(fn: "Callable[..., Any]", *args: "Any", **kwargs: "Any"):
    """Trace a Tensor program and return jax's Lowered object for it.

    The structural-trace counterpart of the reference's graphviz dump
    (SURVEY.md §5.1): where ``utils.to_dot`` shows the eager tape,
    ``md.lower(fn, *args).as_text()`` shows the exact StableHLO the same
    program compiles to — including the backward sweep if ``fn`` calls
    ``backward()`` or ``md.value_and_grad``.  Also accepts
    ``.compile().as_text()`` for post-optimization HLO.
    """
    import jax

    if backend.backend_name() != "xla":
        raise RuntimeError("md.lower requires the xla backend")

    # classify leaves exactly like md.jit: Tensors and arrays are dynamic
    # inputs, hashable non-arrays (strings, dtypes, shape tuples) are statics
    leaves, treedef = jax.tree.flatten((args, kwargs))
    meta = []
    dynamic = []
    for leaf in leaves:
        if _is_tensor(leaf):
            meta.append(("tensor", leaf.allow_grad))
            dynamic.append(leaf._data)
        elif _is_dynamic_leaf(leaf):
            meta.append(("array", None))
            dynamic.append(leaf)
        else:
            meta.append(("static", leaf))

    def pure(dyn):
        it = iter(dyn)
        rebuilt = []
        for kind, info in meta:
            if kind == "tensor":
                rebuilt.append(md.Tensor(next(it), allow_grad=info))
            elif kind == "array":
                rebuilt.append(next(it))
            else:
                rebuilt.append(info)
        a, k = jax.tree.unflatten(treedef, rebuilt)
        out = fn(*a, **k)
        return jax.tree.map(
            lambda t: t._data if _is_tensor(t) else t, out, is_leaf=_is_tensor
        )

    return jax.jit(pure).lower(dynamic)


__all__ = ["grad", "value_and_grad", "hvp", "jvp", "hessian", "jit", "lower",
           "remat", "scan", "cond", "while_loop"]
