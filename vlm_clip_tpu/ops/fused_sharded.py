"""Multi-chip dispatch for the fused Pallas adapter kernels.

A bare ``pallas_call`` has no GSPMD partitioning rule: under a sharded
mesh XLA would all-gather the batch-sharded activations onto every chip
and run the kernel replicated — the silent perf cliff that kept
``fused_enabled()`` single-device-only through round 3. This module
wraps each fused adapter op in ``jax.shard_map`` over the data axis:

- activations stay row-sharded (``P(axis)``): each chip runs the SAME
  kernel on its local rows — per-shard semantics are exactly the
  single-device kernel's;
- weights are replicated in (``P()``), and their per-shard gradients
  are ``psum``-reduced inside the backward shard_map, which is
  precisely the collective GSPMD inserts for the jnp path's replicated
  weight grads under DP;
- the in-kernel dropout seed is decorrelated per shard
  (``seed + axis_index``) in forward AND backward (the kernels remat
  the mask from the seed, so both transforms must match).

Because a pallas_call inside shard_map defeats the replication checker,
the wrappers run ``check_vma=False`` and own their collectives — each
is a ``jax.custom_vjp`` whose backward calls the fused backward kernel
per shard and psums the weight grads explicitly. Gradients are tested
against the unsharded jnp composition on the CPU mesh
(tests/test_fused_sharded.py).

Integration: ``enable(mesh, axis)`` before the train step first runs
(trace time is read time); models/adapters.py then routes its fused
call sites here. Rows must divide the axis size (every caller already
pads batches to fixed shapes); otherwise the jnp path is used.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from . import fused_adapter as F

_STATE = {"mesh": None, "axis": None}


def enable(mesh, axis: str = "data") -> None:
    """Route fused adapter ops through shard_map over ``axis``.

    Sticky (module-level): set it before the first call of the jitted
    step so the routing is baked into the trace. ``disable()`` restores
    the single-device dispatch."""
    if axis not in mesh.axis_names:
        raise ValueError(f"axis {axis!r} not in mesh {mesh.axis_names}")
    _STATE["mesh"] = mesh
    _STATE["axis"] = axis


def disable() -> None:
    _STATE["mesh"] = None
    _STATE["axis"] = None


def current() -> Optional[Tuple]:
    if _STATE["mesh"] is None:
        return None
    return _STATE["mesh"], _STATE["axis"]


def rows_shardable(n_rows: int) -> bool:
    """True when ``n_rows`` divides the enabled data axis."""
    ctx = current()
    if ctx is None:
        return False
    mesh, axis = ctx
    return n_rows % mesh.shape[axis] == 0


def _run(mesh, axis, fwd_body, bwd_body, x, diff):
    """shard_map'd custom_vjp: x rows-sharded, ``diff`` replicated with
    psum'd grads. ``fwd_body(x, *diff) -> y``;
    ``bwd_body(x, *diff, g) -> (dx, *ddiff)`` (per shard, psums its
    own weight grads)."""
    n = len(diff)

    @jax.custom_vjp
    def op(x, *diff):
        return jax.shard_map(fwd_body, mesh=mesh,
                             in_specs=(P(axis),) + (P(),) * n,
                             out_specs=P(axis),
                             check_vma=False)(x, *diff)

    def op_fwd(x, *diff):
        return op(x, *diff), (x,) + diff

    def op_bwd(res, g):
        return jax.shard_map(bwd_body, mesh=mesh,
                             in_specs=(P(axis),) + (P(),) * n
                             + (P(axis),),
                             out_specs=(P(axis),) + (P(),) * n,
                             check_vma=False)(*res, g)

    op.defvjp(op_fwd, op_bwd)
    return op(x, *diff)


def seq_adapter_fused(x, w1, b1, w2, b2, ls, lb, eps: float,
                      mesh, axis: str):
    """Sharded seq_adapter_fused (fused_adapter.py:379)."""

    def fwd_body(xs, w1s, b1s, w2s, b2s, lss, lbs):
        return F._seq_fwd(xs, w1s, b1s, w2s, b2s, lss, lbs, eps)

    def bwd_body(xs, w1s, b1s, w2s, b2s, lss, lbs, gs):
        grads = F._seq_bwd_rule(eps, (xs, w1s, b1s, w2s, b2s, lss), gs)
        dx, dws = grads[0], grads[1:]
        return (dx,) + tuple(jax.lax.psum(d, axis) for d in dws)

    return _run(mesh, axis, fwd_body, bwd_body, x,
                (w1, b1, w2, b2, ls, lb))


def prenorm_mlp_fused(x, w1, b1, w2, b2, ls, lb, eps: float,
                      mesh, axis: str):
    """Sharded prenorm_mlp_fused (fused_adapter.py:601)."""

    def fwd_body(xs, w1s, b1s, w2s, b2s, lss, lbs):
        return F._pnmlp_fwd(xs, w1s, b1s, w2s, b2s, lss, lbs, eps)

    def bwd_body(xs, w1s, b1s, w2s, b2s, lss, lbs, gs):
        grads = F._pnmlp_bwd_rule(
            eps, (xs, w1s, b1s, w2s, b2s, lss, lbs), gs)
        dx, dws = grads[0], grads[1:]
        return (dx,) + tuple(jax.lax.psum(d, axis) for d in dws)

    return _run(mesh, axis, fwd_body, bwd_body, x,
                (w1, b1, w2, b2, ls, lb))


def cross_attn_block_fused(x, wt, bt, ls, lb, wq, bq, kbd, vbd, wo, bo,
                           heads: int, Tk: int, eps: float,
                           mesh, axis: str):
    """Sharded cross_attn_block_fused (fused_adapter.py:881).

    kbd/vbd are the batch-shared packed kv — activations, but
    batch-independent (computed once from the pseudo-image), so they
    ride the replicated-operand path and their grads psum like weight
    grads, matching GSPMD's handling of the jnp composition."""

    def fwd_body(xs, *ds):
        return F._cab_fwd(xs, *ds, heads, Tk, eps)

    def bwd_body(xs, *args):
        ds, gs = args[:-1], args[-1]
        grads = F._cab_bwd_rule(heads, Tk, eps, (xs,) + ds, gs)
        dx, dws = grads[0], grads[1:]
        return (dx,) + tuple(jax.lax.psum(d, axis) for d in dws)

    return _run(mesh, axis, fwd_body, bwd_body, x,
                (wt, bt, ls, lb, wq, bq, kbd, vbd, wo, bo))


def feature_adapter_blend_fused(x, w1, b1, w2, b2, ratio: float,
                                dropout: float, seed, mesh, axis: str):
    """Sharded feature_adapter_blend_fused (fused_adapter.py:199).

    ``seed`` (int32 array or None) is offset by the shard index inside
    BOTH passes so dropout masks decorrelate across chips while the
    backward still remats the identical per-shard mask."""
    seed_arr = (jnp.zeros((), jnp.int32) if seed is None
                else jnp.asarray(seed, jnp.int32).reshape(()))

    def shard_seed(s):
        if dropout <= 0.0:
            return None
        return s + jax.lax.axis_index(axis)

    def fwd_body(xs, ss, w1s, b1s, w2s, b2s):
        return F._feat_fwd(xs, w1s, b1s, w2s, b2s, ratio, dropout,
                           shard_seed(ss))

    def bwd_body(xs, ss, w1s, b1s, w2s, b2s, gs):
        res = (xs, w1s, b1s, w2s, b2s, F._seed_arr(shard_seed(ss)))
        grads = F._feat_bwd_rule(ratio, dropout, res, gs)
        dx, dws = grads[0], grads[1:5]
        return (dx, jnp.zeros((), jnp.int32),
                *(jax.lax.psum(d, axis) for d in dws))

    n = 4

    @jax.custom_vjp
    def op(x, seed_arr, *diff):
        return jax.shard_map(
            fwd_body, mesh=mesh,
            in_specs=(P(axis), P()) + (P(),) * n,
            out_specs=P(axis), check_vma=False)(x, seed_arr, *diff)

    def op_fwd(x, seed_arr, *diff):
        return op(x, seed_arr, *diff), (x, seed_arr) + diff

    def op_bwd(res, g):
        return jax.shard_map(
            bwd_body, mesh=mesh,
            in_specs=(P(axis), P()) + (P(),) * n + (P(axis),),
            out_specs=(P(axis), P()) + (P(),) * n,
            check_vma=False)(*res, g)

    op.defvjp(op_fwd, op_bwd)
    return op(x, seed_arr, w1, b1, w2, b2)
