"""Pallas TPU kernels for the hot batched point operations.

The XLA formulation of the group law (jcurve.py) materializes every
intermediate limb tensor through HBM — a Jacobian add is ~16 Montgomery
multiplies, each with a (batch, 33) redundant accumulator, so one point op
moves hundreds of MB. These kernels run the SAME branchless formulas
(jcurve's group law is generic over a field-ops class) inside a Pallas
kernel on limb-major (16, B) tiles (fields/kfield.py), so all intermediates
stay in VMEM/vector registers at full 128-lane VPU width; only operands and
results touch HBM.

Layout: public tensors stay limb-minor (..., 16). Wrappers transpose to
limb-major with XLA (fused, cheap) and tile the batch axis across the Pallas
grid. On non-TPU backends the kernels run in interpreter mode (tests on the
virtual CPU mesh use tiny shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..fields import kfield as kf
from . import jcurve as jc

TILE = 1024  # 1-D mask inputs carry XLA's T(1024) tiling; blocks must match


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ops(curve: str):
    return kf.KFqOps if curve == "g1" else kf.KFq2Ops


def _tail(curve: str):
    # limb-major tail shape per coordinate
    return (16,) if curve == "g1" else (2, 16)


def _to_major(t, curve):
    """(..., 16) -> (16, B) / (..., 2, 16) -> (2, 16, B), batch flattened."""
    if curve == "g1":
        b = t.reshape(-1, 16)
        return jnp.transpose(b, (1, 0))
    b = t.reshape(-1, 2, 16)
    return jnp.transpose(b, (1, 2, 0))


def _from_major(t, curve, batch_shape):
    if curve == "g1":
        return jnp.transpose(t, (1, 0)).reshape(batch_shape + (16,))
    return jnp.transpose(t, (2, 0, 1)).reshape(batch_shape + (2, 16))


def _pad_last(t, n):
    if t.shape[-1] == n:
        return t
    pad = [(0, 0)] * (t.ndim - 1) + [(0, n - t.shape[-1])]
    return jnp.pad(t, pad)


def _specs(curve: str, n_coord: int, n_mask: int = 0):
    """Block specs tiling the last (batch) axis."""
    if curve == "g1":
        cspec = pl.BlockSpec((16, TILE), lambda i: (0, i))
    else:
        cspec = pl.BlockSpec((2, 16, TILE), lambda i: (0, 0, i))
    mspec = pl.BlockSpec((TILE,), lambda i: (i,))
    return [cspec] * n_coord + [mspec] * n_mask, cspec


def _run(curve, kernel, coords, masks, n_out):
    """Common driver: transpose+pad inputs, tile the grid, undo on outputs."""
    batch_shape = coords[0].shape[: coords[0].ndim -
                                  (1 if curve == "g1" else 2)]
    n = 1
    for d in batch_shape:
        n *= d
    npad = max(TILE, -(-n // TILE) * TILE)
    ins = [_pad_last(_to_major(t, curve), npad) for t in coords]
    ins += [_pad_last(m.reshape(-1).astype(jnp.uint32), npad) for m in masks]
    in_specs, cspec = _specs(curve, len(coords), len(masks))
    tail = _tail(curve)
    out = pl.pallas_call(
        kernel,
        grid=(npad // TILE,),
        in_specs=in_specs,
        out_specs=(cspec,) * n_out,
        out_shape=tuple(jax.ShapeDtypeStruct(tail + (npad,), jnp.uint32)
                        for _ in range(n_out)),
        interpret=_interpret(),
    )(*ins)
    return tuple(_from_major(o[..., :n], curve, batch_shape) for o in out)


@functools.partial(jax.jit, static_argnums=(0,))
def mixed_add(curve: str, P, Qx, Qy, q_inf):
    """Same semantics as jcurve.point_mixed_add, VMEM-resident."""
    F = _ops(curve)

    def kernel(x, y, z, qx, qy, qi, ox, oy, oz):
        r = jc.point_mixed_add(F, (x[:], y[:], z[:]), qx[:], qy[:],
                               qi[:] != 0)
        ox[:], oy[:], oz[:] = r

    return _run(curve, kernel, [P[0], P[1], P[2], Qx, Qy], [q_inf], 3)


@functools.partial(jax.jit, static_argnums=(0,))
def mixed_add_noexc(curve: str, P, Qx, Qy, q_inf):
    """Same semantics as jcurve.point_mixed_add_noexc (blinded-accumulator
    fast path: no doubling/infinity branches), VMEM-resident."""
    F = _ops(curve)

    def kernel(x, y, z, qx, qy, qi, ox, oy, oz):
        r = jc.point_mixed_add_noexc(F, (x[:], y[:], z[:]), qx[:], qy[:],
                                     qi[:] != 0)
        ox[:], oy[:], oz[:] = r

    return _run(curve, kernel, [P[0], P[1], P[2], Qx, Qy], [q_inf], 3)


@functools.partial(jax.jit, static_argnums=(0,))
def add(curve: str, P, Q):
    """Same semantics as jcurve.point_add, VMEM-resident."""
    F = _ops(curve)

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
        r = jc.point_add(F, (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:]))
        ox[:], oy[:], oz[:] = r

    return _run(curve, kernel, [P[0], P[1], P[2], Q[0], Q[1], Q[2]], [], 3)


@functools.partial(jax.jit, static_argnums=(0,))
def double(curve: str, P):
    F = _ops(curve)

    def kernel(x, y, z, ox, oy, oz):
        r = jc.point_double(F, (x[:], y[:], z[:]))
        ox[:], oy[:], oz[:] = r

    return _run(curve, kernel, [P[0], P[1], P[2]], [], 3)
