"""Limb-major field arithmetic for Pallas TPU kernels.

Same CIOS Montgomery algorithm as jfield.py, but with the 16 limbs on the
LEADING (sublane) axis: tensors are (16, B) uint32 for Fq and (2, 16, B) for
Fq2. Two reasons:

  * Mosaic lowers pads/concats on the major axis but rejects the minor-dim
    offset pads jfield's formulation uses ("offset mismatch on non-concat
    dimension");
  * with B in the lane dimension, every elementwise op runs at full 128-lane
    VPU width (limb-minor layouts leave 112/128 lanes idle).

The group-law functions in curves/jcurve.py are generic over an ops class,
so KFqOps/KFq2Ops below let the exact same formulas run in this layout.
Only used inside Pallas kernels (curves/pcurve.py); the public limb-minor
layout is unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import constants as C
from .jfield import FieldSpec, FQ, const_row

MASK = np.uint32(C.LIMB_MASK)
N = C.N_LIMBS
W = C.LIMB_BITS


def _pad0(x, lo, hi):
    """Pad axis 0 of (k, B) with lo/hi zero rows."""
    return jnp.pad(x, ((lo, hi),) + ((0, 0),) * (x.ndim - 1))


def mul(spec: FieldSpec, a, b):
    """Montgomery product on (16, B) limb-major tensors."""
    inv = np.uint32(spec.inv)
    qv = const_row(spec.p_limbs)[:, None]            # (16, 1)

    # limb convolution with lazy carries -> t (33, B)
    t = jnp.zeros((2 * N + 1,) + a.shape[1:], jnp.uint32)
    for i in range(N):
        row = a[i][None, :] * b                      # (16, B)
        t = t + _pad0(row & MASK, i, N + 1 - i)
        t = t + _pad0(row >> W, i + 1, N - i)

    # Montgomery reduction, 16 steps
    for i in range(N):
        m = (t[i] * inv) & MASK                      # (B,)
        mq = m[None, :] * qv                         # (16, B)
        t = t + _pad0(mq & MASK, i, N + 1 - i)
        t = t + _pad0(mq >> W, i + 1, N - i)
        t = t + _pad0((t[i] >> W)[None, :], i + 1, 2 * N - 1 - i)

    # carry propagation over the high half
    res = []
    c = jnp.zeros(a.shape[1:], jnp.uint32)
    for j in range(N, 2 * N):
        s = t[j] + c
        res.append(s & MASK)
        c = s >> W
    x = jnp.stack(res, axis=0)                       # (16, B)
    return _cond_sub_p(spec, x, c)


def _cond_sub_p(spec: FieldSpec, x, extra):
    q = spec.p_limbs
    borrow = jnp.zeros_like(x[0])
    diff = []
    for j in range(N):
        s = x[j] - np.uint32(q[j]) - borrow
        diff.append(s & MASK)
        borrow = (s >> W) & np.uint32(1)
    diff = jnp.stack(diff, axis=0)
    need = ((extra > 0) | (borrow == 0)).astype(jnp.uint32)
    return jnp.where(need[None, :] != 0, diff, x)


def add(spec: FieldSpec, a, b):
    c = jnp.zeros_like(a[0])
    s = []
    for j in range(N):
        t = a[j] + b[j] + c
        s.append(t & MASK)
        c = t >> W
    return _cond_sub_p(spec, jnp.stack(s, axis=0), c)


def sub(spec: FieldSpec, a, b):
    borrow = jnp.zeros_like(a[0])
    d = []
    for j in range(N):
        t = a[j] - b[j] - borrow
        d.append(t & MASK)
        borrow = (t >> W) & np.uint32(1)
    d = jnp.stack(d, axis=0)
    q = spec.p_limbs
    c = jnp.zeros_like(borrow)
    dp = []
    for j in range(N):
        t = d[j] + np.uint32(q[j]) + c
        dp.append(t & MASK)
        c = t >> W
    dp = jnp.stack(dp, axis=0)
    return jnp.where((borrow == 1).astype(jnp.uint32)[None, :] != 0, dp, d)


def neg(spec: FieldSpec, a):
    zero = jnp.zeros_like(a)
    r = sub(spec, zero, a)
    z = is_zero_fq(a).astype(jnp.uint32)
    return jnp.where(z[None, :] != 0, zero, r)


def is_zero_fq(a):
    return jnp.all(a == 0, axis=0)


# ---------------------------------------------------------------------------
# Ops adapters for the generic group law (curves/jcurve.py)
# ---------------------------------------------------------------------------

class KFqOps:
    """Fq on (16, B) limb-major tensors."""

    ndim_tail = 1  # unused in kernels

    mul = staticmethod(lambda a, b: mul(FQ, a, b))
    sqr = staticmethod(lambda a: mul(FQ, a, a))
    add = staticmethod(lambda a, b: add(FQ, a, b))
    sub = staticmethod(lambda a, b: sub(FQ, a, b))
    neg = staticmethod(lambda a: neg(FQ, a))
    is_zero = staticmethod(is_zero_fq)

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=0)

    @staticmethod
    def select(mask, a, b):
        m = mask.astype(jnp.uint32)[None, :] != 0
        return jnp.where(m, a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_like(a):
        return jnp.broadcast_to(const_row(FQ.one_mont)[:, None], a.shape)


class KFq2Ops:
    """Fq2 on (2, 16, B) tensors; u^2 = -1."""

    ndim_tail = 2

    @staticmethod
    def mul(a, b):
        a0, a1 = a[0], a[1]
        b0, b1 = b[0], b[1]
        t0 = mul(FQ, a0, b0)
        t1 = mul(FQ, a1, b1)
        c0 = sub(FQ, t0, t1)
        s = mul(FQ, add(FQ, a0, a1), add(FQ, b0, b1))
        c1 = sub(FQ, sub(FQ, s, t0), t1)
        return jnp.stack([c0, c1], axis=0)

    @staticmethod
    def sqr(a):
        a0, a1 = a[0], a[1]
        t = mul(FQ, add(FQ, a0, a1), sub(FQ, a0, a1))
        c1 = mul(FQ, a0, a1)
        c1 = add(FQ, c1, c1)
        return jnp.stack([t, c1], axis=0)

    @staticmethod
    def add(a, b):
        return jnp.stack([add(FQ, a[0], b[0]), add(FQ, a[1], b[1])], axis=0)

    @staticmethod
    def sub(a, b):
        return jnp.stack([sub(FQ, a[0], b[0]), sub(FQ, a[1], b[1])], axis=0)

    @staticmethod
    def neg(a):
        return jnp.stack([neg(FQ, a[0]), neg(FQ, a[1])], axis=0)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(0, 1))

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=(0, 1))

    @staticmethod
    def select(mask, a, b):
        m = mask.astype(jnp.uint32)[None, None, :] != 0
        return jnp.where(m, a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def one_like(a):
        one = jnp.stack([const_row(FQ.one_mont),
                         jnp.zeros(N, jnp.uint32)])[..., None]  # (2,16,1)
        return jnp.broadcast_to(one, a.shape)
