"""Pallas TPU butterfly kernel for the radix-2 NTT.

One FFT stage is an elementwise triple (t = w·hi, lo+t, lo−t) over m/2
butterflies. The XLA formulation materializes every Montgomery-multiply
intermediate in HBM (~6 s for the mint QAP pipeline); this kernel keeps the
whole butterfly in VMEM at full VPU width using the limb-major field ops
(fields/kfield.py). The twiddle operand arrives pre-broadcast to (m/2, 16) —
an XLA tile of the per-stage span table, fused upstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..fields import kfield as kf
from ..fields.jfield import FR

TILE = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.jit
def butterfly(lo, hi, tw):
    """(lo + tw*hi, lo - tw*hi) on (B, 16) Montgomery tensors."""
    n = lo.shape[0]
    npad = max(TILE, -(-n // TILE) * TILE)

    def pad(t):
        if t.shape[-1] == npad:
            return t
        return jnp.pad(t, ((0, 0), (0, npad - t.shape[-1])))

    ins = [pad(jnp.transpose(t.reshape(-1, 16), (1, 0)))
           for t in (lo, hi, tw)]

    def kernel(lo_r, hi_r, tw_r, out_lo, out_hi):
        t = kf.mul(FR, tw_r[:], hi_r[:])
        out_lo[:] = kf.add(FR, lo_r[:], t)
        out_hi[:] = kf.sub(FR, lo_r[:], t)

    spec = pl.BlockSpec((16, TILE), lambda i: (0, i))
    out = pl.pallas_call(
        kernel,
        grid=(npad // TILE,),
        in_specs=[spec] * 3,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((16, npad), jnp.uint32),) * 2,
        interpret=_interpret(),
    )(*ins)
    return tuple(jnp.transpose(o[:, :n], (1, 0)) for o in out)


@jax.jit
def mul_elementwise(a, b):
    """Pointwise Montgomery product on (B, 16) tensors (the QAP coset
    multiply / divide-by-Z / coset-scale steps)."""
    n = a.shape[0]
    npad = max(TILE, -(-n // TILE) * TILE)

    def prep(t):
        t = jnp.transpose(t.reshape(-1, 16), (1, 0))
        if t.shape[-1] != npad:
            t = jnp.pad(t, ((0, 0), (0, npad - t.shape[-1])))
        return t

    def kernel(ar, br, o):
        o[:] = kf.mul(FR, ar[:], br[:])

    spec = pl.BlockSpec((16, TILE), lambda i: (0, i))
    out = pl.pallas_call(
        kernel,
        grid=(npad // TILE,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((16, npad), jnp.uint32),
        interpret=_interpret(),
    )(prep(a), prep(b))
    return jnp.transpose(out[:, :n], (1, 0))


def use_pallas() -> bool:
    import os
    return (os.environ.get("BMTPU_PALLAS", "1") != "0"
            and jax.default_backend() == "tpu")
