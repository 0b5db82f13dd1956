"""Groth16 prover: QAP witness map + 4 MSMs on device, final combine on host.

Mirrors r1cs_gg_ppzksnark_prover (r1cs_gg_ppzksnark.tcc:391-506):

  H       = qap_witness_map(cs, primary, aux, 0, 0, 0)        [device NTT]
  At      = <A_query[0..n],  (1, wires)>                      [device MSM G1]
  Bt(kc)  = <B_query sparse, (1, wires)>                      [device MSM G2+G1]
  Ht      = <H_query,        H[0..deg-2]>                     [device MSM G1]
  Lt      = <L_query,        wires[num_inputs..]>             [device MSM G1]
  A  = alpha + At + r*delta          (G1)
  B  = beta + Bt + s*delta           (G2; B1 analog in G1)
  C  = Ht + Lt + s*A + r*B1 - rs*delta

r, s are random per proof (tcc:418-419) — pass them explicitly for
deterministic regression tests.
"""

from __future__ import annotations

import secrets
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import host_curve as HC
from ..curves import jcurve as jc
from ..fields import jfield as jf
from ..fields.constants import R_MOD
from ..msm import pippenger as pp
from ..serialization.libsnark_io import Proof
from . import qap
from .keys import DevicePK

FR = jf.FR


def _to_device_points(t):
    x, y, inf = t
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf))


class Prover:
    """Holds device-resident query tensors for one circuit's proving key."""

    def __init__(self, dpk: DevicePK, lanes: int = 1024,
                 window: Optional[int] = None):
        self.dpk = dpk
        self.domain = dpk.domain
        self.lanes = lanes
        self.window = window or pp.default_window(dpk.num_variables)
        self.A = _to_device_points(dpk.A)
        self.B2 = _to_device_points(dpk.B2)
        self.B1 = _to_device_points(dpk.B1)
        self.H = tuple(v[: self.domain.m - 1] for v in _to_device_points(dpk.H))
        self.L = _to_device_points(dpk.L)
        self.B_idx = jnp.asarray(dpk.B_idx)

    def prove(self, primary: List[int], aux: List[int],
              r: Optional[int] = None, s: Optional[int] = None) -> Proof:
        dpk = self.dpk
        assert len(primary) == dpk.primary_input_size
        assert len(aux) == dpk.aux_input_size
        r = secrets.randbelow(R_MOD) if r is None else r
        s = secrets.randbelow(R_MOD) if s is None else s

        # const-padded assignment (1, wires...) in both forms
        wires = [1] + list(primary) + list(aux)
        wires_mont = jnp.asarray(jf.to_mont_host(FR, wires))
        wires_std = jnp.asarray(jf.ints_to_limbs(wires))

        # --- QAP H coefficients -----------------------------------------
        H_mont = qap.qap_h(self.domain, dpk, wires_mont)
        H_std = jf.from_mont(FR, H_mont[: self.domain.m - 1])

        # --- 4 MSMs (dispatched asynchronously) -------------------------
        c, lanes = self.window, self.lanes
        At = pp.msm("g1", self.A, wires_std, c=c, lanes=lanes)
        b_scalars = jnp.take(wires_std, self.B_idx, axis=0)
        Bt2 = pp.msm("g2", self.B2, b_scalars, c=c, lanes=lanes)
        Bt1 = pp.msm("g1", self.B1, b_scalars, c=c, lanes=lanes)
        Ht = pp.msm("g1", self.H, H_std, c=c, lanes=lanes)
        Lt = pp.msm("g1", self.L, wires_std[dpk.primary_input_size + 1:],
                    c=c, lanes=lanes)

        # --- host combine (a handful of scalar muls) --------------------
        At_h = jc.g1_jacobian_to_host(tuple(v[None] for v in At))[0]
        Bt2_h = jc.g2_jacobian_to_host(tuple(v[None] for v in Bt2))[0]
        Bt1_h = jc.g1_jacobian_to_host(tuple(v[None] for v in Bt1))[0]
        Ht_h = jc.g1_jacobian_to_host(tuple(v[None] for v in Ht))[0]
        Lt_h = jc.g1_jacobian_to_host(tuple(v[None] for v in Lt))[0]

        g1_A = HC.g1_add(HC.g1_add(dpk.alpha_g1, At_h),
                         HC.g1_mul(dpk.delta_g1, r))
        g1_B = HC.g1_add(HC.g1_add(dpk.beta_g1, Bt1_h),
                         HC.g1_mul(dpk.delta_g1, s))
        g2_B = HC.g2_add(HC.g2_add(dpk.beta_g2, Bt2_h),
                         HC.g2_mul(dpk.delta_g2, s))
        g1_C = HC.g1_add(
            HC.g1_add(HC.g1_add(Ht_h, Lt_h), HC.g1_mul(g1_A, s)),
            HC.g1_add(HC.g1_mul(g1_B, r),
                      HC.g1_neg(HC.g1_mul(dpk.delta_g1, r * s % R_MOD))))
        return Proof(a=g1_A, b=g2_B, c=g1_C)
