"""Groth16 key generator (trusted setup) — TPU-accelerated fixed-base
windowed exponentiation.

Mirrors r1cs_gg_ppzksnark_generator (r1cs_gg_ppzksnark.tcc:223-388):

  host:   toxic waste sampling, QAP instance evaluation at t (Lagrange
          coefficients + sparse matrix contraction), window tables
  device: fixed-base windowed exponentiation for the A/B/H/L and gamma_ABC
          query vectors (the analogue of libff's get_window_table/batch_exp
          — a gather + 32 batched mixed-adds instead of per-scalar loops),
          batch affine normalisation via O(log n) prefix-product inversion

Needed for configurations the reference binaries cannot produce (e.g. the
depth-20 deposit circuit: INCREMENTAL_MERKLE_TREE_DEPTH is a compile-time
constant in src/deposit/VNT.h). Keys serialize to the libsnark decimal format
so they remain interoperable with the reference stack.
"""

from __future__ import annotations

import secrets
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import host_curve as HC
from ..curves import jcurve as jc
from ..curves import pairing as PR
from ..fields import host as hf
from ..fields import jfield as jf
from ..fields.constants import R_MOD
from ..ntt import domain as D
from ..r1cs.protoboard import Protoboard
from ..serialization import libsnark_io as io

FR = jf.FR
WINDOW_C = 8
N_WINDOWS = -(-256 // WINDOW_C)


# ---------------------------------------------------------------------------
# Host-side QAP instance evaluation
# ---------------------------------------------------------------------------

def _lagrange_coeffs_basic(m: int, omega: int, t: int) -> List[int]:
    """u_i(t) = Z(t)/m * omega^i / (t - omega^i) (basic radix-2 domain)."""
    zt = (pow(t, m, R_MOD) - 1) % R_MOD
    if zt == 0:
        # t hit the domain — resample upstream
        raise ValueError("t in domain")
    minv = pow(m, -1, R_MOD)
    omi = 1
    denoms = []
    for _ in range(m):
        denoms.append((t - omi) % R_MOD)
        omi = omi * omega % R_MOD
    dinv = _batch_modinv(denoms)
    out = []
    omi = 1
    base = zt * minv % R_MOD
    for i in range(m):
        out.append(base * omi % R_MOD * dinv[i] % R_MOD)
        omi = omi * omega % R_MOD
    return out


def _batch_modinv(vals: List[int]) -> List[int]:
    prefix = [1] * (len(vals) + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % R_MOD
    acc = pow(prefix[-1], -1, R_MOD)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = prefix[i] * acc % R_MOD
        acc = acc * vals[i] % R_MOD
    return out


def lagrange_coeffs(domain, t: int) -> List[int]:
    """evaluate_all_lagrange_polynomials for basic and step domains
    (basic_radix2_domain.tcc / step_radix2_domain.tcc:151-182)."""
    if isinstance(domain, D.BasicDomain):
        return _lagrange_coeffs_basic(domain.m, domain.omega, t)
    d: D.StepDomain = domain
    inner_big = _lagrange_coeffs_basic(d.big_m, d.big_omega, t)
    omega_inv = pow(d.omega, -1, R_MOD)
    inner_small = _lagrange_coeffs_basic(
        d.small_m, d.small_omega, t * omega_inv % R_MOD)
    L0 = (pow(t, d.small_m, R_MOD) - pow(d.omega, d.small_m, R_MOD)) % R_MOD
    omega_to_small_m = pow(d.omega, d.small_m, R_MOD)
    big_omega_to_small_m = pow(d.big_omega, d.small_m, R_MOD)
    elt = 1
    denoms = []
    for _ in range(d.big_m):
        denoms.append((elt - omega_to_small_m) % R_MOD)
        elt = elt * big_omega_to_small_m % R_MOD
    dinv = _batch_modinv(denoms)
    result = [inner_big[i] * L0 % R_MOD * dinv[i] % R_MOD
              for i in range(d.big_m)]
    L1 = (pow(t, d.big_m, R_MOD) - 1) * pow(
        (pow(d.omega, d.big_m, R_MOD) - 1) % R_MOD, -1, R_MOD) % R_MOD
    result += [L1 * inner_small[i] % R_MOD for i in range(d.small_m)]
    return result


def qap_instance_evaluation(cs_coo: Dict, num_vars: int, ncons: int,
                            num_inputs: int, domain, t: int):
    """At/Bt/Ct arrays (len num_vars+1) + Ht powers + Zt
    (r1cs_to_qap_instance_map_with_evaluation, r1cs_to_qap.tcc:110-215)."""
    u = lagrange_coeffs(domain, t)
    At = [0] * (num_vars + 1)
    Bt = [0] * (num_vars + 1)
    Ct = [0] * (num_vars + 1)
    # input consistency rows: A_{i}(t) += u_{ncons+i} for i <= num_inputs
    for i in range(num_inputs + 1):
        At[i] = u[ncons + i]
    for (rows, vars_, coeffs), target in (
            (cs_coo["a"], At), (cs_coo["b"], Bt), (cs_coo["c"], Ct)):
        for rr, vv, cc in zip(rows, vars_, coeffs):
            target[vv] = (target[vv] + cc * u[rr]) % R_MOD
    m = domain.m
    Ht = [1] * m
    for i in range(1, m):
        Ht[i] = Ht[i - 1] * t % R_MOD
    Zt = domain.compute_vanishing_polynomial(t)
    return At, Bt, Ct, Ht, Zt


# ---------------------------------------------------------------------------
# Device fixed-base windowed exponentiation
# ---------------------------------------------------------------------------

def _host_window_table_g1(base):
    """(W, 2^c) table: T[w][d] = d * 2^(c*w) * base (host ints)."""
    table = []
    b = base
    for _ in range(N_WINDOWS):
        row = [HC.G1_ZERO]
        for d in range(1, 1 << WINDOW_C):
            row.append(HC.g1_add(row[-1], b))
        table.append(row)
        for _ in range(WINDOW_C):
            b = HC.g1_add(b, b)
    return table


def _host_window_table_g2(base):
    table = []
    b = base
    for _ in range(N_WINDOWS):
        row = [HC.G2_ZERO]
        for d in range(1, 1 << WINDOW_C):
            row.append(HC.g2_add(row[-1], b))
        table.append(row)
        for _ in range(WINDOW_C):
            b = HC.g2_add(b, b)
    return table


def _table_to_device(table, g2: bool):
    flat = [p for row in table for p in row]
    conv = jc.g2_affine_to_device if g2 else jc.g1_affine_to_device
    x, y, inf = conv(flat)
    shape = (N_WINDOWS, 1 << WINDOW_C)
    return (jnp.asarray(x).reshape(shape + x.shape[1:]),
            jnp.asarray(y).reshape(shape + y.shape[1:]),
            jnp.asarray(inf).reshape(shape))


@partial(jax.jit, static_argnums=0)
def fixed_base_exp(curve: str, table_dev, scalars_std):
    """result_i = scalars_i * base via window-table gathers + W batched
    mixed-adds (rolled into one fori_loop instance). Returns Jacobian batch."""
    F = jc.FqOps if curve == "g1" else jc.Fq2Ops
    tx, ty, tinf = table_dev
    n = scalars_std.shape[0]

    from ..msm.pippenger import _digits_for_window

    digits = jnp.stack([_digits_for_window(scalars_std, w, WINDOW_C)
                        for w in range(N_WINDOWS)])  # (W, n)

    shape = (n, 2, jf.N) if curve == "g2" else (n, jf.N)
    acc = (jnp.zeros(shape, jnp.uint32),
           F.one_like(jnp.zeros(shape, jnp.uint32)),
           jnp.zeros(shape, jnp.uint32))

    def body(w, acc):
        d = digits[w].astype(jnp.int32)
        px = jnp.take(tx[w], d, axis=0)
        py = jnp.take(ty[w], d, axis=0)
        pinf = jnp.take(tinf[w], d, axis=0)
        return jc.point_mixed_add(F, acc, px, py, pinf)

    return jax.lax.fori_loop(0, N_WINDOWS, body, acc)


def jacobian_to_affine_host(curve: str, P) -> list:
    if curve == "g1":
        return jc.g1_jacobian_to_host(P)
    return jc.g2_jacobian_to_host(P)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def generate(pb: Protoboard, rng=None, chunk: int = 1 << 16):
    """Run the trusted setup over a synthesised circuit. Returns
    (io.ProvingKey, io.VerificationKey) with host affine points."""
    rnd = rng or (lambda: secrets.randbelow(R_MOD - 1) + 1)
    ncons = len(pb.constraints)
    num_inputs = pb.primary_input_size
    num_vars = pb.num_variables
    domain = D.get_evaluation_domain(ncons + num_inputs + 1)

    # swap A/B if beneficial (r1cs.tcc:182-231) — column-touch count
    touched_a, touched_b = set(), set()
    coo = {"a": ([], [], []), "b": ([], [], []), "c": ([], [], [])}
    for i, (a, b, c) in enumerate(pb.constraints):
        for key, lc, touched in (("a", a, touched_a), ("b", b, touched_b),
                                 ("c", c, None)):
            for idx, cf in lc.as_dict().items():
                coo[key][0].append(i)
                coo[key][1].append(idx)
                coo[key][2].append(cf)
                if touched is not None:
                    touched.add(idx)
    if len(touched_b) > len(touched_a):
        coo["a"], coo["b"] = coo["b"], coo["a"]

    t = rnd()
    At, Bt, Ct, Ht, Zt = qap_instance_evaluation(
        coo, num_vars, ncons, num_inputs, domain, t)

    alpha, beta, gamma, delta = rnd(), rnd(), rnd(), rnd()
    gamma_inv = pow(gamma, -1, R_MOD)
    delta_inv = pow(delta, -1, R_MOD)

    # scalar vectors
    gamma_ABC_s = [(beta * At[i] + alpha * Bt[i] + Ct[i])
                   * gamma_inv % R_MOD for i in range(num_inputs + 1)]
    L_s = [(beta * At[i] + alpha * Bt[i] + Ct[i]) * delta_inv % R_MOD
           for i in range(num_inputs + 1, num_vars + 1)]
    H_s = [Ht[i] * Zt % R_MOD * delta_inv % R_MOD
           for i in range(domain.m - 1)]

    g1 = HC.g1_generator()
    g2 = HC.g2_generator()
    t_g1 = _table_to_device(_host_window_table_g1(g1), g2=False)
    t_g2 = _table_to_device(_host_window_table_g2(g2), g2=True)

    def _exp(curve, table, scalars: List[int]) -> list:
        """Batched fixed-base exp with every dispatch PADDED to a power-of-
        two length: all queries (A/H/L/B/IC) of all circuits then share one
        compiled graph per curve instead of one per exact length (scalar 0
        pads exponentiate to infinity and are sliced off)."""
        out = []
        for off in range(0, len(scalars), chunk):
            part = scalars[off:off + chunk]
            n = len(part)
            padded = 1 << max(4, (n - 1).bit_length())
            s = jnp.asarray(jf.ints_to_limbs(part + [0] * (padded - n)))
            out.extend(jacobian_to_affine_host(
                curve, fixed_base_exp(curve, table, s))[:n])
        return out

    def exp_g1(scalars: List[int]) -> list:
        return _exp("g1", t_g1, scalars)

    def exp_g2(scalars: List[int]) -> list:
        return _exp("g2", t_g2, scalars)

    A_query = exp_g1(At)
    H_query = exp_g1(H_s)
    L_query = exp_g1(L_s)
    gamma_ABC_rest_pts = exp_g1(gamma_ABC_s[1:])
    gamma_ABC_first = HC.g1_mul(g1, gamma_ABC_s[0])

    # B query is sparse over nonzero Bt entries (kc pairs share the scalar)
    b_nonzero = [i for i, v in enumerate(Bt) if v]
    b_scalars = [Bt[i] for i in b_nonzero]
    B_g2 = exp_g2(b_scalars)
    B_g1 = exp_g1(b_scalars)

    alpha_g1 = HC.g1_mul(g1, alpha)
    beta_g1 = HC.g1_mul(g1, beta)
    beta_g2 = HC.g2_mul(g2, beta)
    delta_g1 = HC.g1_mul(g1, delta)
    delta_g2 = HC.g2_mul(g2, delta)
    gamma_g2 = HC.g2_mul(g2, gamma)
    alpha_beta = PR.pairing(alpha_g1, beta_g2)

    cs = io.ConstraintSystem(
        num_inputs, num_vars - num_inputs, _rebuild_constraints(coo, ncons))

    pk = io.ProvingKey(
        alpha_g1=alpha_g1, beta_g1=beta_g1, beta_g2=beta_g2,
        delta_g1=delta_g1, delta_g2=delta_g2,
        A_query=A_query,
        B_domain=num_vars + 1, B_indices=b_nonzero,
        B_g2=B_g2, B_g1=B_g1,
        H_query=H_query, L_query=L_query, cs=cs)
    vk = io.VerificationKey(
        alpha_g1_beta_g2=alpha_beta, gamma_g2=gamma_g2, delta_g2=delta_g2,
        gamma_ABC_first=gamma_ABC_first,
        gamma_ABC_rest=list(enumerate(gamma_ABC_rest_pts)),
        gamma_ABC_domain=num_inputs)
    return pk, vk


def _rebuild_constraints(coo, ncons):
    rows = [([], [], []) for _ in range(ncons)]
    for k, sel in (("a", 0), ("b", 1), ("c", 2)):
        rr, vv, cc = coo[k]
        for r, v, c in zip(rr, vv, cc):
            rows[r][sel].append((v, c))
    return [tuple(r) for r in rows]
