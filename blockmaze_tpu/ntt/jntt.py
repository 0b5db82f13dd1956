"""Radix-2 NTT over Fr for JAX/TPU.

Implements the exact FFT pipeline of the QAP witness map
(libfqfft basic_radix2_domain_aux.tcc:45-80 and step_radix2_domain.tcc) on
Montgomery limb tensors of shape (m, 16):

 - butterflies are vectorized per stage (reshape to (blocks, 2, span)); the
   stage loop is a Python loop over log2(m) stages, so the jitted graph is
   ~log2(m) fused elementwise passes — a natural fit for the TPU VPU;
 - twiddle factors, coset power tables, bit-reversal permutations and the
   divide-by-vanishing-polynomial tables are precomputed host-side per domain
   and cached (they depend only on the domain, not the data);
 - the step domain (m = 2^k + 2^r, mint/redeem circuits) follows
   step_radix2_domain.tcc:39-148 with the same c/d/e decomposition.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import jfield as jf
from ..fields.constants import R_MOD
from . import pntt
from .domain import BasicDomain, StepDomain, MULT_GEN

FR = jf.FR


# ---------------------------------------------------------------------------
# Host-side table precomputation
# ---------------------------------------------------------------------------

def _powers(base: int, n: int) -> list:
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * base % R_MOD
    return out


def _bitrev_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@lru_cache(maxsize=None)
def _fft_tables(m: int, omega: int):
    """Per-stage twiddle tables (Montgomery) + bit-reversal permutation."""
    logm = m.bit_length() - 1
    assert m == 1 << logm
    perm = _bitrev_perm(m)
    stages = []
    span = 1
    for _ in range(logm):
        w_m = pow(omega, m // (2 * span), R_MOD)
        stages.append(jf.to_mont_host(FR, _powers(w_m, span)))
        span *= 2
    return perm, stages


@lru_cache(maxsize=None)
def _coset_table(m: int, g: int):
    return jf.to_mont_host(FR, _powers(g, m))


def _batch_modinv(vals: list) -> list:
    """Host batch inversion (one pow) for table precomputation."""
    prefix = [1] * (len(vals) + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % R_MOD
    inv_total = pow(prefix[-1], -1, R_MOD)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = prefix[i] * inv_total % R_MOD
        inv_total = inv_total * vals[i] % R_MOD
    return out


@lru_cache(maxsize=None)
def _divide_by_z_table(domain):
    """Precomputed 1/Z(coset element) table (Montgomery limbs, (m,16)).

    basic: Z is constant (g^m - 1) on the coset (basic_radix2_domain.tcc);
    step : per-index values from step_radix2_domain.tcc:218-247."""
    g = MULT_GEN
    if isinstance(domain, BasicDomain):
        zinv = pow((pow(g, domain.m, R_MOD) - 1) % R_MOD, -1, R_MOD)
        return jf.to_mont_host(FR, [zinv] * domain.m)
    assert isinstance(domain, StepDomain)
    big_m, small_m, omega = domain.big_m, domain.small_m, domain.omega
    Z0 = (pow(g, big_m, R_MOD) - 1) % R_MOD
    c_sm_Z0 = pow(g, small_m, R_MOD) * Z0 % R_MOD
    w_sm_Z0 = pow(omega, small_m, R_MOD) * Z0 % R_MOD
    w_2sm = pow(omega, 2 * small_m, R_MOD)
    elt = 1
    vals = []
    for _ in range(big_m):
        vals.append((c_sm_Z0 * elt - w_sm_Z0) % R_MOD)
        elt = elt * w_2sm % R_MOD
    Z1 = (pow(g * omega % R_MOD, big_m, R_MOD) - 1) * (
        (pow(g * omega % R_MOD, small_m, R_MOD) - pow(omega, small_m, R_MOD)) % R_MOD
    ) % R_MOD
    vals.append(Z1)
    inv = _batch_modinv(vals)
    table = inv[:big_m] + [inv[big_m]] * small_m
    return jf.to_mont_host(FR, table)


# ---------------------------------------------------------------------------
# Core radix-2 FFT (power-of-two size)
# ---------------------------------------------------------------------------

def fft_with(a, m: int, perm, stages):
    """In-order Cooley-Tukey DIT FFT matching _basic_serial_radix2_FFT, with
    the permutation and per-stage twiddle tables passed as ARRAYS.

    Passing tables as arguments instead of closure constants keeps them out
    of the lowered StableHLO: with baked-in tables the mint QAP module is
    ~465 MB of text and costs minutes of trace/lower/hash in EVERY process —
    the dominant share of the TPU "compile tax" (the persistent compile
    cache only skips the XLA compile step, never lowering).

    On TPU every stage's butterflies run in one Pallas kernel (ntt/pntt.py);
    elsewhere the XLA elementwise path is used."""
    a = jnp.take(a, perm, axis=0)
    span = 1
    pallas = pntt.use_pallas()
    for tw in stages:
        blocks = m // (2 * span)
        v = a.reshape(blocks, 2, span, jf.N)
        lo, hi = v[:, 0], v[:, 1]
        if pallas:
            twf = jnp.broadcast_to(tw, hi.shape)
            nl, nh = pntt.butterfly(lo.reshape(-1, jf.N),
                                    hi.reshape(-1, jf.N),
                                    twf.reshape(-1, jf.N))
            new_lo = nl.reshape(lo.shape)
            new_hi = nh.reshape(hi.shape)
        else:
            t = jf.mont_mul(FR, jnp.broadcast_to(tw, hi.shape), hi)
            new_lo = jf.add(FR, lo, t)
            new_hi = jf.sub(FR, lo, t)
        a = jnp.stack([new_lo, new_hi], axis=1).reshape(m, jf.N)
        span *= 2
    return a


def _basic_fft(a, m: int, omega: int):
    """fft_with with host-computed tables inlined as constants (small-m
    callers: tests, generator; the QAP pipeline passes tables as args)."""
    perm, stages = _fft_tables(m, omega)
    return fft_with(a, m, jnp.asarray(perm),
                    tuple(jnp.asarray(t) for t in stages))


def _scale(a, k: int):
    """Multiply every element by host constant k (Montgomery)."""
    c = jnp.asarray(jf.to_mont_host(FR, [k])[0])
    b = jnp.broadcast_to(c, a.shape)
    if pntt.use_pallas():
        return pntt.mul_elementwise(a, b)
    return jf.mont_mul(FR, a, b)


def _mul_table(a, table_np):
    if pntt.use_pallas():
        return pntt.mul_elementwise(a, jnp.asarray(table_np))
    return jf.mont_mul(FR, a, jnp.asarray(table_np))


# ---------------------------------------------------------------------------
# Domain-level operations (FFT / iFFT / cosetFFT / icosetFFT / divide_by_Z)
# ---------------------------------------------------------------------------

def fft(domain, a):
    if isinstance(domain, BasicDomain):
        return _basic_fft(a, domain.m, domain.omega)
    return _step_fft(domain, a)


def ifft(domain, a):
    if isinstance(domain, BasicDomain):
        out = _basic_fft(a, domain.m, pow(domain.omega, -1, R_MOD))
        return _scale(out, pow(domain.m, -1, R_MOD))
    return _step_ifft(domain, a)


def coset_fft(domain, a, g: int = MULT_GEN):
    a = _mul_table(a, _coset_table(domain.m, g))
    return fft(domain, a)


def icoset_fft(domain, a, g: int = MULT_GEN):
    a = ifft(domain, a)
    return _mul_table(a, _coset_table(domain.m, pow(g, -1, R_MOD)))


def divide_by_z_on_coset(domain, a):
    return _mul_table(a, _divide_by_z_table(domain))


# ---------------------------------------------------------------------------
# Table-parameterized pipeline (tables as jit ARGUMENTS, not constants)
#
# qap_tables(domain) builds one host-side pytree with every table the QAP
# witness-map pipeline needs; the *_t ops consume it. This keeps hundreds of
# MB of twiddle/coset data out of the lowered module — see fft_with.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def qap_tables(domain):
    """Host pytree of every table used by the QAP pipeline for `domain`.
    Upload once with jax.device_put and pass to qap.qap_h_arrays(tables=)."""
    g = MULT_GEN
    if isinstance(domain, BasicDomain):
        m, omega = domain.m, domain.omega
        perm, fwd = _fft_tables(m, omega)
        _, inv = _fft_tables(m, pow(omega, -1, R_MOD))
        return {
            "perm": perm.astype(np.int32),
            "fwd": tuple(fwd), "inv": tuple(inv),
            "minv": jf.to_mont_host(FR, [pow(m, -1, R_MOD)])[0],
            "coset": _coset_table(m, g),
            "coset_inv": _coset_table(m, pow(g, -1, R_MOD)),
            "zinv": _divide_by_z_table(domain),
        }
    d = domain
    big_o = d.omega * d.omega % R_MOD
    big_perm, big_fwd = _fft_tables(d.big_m, big_o)
    _, big_inv = _fft_tables(d.big_m, pow(big_o, -1, R_MOD))
    small_perm, small_fwd = _fft_tables(d.small_m, d.small_omega)
    _, small_inv = _fft_tables(d.small_m, pow(d.small_omega, -1, R_MOD))
    return {
        "big_perm": big_perm.astype(np.int32),
        "big_fwd": tuple(big_fwd), "big_inv": tuple(big_inv),
        "small_perm": small_perm.astype(np.int32),
        "small_fwd": tuple(small_fwd), "small_inv": tuple(small_inv),
        "omega_pows": _coset_table(d.big_m, d.omega),
        "omega_inv_pows": _coset_table(d.small_m, pow(d.omega, -1, R_MOD)),
        "big_minv": jf.to_mont_host(FR, [pow(d.big_m, -1, R_MOD)])[0],
        "small_minv": jf.to_mont_host(FR, [pow(d.small_m, -1, R_MOD)])[0],
        "half": jf.to_mont_host(FR, [pow(2, -1, R_MOD)])[0],
        "coset": _coset_table(d.m, g),
        "coset_inv": _coset_table(d.m, pow(g, -1, R_MOD)),
        "zinv": _divide_by_z_table(domain),
    }


def _scale_t(a, km):
    b = jnp.broadcast_to(km, a.shape)
    if pntt.use_pallas():
        return pntt.mul_elementwise(a, b)
    return jf.mont_mul(FR, a, b)


def _mul_t(a, table):
    if pntt.use_pallas():
        return pntt.mul_elementwise(a, table)
    return jf.mont_mul(FR, a, table)


def fft_t(domain, a, T):
    if isinstance(domain, BasicDomain):
        return fft_with(a, domain.m, T["perm"], T["fwd"])
    return _step_fft_t(domain, a, T)


def ifft_t(domain, a, T):
    if isinstance(domain, BasicDomain):
        out = fft_with(a, domain.m, T["perm"], T["inv"])
        return _scale_t(out, T["minv"])
    return _step_ifft_t(domain, a, T)


def coset_fft_t(domain, a, T):
    return fft_t(domain, _mul_t(a, T["coset"]), T)


def icoset_fft_t(domain, a, T):
    return _mul_t(ifft_t(domain, a, T), T["coset_inv"])


def divide_by_z_t(a, T):
    return _mul_t(a, T["zinv"])


def _step_fft_t(d: StepDomain, a, T):
    big_m, small_m = d.big_m, d.small_m
    compr = big_m // small_m
    a_lo, a_hi = a[:big_m], a[big_m:]
    pad_hi = jnp.concatenate(
        [a_hi, jnp.zeros((big_m - small_m, jf.N), jnp.uint32)], axis=0)
    c = jf.add(FR, a_lo, pad_hi)
    dvec = jf.mont_mul(FR, T["omega_pows"], jf.sub(FR, a_lo, pad_hi))
    e = dvec.reshape(compr, small_m, jf.N)
    acc = e[0]
    for j in range(1, compr):
        acc = jf.add(FR, acc, e[j])
    c = fft_with(c, big_m, T["big_perm"], T["big_fwd"])
    eo = fft_with(acc, small_m, T["small_perm"], T["small_fwd"])
    return jnp.concatenate([c, eo], axis=0)


def _step_ifft_t(d: StepDomain, a, T):
    big_m, small_m = d.big_m, d.small_m
    compr = big_m // small_m
    U0 = fft_with(a[:big_m], big_m, T["big_perm"], T["big_inv"])
    U1 = fft_with(a[big_m:], small_m, T["small_perm"], T["small_inv"])
    U0 = _scale_t(U0, T["big_minv"])
    U1 = _scale_t(U1, T["small_minv"])

    tmp = jf.mont_mul(FR, U0, T["omega_pows"])
    tmp_r = tmp.reshape(compr, small_m, jf.N)
    sub_acc = tmp_r[1]
    for j in range(2, compr):
        sub_acc = jf.add(FR, sub_acc, tmp_r[j])
    U1 = jf.sub(FR, U1, sub_acc)
    U1 = jf.mont_mul(FR, U1, T["omega_inv_pows"])

    a_prefix = _scale_t(jf.add(FR, U0[:small_m], U1), T["half"])
    b2 = _scale_t(jf.sub(FR, U0[:small_m], U1), T["half"])
    return jnp.concatenate([a_prefix, U0[small_m:], b2], axis=0)


# ---------------------------------------------------------------------------
# Step domain (m = big_m + small_m), step_radix2_domain.tcc:39-148
# ---------------------------------------------------------------------------

def _step_fft(d: StepDomain, a):
    big_m, small_m = d.big_m, d.small_m
    compr = big_m // small_m
    omega_pows = jnp.asarray(_coset_table(big_m, d.omega))

    a_lo, a_hi = a[:big_m], a[big_m:]
    # c[i] = a[i] (+ a[i+big_m] for i < small_m)
    pad_hi = jnp.concatenate(
        [a_hi, jnp.zeros((big_m - small_m, jf.N), jnp.uint32)], axis=0)
    c = jf.add(FR, a_lo, pad_hi)
    # d[i] = omega^i * (a[i] (- a[i+big_m] for i < small_m))
    dvec = jf.mont_mul(FR, omega_pows, jf.sub(FR, a_lo, pad_hi))
    # e[i] = sum_j d[i + j*small_m]
    e = dvec.reshape(compr, small_m, jf.N)
    acc = e[0]
    for j in range(1, compr):
        acc = jf.add(FR, acc, e[j])

    c = _basic_fft(c, big_m, d.omega * d.omega % R_MOD)
    eo = _basic_fft(acc, small_m, d.small_omega)
    return jnp.concatenate([c, eo], axis=0)


def _step_ifft(d: StepDomain, a):
    big_m, small_m = d.big_m, d.small_m
    compr = big_m // small_m
    U0 = _basic_fft(a[:big_m], big_m, pow(d.omega * d.omega % R_MOD, -1, R_MOD))
    U1 = _basic_fft(a[big_m:], small_m, pow(d.small_omega, -1, R_MOD))
    U0 = _scale(U0, pow(big_m, -1, R_MOD))
    U1 = _scale(U1, pow(small_m, -1, R_MOD))

    omega_pows = jnp.asarray(_coset_table(big_m, d.omega))
    tmp = jf.mont_mul(FR, U0, omega_pows)

    # U1[i] -= tmp[i + j*small_m] for j in 1..compr-1
    tmp_r = tmp.reshape(compr, small_m, jf.N)
    sub_acc = tmp_r[1]
    for j in range(2, compr):
        sub_acc = jf.add(FR, sub_acc, tmp_r[j])
    U1 = jf.sub(FR, U1, sub_acc)

    omega_inv_pows = jnp.asarray(
        _coset_table(small_m, pow(d.omega, -1, R_MOD)))
    U1 = jf.mont_mul(FR, U1, omega_inv_pows)

    over_two = pow(2, -1, R_MOD)
    a_prefix = _scale(jf.add(FR, U0[:small_m], U1), over_two)
    b2 = _scale(jf.sub(FR, U0[:small_m], U1), over_two)
    return jnp.concatenate([a_prefix, U0[small_m:], b2], axis=0)
