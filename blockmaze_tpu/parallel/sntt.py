"""Multi-chip sharded NTT: Bailey/4-step decomposition over a device mesh.

The reference parallelises its FFT by splitting into 2^log_cpus sub-FFTs with
twiddle recombination on OpenMP threads (_basic_parallel_radix2_FFT_inner,
libfqfft basic_radix2_domain_aux.tcc:83+). That decomposition IS the 4-step
structure, so the TPU-native version maps it onto a mesh axis with XLA
collectives instead of threads (SURVEY.md §2.3 "Sharded NTT"):

  view the m = m1*m2 coefficients as an (m1, m2) matrix, x[i1*m2 + i2]:

    step 1  column FFTs (length m1)     — columns sharded per device, local
    step 2  twiddle by w^(i2*k1)        — elementwise, local
    step 3  all-to-all: column-sharding -> row-sharding   (the ICI transpose)
    step 4  row FFTs (length m2)        — rows sharded per device, local

  X[k1 + m1*k2] = C[k1, k2]: the output is the transposed flatten, applied
  host-side or fused into the next pipeline stage's indexing.

All arithmetic runs on the Montgomery limb tensors of fields.jfield; the
collective moves raw uint32 lanes over ICI. Twiddle/permutation tables are
passed as ARGUMENTS (pytrees from sqap_tables/fft_tabs), never baked into
the lowered module — see jntt.fft_with for why.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import smap

from ..fields import jfield as jf
from ..fields.constants import R_MOD
from ..ntt.domain import BasicDomain, StepDomain, MULT_GEN
from ..ntt import jntt
from ..ntt.jntt import _fft_tables, _powers

FR = jf.FR


# ---------------------------------------------------------------------------
# Batched in-order FFT along axis 0 (trailing batch dims welcome)
# ---------------------------------------------------------------------------

def fft_axis0(a, m: int, perm, stages):
    """In-order DIT radix-2 FFT along axis 0 of a (m, ..., 16) limb tensor.
    Generalizes jntt.fft_with to interior batch dims (the 4-step sub-FFTs
    run one FFT per matrix column/row). perm/stages are table ARRAYS."""
    a = jnp.take(a, perm, axis=0)
    rest = a.shape[1:]  # (..., 16)
    span = 1
    for tw in stages:
        blocks = m // (2 * span)
        v = a.reshape((blocks, 2, span) + rest)
        lo, hi = v[:, 0], v[:, 1]
        twt = tw.reshape((span,) + (1,) * (len(rest) - 1) + (jf.N,))
        t = jf.mont_mul(FR, jnp.broadcast_to(twt, hi.shape), hi)
        new_lo = jf.add(FR, lo, t)
        new_hi = jf.sub(FR, lo, t)
        a = jnp.stack([new_lo, new_hi], axis=1).reshape((m,) + rest)
        span *= 2
    return a


@lru_cache(maxsize=None)
def _twiddle_table(m1: int, m2: int, omega: int):
    """(m1, m2, 16) Montgomery table of w^(i2*k1) (step-2 twiddles)."""
    col = _powers(omega, m1)  # w^k1
    rows = []
    for k1 in range(m1):
        rows.append(_powers(col[k1], m2))
    flat = [v for row in rows for v in row]
    return jf.to_mont_host(FR, flat).reshape(m1, m2, jf.N)


def _split(m: int, n_dev: int):
    """Pick m = m1*m2 with both multiples of n_dev (for even sharding)."""
    logm = m.bit_length() - 1
    l1 = logm // 2
    m1, m2 = 1 << l1, 1 << (logm - l1)
    assert m1 % n_dev == 0 and m2 % n_dev == 0, (
        f"m={m} too small to 4-step over {n_dev} devices")
    return m1, m2


def can_shard(m: int, n_dev: int) -> bool:
    """True when the 4-step split of m feeds n_dev devices evenly."""
    logm = m.bit_length() - 1
    if m != 1 << logm:
        return False
    l1 = logm // 2
    return ((1 << l1) % n_dev == 0) and ((1 << (logm - l1)) % n_dev == 0)


# ---------------------------------------------------------------------------
# Table construction (host, cached) — one dict per sharded-FFT instance
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def fft_tabs(m: int, omega: int, n_dev: int):
    """Tables for one sharded 4-step FFT of size m with root `omega`."""
    m1, m2 = _split(m, n_dev)
    w1 = pow(omega, m2, R_MOD)   # m1-th root
    w2 = pow(omega, m1, R_MOD)   # m2-th root
    p1, s1 = _fft_tables(m1, w1)
    p2, s2 = _fft_tables(m2, w2)
    return {"p1": p1.astype(np.int32), "s1": tuple(s1),
            "p2": p2.astype(np.int32), "s2": tuple(s2),
            "tw": _twiddle_table(m1, m2, omega)}


@lru_cache(maxsize=None)
def sqap_tables(domain, n_dev: int):
    """Host pytree of every table the SHARDED QAP pipeline needs (the mesh
    analogue of jntt.qap_tables: per-sub-FFT 4-step tables + coset/vanishing
    tables)."""
    g = MULT_GEN
    if isinstance(domain, BasicDomain):
        m, omega = domain.m, domain.omega
        return {
            "fwd": fft_tabs(m, omega, n_dev),
            "inv": fft_tabs(m, pow(omega, -1, R_MOD), n_dev),
            "minv": jf.to_mont_host(FR, [pow(m, -1, R_MOD)])[0],
            "coset": jntt._coset_table(m, g),
            "coset_inv": jntt._coset_table(m, pow(g, -1, R_MOD)),
            "zinv": jntt._divide_by_z_table(domain),
        }
    d = domain
    big_o = d.omega * d.omega % R_MOD
    return {
        "big_fwd": fft_tabs(d.big_m, big_o, n_dev),
        "big_inv": fft_tabs(d.big_m, pow(big_o, -1, R_MOD), n_dev),
        "small_fwd": fft_tabs(d.small_m, d.small_omega, n_dev),
        "small_inv": fft_tabs(d.small_m, pow(d.small_omega, -1, R_MOD),
                              n_dev),
        "omega_pows": jntt._coset_table(d.big_m, d.omega),
        "omega_inv_pows": jntt._coset_table(d.small_m,
                                            pow(d.omega, -1, R_MOD)),
        "big_minv": jf.to_mont_host(FR, [pow(d.big_m, -1, R_MOD)])[0],
        "small_minv": jf.to_mont_host(FR, [pow(d.small_m, -1, R_MOD)])[0],
        "half": jf.to_mont_host(FR, [pow(2, -1, R_MOD)])[0],
        "coset": jntt._coset_table(d.m, g),
        "coset_inv": jntt._coset_table(d.m, pow(g, -1, R_MOD)),
        "zinv": jntt._divide_by_z_table(domain),
    }


# ---------------------------------------------------------------------------
# Sharded 4-step FFT (tables as arguments)
# ---------------------------------------------------------------------------

def sharded_fft_t(mesh: Mesh, m: int, a, T, minv=None):
    """Distributed FFT of a (m, 16) Montgomery tensor over `mesh`'s first
    axis using a fft_tabs table dict. Returns the same (m, 16) result as
    jntt.fft / jntt.ifft (pass minv = the 1/m Montgomery constant row to get
    the inverse-FFT scaling).

    Sharding layout: step 1/2 run column-sharded, the all-to-all reshards to
    row-sharded for step 4; a final all-gather materialises the replicated
    output (callers that keep the pipeline sharded can drop it)."""
    axis = mesh.axis_names[0]
    m1 = T["tw"].shape[0]
    m2 = T["tw"].shape[1]

    def run_body(x, Tl):
        # x: (m1, m2/n_dev, 16) local columns
        x = fft_axis0(x, m1, Tl["p1"], Tl["s1"])      # step 1: column FFTs
        x = jf.mont_mul(FR, x, Tl["tw"])              # step 2: twiddles
        # step 3: ICI transpose — split rows, concat columns
        x = jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=1,
                               tiled=True)            # (m1/n_dev, m2, 16)
        # step 4: row FFTs (length m2 along axis 1)
        x = jnp.swapaxes(x, 0, 1)                     # (m2, m1/n_dev, 16)
        x = fft_axis0(x, m2, Tl["p2"], Tl["s2"])
        x = jnp.swapaxes(x, 0, 1)                     # (m1/n_dev, m2, 16)
        # gather the full (m1, m2) result on every device
        return jax.lax.all_gather(x, axis, axis=0, tiled=True)

    tw_spec = {"p1": P(None), "s1": tuple(P(None, None) for _ in T["s1"]),
               "p2": P(None), "s2": tuple(P(None, None) for _ in T["s2"]),
               "tw": P(None, axis, None)}
    run = smap(run_body, mesh, (P(None, axis, None), tw_spec),
               P(None, None, None))
    C = run(a.reshape(m1, m2, jf.N), T)
    # X[k1 + m1*k2] = C[k1, k2]  ->  transpose to (m2, m1) then flatten
    out = jnp.swapaxes(C, 0, 1).reshape(m, jf.N)
    if minv is not None:
        out = jf.mont_mul(FR, out, jnp.broadcast_to(minv, out.shape))
    return out


# ---------------------------------------------------------------------------
# Step domain (m = big_m + small_m) — the mint/redeem domain shape.
#
# step_radix2_domain.tcc:39-148 decomposes the size-m transform into one
# basic FFT of size big_m and one of size small_m plus elementwise
# fold/twiddle passes. The sharded version runs BOTH sub-FFTs through the
# 4-step mesh decomposition above; the O(m) elementwise passes stay
# replicated (they are bandwidth-trivial next to the sub-FFTs).
# ---------------------------------------------------------------------------

def _sharded_step_fft_t(mesh: Mesh, d: StepDomain, a, T):
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
    c = sharded_fft_t(mesh, big_m, c, T["big_fwd"])
    eo = sharded_fft_t(mesh, small_m, acc, T["small_fwd"])
    return jnp.concatenate([c, eo], axis=0)


def _sharded_step_ifft_t(mesh: Mesh, d: StepDomain, a, T):
    big_m, small_m = d.big_m, d.small_m
    compr = big_m // small_m
    U0 = sharded_fft_t(mesh, big_m, a[:big_m], T["big_inv"],
                       minv=T["big_minv"])
    U1 = sharded_fft_t(mesh, small_m, a[big_m:], T["small_inv"],
                       minv=T["small_minv"])

    tmp = jf.mont_mul(FR, U0, T["omega_pows"])
    tmp_r = tmp.reshape(compr, small_m, jf.N)
    sub_acc = tmp_r[1]
    for j in range(2, compr):
        sub_acc = jf.add(FR, sub_acc, tmp_r[j])
    U1 = jf.sub(FR, U1, sub_acc)
    U1 = jf.mont_mul(FR, U1, T["omega_inv_pows"])

    def _scale(x, km):
        return jf.mont_mul(FR, x, jnp.broadcast_to(km, x.shape))

    a_prefix = _scale(jf.add(FR, U0[:small_m], U1), T["half"])
    b2 = _scale(jf.sub(FR, U0[:small_m], U1), T["half"])
    return jnp.concatenate([a_prefix, U0[small_m:], b2], axis=0)


# ---------------------------------------------------------------------------
# Domain-dispatching wrappers (the sharded mirror of jntt's fft/ifft/coset
# surface; used by parallel.sqap to run the QAP pipeline over a mesh).
# All take the sqap_tables pytree.
# ---------------------------------------------------------------------------

def s_fft_t(mesh: Mesh, domain, a, T):
    if isinstance(domain, BasicDomain):
        return sharded_fft_t(mesh, domain.m, a, T["fwd"])
    return _sharded_step_fft_t(mesh, domain, a, T)


def s_ifft_t(mesh: Mesh, domain, a, T):
    if isinstance(domain, BasicDomain):
        return sharded_fft_t(mesh, domain.m, a, T["inv"], minv=T["minv"])
    return _sharded_step_ifft_t(mesh, domain, a, T)


def s_coset_fft_t(mesh: Mesh, domain, a, T):
    a = jf.mont_mul(FR, a, T["coset"])
    return s_fft_t(mesh, domain, a, T)


def s_icoset_fft_t(mesh: Mesh, domain, a, T):
    out = s_ifft_t(mesh, domain, a, T)
    return jf.mont_mul(FR, out, T["coset_inv"])


# ---------------------------------------------------------------------------
# Constant-table convenience wrappers (tests, dryrun, external callers)
# ---------------------------------------------------------------------------

def _dev_tabs(T):
    return jax.tree.map(jnp.asarray, T)


def sharded_fft(mesh: Mesh, domain: BasicDomain, a, inverse: bool = False):
    """Single-call sharded FFT with tables inlined (convenience form; the
    prover pipeline passes tables as args via sqap_tables instead)."""
    n_dev = mesh.devices.size
    omega = pow(domain.omega, -1, R_MOD) if inverse else domain.omega
    T = _dev_tabs(fft_tabs(domain.m, omega, n_dev))
    minv = None
    if inverse:
        minv = jnp.asarray(jf.to_mont_host(FR, [pow(domain.m, -1, R_MOD)])[0])
    return sharded_fft_t(mesh, domain.m, a, T, minv=minv)


def s_fft(mesh: Mesh, domain, a):
    n_dev = mesh.devices.size
    if isinstance(domain, BasicDomain):
        return sharded_fft(mesh, domain, a)
    return _sharded_step_fft_t(mesh, domain, a,
                               _dev_tabs(sqap_tables(domain, n_dev)))


def s_ifft(mesh: Mesh, domain, a):
    n_dev = mesh.devices.size
    if isinstance(domain, BasicDomain):
        return sharded_fft(mesh, domain, a, inverse=True)
    return _sharded_step_ifft_t(mesh, domain, a,
                                _dev_tabs(sqap_tables(domain, n_dev)))


def sharded_coset_fft(mesh: Mesh, domain: BasicDomain, a, g: int):
    a = jf.mont_mul(FR, a, jnp.asarray(jntt._coset_table(domain.m, g)))
    return s_fft(mesh, domain, a)


def sharded_icoset_fft(mesh: Mesh, domain: BasicDomain, a, g: int):
    out = s_ifft(mesh, domain, a)
    return jf.mont_mul(
        FR, out, jnp.asarray(jntt._coset_table(domain.m, pow(g, -1, R_MOD))))
