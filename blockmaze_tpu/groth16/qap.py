"""R1CS -> QAP witness map on device (JAX).

Mirrors r1cs_to_qap_witness_map (r1cs_to_qap.tcc:218-311) with d1=d2=d3=0
(the only call configuration the Groth16 prover uses,
r1cs_gg_ppzksnark.tcc:402):

  aA/aB/aC evaluations on S  : sparse COO matvec = gather·mul + integer
                               segment_sum over limbs + lazy normalisation
                               (no atomics, no data-dependent shapes)
  aA extra rows              : aA[ncons + i] = witness_i for i <= num_inputs
                               (the "input consistency" constraints)
  polynomial pipeline        : iFFT -> cosetFFT -> pointwise -> divide_by_Z
                               -> icosetFFT (ntt/jntt.py kernels)

Returns the m H-coefficients; the prover consumes the first m-1
(H has degree m-2, r1cs_gg_ppzksnark.tcc:404-408).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import jfield as jf
from ..ntt import jntt, pntt

FR = jf.FR


def sparse_matvec(row, var, coeff, witness_mont, m: int):
    """y[r] = Σ coeff_t * witness[var_t] over terms with row_t == r.

    witness_mont: (nvars+1, 16) Montgomery (index 0 = constant ONE).
    Output: (m, 16) Montgomery, rows >= ncons are zero."""
    gathered = jnp.take(witness_mont, var, axis=0)
    if pntt.use_pallas():
        terms = pntt.mul_elementwise(gathered, coeff)
    else:
        terms = jf.mont_mul(FR, gathered, coeff)
    wide = jax.ops.segment_sum(terms, row, num_segments=m)
    return jf.canon_wide(FR, wide)


def qap_h(domain, dpk, witness_mont):
    """Compute H coefficients for a DevicePK and a full witness tensor."""
    coos = (
        (jnp.asarray(dpk.a_row), jnp.asarray(dpk.a_var),
         jnp.asarray(dpk.a_coeff)),
        (jnp.asarray(dpk.b_row), jnp.asarray(dpk.b_var),
         jnp.asarray(dpk.b_coeff)),
        (jnp.asarray(dpk.c_row), jnp.asarray(dpk.c_var),
         jnp.asarray(dpk.c_coeff)),
    )
    return qap_h_arrays(
        domain, (dpk.num_constraints, dpk.primary_input_size), coos,
        witness_mont)


def qap_h_arrays(domain, meta, coos, witness_mont, tables=None):
    """qap_h over explicit device-resident COO triples; `meta` =
    (num_constraints, primary_input_size). The prover passes the triples —
    and the NTT twiddle/coset/vanishing tables (jntt.qap_tables) — as jit
    ARGUMENTS so they are uploaded once per key and never baked into the
    compiled program as constants (baked tables blow the lowered module to
    ~465 MB and dominate per-process compile time)."""
    m = domain.m
    ncons, n_inp = meta
    (a_row, a_var, a_coeff), (b_row, b_var, b_coeff), \
        (c_row, c_var, c_coeff) = coos
    T = tables

    def _ifft(x):
        return jntt.ifft(domain, x) if T is None else jntt.ifft_t(domain, x, T)

    def _cfft(x):
        return (jntt.coset_fft(domain, x) if T is None
                else jntt.coset_fft_t(domain, x, T))

    aA = sparse_matvec(a_row, a_var, a_coeff, witness_mont, m)
    aB = sparse_matvec(b_row, b_var, b_coeff, witness_mont, m)
    # input consistency rows
    rows = jnp.arange(ncons, ncons + n_inp + 1)
    aA = aA.at[rows].set(witness_mont[: n_inp + 1])

    aA = _cfft(_ifft(aA))
    aB = _cfft(_ifft(aB))
    if pntt.use_pallas():
        H = pntt.mul_elementwise(aA, aB)
    else:
        H = jf.mont_mul(FR, aA, aB)

    aC = sparse_matvec(c_row, c_var, c_coeff, witness_mont, m)
    aC = _cfft(_ifft(aC))

    H = jf.sub(FR, H, aC)
    if T is None:
        H = jntt.divide_by_z_on_coset(domain, H)
        H = jntt.icoset_fft(domain, H)
    else:
        H = jntt.divide_by_z_t(H, T)
        H = jntt.icoset_fft_t(domain, H, T)
    return H
