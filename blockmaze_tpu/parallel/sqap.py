"""Sharded R1CS -> QAP witness map (mesh version of groth16/qap.py).

Mirrors r1cs_to_qap_witness_map (r1cs_to_qap.tcc:218-311) with the two hot
structures distributed over the mesh's first axis:

  sparse matvec   — COO terms sharded per device; each device segment-sums
                    its term slice into a local (m, 16) lazy-limb partial,
                    canonicalises, and the partials are psum-reduced over ICI
                    (field addition is linear in the limb representation, so
                    the collective is a plain integer psum + one Montgomery
                    normalisation — see parallel.mesh.sharded_field_inner_sum).
  FFT pipeline    — every iFFT/cosetFFT/icosetFFT runs the 4-step mesh
                    decomposition (parallel.sntt), including the step-radix2
                    domains of mint/redeem (_basic_parallel_radix2_FFT_inner,
                    basic_radix2_domain_aux.tcc:83, is the reference's
                    thread-level analogue of the same decomposition).

The O(m) elementwise passes (input-consistency rows, pointwise A*B-C,
divide_by_Z tables) stay replicated: they are bandwidth-trivial next to the
sub-FFTs and XLA keeps them fused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fields import jfield as jf
from ..ntt import jntt
from ..ntt.domain import BasicDomain, StepDomain
from . import sntt
from .mesh import smap

FR = jf.FR


def _pad_terms(row, var, coeff, n_dev: int, m: int):
    """Pad COO term arrays to a multiple of n_dev; padding rows point at
    segment index m, which segment_sum(num_segments=m) drops."""
    import numpy as np
    t = row.shape[0]
    tp = -(-t // n_dev) * n_dev
    if tp == t:
        return row, var, coeff
    padn = tp - t
    row = np.concatenate([np.asarray(row),
                          np.full(padn, m, np.asarray(row).dtype)])
    var = np.concatenate([np.asarray(var),
                          np.zeros(padn, np.asarray(var).dtype)])
    coeff = np.concatenate([np.asarray(coeff),
                            np.zeros((padn,) + coeff.shape[1:],
                                     np.asarray(coeff).dtype)])
    return row, var, coeff


def sharded_matvec(mesh: Mesh, row, var, coeff, witness_mont, m: int):
    """y[r] = Σ coeff_t * witness[var_t] with terms sharded over the mesh.

    Per-device: gather + Montgomery mul + integer segment_sum (lazy limbs),
    one canonical reduction; across devices: psum of canonical limb tensors
    (limb values < n_dev * 2^16 << 2^32) + one more canonical reduction."""
    axis = mesh.axis_names[0]

    def body(rw, vr, cf, w):
        gathered = jnp.take(w, vr, axis=0)
        terms = jf.mont_mul(FR, gathered, cf)
        wide = jax.ops.segment_sum(terms, rw, num_segments=m)
        local = jf.canon_wide(FR, wide)
        tot = jax.lax.psum(local, axis)
        return jf.canon_wide(FR, tot)

    run = smap(body, mesh,
               (P(axis), P(axis), P(axis, None), P(None, None)),
               P(None, None))
    return run(row, var, coeff, witness_mont)


def can_shard_domain(domain, n_dev: int) -> bool:
    if isinstance(domain, BasicDomain):
        return sntt.can_shard(domain.m, n_dev)
    return (sntt.can_shard(domain.big_m, n_dev)
            and sntt.can_shard(domain.small_m, n_dev))


def sharded_qap_h(mesh: Mesh, domain, meta, coos, witness_mont, tabs):
    """qap.qap_h_arrays distributed over `mesh`. Same (m, 16) Montgomery
    H output, bit-identical to the single-chip pipeline. `tabs` is the
    sntt.sqap_tables pytree passed as a jit ARGUMENT (baked-in tables blow
    up the lowered module — see jntt.fft_with)."""
    m = domain.m
    ncons, n_inp = meta
    (a_row, a_var, a_coeff), (b_row, b_var, b_coeff), \
        (c_row, c_var, c_coeff) = coos

    aA = sharded_matvec(mesh, a_row, a_var, a_coeff, witness_mont, m)
    aB = sharded_matvec(mesh, b_row, b_var, b_coeff, witness_mont, m)
    rows = jnp.arange(ncons, ncons + n_inp + 1)
    aA = aA.at[rows].set(witness_mont[: n_inp + 1])

    aA = sntt.s_ifft_t(mesh, domain, aA, tabs)
    aB = sntt.s_ifft_t(mesh, domain, aB, tabs)
    aA = sntt.s_coset_fft_t(mesh, domain, aA, tabs)
    aB = sntt.s_coset_fft_t(mesh, domain, aB, tabs)
    H = jf.mont_mul(FR, aA, aB)

    aC = sharded_matvec(mesh, c_row, c_var, c_coeff, witness_mont, m)
    aC = sntt.s_ifft_t(mesh, domain, aC, tabs)
    aC = sntt.s_coset_fft_t(mesh, domain, aC, tabs)

    H = jf.sub(FR, H, aC)
    H = jf.mont_mul(FR, H, tabs["zinv"])
    H = sntt.s_icoset_fft_t(mesh, domain, H, tabs)
    return H
