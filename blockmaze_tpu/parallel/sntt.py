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
collective moves raw uint32 lanes over ICI.
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
from ..ntt.domain import BasicDomain
from ..ntt.jntt import _fft_tables, _powers

FR = jf.FR


# ---------------------------------------------------------------------------
# Batched in-order FFT along axis 0 (trailing batch dims welcome)
# ---------------------------------------------------------------------------

def fft_axis0(a, m: int, omega: int):
    """In-order DIT radix-2 FFT along axis 0 of a (m, ..., 16) limb tensor.
    Generalizes jntt._basic_fft to interior batch dims (the 4-step sub-FFTs
    run one FFT per matrix column/row)."""
    perm, stages = _fft_tables(m, omega)
    a = jnp.take(a, jnp.asarray(perm), axis=0)
    rest = a.shape[1:]  # (..., 16)
    span = 1
    for tw in stages:
        blocks = m // (2 * span)
        v = a.reshape((blocks, 2, span) + rest)
        lo, hi = v[:, 0], v[:, 1]
        twt = jnp.asarray(tw).reshape((span,) + (1,) * (len(rest) - 1) + (jf.N,))
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


# ---------------------------------------------------------------------------
# Sharded 4-step FFT
# ---------------------------------------------------------------------------

def sharded_fft(mesh: Mesh, domain: BasicDomain, a, inverse: bool = False):
    """Distributed FFT of a (m, 16) Montgomery tensor over `mesh`'s first
    axis. Returns the same (m, 16) result as jntt.fft / jntt.ifft.

    Sharding layout: step 1/2 run column-sharded, the all-to-all reshards to
    row-sharded for step 4; a final all-gather materialises the replicated
    output (callers that keep the pipeline sharded can drop it)."""
    m = domain.m
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    omega = pow(domain.omega, -1, R_MOD) if inverse else domain.omega
    m1, m2 = _split(m, n_dev)
    w1 = pow(omega, m2, R_MOD)   # m1-th root
    w2 = pow(omega, m1, R_MOD)   # m2-th root
    tw = jnp.asarray(_twiddle_table(m1, m2, omega))

    def run_body(x, twl):
        # x: (m1, m2/n_dev, 16) local columns
        x = fft_axis0(x, m1, w1)                      # step 1: column FFTs
        x = jf.mont_mul(FR, x, twl)                   # step 2: twiddles
        # step 3: ICI transpose — split rows, concat columns
        x = jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=1,
                               tiled=True)            # (m1/n_dev, m2, 16)
        # step 4: row FFTs (length m2 along axis 1)
        x = jnp.swapaxes(x, 0, 1)                     # (m2, m1/n_dev, 16)
        x = fft_axis0(x, m2, w2)
        x = jnp.swapaxes(x, 0, 1)                     # (m1/n_dev, m2, 16)
        # gather the full (m1, m2) result on every device
        return jax.lax.all_gather(x, axis, axis=0, tiled=True)

    run = smap(run_body, mesh, (P(None, axis, None), P(None, axis, None)),
               P(None, None, None))
    C = run(a.reshape(m1, m2, jf.N), tw)
    # X[k1 + m1*k2] = C[k1, k2]  ->  transpose to (m2, m1) then flatten
    out = jnp.swapaxes(C, 0, 1).reshape(m, jf.N)
    if inverse:
        minv = jnp.asarray(jf.to_mont_host(FR, [pow(m, -1, R_MOD)])[0])
        out = jf.mont_mul(FR, out, jnp.broadcast_to(minv, out.shape))
    return out


def sharded_coset_fft(mesh: Mesh, domain: BasicDomain, a, g: int):
    from ..ntt.jntt import _coset_table
    a = jf.mont_mul(FR, a, jnp.asarray(_coset_table(domain.m, g)))
    return sharded_fft(mesh, domain, a)


def sharded_icoset_fft(mesh: Mesh, domain: BasicDomain, a, g: int):
    from ..ntt.jntt import _coset_table
    out = sharded_fft(mesh, domain, a, inverse=True)
    return jf.mont_mul(
        FR, out, jnp.asarray(_coset_table(domain.m, pow(g, -1, R_MOD))))
