"""Sharded (4-step) NTT over the virtual 8-device mesh must agree with the
single-chip radix-2 implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from blockmaze_tpu.fields import jfield as jf
from blockmaze_tpu.fields.constants import R_MOD
from blockmaze_tpu.ntt import domain as D, jntt
from blockmaze_tpu.parallel import mesh as pmesh
from blockmaze_tpu.parallel import sntt

FR = jf.FR


@pytest.fixture(scope="module")
def mesh8():
    return pmesh.make_mesh(8)


def _rand_poly(rng, m):
    vals = [rng.randrange(R_MOD) for _ in range(m)]
    return jnp.asarray(jf.to_mont_host(FR, vals))


@pytest.mark.parametrize("logm", [6, 8])
def test_sharded_fft_matches_single_chip(mesh8, rng, logm):
    dom = D.get_evaluation_domain(1 << logm)
    a = _rand_poly(rng, dom.m)
    want = np.asarray(jntt.fft(dom, a))
    got = np.asarray(sntt.sharded_fft(mesh8, dom, a))
    assert np.array_equal(got, want)


def test_sharded_ifft_roundtrip(mesh8, rng):
    dom = D.get_evaluation_domain(1 << 7)
    a = _rand_poly(rng, dom.m)
    fwd = sntt.sharded_fft(mesh8, dom, a)
    back = sntt.sharded_fft(mesh8, dom, fwd, inverse=True)
    assert np.array_equal(np.asarray(back), np.asarray(a))
    # and the inverse agrees with the single-chip iFFT
    want = np.asarray(jntt.ifft(dom, fwd))
    assert np.array_equal(np.asarray(back), want)


def test_sharded_coset_pipeline(mesh8, rng):
    """cosetFFT + icosetFFT across the mesh equals the local pipeline."""
    from blockmaze_tpu.ntt.domain import MULT_GEN
    dom = D.get_evaluation_domain(1 << 6)
    a = _rand_poly(rng, dom.m)
    want = np.asarray(jntt.coset_fft(dom, a))
    got = np.asarray(sntt.sharded_coset_fft(mesh8, dom, a, MULT_GEN))
    assert np.array_equal(got, want)
    back = sntt.sharded_icoset_fft(mesh8, dom, jnp.asarray(got), MULT_GEN)
    assert np.array_equal(np.asarray(back), np.asarray(a))


def test_fft_axis0_batched(rng):
    """The batched axis-0 FFT matches per-column single FFTs."""
    dom = D.get_evaluation_domain(1 << 5)
    cols = []
    for _ in range(3):
        cols.append(_rand_poly(rng, dom.m))
    batched = jnp.stack(cols, axis=1)  # (m, 3, 16)
    perm, stages = jntt._fft_tables(dom.m, dom.omega)
    out = sntt.fft_axis0(batched, dom.m, jnp.asarray(perm),
                         tuple(jnp.asarray(t) for t in stages))
    for j, c in enumerate(cols):
        want = np.asarray(jntt.fft(dom, c))
        assert np.array_equal(np.asarray(out[:, j]), want)
