"""NTT tests: domain selection parity, FFT vs direct evaluation, round trips,
and the divide-by-Z table identity — for both basic and step domains."""

import numpy as np
import jax.numpy as jnp
import pytest

from blockmaze_tpu.fields import jfield as jf
from blockmaze_tpu.fields.constants import R_MOD
from blockmaze_tpu.ntt import domain as D
from blockmaze_tpu.ntt import jntt

FR = jf.FR


def poly_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R_MOD
    return acc


def test_domain_selection_matches_reference_sizes():
    # measured from reference pk files / keygen runs
    assert isinstance(D.get_evaluation_domain(167270 + 4 + 1), D.StepDomain)
    assert D.get_evaluation_domain(167275).m == 196608  # mint
    assert D.get_evaluation_domain(252292).m == 262144  # send -> basic 2^18
    assert isinstance(D.get_evaluation_domain(252292), D.BasicDomain)
    assert D.get_evaluation_domain(503870).m == 524288  # deposit -> basic 2^19
    d = D.get_evaluation_domain(167275)
    assert (d.big_m, d.small_m) == (131072, 65536)


@pytest.mark.parametrize("min_size", [16, 24], ids=["basic16", "step24"])
class TestNTT:
    def _domain_and_coeffs(self, rng, min_size):
        d = D.get_evaluation_domain(min_size)
        coeffs = [rng.randrange(R_MOD) for _ in range(d.m)]
        return d, coeffs

    def test_fft_matches_direct_eval(self, rng, min_size):
        d, coeffs = self._domain_and_coeffs(rng, min_size)
        a = jnp.asarray(jf.to_mont_host(FR, coeffs))
        out = jf.from_mont_host(FR, np.asarray(jntt.fft(d, a)))
        want = [poly_eval(coeffs, d.get_domain_element(i)) for i in range(d.m)]
        assert out == want

    def test_ifft_roundtrip(self, rng, min_size):
        d, coeffs = self._domain_and_coeffs(rng, min_size)
        a = jnp.asarray(jf.to_mont_host(FR, coeffs))
        back = jf.from_mont_host(FR, np.asarray(jntt.ifft(d, jntt.fft(d, a))))
        assert back == coeffs

    def test_coset_fft_matches_direct_eval(self, rng, min_size):
        d, coeffs = self._domain_and_coeffs(rng, min_size)
        g = D.MULT_GEN
        a = jnp.asarray(jf.to_mont_host(FR, coeffs))
        out = jf.from_mont_host(FR, np.asarray(jntt.coset_fft(d, a)))
        want = [poly_eval(coeffs, g * d.get_domain_element(i) % R_MOD)
                for i in range(d.m)]
        assert out == want

    def test_icoset_roundtrip(self, rng, min_size):
        d, coeffs = self._domain_and_coeffs(rng, min_size)
        a = jnp.asarray(jf.to_mont_host(FR, coeffs))
        back = jf.from_mont_host(
            FR, np.asarray(jntt.icoset_fft(d, jntt.coset_fft(d, a))))
        assert back == coeffs

    def test_divide_by_z_on_coset(self, rng, min_size):
        d, _ = self._domain_and_coeffs(rng, min_size)
        g = D.MULT_GEN
        ones = jnp.asarray(jf.to_mont_host(FR, [1] * d.m))
        out = jf.from_mont_host(FR, np.asarray(jntt.divide_by_z_on_coset(d, ones)))
        # For basic domains Z is constant on the coset. For the step domain the
        # reference's per-index formula equals 1/Z(coset point) where the point
        # ordering matches the FFT output layout (big then small part).
        for i in range(d.m):
            pt = g * d.get_domain_element(i) % R_MOD
            zi = d.compute_vanishing_polynomial(pt)
            assert out[i] * zi % R_MOD == 1, f"mismatch at {i}"
