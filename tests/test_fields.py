"""Golden tests: JAX limb field arithmetic vs Python-int reference."""

import numpy as np
import pytest

from blockmaze_tpu.fields import constants as C
from blockmaze_tpu.fields import jfield as jf


def rand_elems(rng, spec, n):
    xs = [rng.randrange(spec.modulus) for _ in range(n - 3)]
    # edge cases
    xs += [0, 1, spec.modulus - 1]
    return xs


@pytest.mark.parametrize("spec", [jf.FR, jf.FQ], ids=["Fr", "Fq"])
class TestField:
    def test_roundtrip(self, rng, spec):
        xs = rand_elems(rng, spec, 32)
        a = jf.to_mont_host(spec, xs)
        back = jf.from_mont_host(spec, a)
        assert back == [x % spec.modulus for x in xs]

    def test_mont_mul(self, rng, spec):
        xs = rand_elems(rng, spec, 64)
        ys = list(reversed(xs))
        a = jf.to_mont_host(spec, xs)
        b = jf.to_mont_host(spec, ys)
        c = jf.mont_mul(spec, a, b)
        got = jf.from_mont_host(spec, np.asarray(c))
        want = [(x * y) % spec.modulus for x, y in zip(xs, ys)]
        assert got == want

    def test_add_sub_neg(self, rng, spec):
        xs = rand_elems(rng, spec, 64)
        ys = list(reversed(xs))
        a = jf.to_mont_host(spec, xs)
        b = jf.to_mont_host(spec, ys)
        p = spec.modulus
        assert jf.from_mont_host(spec, np.asarray(jf.add(spec, a, b))) == [
            (x + y) % p for x, y in zip(xs, ys)
        ]
        assert jf.from_mont_host(spec, np.asarray(jf.sub(spec, a, b))) == [
            (x - y) % p for x, y in zip(xs, ys)
        ]
        assert jf.from_mont_host(spec, np.asarray(jf.neg(spec, a))) == [
            (-x) % p for x in xs
        ]

    def test_pow_inv(self, rng, spec):
        xs = [rng.randrange(1, spec.modulus) for _ in range(8)]
        a = jf.to_mont_host(spec, xs)
        p = spec.modulus
        e = 0xDEADBEEF12345
        got = jf.from_mont_host(spec, np.asarray(jf.pow_fixed(spec, a, e)))
        assert got == [pow(x, e, p) for x in xs]
        got = jf.from_mont_host(spec, np.asarray(jf.inv(spec, a)))
        assert got == [pow(x, -1, p) for x in xs]

    def test_batch_inv(self, rng, spec):
        xs = [rng.randrange(1, spec.modulus) for _ in range(16)]
        xs[3] = 0  # zero passes through
        a = jf.to_mont_host(spec, xs)
        got = jf.from_mont_host(spec, np.asarray(jf.batch_inv(spec, a)))
        want = [pow(x, -1, spec.modulus) if x else 0 for x in xs]
        assert got == want

    def test_to_from_mont_device(self, rng, spec):
        xs = rand_elems(rng, spec, 16)
        raw = jf.ints_to_limbs(xs)
        m = jf.to_mont(spec, raw)
        assert jf.from_mont_host(spec, np.asarray(m)) == xs
        back = jf.from_mont(spec, m)
        assert jf.limbs_to_ints(np.asarray(back)) == xs


def test_montgomery_matches_libsnark_radix():
    """Montgomery residues must be bit-identical to the reference 4x64 layout."""
    assert C.R_MONT == 1 << 256
    assert C.FR_R2 * pow(C.R_MONT, -1, C.R_MOD) % C.R_MOD == C.FR_R
