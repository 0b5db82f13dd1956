"""JAX curve ops vs host-int oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from blockmaze_tpu.curves import host_curve as HC
from blockmaze_tpu.curves import jcurve as JC
from blockmaze_tpu.fields.constants import R_MOD


def host_g1_batch(rng, n):
    g = HC.g1_generator()
    pts = [HC.g1_mul(g, rng.randrange(1, R_MOD)) for _ in range(n - 1)]
    pts.append(HC.G1_ZERO)
    return pts


def host_g2_batch(rng, n):
    g = HC.g2_generator()
    pts = [HC.g2_mul(g, rng.randrange(1, R_MOD)) for _ in range(n - 1)]
    pts.append(HC.G2_ZERO)
    return pts


def to_jac_g1(pts):
    X, Y, inf = JC.g1_affine_to_device(pts)
    F = JC.FqOps
    Z = np.where(inf[:, None], np.zeros_like(X), np.array(JC.FQ.one_mont)[None, :])
    Y = np.where(inf[:, None], np.array(JC.FQ.one_mont)[None, :], Y)
    return (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))


def to_jac_g2(pts):
    X, Y, inf = JC.g2_affine_to_device(pts)
    one = np.zeros((2, 16), np.uint32)
    one[0] = np.array(JC.FQ.one_mont)
    Z = np.where(inf[:, None, None], np.zeros_like(X), one[None])
    Y = np.where(inf[:, None, None], one[None], Y)
    return (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))


class TestG1:
    def test_add(self, rng):
        n = 16
        P = host_g1_batch(rng, n)
        Q = list(reversed(host_g1_batch(rng, n)))
        got = JC.g1_jacobian_to_host(JC.point_add(JC.FqOps, to_jac_g1(P), to_jac_g1(Q)))
        want = [HC.g1_add(p, q) for p, q in zip(P, Q)]
        assert got == want

    def test_add_edge_cases(self, rng):
        g = HC.g1_generator()
        p = HC.g1_mul(g, 12345)
        cases_p = [p, p, p, HC.G1_ZERO, HC.G1_ZERO]
        cases_q = [p, HC.g1_neg(p), HC.G1_ZERO, p, HC.G1_ZERO]
        got = JC.g1_jacobian_to_host(
            JC.point_add(JC.FqOps, to_jac_g1(cases_p), to_jac_g1(cases_q)))
        want = [HC.g1_add(a, b) for a, b in zip(cases_p, cases_q)]
        assert got == want

    def test_double(self, rng):
        P = host_g1_batch(rng, 8)
        got = JC.g1_jacobian_to_host(JC.point_double(JC.FqOps, to_jac_g1(P)))
        want = [HC.g1_add(p, p) for p in P]
        assert got == want

    def test_mixed_add(self, rng):
        n = 12
        P = host_g1_batch(rng, n)
        Q = list(reversed(host_g1_batch(rng, n)))
        Qx, Qy, qinf = JC.g1_affine_to_device(Q)
        got = JC.g1_jacobian_to_host(JC.point_mixed_add(
            JC.FqOps, to_jac_g1(P), jnp.asarray(Qx), jnp.asarray(Qy),
            jnp.asarray(qinf)))
        want = [HC.g1_add(p, q) for p, q in zip(P, Q)]
        assert got == want


class TestG2:
    def test_add(self, rng):
        n = 8
        P = host_g2_batch(rng, n)
        Q = list(reversed(host_g2_batch(rng, n)))
        got = JC.g2_jacobian_to_host(JC.point_add(JC.Fq2Ops, to_jac_g2(P), to_jac_g2(Q)))
        want = [HC.g2_add(p, q) for p, q in zip(P, Q)]
        assert got == want

    def test_mixed_add_and_double(self, rng):
        n = 8
        P = host_g2_batch(rng, n)
        Q = list(reversed(host_g2_batch(rng, n)))
        Qx, Qy, qinf = JC.g2_affine_to_device(Q)
        got = JC.g2_jacobian_to_host(JC.point_mixed_add(
            JC.Fq2Ops, to_jac_g2(P), jnp.asarray(Qx), jnp.asarray(Qy),
            jnp.asarray(qinf)))
        want = [HC.g2_add(p, q) for p, q in zip(P, Q)]
        assert got == want
        got = JC.g2_jacobian_to_host(JC.point_double(JC.Fq2Ops, to_jac_g2(P)))
        want = [HC.g2_add(p, p) for p in P]
        assert got == want
