"""TPU-backend Pippenger parity vs the host-int oracle (advisor r4: the
default CPU suite only exercises the _xla_round driver; the Pallas round
kernel + one-kernel Horner fold were validated solely by e2e oracle logs).

Runs ONLY on a real TPU backend (skipped on the CPU test mesh) and in the
slow tier; BMTPU_EXPORT=0 so the LIVE kernel is tested, not a cached
export artifact:

    BMTPU_SLOW=1 JAX_PLATFORMS=axon python -m pytest tests/test_tpu_msm.py
"""

import os

import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tpu():
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU backend (conftest pins cpu)")
    os.environ["BMTPU_EXPORT"] = "0"
    yield jax
    os.environ.pop("BMTPU_EXPORT", None)


def _host_msm(pts, scalars, curve):
    from blockmaze_tpu.curves import host_curve as HC
    add = HC.g1_add if curve == "g1" else HC.g2_add
    mul = HC.g1_mul if curve == "g1" else HC.g2_mul
    acc = HC.G1_ZERO if curve == "g1" else HC.G2_ZERO
    for p, k in zip(pts, scalars):
        acc = add(acc, mul(p, k))
    return acc


@pytest.mark.parametrize("curve,n,blind", [
    ("g1", 33, False), ("g1", 33, True), ("g2", 16, True)])
def test_pallas_msm_matches_host(tpu, rng, curve, n, blind):
    import jax.numpy as jnp
    import numpy as np
    from blockmaze_tpu.curves import host_curve as HC
    from blockmaze_tpu.curves import jcurve as JC
    from blockmaze_tpu.fields.constants import R_MOD
    from blockmaze_tpu.msm import pippenger as pp

    g = HC.g1_generator() if curve == "g1" else HC.g2_generator()
    mul = HC.g1_mul if curve == "g1" else HC.g2_mul
    pts = [mul(g, rng.randrange(1, R_MOD)) for _ in range(n)]
    if curve == "g1":
        pts[2] = HC.G1_ZERO
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    to_dev = (JC.g1_affine_to_device if curve == "g1"
              else JC.g2_affine_to_device)
    to_host = (JC.g1_jacobian_to_host if curve == "g1"
               else JC.g2_jacobian_to_host)
    X, Y, inf = to_dev(pts)
    dev = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(inf))
    sc = jnp.asarray(pp.scalars_to_device(scalars))
    if blind:
        R_host, (bx, by) = pp.make_blind(curve)
        res = pp.msm(curve, dev, sc, c=8, lanes=4,
                     blind=(jnp.asarray(bx), jnp.asarray(by)))
        got = to_host(tuple(np.asarray(r)[None] for r in res[:3]))[0]
        got = pp.unblind_msm(curve, got, np.asarray(res[3]), R_host, 8)
    else:
        res = pp.msm(curve, dev, sc, c=8, lanes=4)
        got = to_host(tuple(np.asarray(r)[None] for r in res))[0]
    assert got == _host_msm(pts, scalars, curve)
