"""sharded_msm + msm_compact coverage on the 8-device CPU mesh.

VERDICT r1: `sharded_msm` (parallel/mesh.py) had zero test coverage and its
only exerciser — the multichip dryrun — timed out. These tests pin both the
sharded collective structure (shard_map + all_gather + rolled fold) and the
compact double-and-add kernel it dispatches to on CPU backends against the
host-int oracle. Reference analog: the OpenMP-chunked multi_exp driver
(multiexp.tcc:421) whose per-thread partials are summed serially.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockmaze_tpu.curves import host_curve as HC
from blockmaze_tpu.curves import jcurve as JC
from blockmaze_tpu.fields.constants import R_MOD
from blockmaze_tpu.msm import pippenger as pp
from blockmaze_tpu.parallel import mesh as pmesh


def _instance(rng, n, curve="g1"):
    if curve == "g1":
        g = HC.g1_generator()
        pts = [HC.g1_mul(g, rng.randrange(1, R_MOD)) for _ in range(n)]
        pts[min(2, n - 1)] = HC.G1_ZERO
        to_dev = JC.g1_affine_to_device
    else:
        g = HC.g2_generator()
        pts = [HC.g2_mul(g, rng.randrange(1, R_MOD)) for _ in range(n)]
        to_dev = JC.g2_affine_to_device
    scalars = [rng.randrange(R_MOD) for _ in range(n)]
    scalars[0] = 0
    scalars[min(1, n - 1)] = 1
    X, Y, inf = to_dev(pts)
    return pts, scalars, (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(inf))


def _host_msm(pts, scalars, curve="g1"):
    add = HC.g1_add if curve == "g1" else HC.g2_add
    mul = HC.g1_mul if curve == "g1" else HC.g2_mul
    acc = HC.G1_ZERO if curve == "g1" else HC.G2_ZERO
    for p, k in zip(pts, scalars):
        acc = add(acc, mul(p, k))
    return acc


def test_msm_compact_g1(rng):
    pts, scalars, dev = _instance(rng, 23)
    res = pp.msm_compact("g1", dev,
                         jnp.asarray(pp.scalars_to_device(scalars)))
    got = JC.g1_jacobian_to_host(tuple(r[None] for r in res))[0]
    assert got == _host_msm(pts, scalars)


def test_msm_compact_g2(rng):
    pts, scalars, dev = _instance(rng, 9, "g2")
    res = pp.msm_compact("g2", dev,
                         jnp.asarray(pp.scalars_to_device(scalars)))
    got = JC.g2_jacobian_to_host(tuple(r[None] for r in res))[0]
    assert got == _host_msm(pts, scalars, "g2")


def test_sharded_msm_8dev(rng):
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest pins 8 virtual CPU devices"
    mesh = pmesh.make_mesh(8)
    n = 8 * 4
    pts, scalars, dev = _instance(rng, n)
    res = pmesh.sharded_msm(mesh, "g1", dev,
                            jnp.asarray(pp.scalars_to_device(scalars)),
                            c=8, lanes=4)
    got = JC.g1_jacobian_to_host(tuple(np.asarray(r)[None] for r in res))[0]
    assert got == _host_msm(pts, scalars)


def test_sharded_msm_blinded_8dev(rng):
    """The bspec branch of parallel.mesh.sharded_msm (r4 advisor: untested):
    replicated blind point + all-gathered per-device weights. On the CPU
    mesh msm_auto dispatches to the compact kernel, which needs no blinding
    and reports zero weights — the collective structure (blind in_specs,
    (n_dev, W) weight gather, unblind_msm summation) is still exercised."""
    mesh = pmesh.make_mesh(8)
    n = 8 * 3
    pts, scalars, dev = _instance(rng, n)
    R_host, (bx, by) = pp.make_blind("g1")
    res = pmesh.sharded_msm(mesh, "g1", dev,
                            jnp.asarray(pp.scalars_to_device(scalars)),
                            c=8, lanes=4,
                            blind=(jnp.asarray(bx), jnp.asarray(by)))
    assert len(res) == 4
    wts = np.asarray(res[3])
    assert wts.shape[0] == 8  # per-device weight rows gathered
    got = JC.g1_jacobian_to_host(tuple(np.asarray(r)[None]
                                       for r in res[:3]))[0]
    got = pp.unblind_msm("g1", got, wts, R_host, 8)
    assert got == _host_msm(pts, scalars)


def test_sharded_field_inner_sum(rng):
    from blockmaze_tpu.fields import jfield as jf
    mesh = pmesh.make_mesh(8)
    vals = [rng.randrange(R_MOD) for _ in range(64)]
    terms = jnp.asarray(jf.to_mont_host(jf.FR, vals))
    tot = pmesh.sharded_field_inner_sum(mesh, terms)
    got = jf.from_mont_host(jf.FR, np.asarray(tot)[None])[0]
    assert got == sum(vals) % R_MOD
