"""Multi-chip sharding for the proving stack (jax.sharding + shard_map).

The reference parallelises with OpenMP threads inside one process
(multiexp.tcc:421, basic_radix2_domain_aux.tcc:83). The TPU-native design
shards over a device Mesh instead (SURVEY.md §2.3):

  axis "pts"   — MSM (point, scalar) pairs are sharded per chip; every chip
                 runs the full Pippenger kernel on its slice, producing one
                 partial group element; partials are all-gathered over ICI
                 (tiny: one Jacobian point each) and folded.
  axis "batch" — independent proofs (witnesses) are data-parallel.

Field-element reductions across chips ride psum on the lazy limb
representation: uint32 limb sums are linear, so psum + canon_wide is an exact
field addition collective (no bespoke transport — XLA collectives over ICI).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def smap(f, mesh, in_specs, out_specs):
    """shard_map across jax versions (jax.shard_map keyword-only API)."""
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)

from ..curves import jcurve as jc
from ..fields import jfield as jf
from ..msm import pippenger as pp


def make_mesh(n_devices: int | None = None, axis: str = "pts") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def sharded_msm(mesh: Mesh, curve: str, points, scalars, c: int = 13,
                lanes: int = 1024, blind=None):
    """MSM with (point, scalar) pairs sharded across the mesh's `pts` axis.

    Each device reduces its shard with the single-chip Pippenger kernel; the
    per-device partial sums (one Jacobian point each) are all-gathered over
    ICI and folded with log2(n) point additions.

    blind: optional replicated (Rx, Ry) blind point (pippenger.msm). Every
    device seeds with the same R; the per-device blind weights are
    all-gathered and returned as (n_dev, W) so the caller's unblind_msm sums
    them exactly. Return becomes a 4-tuple."""
    F = jc.FqOps if curve == "g1" else jc.Fq2Ops
    coord = P("pts") if curve == "g1" else P("pts")
    pspec = (coord, coord, P("pts"))
    sspec = P("pts")

    def _fold(part):
        # gather all partials: (n_dev, ...) on every device
        gx = jax.lax.all_gather(part[0], "pts")
        gy = jax.lax.all_gather(part[1], "pts")
        gz = jax.lax.all_gather(part[2], "pts")
        n_dev = gx.shape[0]

        # fold with a rolled loop: ONE point_add instance in the graph
        # (a Python loop would inline n_dev-1 copies and multiply compile
        # time, the resource the multichip dryrun is budgeted on)
        def fold(i, acc):
            Q = (jnp.take(gx, i, axis=0), jnp.take(gy, i, axis=0),
                 jnp.take(gz, i, axis=0))
            return jc.point_add(F, acc, Q)

        return jax.lax.fori_loop(1, n_dev, fold, (gx[0], gy[0], gz[0]))

    if blind is None:
        def run_body(pts, sc):
            return _fold(pp.msm_auto(curve, pts, sc, c=c, lanes=lanes))

        run = smap(run_body, mesh, (pspec, sspec),
                   (P(None), P(None), P(None)))
        return run(points, scalars)

    bspec = (P(*[None] * (blind[0].ndim)), P(*[None] * (blind[1].ndim)))

    def run_body_b(pts, sc, bl):
        part = pp.msm_auto(curve, pts, sc, c=c, lanes=lanes, blind=bl)
        folded = _fold(part[:3])
        wts = jax.lax.all_gather(part[3], "pts")      # (n_dev, W)
        return folded + (wts,)

    run = smap(run_body_b, mesh, (pspec, sspec, bspec),
               (P(None), P(None), P(None), P(None)))
    return run(points, scalars, blind)


def sharded_field_inner_sum(mesh: Mesh, terms_mont):
    """Σ_i terms_i across a sharded axis: per-device lazy limb sums, psum over
    ICI, one canonical reduction. Demonstrates the linear-collective trick
    used by the sharded QAP matvec."""

    def run_body(t):
        local = jnp.sum(t.astype(jnp.uint32), axis=0)  # lazy limb sum
        total = jax.lax.psum(local, "pts")
        return jf.canon_wide(jf.FR, total)

    run = smap(run_body, mesh, P("pts"), P(None))
    return run(terms_mont)
