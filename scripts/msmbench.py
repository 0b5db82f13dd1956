"""MSM microbenchmark: per-phase wall clock + Mpoints/s for the Pippenger
kernel at real prover sizes (deposit A-query = 2^19 G1, B-query G2, ...).

Separately times the three phases of msm/pippenger.py so optimization is not
flying blind (VERDICT r2 weak #1):

  sort      — digit extraction, key argsort, packed stream gather
  loop      — tiled segmented reduction (the mixed-add stream)
  combine   — boundary scan + triangle/window fold

Usage: python scripts/msmbench.py [--platform axon] [--n 19] [--curve g1]
                                  [--window 13] [--lanes 32768] [--reps 3]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="axon")
parser.add_argument("--n", type=int, default=19, help="log2 point count")
parser.add_argument("--curve", default="g1")
parser.add_argument("--window", type=int, default=13)
parser.add_argument("--lanes", type=int, default=32768)
parser.add_argument("--reps", type=int, default=3)
parser.add_argument("--phases", action="store_true",
                    help="time sort/loop/combine separately")
args = parser.parse_args()

os.environ["JAX_PLATFORMS"] = args.platform
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", args.platform)
from blockmaze_tpu.utils.cachedirs import setup_caches
setup_caches()

from blockmaze_tpu.curves import host_curve as HC
from blockmaze_tpu.curves import jcurve as JC
from blockmaze_tpu.fields.constants import R_MOD
from blockmaze_tpu.msm import pippenger as pp


def synth_points(n, curve):
    """n points tiled from 64 distinct multiples of the generator (timing is
    data-independent: the kernels are branchless)."""
    base = 64
    g = HC.g1_generator() if curve == "g1" else HC.g2_generator()
    add = HC.g1_add if curve == "g1" else HC.g2_add
    pts, p = [], g
    for _ in range(base):
        pts.append(p)
        p = add(p, g)
    conv = (JC.g1_affine_to_device if curve == "g1"
            else JC.g2_affine_to_device)
    X, Y, inf = conv(pts)
    reps = -(-n // base)
    X = np.tile(X, (reps,) + (1,) * (X.ndim - 1))[:n]
    Y = np.tile(Y, (reps,) + (1,) * (Y.ndim - 1))[:n]
    inf = np.tile(inf, reps)[:n]
    return jnp.asarray(X), jnp.asarray(Y), jnp.asarray(inf)


def main():
    n = 1 << args.n
    curve = args.curve
    pts = synth_points(n, curve)
    rng = np.random.RandomState(5)
    sc = jnp.asarray(pp.scalars_to_device(
        [int.from_bytes(rng.bytes(31), "little") % R_MOD for _ in range(n)]))

    fn = jax.jit(lambda p, s: pp.msm(curve, p, s, c=args.window,
                                     lanes=args.lanes))

    def sync(out):
        # block_until_ready returns before execution completes on the axon
        # tunnel backend; a tiny device->host transfer forces completion
        np.asarray(jax.tree.leaves(out)[0].reshape(-1)[:1])

    t0 = time.time()
    sync(fn(pts, sc))
    compile_s = time.time() - t0
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        sync(fn(pts, sc))
        times.append(time.time() - t0)
    best = min(times)
    print(f"msm {curve} n=2^{args.n} c={args.window} lanes={args.lanes}: "
          f"compile {compile_s:.1f}s  best {best*1e3:.1f}ms  "
          f"{n/best/1e6:.2f} Mpoints/s")

    if args.phases:
        _phase_timings(curve, pts, sc, n)


def _phase_timings(curve, pts, sc, n):
    """Split timing through the module's OWN sort-phase front end
    (pp.stream_keys) so the benchmark cannot drift from the kernel."""
    c, lanes = args.window, args.lanes

    @jax.jit
    def phase_sort(points, scalars):
        P, skeys, spid, DROP = pp.stream_keys(curve, points, scalars, c)
        stream = jnp.take(P, spid, axis=0)
        return skeys, stream

    t0 = time.time()
    out = jax.block_until_ready(phase_sort(pts, sc))
    comp = time.time() - t0
    best = 1e9
    for _ in range(args.reps):
        t0 = time.time()
        out = jax.block_until_ready(phase_sort(pts, sc))
        best = min(best, time.time() - t0)
    print(f"  sort+gather: compile {comp:.1f}s  best {best*1e3:.1f}ms")

    # the loop+combine share one jit in msm(); estimate loop = total - sort
    fn = jax.jit(lambda p, s: pp.msm(curve, p, s, c=c, lanes=lanes))
    jax.block_until_ready(fn(pts, sc))
    t0 = time.time()
    jax.block_until_ready(fn(pts, sc))
    total = time.time() - t0
    print(f"  total {total*1e3:.1f}ms  => loop+combine ~"
          f"{(total-best)*1e3:.1f}ms")


if __name__ == "__main__":
    main()
