"""MSM scaling-efficiency harness (BASELINE: >=80% MSM scaling at 2 hosts).

Shards one real-sized MSM (the mint A-query, 2^18 G1 points, or synthetic
points when keys are absent) across 1/2/4/8 mesh devices and prints per-size
wall clock + parallel efficiency.

  python scripts/scaling.py                    # 8 virtual CPU devices
  python scripts/scaling.py --platform axon    # real TPU (1 chip: prints
                                               #   single-chip Mpoints/s)
  python scripts/scaling.py --coordinator h0:1234 --num-processes 2 \
        --process-id $RANK                     # multi-host over DCN

NB on virtual CPU devices the 8 "chips" share this machine's physical cores
(2 here), so wall-clock efficiency beyond n_phys cores measures collective
overhead, not speedup; the number that transfers to a pod slice is the
efficiency at n_dev <= n_phys plus the flat collective cost. Record both.
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="cpu")
parser.add_argument("--n", type=int, default=1 << 18)
parser.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
parser.add_argument("--window", type=int, default=13)
parser.add_argument("--lanes", type=int, default=None)
parser.add_argument("--reps", type=int, default=3)
parser.add_argument("--coordinator", default=None)
parser.add_argument("--num-processes", type=int, default=None)
parser.add_argument("--process-id", type=int, default=None)
args = parser.parse_args()

os.environ.setdefault("JAX_PLATFORMS", args.platform)
if args.platform == "cpu":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count="
                               + str(max(args.devices))).strip()
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", args.platform)
from blockmaze_tpu.utils.cachedirs import setup_caches
setup_caches()

from blockmaze_tpu.parallel import distributed as dist
from blockmaze_tpu.parallel import mesh as pm
from blockmaze_tpu.msm import pippenger as pp
from blockmaze_tpu.fields.constants import R_MOD

IS_DIST = dist.initialize(args.coordinator, args.num_processes,
                          args.process_id)
PID = jax.process_index() if IS_DIST else 0
if args.lanes is None:
    args.lanes = 32768 if jax.default_backend() == "tpu" else 1024


def say(*a):
    if PID == 0:
        print(*a, flush=True)

n = args.n
rng = np.random.RandomState(11)


def load_points():
    """Real mint A-query points when available (first n rows), else a cached
    synthetic multiples-of-g table."""
    pk = os.path.join(ROOT, "reference_harness", "prfKey", "mintpk.txt")
    try:
        from blockmaze_tpu.groth16 import keys
        dpk = keys.load_or_build(pk)
        X, Y, inf = dpk.A
        if X.shape[0] >= n:
            say(f"# points: real mint A-query[:{n}]")
            return X[:n], Y[:n], inf[:n]
    except Exception as e:
        say(f"# mint pk unavailable ({e}); synthetic points")
    cache = f"/root/.cache/bmtpu_synth_{n}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["X"], z["Y"], z["inf"]
    from blockmaze_tpu.curves import host_curve as HC, jcurve as JC
    g = HC.g1_generator()
    pts, p = [], g
    for _ in range(n):
        pts.append(p)
        p = HC.g1_add(p, g)
    X, Y, inf = JC.g1_affine_to_device(pts)
    np.savez(cache, X=X, Y=Y, inf=inf)
    return X, Y, inf


X, Y, inf = load_points()
scalars = pp.scalars_to_device(
    [int.from_bytes(rng.bytes(31), "little") % R_MOD for _ in range(n)])

avail = len(jax.devices())
rows = []
for n_dev in args.devices:
    if n_dev > avail:
        say(f"# skip n_dev={n_dev} (only {avail} devices)")
        continue
    mesh = pm.make_mesh(n_dev)
    if IS_DIST:
        # multi-controller: every process holds the same host data and
        # assembles GLOBAL arrays sharded over the (possibly cross-process)
        # mesh — collectives then ride the distributed runtime (the DCN
        # path on real pods; socket transport on the localhost rehearsal)
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = mesh.axis_names[0]

        def gput(a, spec):
            sh = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(a.shape, sh,
                                                lambda idx: a[idx])

        pts = (gput(X, P(ax, *[None] * (X.ndim - 1))),
               gput(Y, P(ax, *[None] * (Y.ndim - 1))),
               gput(inf, P(ax)))
        sc = gput(scalars, P(ax, None))
    else:
        pts = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(inf))
        sc = jnp.asarray(scalars)

    def run():
        return jax.block_until_ready(pm.sharded_msm(
            mesh, "g1", pts, sc, c=args.window, lanes=args.lanes))

    t0 = time.time()
    res = run()   # compile + first run
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(args.reps):
        res = run()
    dt = (time.time() - t0) / args.reps
    rows.append((n_dev, dt, compile_s))
    mpts = n / dt / 1e6
    base = rows[0][1]
    eff = base / (dt * n_dev / rows[0][0])
    say(f"n_dev={n_dev:2d}  {dt*1e3:9.1f} ms/msm  {mpts:8.3f} Mpoints/s  "
          f"efficiency {eff*100:5.1f}%  (first-run {compile_s:.1f}s)")

out = {
    "metric": "msm_scaling",
    "n": n, "window": args.window, "lanes": args.lanes,
    "backend": jax.default_backend(), "physical_cores": os.cpu_count(),
    "rows": [{"n_dev": d, "sec_per_msm": round(t, 4),
              "mpoints_per_sec": round(n / t / 1e6, 3)} for d, t, _ in rows],
}
say(json.dumps(out))
