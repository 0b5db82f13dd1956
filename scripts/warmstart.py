"""Fresh-process warm-start profile: where does the first prove go?

Breaks the reference's "pk load ~20 s" analogue (mintcgo.cpp:300-301) into
phases: backend init, pk npz load+parse, Prover device transfer, export
artifact deserialize, XLA executable compile/cache-load, first execute,
steady-state prove. Run in a FRESH process per circuit:

    python scripts/warmstart.py mint [--platform axon]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

parser = argparse.ArgumentParser()
parser.add_argument("circuit", nargs="?", default="mint")
parser.add_argument("--platform", default="axon")
parser.add_argument("--lanes", type=int, default=None)
parser.add_argument("--window", type=int, default=None)
parser.add_argument("--no-warmup", action="store_true",
                    help="skip the parallel warmup (serial baseline)")
args = parser.parse_args()

os.environ["JAX_PLATFORMS"] = args.platform
os.environ["BMTPU_VERBOSE"] = "1"

T0 = time.time()
mark = [T0]


def t(label):
    now = time.time()
    print(f"[warmstart] {label}: {now - mark[0]:.2f}s  (t+{now - T0:.1f}s)",
          flush=True)
    mark[0] = now


import jax  # noqa: E402

jax.config.update("jax_platforms", args.platform)
from blockmaze_tpu.utils.cachedirs import setup_caches  # noqa: E402

setup_caches()
jax.devices()
t("backend init")

from blockmaze_tpu.groth16 import keys  # noqa: E402
from blockmaze_tpu.groth16.prover import Prover  # noqa: E402

pk_path = os.path.join(ROOT, "reference_harness", "prfKey",
                       f"{args.circuit}pk.txt")
dpk = keys.load_or_build(pk_path)
t("pk load (npz or parse)")

prover = Prover(dpk, lanes=args.lanes, window=args.window)
t("Prover init (device transfer)")

if not args.no_warmup:
    prover.warmup()
    t("parallel warmup")

sys.path.insert(0, os.path.join(ROOT, "scripts"))
from witnesses import WITNESS  # noqa: E402

pb = WITNESS[args.circuit]()
t("witness build")

primary, aux = pb.primary_input(), pb.auxiliary_input()
proof = prover.prove(primary, aux, r=1, s=2)
t("FIRST prove (compile/cache-load + execute)")

proof = prover.prove(primary, aux, r=3, s=5)
t("second prove")

proof = prover.prove(primary, aux, r=4, s=6)
t("third prove")
print(f"[warmstart] TOTAL: {time.time() - T0:.1f}s")
