"""Pre-warm every circuit's compiled prover graphs (VERDICT r3 #6).

Fresh processes pay trace+lower+compile for the QAP/NTT pipeline and the
four MSM graphs per circuit unless the jax.export artifact cache
(utils/engine_cache.py) and the persistent XLA cache already hold them.
This script populates both for all four circuits (and the depth-20 deposit
key cache when present) by running one deterministic proof each, so that
operator-facing paths (bench.py, scripts/e2e.py, node RPC) hit warm caches:
the reference's analogous fixed cost is its ~20 s pk load
(mintcgo.cpp:300-301); ours is compilation, paid here once per kernel-code
fingerprint instead of per process.

Usage: python scripts/prewarm.py [--platform axon] [--circuits mint,send,..]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="axon")
parser.add_argument("--circuits", default="mint,send,redeem,deposit")
parser.add_argument("--lanes", type=int, default=None)
parser.add_argument("--window", type=int, default=None)
args = parser.parse_args()

os.environ["JAX_PLATFORMS"] = args.platform
import jax

jax.config.update("jax_platforms", args.platform)
from blockmaze_tpu.utils.cachedirs import setup_caches
setup_caches()

from blockmaze_tpu.groth16 import keys
from blockmaze_tpu.groth16.prover import Prover
from witnesses import WITNESS

PRFKEY = os.path.join(ROOT, "reference_harness", "prfKey")

for circ in args.circuits.split(","):
    circ = circ.strip()
    pk = os.path.join(PRFKEY, f"{circ}pk.txt")
    cached = os.path.join(PRFKEY, f"{circ}pk.v{keys.CACHE_VERSION}.npz")
    if not (os.path.exists(pk) or os.path.exists(cached)):
        print(f"[{circ}] SKIP: no keys (run reference_harness/"
              f"run_build_keys.sh)", flush=True)
        continue
    t0 = time.time()
    dpk = keys.load_or_build(pk)
    t1 = time.time()
    pb = WITNESS[circ]()
    prover = Prover(dpk, lanes=args.lanes, window=args.window)
    prover.warmup()
    t2 = time.time()
    prover.prove(pb.primary_input(), pb.auxiliary_input(), r=1, s=2)
    print(f"[{circ}] pk load {t1-t0:.1f}s  warmup {t2-t1:.1f}s  "
          f"first prove {time.time()-t2:.1f}s", flush=True)
print("PREWARM DONE")
