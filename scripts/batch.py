"""Batched multi-proof throughput on a REAL key (BASELINE config 5:
"batched multi-proof throughput across a pod slice"; reference analogue:
per-node process parallelism, test/clique/instructions.txt).

prove_batch vmaps the QAP pipeline and all four MSMs over B independent
witnesses of the same circuit; every proof is verified individually.

Usage: python scripts/batch.py [--circuit mint] [--batch 8] [--platform axon]
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

parser = argparse.ArgumentParser()
parser.add_argument("--circuit", default="mint")
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--platform", default="axon")
parser.add_argument("--lanes", type=int, default=None)
parser.add_argument("--reps", type=int, default=2)
args = parser.parse_args()

os.environ["JAX_PLATFORMS"] = args.platform
import jax

jax.config.update("jax_platforms", args.platform)
from blockmaze_tpu.utils.cachedirs import setup_caches
setup_caches()

from blockmaze_tpu.crypto import notes as NT
from blockmaze_tpu.groth16 import keys, verifier as ver
from blockmaze_tpu.groth16.prover import Prover
from blockmaze_tpu.r1cs.protoboard import Protoboard
from blockmaze_tpu.circuits.mint import MintGadget
from blockmaze_tpu.serialization import libsnark_io as io

PRFKEY = os.path.join(ROOT, "reference_harness", "prfKey")
assert args.circuit == "mint", "batch bench currently drives mint"


def witness(i: int):
    """B distinct mint instances (different values/randomness per slot)."""
    sk = NT.uint256_from_hex("1")
    r_old = NT.uint256_from_hex(f"{123456 + i:x}")
    r = NT.uint256_from_hex(f"{123 + i:x}")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(6 + i, sn_old, r_old)
    note = NT.Note(6 + i + 7, NT.compute_prf(sk, r), r)
    pb = Protoboard()
    MintGadget(pb).generate_witness(note_old, note, note_old.cm(),
                                    note.cm(), 7, sk)
    return pb


t0 = time.time()
dpk = keys.load_or_build(os.path.join(PRFKEY, "mintpk.txt"))
vk = io.load_verification_key(os.path.join(PRFKEY, "mintvk.txt"))
print(f"pk load: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
pbs = [witness(i) for i in range(args.batch)]
instances = [(pb.primary_input(), pb.auxiliary_input()) for pb in pbs]
print(f"witnesses x{args.batch}: {time.time()-t0:.1f}s", flush=True)

prover = Prover(dpk, lanes=args.lanes)
t0 = time.time()
proofs = prover.prove_batch(instances,
                            rs=list(range(1, args.batch + 1)),
                            ss=list(range(51, 51 + args.batch)))
print(f"prove_batch (first, with compile): {time.time()-t0:.1f}s", flush=True)

times = []
for _ in range(args.reps):
    t0 = time.time()
    proofs = prover.prove_batch(instances)
    times.append(time.time() - t0)
    print(f"prove_batch repeat: {times[-1]:.2f}s "
          f"({times[-1]/args.batch:.2f} s/proof)", flush=True)

ok = all(ver.verify(vk, pb.primary_input(), pf)
         for pb, pf in zip(pbs, proofs))
print("all proofs verify:", ok)
assert ok
best = min(times)
print(f"BATCH OK: batch={args.batch} {best:.2f}s total = "
      f"{args.batch/best:.4f} proofs/s (single-proof baseline CPU mint "
      f"0.1329/s)")
