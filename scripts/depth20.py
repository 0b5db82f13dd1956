"""Depth-20 deposit end-to-end: OWN-STACK keygen (groth16/generator.py, incl.
the swap-AB column heuristic) -> TPU prove -> our pairing verifier -> the
UNMODIFIED reference verifier (oracle_deposit), using our libsnark-format vk
serialization.

Depth 20 is the production Merkle depth (VNT.h:7
INCREMENTAL_MERKLE_TREE_DEPTH_TESTING; zktx.go:74 "in practical ... 20");
the reference repo never ships depth-20 keys, so this config exercises our
own trusted setup at ~2^20 domain scale.

Keys are cached under reference_harness/prfKey/ as deposit20pk.v*.npz +
deposit20vk.txt; delete them to re-run the setup.

Usage: python scripts/depth20.py [--platform axon] [--reps N]
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="axon")
parser.add_argument("--lanes", type=int, default=None)
parser.add_argument("--window", type=int, default=None)
parser.add_argument("--reps", type=int, default=2)
args = parser.parse_args()

os.environ["JAX_PLATFORMS"] = args.platform
import jax

jax.config.update("jax_platforms", args.platform)
from blockmaze_tpu.utils.cachedirs import setup_caches
setup_caches()

from blockmaze_tpu.crypto import notes as NT
from blockmaze_tpu.merkle import incremental as MK
from blockmaze_tpu.r1cs.protoboard import Protoboard
from blockmaze_tpu.circuits.deposit import DepositGadget
from blockmaze_tpu.groth16 import generator, keys, verifier as ver
from blockmaze_tpu.groth16.prover import Prover
from blockmaze_tpu.serialization import libsnark_io as io

DEPTH = 20
PRFKEY = os.path.join(ROOT, "reference_harness", "prfKey")
NPZ = os.path.join(PRFKEY, f"deposit20pk.v{keys.CACHE_VERSION}.npz")
VK = os.path.join(PRFKEY, "deposit20vk.txt")


def _u256(s):
    return NT.uint256_from_hex(s)


def build_witness():
    sk = _u256("1")
    r_old, r, r_s = _u256("123456"), _u256("12"), _u256("123")
    pk_recv = int("123", 16).to_bytes(20, "little")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(255, sn_old, r_old)
    note_s = NT.NoteS(9, pk_recv, r_s, _u256("123"))
    note = NT.Note(264, NT.compute_prf(sk, r), r)
    sn_s = NT.compute_prf(sk, r_s)
    cmtS = note_s.cm()
    leaf_index = 5
    leaves = [cmtS if i == leaf_index else _u256(str(i + 1))
              for i in range(11)]
    tree = MK.IncrementalMerkleTree(DEPTH)
    wit = None
    for i, leaf in enumerate(leaves):
        if wit is not None:
            wit.append(leaf)
        else:
            tree.append(leaf)
        if i == leaf_index:
            wit = tree.witness()
    pb = Protoboard()
    DepositGadget(pb, depth=DEPTH).generate_witness(
        note_s, note_old, note, cmtS, note_old.cm(), note.cm(),
        wit.root(), wit.path(), sn_s, sk)
    return pb


t0 = time.time()
pb = build_witness()
print(f"witness (depth {DEPTH}): {time.time()-t0:.1f}s  "
      f"constraints={len(pb.constraints)}", flush=True)

if os.path.exists(NPZ) and os.path.exists(VK):
    t0 = time.time()
    dpk = keys.load_device_pk(NPZ)
    vk = io.load_verification_key(VK)
    print(f"keys loaded from cache: {time.time()-t0:.1f}s", flush=True)
else:
    t0 = time.time()
    pk, vk = generator.generate(pb)
    print(f"KEYGEN (own stack): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    dpk = keys.build_device_pk(pk)
    keys.save_device_pk(dpk, NPZ)
    io.write_verification_key(VK, vk)
    print(f"device pk build+cache: {time.time()-t0:.1f}s", flush=True)

prover = Prover(dpk, lanes=args.lanes, window=args.window)
t0 = time.time()
proof = prover.prove(pb.primary_input(), pb.auxiliary_input(), r=1, s=2)
print(f"prove (first, with compile): {time.time()-t0:.1f}s", flush=True)
times = []
for i in range(args.reps):
    t0 = time.time()
    proof = prover.prove(pb.primary_input(), pb.auxiliary_input())
    times.append(time.time() - t0)
    print(f"prove repeat: {times[-1]:.2f}s", flush=True)

ok = ver.verify(vk, pb.primary_input(), proof)
print("our pairing verifier:", ok)

io.write_proof("/tmp/our_d20_proof.txt", proof)
io.write_primary_input("/tmp/our_d20_primary.txt", pb.primary_input())
res = subprocess.run(
    [os.path.join(ROOT, "reference_harness", "build", "oracle_deposit"),
     "verify", VK, "/tmp/our_d20_proof.txt", "/tmp/our_d20_primary.txt"],
    capture_output=True, text=True)
print("reference oracle:",
      res.stdout.strip().splitlines()[-1] if res.stdout else res.stderr)
assert ok and "VERIFY_OK" in res.stdout
if times:
    best = min(times)
    print(f"DEPTH20 OK: {best:.2f} s/proof = {1/best:.4f} proofs/s "
          f"(reference has no depth-20 baseline; depth-8 CPU = 0.0370)")
