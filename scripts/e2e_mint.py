"""End-to-end slice: mint proof on the JAX stack, verified bit-exactly by the
unmodified reference verifier via the oracle binary (and by our own verifier).

Usage: python scripts/e2e_mint.py [--platform cpu|axon] [--lanes N] [--window C]
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="cpu")
parser.add_argument("--lanes", type=int, default=2048)
parser.add_argument("--window", type=int, default=None)
parser.add_argument("--repeat", type=int, default=1)
args = parser.parse_args()

os.environ["JAX_PLATFORMS"] = args.platform
import jax

jax.config.update("jax_platforms", args.platform)
os.makedirs("/root/.cache/bmtpu_xla", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/bmtpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from blockmaze_tpu.crypto import notes as NT
from blockmaze_tpu.r1cs.protoboard import Protoboard
from blockmaze_tpu.circuits.mint import MintGadget
from blockmaze_tpu.groth16 import keys
from blockmaze_tpu.groth16.prover import Prover
from blockmaze_tpu.groth16 import verifier as ver
from blockmaze_tpu.serialization import libsnark_io as io

ROOT = os.path.join(os.path.dirname(__file__), "..")
PRFKEY = os.path.join(ROOT, "reference_harness", "prfKey")

print("== loading device pk (npz cache)")
t0 = time.time()
dpk = keys.load_or_build(os.path.join(PRFKEY, "mintpk.txt"))
print(f"   {time.time()-t0:.1f}s; n={dpk.num_variables} m={dpk.domain_size}")

print("== building witness")
t0 = time.time()
sk = NT.uint256_from_hex("1")
r_old = NT.uint256_from_hex("123456")
r = NT.uint256_from_hex("123")
sn_old = NT.compute_prf(sk, r_old)
note_old = NT.Note(6, sn_old, r_old)
sn = NT.compute_prf(sk, r)
note = NT.Note(13, sn, r)
pb = Protoboard()
g = MintGadget(pb)
g.generate_witness(note_old, note, note_old.cm(), note.cm(), 7, sk)
primary, aux = pb.primary_input(), pb.auxiliary_input()
print(f"   {time.time()-t0:.2f}s")

print("== proving (compile + run)")
prover = Prover(dpk, lanes=args.lanes, window=args.window)
t0 = time.time()
proof = prover.prove(primary, aux, r=12345, s=67890)
print(f"   first (with compile): {time.time()-t0:.1f}s")
for _ in range(args.repeat - 1):
    t0 = time.time()
    proof = prover.prove(primary, aux)
    print(f"   repeat: {time.time()-t0:.2f}s")

print("== verifying with our pairing verifier")
vk = io.load_verification_key(os.path.join(PRFKEY, "mintvk.txt"))
t0 = time.time()
ok = ver.verify(vk, primary, proof)
print(f"   our verifier: {ok} ({time.time()-t0:.3f}s)")

print("== verifying with the reference oracle")
io.write_proof("/tmp/our_mint_proof.txt", proof)
io.write_primary_input("/tmp/our_mint_primary.txt", primary)
res = subprocess.run(
    [os.path.join(ROOT, "reference_harness", "build", "oracle"), "verify",
     os.path.join(PRFKEY, "mintvk.txt"),
     "/tmp/our_mint_proof.txt", "/tmp/our_mint_primary.txt"],
    capture_output=True, text=True)
print("   oracle:", res.stdout.strip().splitlines()[-1] if res.stdout else res.stderr)
assert ok, "our verifier rejected"
assert "VERIFY_OK" in res.stdout, "reference verifier rejected"
print("E2E OK")
