"""End-to-end bit-exactness gate, all four circuits: prove on this stack,
verify with our pairing verifier AND with the UNMODIFIED reference verifier
(reference_harness/build/oracle*, compiled from /root/reference sources).

Mirrors the reference's own acceptance surface: verifyMintproof
(libsnark-vnt/src/mint/mintcgo.cpp:323-418), verifySendproof
(src/send/sendcgo.cpp), verifyDepositproof (src/deposit/depositcgo.cpp),
verifyRedeemproof (src/redeem/redeemcgo.cpp).

Usage: python scripts/e2e.py [circuits...] [--platform cpu|axon]
                             [--lanes N] [--window C] [--repeat N]
       (default: mint send redeem deposit)
"""

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("circuits", nargs="*",
                    default=["mint", "send", "redeem", "deposit"])
parser.add_argument("--platform", default="cpu")
parser.add_argument("--lanes", type=int, default=None,
                    help="MSM lanes (default: 32768 on TPU backends — the "
                    "bench-tuned value — else 2048)")
parser.add_argument("--window", type=int, default=None)
parser.add_argument("--repeat", type=int, default=1)
args = parser.parse_args()

os.environ["JAX_PLATFORMS"] = args.platform
import jax

jax.config.update("jax_platforms", args.platform)
if args.lanes is None:
    args.lanes = 2048 if args.platform == "cpu" else 32768
from blockmaze_tpu.utils.cachedirs import setup_caches
setup_caches()

from blockmaze_tpu.groth16 import keys
from blockmaze_tpu.groth16.prover import Prover
from blockmaze_tpu.groth16 import verifier as ver
from blockmaze_tpu.serialization import libsnark_io as io
from witnesses import WITNESS

ROOT = os.path.join(os.path.dirname(__file__), "..")
PRFKEY = os.path.join(ROOT, "reference_harness", "prfKey")
ORACLE = {"mint": "oracle", "send": "oracle_send", "redeem": "oracle_redeem",
          "deposit": "oracle_deposit"}



failures = []
for circ in args.circuits:
    print(f"===== {circ} =====")
    t0 = time.time()
    dpk = keys.load_or_build(os.path.join(PRFKEY, f"{circ}pk.txt"))
    print(f"  pk load: {time.time()-t0:.1f}s  n={dpk.num_variables} "
          f"m={dpk.domain_size}")

    # load the vk BEFORE proving: a missing/corrupt vk must fail fast, not
    # after a multi-minute prove (getpvk.cpp writes pk then vk — a partial
    # keygen leaves pk without vk)
    vk = io.load_verification_key(os.path.join(PRFKEY, f"{circ}vk.txt"))

    t0 = time.time()
    pb = WITNESS[circ]()
    primary, aux = pb.primary_input(), pb.auxiliary_input()
    print(f"  witness: {time.time()-t0:.2f}s")

    prover = Prover(dpk, lanes=args.lanes, window=args.window)
    t0 = time.time()
    proof = prover.prove(primary, aux, r=12345, s=67890)
    print(f"  prove (first, with compile): {time.time()-t0:.1f}s")
    for _ in range(args.repeat - 1):
        t0 = time.time()
        proof = prover.prove(primary, aux)
        print(f"  prove repeat: {time.time()-t0:.2f}s")

    t0 = time.time()
    ours = ver.verify(vk, primary, proof)
    print(f"  our verifier: {ours} ({time.time()-t0:.3f}s)")

    io.write_proof(f"/tmp/our_{circ}_proof.txt", proof)
    io.write_primary_input(f"/tmp/our_{circ}_primary.txt", primary)
    res = subprocess.run(
        [os.path.join(ROOT, "reference_harness", "build", ORACLE[circ]),
         "verify", os.path.join(PRFKEY, f"{circ}vk.txt"),
         f"/tmp/our_{circ}_proof.txt", f"/tmp/our_{circ}_primary.txt"],
        capture_output=True, text=True)
    oracle_ok = "VERIFY_OK" in res.stdout
    print("  reference oracle:",
          res.stdout.strip().splitlines()[-1] if res.stdout else res.stderr)
    if not (ours and oracle_ok):
        failures.append(circ)

if failures:
    print("E2E FAILED:", ", ".join(failures))
    sys.exit(1)
print(f"E2E OK: {len(args.circuits)}/4 circuits prove on this stack and "
      "verify under the unmodified reference verifier")
