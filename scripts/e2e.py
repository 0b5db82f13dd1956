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
os.makedirs("/root/.cache/bmtpu_xla", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/bmtpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from blockmaze_tpu.crypto import notes as NT
from blockmaze_tpu.merkle import incremental as MK
from blockmaze_tpu.r1cs.protoboard import Protoboard
from blockmaze_tpu.circuits.mint import MintGadget
from blockmaze_tpu.circuits.send import SendGadget
from blockmaze_tpu.circuits.redeem import RedeemGadget
from blockmaze_tpu.circuits.deposit import DepositGadget
from blockmaze_tpu.groth16 import keys
from blockmaze_tpu.groth16.prover import Prover
from blockmaze_tpu.groth16 import verifier as ver
from blockmaze_tpu.serialization import libsnark_io as io

ROOT = os.path.join(os.path.dirname(__file__), "..")
PRFKEY = os.path.join(ROOT, "reference_harness", "prfKey")
ORACLE = {"mint": "oracle", "send": "oracle_send", "redeem": "oracle_redeem",
          "deposit": "oracle_deposit"}


def _u256(h):
    return NT.uint256_from_hex(h)


def witness_mint():
    sk, r_old, r = _u256("1"), _u256("123456"), _u256("123")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(6, sn_old, r_old)
    note = NT.Note(13, NT.compute_prf(sk, r), r)
    pb = Protoboard()
    MintGadget(pb).generate_witness(note_old, note, note_old.cm(), note.cm(),
                                    7, sk)
    return pb


def witness_send():
    sk, r_old, r = _u256("1"), _u256("123456"), _u256("12")
    pk_sender = int("456", 16).to_bytes(20, "little")
    pk_recv = int("123", 16).to_bytes(20, "little")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(10, sn_old, r_old)
    note = NT.Note(4, NT.compute_prf(sk, r), r)
    note_s = NT.NoteS(6, pk_recv, NT.compute_crh(pk_sender, r), sn_old)
    pb = Protoboard()
    SendGadget(pb).generate_witness(note_old, note_s, note, note_old.cm(),
                                    note_s.cm(), note.cm(), sk, pk_sender)
    return pb


def witness_redeem():
    sk, r_old, r = _u256("1"), _u256("123456"), _u256("123")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(13, sn_old, r_old)
    note = NT.Note(6, NT.compute_prf(sk, r), r)
    pb = Protoboard()
    RedeemGadget(pb).generate_witness(note_old, note, note_old.cm(),
                                      note.cm(), 7, sk)
    return pb


def witness_deposit():
    sk = _u256("1")
    r_old, r, r_s = _u256("123456"), _u256("12"), _u256("123")
    pk_recv = int("123", 16).to_bytes(20, "little")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(255, sn_old, r_old)
    note_s = NT.NoteS(9, pk_recv, r_s, _u256("123"))
    note = NT.Note(264, NT.compute_prf(sk, r), r)
    sn_s = NT.compute_prf(sk, r_s)
    cmtS = note_s.cm()
    leaf_index = 9
    leaves = [cmtS if i == leaf_index else _u256(str(i + 1))
              for i in range(16)]
    tree = MK.IncrementalMerkleTree()
    wit = None
    for i, leaf in enumerate(leaves):
        if wit is not None:
            wit.append(leaf)
        else:
            tree.append(leaf)
        if i == leaf_index:
            wit = tree.witness()
    pb = Protoboard()
    DepositGadget(pb).generate_witness(
        note_s, note_old, note, cmtS, note_old.cm(), note.cm(),
        wit.root(), wit.path(), sn_s, sk)
    return pb


WITNESS = {"mint": witness_mint, "send": witness_send,
           "redeem": witness_redeem, "deposit": witness_deposit}

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
