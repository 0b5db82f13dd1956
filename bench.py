"""Benchmark: Groth16 mint-circuit proofs/sec on the TPU stack.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: single-core libsnark mint prove = 7.527 s/proof = 0.13286 proofs/s
(reference_harness/BASELINE_MEASURED.md, measured on this machine from the
unmodified reference binaries).

Requires reference_harness/prfKey/mintpk.txt (generated once by
reference_harness/build_reference.sh + mint_key); the parsed device-tensor
form is cached as .npz next to it.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

os.makedirs("/root/.cache/bmtpu_xla", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/bmtpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BASELINE_MINT_PROOFS_PER_SEC = 1.0 / 7.527

LANES = int(os.environ.get("BMTPU_LANES", "32768"))
WINDOW = int(os.environ.get("BMTPU_WINDOW", "13"))
REPS = int(os.environ.get("BMTPU_REPS", "3"))


def main():
    from blockmaze_tpu.crypto import notes as NT
    from blockmaze_tpu.r1cs.protoboard import Protoboard
    from blockmaze_tpu.circuits.mint import MintGadget
    from blockmaze_tpu.groth16 import keys
    from blockmaze_tpu.groth16.prover import Prover

    pk_path = os.path.join(ROOT, "reference_harness", "prfKey", "mintpk.txt")
    if not os.path.exists(pk_path) and not os.path.exists(
            os.path.join(os.path.dirname(pk_path),
                         f"mintpk.v{keys.CACHE_VERSION}.npz")):
        print(json.dumps({"metric": "mint_proofs_per_sec", "value": 0.0,
                          "unit": "proofs/s", "vs_baseline": 0.0,
                          "error": "reference keys not generated"}))
        return

    dpk = keys.load_or_build(pk_path)

    sk = NT.uint256_from_hex("1")
    r_old = NT.uint256_from_hex("123456")
    r = NT.uint256_from_hex("123")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(6, sn_old, r_old)
    note = NT.Note(13, NT.compute_prf(sk, r), r)
    pb = Protoboard()
    g = MintGadget(pb)
    g.generate_witness(note_old, note, note_old.cm(), note.cm(), 7, sk)
    primary, aux = pb.primary_input(), pb.auxiliary_input()

    prover = Prover(dpk, lanes=LANES, window=WINDOW)
    # warm-up (compilation)
    prover.prove(primary, aux, r=1, s=2)

    t0 = time.time()
    for i in range(REPS):
        prover.prove(primary, aux, r=3 + i, s=5 + i)
    dt = (time.time() - t0) / REPS

    pps = 1.0 / dt
    print(json.dumps({
        "metric": "mint_proofs_per_sec",
        "value": round(pps, 4),
        "unit": "proofs/s",
        "vs_baseline": round(pps / BASELINE_MINT_PROOFS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
