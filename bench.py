"""Benchmark: Groth16 proofs/sec on the TPU stack.

Prints ONE JSON line. Primary metric = deposit-circuit proofs/sec (the
BASELINE north star; reference single-core deposit prove on THIS machine =
28.868 s = 0.0346 proofs/s, reference_harness/BASELINE_MEASURED.md). The
same line carries every benched circuit's proofs/s, its end-to-end rate
including witness generation (surfaced as value_e2e for the headline
circuit), and first-prove/compile seconds.

Requires reference_harness/prfKey/*.txt (generated once by
reference_harness/build_reference.sh + *_key); the parsed device-tensor
form is cached as .npz next to each.

BMTPU_BENCH_CIRCUITS=mint,deposit picks circuits (default both).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

import jax

from blockmaze_tpu.utils.cachedirs import setup_caches
setup_caches()

# single-core reference prove times measured on THIS host (round 4,
# reference_harness/build/baseline_run_r4.log)
BASELINE = {"mint": 1.0 / 11.485, "deposit": 1.0 / 28.868,
            "send": 1.0 / 14.845, "redeem": 1.0 / 8.757}

LANES = int(os.environ.get("BMTPU_LANES", "32768"))
WINDOW = int(os.environ.get("BMTPU_WINDOW", "13"))
REPS = int(os.environ.get("BMTPU_REPS", "3"))
CIRCUITS = os.environ.get("BMTPU_BENCH_CIRCUITS",
                          "mint,send,redeem,deposit").split(",")

PRFKEY = os.path.join(ROOT, "reference_harness", "prfKey")


def build_witness(circ):
    """Deterministic witness builders (shared with scripts/e2e.py)."""
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from witnesses import WITNESS
    return WITNESS[circ]()


def main():
    from blockmaze_tpu.groth16 import keys
    from blockmaze_tpu.groth16.prover import Prover

    out = {"metric": "deposit_proofs_per_sec", "unit": "proofs/s",
           "lanes": LANES, "window": WINDOW,
           "backend": jax.default_backend()}
    for circ in CIRCUITS:
        circ = circ.strip()
        pk_path = os.path.join(PRFKEY, f"{circ}pk.txt")
        cached = os.path.join(PRFKEY, f"{circ}pk.v{keys.CACHE_VERSION}.npz")
        if not (os.path.exists(pk_path) or os.path.exists(cached)):
            # distinguish "never generated" from "npz from an older
            # CACHE_VERSION exists but there is no pk.txt to rebuild from"
            import glob
            stale = glob.glob(os.path.join(PRFKEY, f"{circ}pk.v*.npz"))
            if stale:
                out.setdefault("errors", []).append(
                    f"{circ}: npz cache is stale (found {stale}, need "
                    f"v{keys.CACHE_VERSION}) and no pk.txt to rebuild")
            else:
                out.setdefault("errors", []).append(
                    f"{circ}: reference keys not generated")
            continue
        dpk = keys.load_or_build(pk_path)

        t0 = time.time()
        pb = build_witness(circ)
        wit_s = time.time() - t0
        primary, aux = pb.primary_input(), pb.auxiliary_input()

        prover = Prover(dpk, lanes=LANES, window=WINDOW)
        t0 = time.time()
        prover.warmup()  # parallel compile/cache-load + program upload
        warm_s = time.time() - t0
        t0 = time.time()
        prover.prove(primary, aux, r=1, s=2)
        compile_s = time.time() - t0
        out[f"{circ}_warmup_sec"] = round(warm_s, 1)

        t0 = time.time()
        for i in range(REPS):
            prover.prove(primary, aux, r=3 + i, s=5 + i)
        dt = (time.time() - t0) / REPS
        pps = 1.0 / dt
        out[f"{circ}_proofs_per_sec"] = round(pps, 4)
        out[f"{circ}_witness_sec"] = round(wit_s, 3)
        out[f"{circ}_first_prove_sec"] = round(compile_s, 1)
        out[f"{circ}_vs_baseline"] = round(pps / BASELINE[circ], 2)
        # end-to-end rate including witness generation (the honest
        # per-transaction number; reference baselines time only the prove)
        out[f"{circ}_proofs_per_sec_with_witness"] = round(
            1.0 / (dt + wit_s), 4)

    if "deposit_proofs_per_sec" in out:
        out["value"] = out["deposit_proofs_per_sec"]
        out["value_e2e"] = out["deposit_proofs_per_sec_with_witness"]
        out["vs_baseline"] = out["deposit_vs_baseline"]
    elif "mint_proofs_per_sec" in out:
        out["metric"] = "mint_proofs_per_sec"
        out["value"] = out["mint_proofs_per_sec"]
        out["vs_baseline"] = out["mint_vs_baseline"]
    else:
        out["value"] = 0.0
        out["vs_baseline"] = 0.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
