"""Real-prover node integration (VERDICT r3 #7): one full lifecycle with the
REAL ZkTx service (Groth16 proofs on real reference keys, hex wire ABI,
tx-pool + block-import double verification) through Node/ChainState.

The suite's conftest pins JAX to the 8-device virtual-CPU platform before
any test imports jax, so the real prover is driven in a SUBPROCESS running
scripts/lifecycle.py on the session's default backend (the real TPU under
the axon tunnel; CPU elsewhere). Slow tier: a cold run pays the prover
compile for all four circuits.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_real_lifecycle():
    prf = os.path.join(ROOT, "reference_harness", "prfKey")
    if not os.path.exists(os.path.join(prf, "mintpk.txt")) and not any(
            f.startswith("mintpk.v") for f in
            (os.listdir(prf) if os.path.isdir(prf) else [])):
        pytest.skip("reference keys not generated (run_build_keys.sh)")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # session default backend (axon on TPU)
    platform = env.get("BMTPU_REAL_PLATFORM", "axon")
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "lifecycle.py"),
         "--platform", platform],
        capture_output=True, text=True, timeout=5400, env=env)
    assert "LIFECYCLE OK" in res.stdout, (
        f"stdout tail: {res.stdout[-2000:]}\nstderr tail: {res.stderr[-2000:]}")
