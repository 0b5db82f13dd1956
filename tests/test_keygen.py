"""Keygen round-trip: our generator + our prover + our verifier on a small
synthetic circuit; vk serialization cross-checked against the reference
verifier binary when available."""

import os
import subprocess

import pytest

from blockmaze_tpu.fields.constants import R_MOD
from blockmaze_tpu.groth16 import generator, keys, verifier
from blockmaze_tpu.groth16.prover import Prover
from blockmaze_tpu.r1cs.protoboard import LC, Protoboard
from blockmaze_tpu.serialization import libsnark_io as io

ORACLE = os.path.join(os.path.dirname(__file__), "..", "reference_harness",
                      "build", "oracle")


def toy_circuit(x: int, w: int):
    """Public x, witness w with constraints: w*w = x and (w+1)*(w-1) = x-1."""
    pb = Protoboard()
    vx = pb.allocate()
    pb.set_input_sizes(1)
    vw = pb.allocate()
    pb.add_constraint(LC.var(vw), LC.var(vw), LC.var(vx))
    pb.add_constraint(LC.var(vw) + 1, LC.var(vw) - 1, LC.var(vx) - 1)
    pb.setval(vx, x)
    pb.setval(vw, w)
    assert pb.is_satisfied()
    return pb


@pytest.fixture(scope="module")
def keypair_and_proof():
    w = 1234567
    pb = toy_circuit(w * w % R_MOD, w)
    rng_vals = iter([11, 13, 17, 19, 23])  # deterministic toxic waste
    pk, vk = generator.generate(pb, rng=lambda: next(rng_vals))
    dpk = keys.build_device_pk(pk)
    prover = Prover(dpk, lanes=8, window=8)
    proof = prover.prove(pb.primary_input(), pb.auxiliary_input(), r=7, s=9)
    return pb, pk, vk, proof


def test_keygen_prove_verify(keypair_and_proof):
    pb, pk, vk, proof = keypair_and_proof
    assert verifier.verify(vk, pb.primary_input(), proof)
    # wrong input rejected
    assert not verifier.verify(vk, [(pb.primary_input()[0] + 1) % R_MOD],
                               proof)


def test_keygen_witness_consistency(keypair_and_proof):
    pb, pk, vk, proof = keypair_and_proof
    # generated cs must be satisfied by the assignment (A/B possibly swapped)
    assert pk.cs.is_satisfied(pb.values)


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="reference oracle not built")
def test_vk_serialization_verifies_with_reference(keypair_and_proof, tmp_path):
    pb, pk, vk, proof = keypair_and_proof
    vk_path = str(tmp_path / "vk.txt")
    proof_path = str(tmp_path / "proof.txt")
    primary_path = str(tmp_path / "primary.txt")
    io.write_verification_key(vk_path, vk)
    io.write_proof(proof_path, proof)
    io.write_primary_input(primary_path, pb.primary_input())
    res = subprocess.run([ORACLE, "verify", vk_path, proof_path, primary_path],
                         capture_output=True, text=True, timeout=300)
    assert "VERIFY_OK" in res.stdout, res.stdout + res.stderr

def test_prove_batch(keypair_and_proof):
    """vmapped multi-proof dispatch: every proof in the batch verifies, and
    the deterministic (r, s) path matches the single-proof prover."""
    from blockmaze_tpu.groth16 import keys as K
    pb, pk, vk, proof = keypair_and_proof
    dpk = K.build_device_pk(pk)
    prover = Prover(dpk, lanes=8, window=8)
    w2 = 424242
    pb2 = toy_circuit(w2 * w2 % R_MOD, w2)
    instances = [(pb.primary_input(), pb.auxiliary_input()),
                 (pb2.primary_input(), pb2.auxiliary_input())]
    proofs = prover.prove_batch(instances, rs=[7, 3], ss=[9, 5])
    assert verifier.verify(vk, pb.primary_input(), proofs[0])
    assert verifier.verify(vk, pb2.primary_input(), proofs[1])
    # r=7, s=9 must reproduce the single-proof result exactly
    assert proofs[0] == proof
    # cross-instance mixups rejected
    assert not verifier.verify(vk, pb.primary_input(), proofs[1])
