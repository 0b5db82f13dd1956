"""Host pairing tests: algebraic identities + cross-check against
reference-generated key files (pairing(pk.alpha_g1, pk.beta_g2) must equal
vk.alpha_g1_beta_g2 as serialized by the unmodified reference keygen)."""

import os

import pytest

from blockmaze_tpu.curves import host_curve as HC
from blockmaze_tpu.curves import pairing as P
from blockmaze_tpu.fields import host as F
from blockmaze_tpu.fields.constants import R_MOD

PRFKEY = os.path.join(os.path.dirname(__file__), "..", "reference_harness", "prfKey")


def test_generators_on_curve():
    assert HC.g1_is_on_curve(HC.g1_generator())
    assert HC.g2_is_on_curve(HC.g2_generator())


def test_group_law(rng):
    g = HC.g1_generator()
    a, b = rng.randrange(R_MOD), rng.randrange(R_MOD)
    pa, pb = HC.g1_mul(g, a), HC.g1_mul(g, b)
    assert HC.g1_add(pa, pb) == HC.g1_mul(g, (a + b) % R_MOD)
    # G2
    h = HC.g2_generator()
    qa, qb = HC.g2_mul(h, a), HC.g2_mul(h, b)
    assert HC.g2_add(qa, qb) == HC.g2_mul(h, (a + b) % R_MOD)
    # subgroup order
    assert HC.g1_mul(g, R_MOD) == HC.G1_ZERO
    assert HC.g2_mul(h, R_MOD) == HC.G2_ZERO


def test_pairing_bilinear(rng):
    g, h = HC.g1_generator(), HC.g2_generator()
    a, b = rng.randrange(1, 1 << 64), rng.randrange(1, 1 << 64)
    e = P.pairing(g, h)
    assert e != F.FQ12_ONE
    lhs = P.pairing(HC.g1_mul(g, a), HC.g2_mul(h, b))
    rhs = F.fq12_pow(e, a * b % R_MOD)
    assert lhs == rhs
    # e(g, h)^r == 1
    assert F.fq12_pow(e, R_MOD) == F.FQ12_ONE


@pytest.mark.skipif(
    not os.path.exists(os.path.join(PRFKEY, "mintvk.txt")),
    reason="reference keys not generated",
)
def test_vk_alpha_beta_matches_reference():
    from blockmaze_tpu.serialization import libsnark_io as io

    vk = io.load_verification_key(os.path.join(PRFKEY, "mintvk.txt"))
    assert HC.g2_is_on_curve(vk.gamma_g2)
    assert HC.g2_is_on_curve(vk.delta_g2)
    assert HC.g1_is_on_curve(vk.gamma_ABC_first)
    for _, p in vk.gamma_ABC_rest:
        assert HC.g1_is_on_curve(p)
