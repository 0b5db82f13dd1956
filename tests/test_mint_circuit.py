"""Mint circuit tests: host-crypto self-consistency and witness/constraint
structure (fast, no reference artifacts needed)."""

import hashlib

from blockmaze_tpu.crypto import notes as NT
from blockmaze_tpu.r1cs.protoboard import Protoboard
from blockmaze_tpu.circuits.mint import MintGadget
from blockmaze_tpu.fields.constants import R_MOD


def make_instance():
    sk = NT.uint256_from_hex("1")
    r_old = NT.uint256_from_hex("123456")
    r = NT.uint256_from_hex("123")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(6, sn_old, r_old)
    sn = NT.compute_prf(sk, r)
    note = NT.Note(13, sn, r)
    return sk, note_old, note


def test_note_hash_layouts():
    sk, note_old, note = make_instance()
    # PRF = sha256(sk||r)
    assert note.sn == hashlib.sha256(sk + note.r).digest()
    # cm = sha256(LE64(value)||sn||r)
    assert note.cm() == hashlib.sha256(
        (13).to_bytes(8, "little") + note.sn + note.r).digest()


def test_bit_conventions():
    b = NT.uint256_from_hex("123456")
    assert NT.bits_to_bytes(NT.bytes_to_bits(b)) == b
    assert NT.uint64_to_bits(1)[:8] == [0, 0, 0, 0, 0, 0, 0, 1]


def test_mint_witness_satisfies_own_constraints():
    sk, note_old, note = make_instance()
    pb = Protoboard()
    g = MintGadget(pb)
    g.generate_constraints()
    g.generate_witness(note_old, note, note_old.cm(), note.cm(), 7, sk)
    assert pb.num_variables == 151512
    assert len(pb.constraints) == 167270
    assert pb.primary_input() == MintGadget.witness_map(
        note_old.cm(), note_old.sn, note.cm(), 7)
    assert pb.is_satisfied()


def test_mint_witness_rejects_bad_sum():
    sk, note_old, note = make_instance()
    pb = Protoboard()
    g = MintGadget(pb)
    g.generate_constraints()
    # value != value_old + value_s
    g.generate_witness(note_old, note, note_old.cm(), note.cm(), 8, sk)
    assert not pb.is_satisfied()
