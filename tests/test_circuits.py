"""Self-consistency tests for send/redeem/deposit circuits (mint is covered in
test_mint_circuit.py): witness satisfies own constraints, reference-matching
constraint counts, and negative paths."""

import pytest

from blockmaze_tpu.crypto import notes as NT
from blockmaze_tpu.merkle import incremental as MK
from blockmaze_tpu.r1cs.protoboard import Protoboard
from blockmaze_tpu.circuits.send import SendGadget
from blockmaze_tpu.circuits.redeem import RedeemGadget
from blockmaze_tpu.circuits.deposit import DepositGadget


def _u256(h):
    return NT.uint256_from_hex(h)


def test_send_circuit():
    sk, r_old, r = _u256("1"), _u256("123456"), _u256("12")
    pk_sender = int("456", 16).to_bytes(20, "little")
    pk_recv = int("123", 16).to_bytes(20, "little")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(10, sn_old, r_old)
    note = NT.Note(4, NT.compute_prf(sk, r), r)
    r_s = NT.compute_crh(pk_sender, r)
    note_s = NT.NoteS(6, pk_recv, r_s, sn_old)

    pb = Protoboard()
    g = SendGadget(pb)
    g.generate_constraints()
    assert len(pb.constraints) == 252286  # reference count
    g.generate_witness(note_old, note_s, note, note_old.cm(), note_s.cm(),
                       note.cm(), sk, pk_sender)
    assert pb.is_satisfied()
    assert pb.primary_input() == SendGadget.witness_map(
        note_old.cm(), sn_old, note_s.cm(), note.cm())


def test_redeem_circuit():
    sk, r_old, r = _u256("1"), _u256("123456"), _u256("123")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(13, sn_old, r_old)
    note = NT.Note(6, NT.compute_prf(sk, r), r)

    pb = Protoboard()
    g = RedeemGadget(pb)
    g.generate_constraints()
    assert len(pb.constraints) == 167853
    g.generate_witness(note_old, note, note_old.cm(), note.cm(), 7, sk)
    assert pb.is_satisfied()

    # subtraction must balance: 13 - 8 != 6
    pb2 = Protoboard()
    g2 = RedeemGadget(pb2)
    g2.generate_constraints()
    g2.generate_witness(note_old, note, note_old.cm(), note.cm(), 8, sk)
    assert not pb2.is_satisfied()


def _deposit_instance(leaf_index=9):
    sk = _u256("1")
    r_old, r, r_s = _u256("123456"), _u256("12"), _u256("123")
    sn_A_old = _u256("123")
    pk_recv = int("123", 16).to_bytes(20, "little")
    sn_old = NT.compute_prf(sk, r_old)
    note_old = NT.Note(255, sn_old, r_old)
    note_s = NT.NoteS(9, pk_recv, r_s, sn_A_old)
    note = NT.Note(264, NT.compute_prf(sk, r), r)
    sn_s = NT.compute_prf(sk, r_s)
    cmtS = note_s.cm()

    leaves = [cmtS if i == leaf_index else _u256(str(i + 1)) for i in range(16)]
    tree = MK.IncrementalMerkleTree()
    wit = None
    for i, leaf in enumerate(leaves):
        if wit is not None:
            wit.append(leaf)
        else:
            tree.append(leaf)
        if i == leaf_index:
            wit = tree.witness()
    return (note_s, note_old, note, cmtS, note_old.cm(), note.cm(),
            wit.root(), wit.path(), sn_s, sk, pk_recv, sn_old)


def test_deposit_circuit():
    (note_s, note_old, note, cmtS, cmtB_old, cmtB, rt, path, sn_s, sk,
     pk_recv, sn_old) = _deposit_instance()
    pb = Protoboard()
    g = DepositGadget(pb)
    g.generate_constraints()
    assert len(pb.constraints) == 503863
    g.generate_witness(note_s, note_old, note, cmtS, cmtB_old, cmtB,
                       rt, path, sn_s, sk)
    assert pb.is_satisfied()
    assert pb.primary_input() == DepositGadget.witness_map(
        rt, pk_recv, cmtB_old, sn_old, cmtB, sn_s)


def test_deposit_wrong_root_rejected():
    (note_s, note_old, note, cmtS, cmtB_old, cmtB, rt, path, sn_s, sk,
     *_rest) = _deposit_instance()
    bad_rt = MK.combine(rt, rt)
    pb = Protoboard()
    g = DepositGadget(pb)
    g.generate_constraints()
    g.generate_witness(note_s, note_old, note, cmtS, cmtB_old, cmtB,
                       bad_rt, path, sn_s, sk)
    assert not pb.is_satisfied()


def test_merkle_tree_matches_full_tree():
    """Incremental root equals a straightforward bottom-up tree build."""
    leaves = [_u256(str(i + 1)) for i in range(16)]
    tree = MK.IncrementalMerkleTree()
    for leaf in leaves:
        tree.append(leaf)
    level = leaves + [b"\x00" * 32] * (256 - 16)
    while len(level) > 1:
        level = [MK.combine(level[i], level[i + 1])
                 for i in range(0, len(level), 2)]
    assert tree.root() == level[0]
