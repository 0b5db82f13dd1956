"""Node/wallet layer tests: the mint→send→deposit→redeem lifecycle on a
simulated multi-node network, wallet SNfile persistence, crash recovery,
nullifier double-spend and one-time-key reuse rejection.

Proof generation is the slow path tested elsewhere (test_circuits,
e2e scripts); here a FakeZkTx implements the same service interface with
hash-commitment "proofs" whose verification recomputes the exact public
inputs — so every protocol-semantics check (commitment openings, value
conservation, Merkle root membership, nullifier flow) is still enforced,
just without Groth16.
"""

import hashlib

import pytest

from blockmaze_tpu.chain import state as CS
from blockmaze_tpu.crypto import notes as NT
from blockmaze_tpu.merkle import incremental as MK
from blockmaze_tpu.node import Network, Node
from blockmaze_tpu.node.node import NodeError
from blockmaze_tpu.node import wallet as W
from blockmaze_tpu.zktx import api as zapi


def _fake_proof(*parts) -> bytes:
    h = hashlib.sha256()
    for p in parts:
        h.update(p if isinstance(p, bytes) else str(p).encode())
    return h.digest()


class FakeZkTx:
    """Same surface as zktx.api.ZkTx; proofs are binding hash commitments to
    the public inputs, and generation enforces the circuits' arithmetic
    relations (value conservation, comparison, Merkle membership)."""

    # -- mint --------------------------------------------------------------
    def gen_mint_proof(self, value_old, value, value_s, sk, r_old, r,
                       sn_old=None):
        assert value == value_old + value_s, "mint: v = v_old + v_s"
        sn_old = sn_old or NT.compute_prf(sk, r_old)
        cmt_old = NT.Note(value_old, sn_old, r_old).cm()
        sn = NT.compute_prf(sk, r)
        cmt = NT.Note(value, sn, r).cm()
        return _fake_proof(b"mint", cmt_old, sn_old, cmt, value_s), None

    def verify_mint_proof(self, proof, cmtA_old, sn_old, cmtA, value_s):
        return proof == _fake_proof(b"mint", cmtA_old, sn_old, cmtA, value_s)

    # -- send ----------------------------------------------------------------
    def gen_send_proof(self, value_old, value, value_s, sk, r_old, r,
                       pk_sender, pk_recv, sn_old=None):
        assert value == value_old - value_s and value_s < value_old, \
            "send: v = v_old - v_s, v_s < v_old"
        sn_old = sn_old or NT.compute_prf(sk, r_old)
        cmt_old = NT.Note(value_old, sn_old, r_old).cm()
        r_s = NT.compute_crh(pk_sender, r)
        cmts = NT.NoteS(value_s, pk_recv, r_s, sn_old).cm()
        sn = NT.compute_prf(sk, r)
        cmt = NT.Note(value, sn, r).cm()
        return _fake_proof(b"send", cmt_old, sn_old, cmts, cmt), None

    def verify_send_proof(self, proof, cmtA_old, sn_old, cmtS, cmtA):
        return proof == _fake_proof(b"send", cmtA_old, sn_old, cmtS, cmtA)

    # -- deposit ---------------------------------------------------------------
    def gen_deposit_proof(self, value_old, value, value_s, sk, r_old, r,
                          r_s, sn_A_old, pk_recv, cmts_for_merkle,
                          sn_old=None):
        assert value == value_old + value_s, "deposit: v = v_old + v_s"
        sn_old = sn_old or NT.compute_prf(sk, r_old)
        cmt_old = NT.Note(value_old, sn_old, r_old).cm()
        cmtS = NT.NoteS(value_s, pk_recv, r_s, sn_A_old).cm()
        assert cmtS in cmts_for_merkle, "deposit: cmtS in tree"
        rt = zapi.gen_rt(cmts_for_merkle)
        sn_s = NT.compute_prf(sk, r_s)
        sn = NT.compute_prf(sk, r)
        cmt = NT.Note(value, sn, r).cm()
        return _fake_proof(b"deposit", rt, pk_recv, cmt_old, sn_old,
                           cmt, sn_s), None

    def verify_deposit_proof(self, proof, rt, pk_recv, cmtB_old, sn_old,
                             cmtB, sn_s):
        return proof == _fake_proof(b"deposit", rt, pk_recv, cmtB_old,
                                    sn_old, cmtB, sn_s)

    # -- redeem ---------------------------------------------------------------
    def gen_redeem_proof(self, value_old, value, value_s, sk, r_old, r,
                         sn_old=None):
        assert value == value_old - value_s and value_s < value_old, \
            "redeem: v = v_old - v_s, v_s < v_old"
        sn_old = sn_old or NT.compute_prf(sk, r_old)
        cmt_old = NT.Note(value_old, sn_old, r_old).cm()
        sn = NT.compute_prf(sk, r)
        cmt = NT.Note(value, sn, r).cm()
        return _fake_proof(b"redeem", cmt_old, sn_old, cmt, value_s), None

    def verify_redeem_proof(self, proof, cmtA_old, sn_old, cmtA, value_s):
        return proof == _fake_proof(b"redeem", cmtA_old, sn_old, cmtA,
                                    value_s)


@pytest.fixture
def net():
    return Network(FakeZkTx(), seed=7)


def test_full_lifecycle(net, tmp_path):
    """mint -> send -> deposit -> redeem across two nodes (the clique runbook
    flow, test/clique/instructions.txt)."""
    alice = Node(net, str(tmp_path / "a"), address=b"\x0a" * 20)
    bob = Node(net, str(tmp_path / "b"), address=b"\x0b" * 20)
    net.fund(alice.address, 1000)

    # mint 100 into the hidden balance
    alice.send_mint_transaction(100)
    net.mine_block()
    assert net.balance_of(alice.address) == 900
    assert alice.wallet.sequence_number_after.value == 100

    # send 30 to bob via his published pubkey
    h_send = alice.send_send_transaction(30, bob.get_pub_key_rlp())
    blk = net.mine_block()
    assert alice.wallet.sequence_number_after.value == 70
    assert len(blk["cmt"]) == 1  # the SendTx CMTS landed in the header
    assert net.chain.rt_index[blk["rtcmt"]] == blk["number"]

    # bob claims it
    bob.send_deposit_transaction(h_send)
    net.mine_block()
    assert bob.wallet.sequence_number_after.value == 30

    # bob redeems 10 back to plaintext
    bob.send_redeem_transaction(10)
    net.mine_block()
    assert bob.wallet.sequence_number_after.value == 20
    assert net.balance_of(bob.address) == 10

    bal = bob.get_balance2()
    assert bal["balance"] == 10 and bal["wallet_value"] == 20
    # on-chain commitment tracks the wallet's latest note
    assert bal["cmt_balance"] == bob.wallet.sequence_number_after.cmt.hex()


def test_double_spend_rejected(net, tmp_path):
    alice = Node(net, str(tmp_path / "a"), address=b"\x0a" * 20)
    net.fund(alice.address, 1000)
    # first mint consumes the genesis SN (which is replay-exempt by design,
    # zktx.go InitializeSN); the second mint's SN is a real nullifier
    alice.send_mint_transaction(100)
    net.mine_block()
    alice.send_mint_transaction(50)
    tx = net.pending[0]
    net.mine_block()
    # replaying the same SN must fail at the state processor
    with pytest.raises(CS.ChainError, match="already used"):
        net.chain.apply_transaction(tx)


def test_one_time_key_single_use(net, tmp_path):
    alice = Node(net, str(tmp_path / "a"), address=b"\x0a" * 20)
    bob = Node(net, str(tmp_path / "b"), address=b"\x0b" * 20)
    net.fund(alice.address, 1000)
    alice.send_mint_transaction(100)
    net.mine_block()
    h = alice.send_send_transaction(30, bob.get_pub_key_rlp())
    net.mine_block()
    bob.send_deposit_transaction(h)
    dep_tx = net.pending[0]
    # another party already burned this one-time address on-chain
    net.chain.db.accounts[dep_tx.one_time_addr] = CS.Account(nonce=1)
    with pytest.raises(CS.ChainError, match="second time"):
        net.mine_block()


def test_deposit_requires_valid_rt(net, tmp_path):
    alice = Node(net, str(tmp_path / "a"), address=b"\x0a" * 20)
    bob = Node(net, str(tmp_path / "b"), address=b"\x0b" * 20)
    net.fund(alice.address, 1000)
    alice.send_mint_transaction(100)
    net.mine_block()
    h = alice.send_send_transaction(30, bob.get_pub_key_rlp())
    net.mine_block()
    bob.send_deposit_transaction(h)
    tx = net.pending.pop()
    tx.rt_cmt = b"\x42" * 32
    with pytest.raises(CS.ChainError, match="invalid CMTRoot"):
        net.validate_tx(tx)


def test_deposit_signature_checked(net, tmp_path):
    alice = Node(net, str(tmp_path / "a"), address=b"\x0a" * 20)
    bob = Node(net, str(tmp_path / "b"), address=b"\x0b" * 20)
    net.fund(alice.address, 1000)
    alice.send_mint_transaction(100)
    net.mine_block()
    h = alice.send_send_transaction(30, bob.get_pub_key_rlp())
    net.mine_block()
    bob.send_deposit_transaction(h)
    tx = net.pending.pop()
    # tamper: flip the claimed one-time address
    tx.one_time_addr = b"\x01" * 20
    with pytest.raises(CS.ChainError, match="signature"):
        net.validate_tx(tx)


def test_wallet_persistence_and_reload(net, tmp_path):
    datadir = str(tmp_path / "a")
    alice = Node(net, datadir, address=b"\x0a" * 20)
    net.fund(alice.address, 1000)
    alice.send_mint_transaction(100)
    net.mine_block()
    seq = alice.wallet.sequence_number_after

    # a fresh node over the same datadir restores the sequence state
    alice2 = Node(net, datadir, address=b"\x0a" * 20)
    assert alice2.wallet.sequence_number_after == seq
    assert alice2.wallet.stage == W.Stage.MINT
    # and can keep transacting
    alice2.send_mint_transaction(50)
    net.mine_block()
    assert alice2.wallet.sequence_number_after.value == 150


def test_crash_recovery_rolls_back_unlanded_tx(net, tmp_path):
    """api.go:1414-1431: if the previous tx never landed (SN absent from
    state), the pending sequence rolls back; if the pending SN is already
    on-chain, the wallet reports 'sn is lost'."""
    alice = Node(net, str(tmp_path / "a"), address=b"\x0a" * 20)
    net.fund(alice.address, 1000)
    alice.send_mint_transaction(100)
    net.mine_block()
    good = alice.wallet.sequence_number_after

    # simulate a tx that was built + persisted but never submitted
    phantom = W.Sequence(b"\x77" * 32, b"\x88" * 32, b"\x99" * 32, 123)
    alice.wallet.advance(phantom, W.Stage.MINT)
    assert alice.wallet.sequence_number_after is phantom

    alice.wallet.recover(net.sn_exists)
    assert alice.wallet.sequence_number_after == good

    # 'sn is lost': pending SN already consumed on-chain
    alice.wallet.sequence_number_after = good
    alice.wallet.sequence_number = phantom
    net.chain.db.create_nullifier(good.sn)
    with pytest.raises(W.WalletError, match="sn is lost"):
        alice.wallet.recover(net.sn_exists)


def test_sequence_s_roundtrip():
    s1 = W.Sequence(b"\x01" * 32, b"\x02" * 32, b"\x03" * 32, 7)
    s2 = W.Sequence(b"\x04" * 32, b"\x05" * 32, b"\x06" * 32, 0, False)
    sns = W.Sequence(b"\x00" * 32, b"\x07" * 32, b"\x08" * 32, 30)
    for obj in (W.SequenceS(s1, s2, sns, 12345, 678910, 2),
                W.SequenceS(s1, s2, None, 0, 0, 0)):
        enc = W.encode_sequence_s(obj)
        dec = W.decode_sequence_s(enc)
        assert dec == obj


def test_gen_rt_matches_incremental_tree():
    cmts = [hashlib.sha256(bytes([i])).digest() for i in range(5)]
    tree = MK.IncrementalMerkleTree()
    for c in cmts:
        tree.append(c)
    assert zapi.gen_rt(cmts) == tree.root()
