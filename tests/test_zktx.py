"""zktx layer tests: hash helpers, one-time addresses, AUX memo round-trip,
AES-128 against the FIPS-197 vector."""

import hashlib

from blockmaze_tpu.zktx import api, aux
from blockmaze_tpu.crypto import notes as NT
from blockmaze_tpu.merkle import incremental as MK


def test_hash_helpers():
    sk = NT.uint256_from_hex("1")
    r = NT.uint256_from_hex("123")
    sn = api.compute_prf(sk, r)
    assert sn == hashlib.sha256(sk + r).digest()
    cm = api.gen_cmt(13, sn, r)
    assert cm == NT.Note(13, sn, r).cm()
    pk = int("123", 16).to_bytes(20, "little")
    cmts = api.gen_cmt_s(6, pk, r, sn)
    assert cmts == NT.NoteS(6, pk, r, sn).cm()


def test_gen_rt_matches_incremental_tree():
    cmts = [NT.uint256_from_hex(str(i + 1)) for i in range(5)]
    tree = MK.IncrementalMerkleTree()
    for c in cmts:
        tree.append(c)
    assert api.gen_rt(cmts) == tree.root()


def test_aes128_fips197():
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    w = aux._aes128_expand(key)
    ct = aux._aes128_encrypt_block(pt, w)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_one_time_address_roundtrip():
    # receiver key pair kB; sender ephemeral sA with R = sA*G
    kB_priv, kB_pub = aux.keygen()
    sA, R = aux.keygen()
    # sender derives the one-time pubkey, receiver the matching private key
    otp_pub = aux.new_random_pub_key(sA, kB_pub)
    priv, pub = aux.generate_key_for_random_b(R, kB_priv, kB_pub)
    assert pub == otp_pub
    # the derived private key controls the derived public key
    assert aux.scalar_mult(priv % aux.N, aux.G) == otp_pub


def test_aux_memo_roundtrip():
    _, pk = aux.keygen()
    rs = NT.uint256_from_hex("123")
    sna = NT.uint256_from_hex("456")
    ct = aux.compute_aux(pk, 77, rs, sna)
    value, rs2, sna2 = aux.dec_aux(pk, ct)
    assert (value, rs2, sna2) == (77, rs, sna)
