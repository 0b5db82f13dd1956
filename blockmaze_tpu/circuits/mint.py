"""Mint circuit: exact replica of src/mint/circuit/ (gadget.tcc, note.tcc,
add_cmp.tcc, commitment.tcc) with identical variable-allocation and
constraint order, so witnesses line up with the reference proving key.

Proves, for public (cmtA_old, sn_old, cmtA, value_s):
    cmtA_old = SHA256(value_old || sn_old || r_old)
    sn       = SHA256(sk || r)                      (PRF)
    cmtA     = SHA256(value || sn || r)
    value    = value_old + value_s
"""

from __future__ import annotations

from typing import List

from ..crypto import notes as NT
from ..fields.constants import FR_CAPACITY
from ..r1cs.protoboard import (
    LC,
    Protoboard,
    generate_boolean_constraint,
    generate_equals_const_constraint,
)
from ..r1cs.gadgets.basic import BlockVariable, DigestVariable, MultipackingGadget
from ..r1cs.gadgets.sha256 import Sha256CompressionGadget, sha256_default_IV


def _from_bits(bits: List[int], ZERO: int) -> List[int]:
    """constant bit pattern -> var list of ONE/ZERO (utils.tcc from_bits)."""
    return [0 if b else ZERO for b in bits]  # index 0 == ONE


def _cmta_padding(ZERO: int) -> List[int]:
    """448-bit padding for the 576-bit CMTA message (commitment.tcc:39-66)."""
    bits = [1] + [0] * 383 + NT.bytes_to_bits((576).to_bytes(8, "big"))
    return _from_bits(bits, ZERO)


def _prf_padding(ZERO: int) -> List[int]:
    """512-bit padding block for the 512-bit PRF message (commitment.tcc:121+)."""
    bits = [1] + [0] * 447 + NT.bytes_to_bits((512).to_bytes(8, "big"))
    return _from_bits(bits, ZERO)


class Sha256CmtaGadget:
    """cmtA = SHA256(v(64) || sn(256) || r(256) + padding), 2 blocks
    (mint/circuit/commitment.tcc:14-100)."""

    def __init__(self, pb: Protoboard, ZERO: int, v: List[int],
                 sn: List[int], rho: List[int], cmtA: DigestVariable):
        self.pb = pb
        first_of_r = rho[:192]
        last_of_r = rho[192:]
        self.intermediate_hash = DigestVariable(pb, 256)
        length_padding = _cmta_padding(ZERO)
        block1 = BlockVariable(pb, [v, sn, first_of_r])
        block2 = BlockVariable(pb, [last_of_r, length_padding])
        IV = sha256_default_IV()
        self.hasher1 = Sha256CompressionGadget(
            pb, IV, block1.bits, self.intermediate_hash)
        self.hasher2 = Sha256CompressionGadget(
            pb, self.intermediate_hash.bits, block2.bits, cmtA)

    def generate_constraints(self):
        self.intermediate_hash.generate_constraints()
        self.hasher1.generate_constraints()
        self.hasher2.generate_constraints()

    def generate_witness(self):
        self.hasher1.generate_witness()
        self.hasher2.generate_witness()


class Sha256PrfGadget:
    """sn = SHA256(sk(256) || r(256) + padding block) (commitment.tcc:103-185)."""

    def __init__(self, pb: Protoboard, ZERO: int, sk: List[int],
                 rho: List[int], sn: DigestVariable):
        self.pb = pb
        self.intermediate_hash = DigestVariable(pb, 256)
        length_padding = _prf_padding(ZERO)
        block1 = BlockVariable(pb, [sk, rho])
        block2 = BlockVariable(pb, [length_padding])
        IV = sha256_default_IV()
        self.hasher1 = Sha256CompressionGadget(
            pb, IV, block1.bits, self.intermediate_hash)
        self.hasher2 = Sha256CompressionGadget(
            pb, self.intermediate_hash.bits, block2.bits, sn)

    def generate_constraints(self):
        self.intermediate_hash.generate_constraints()
        self.hasher1.generate_constraints()
        self.hasher2.generate_constraints()

    def generate_witness(self):
        self.hasher1.generate_witness()
        self.hasher2.generate_witness()


class NoteGadgetWithPacking:
    """mint/circuit/note.tcc:6-88."""

    def __init__(self, pb: Protoboard, value, value_old, value_s, sk, r, r_old):
        self.pb = pb
        self.value, self.value_old, self.value_s = value, value_old, value_s
        self.sk, self.r, self.r_old = sk, r, r_old
        self.value_packed = pb.allocate()
        self.value_old_packed = pb.allocate()
        self.value_s_packed = pb.allocate()

    def generate_constraints(self):
        for arr in (self.value_old, self.value_s, self.value):
            for b in arr:
                generate_boolean_constraint(self.pb, b)
        self.sk.generate_constraints()
        self.r.generate_constraints()
        self.r_old.generate_constraints()

    def _fill_u64(self, arr, v):
        bits = NT.uint64_to_bits(v)
        for var, bit in zip(arr, bits):
            self.pb.setval(var, bit)

    def generate_witness(self, note_old: NT.Note, note: NT.Note, v_s: int,
                         sk_data: bytes):
        self._fill_u64(self.value, note.value)
        self.pb.setval(self.value_packed, note.value)
        self._fill_u64(self.value_old, note_old.value)
        self.pb.setval(self.value_old_packed, note_old.value)
        self._fill_u64(self.value_s, v_s)
        self.pb.setval(self.value_s_packed, v_s)
        self.sk.fill_with_bits(NT.bytes_to_bits(sk_data))
        self.r.fill_with_bits(NT.bytes_to_bits(note.r))
        self.r_old.fill_with_bits(NT.bytes_to_bits(note_old.r))


class NoteGadgetWithComparisonAndAdditionForBalance(NoteGadgetWithPacking):
    """mint/circuit/add_cmp.tcc:9-35: adds 1*(value_old+value_s) = value."""

    def generate_constraints(self):
        super().generate_constraints()
        self.pb.add_constraint(
            LC.of(1),
            LC.var(self.value_old_packed) + LC.var(self.value_s_packed),
            LC.var(self.value_packed))


class MintGadget:
    """src/mint/circuit/gadget.tcc:23-304."""

    PACKED_INPUTS = 4  # ceil(832 / 253)

    def __init__(self, pb: Protoboard):
        self.pb = pb
        self.zk_packed_inputs = pb.allocate_array(self.PACKED_INPUTS)
        pb.set_input_sizes(self.PACKED_INPUTS)

        self.zk_unpacked_inputs: List[int] = []
        self.cmtA_old = self._alloc_uint256()
        self.sn_old = self._alloc_uint256()
        self.cmtA = self._alloc_uint256()
        self.value_s = self._alloc_uint64()
        assert len(self.zk_unpacked_inputs) == 832

        self.unpacker = MultipackingGadget(
            pb, self.zk_unpacked_inputs, self.zk_packed_inputs, FR_CAPACITY)

        self.ZERO = pb.allocate()
        self.value = pb.allocate_array(64)
        self.value_old = pb.allocate_array(64)
        self.sk = DigestVariable(pb, 256)
        self.r = DigestVariable(pb, 256)
        self.r_old = DigestVariable(pb, 256)
        self.sn = DigestVariable(pb, 256)

        self.ncab = NoteGadgetWithComparisonAndAdditionForBalance(
            pb, self.value, self.value_old, self.value_s,
            self.sk, self.r, self.r_old)

        self.prf_to_inputs_sn = Sha256PrfGadget(
            pb, self.ZERO, self.sk.bits, self.r.bits, self.sn)

        self.commit_to_inputs_cmt_old = Sha256CmtaGadget(
            pb, self.ZERO, self.value_old, self.sn_old.bits,
            self.r_old.bits, self.cmtA_old)

        self.commit_to_inputs_cmt = Sha256CmtaGadget(
            pb, self.ZERO, self.value, self.sn.bits, self.r.bits, self.cmtA)

    def _alloc_uint256(self) -> DigestVariable:
        d = DigestVariable(self.pb, 256)
        self.zk_unpacked_inputs.extend(d.bits)
        return d

    def _alloc_uint64(self) -> List[int]:
        arr = self.pb.allocate_array(64)
        self.zk_unpacked_inputs.extend(arr)
        return arr

    def generate_constraints(self):
        self.unpacker.generate_constraints(True)
        self.ncab.generate_constraints()
        generate_equals_const_constraint(self.pb, self.ZERO, 0)
        self.sn.generate_constraints()
        self.prf_to_inputs_sn.generate_constraints()
        self.sn_old.generate_constraints()
        self.cmtA_old.generate_constraints()
        self.commit_to_inputs_cmt_old.generate_constraints()
        self.cmtA.generate_constraints()
        self.commit_to_inputs_cmt.generate_constraints()

    def generate_witness(self, note_old: NT.Note, note: NT.Note,
                         cmtA_old: bytes, cmtA: bytes, v_s: int,
                         sk_data: bytes):
        self.ncab.generate_witness(note_old, note, v_s, sk_data)
        self.pb.setval(self.ZERO, 0)
        self.prf_to_inputs_sn.generate_witness()
        self.sn.fill_with_bits(NT.bytes_to_bits(note.sn))
        self.sn_old.fill_with_bits(NT.bytes_to_bits(note_old.sn))
        self.commit_to_inputs_cmt_old.generate_witness()
        self.commit_to_inputs_cmt.generate_witness()
        self.cmtA_old.fill_with_bits(NT.bytes_to_bits(cmtA_old))
        self.cmtA.fill_with_bits(NT.bytes_to_bits(cmtA))
        self.unpacker.witness_from_bits()

    @staticmethod
    def witness_map(cmtA_old: bytes, sn_old: bytes, cmtA: bytes,
                    value_s: int) -> List[int]:
        """Public-input packing (gadget.tcc:249-285)."""
        bits = (NT.bytes_to_bits(cmtA_old) + NT.bytes_to_bits(sn_old)
                + NT.bytes_to_bits(cmtA) + NT.uint64_to_bits(value_s))
        return pack_bits(bits)


def pack_bits(bits: List[int], chunk: int = FR_CAPACITY) -> List[int]:
    """libff pack_bit_vector_into_field_element_vector (field_utils.tcc:79)."""
    out = []
    for off in range(0, len(bits), chunk):
        acc = 0
        for j, b in enumerate(bits[off:off + chunk]):
            acc |= b << j
        out.append(acc)
    return out
