// Interop oracle: drives the UNMODIFIED reference libsnark-vnt stack with
// configurable file paths, so the TPU framework can be validated bit-exactly
// against it in both directions:
//
//   oracle verify  <vk.txt> <proof.txt> <primary.txt>
//       - loads a reference-format vk + decimal-serialized proof + primary
//         input list, runs r1cs_gg_ppzksnark_verifier_strong_IC, prints
//         VERIFY_OK / VERIFY_FAIL.
//
//   oracle prove_redeem <pk.txt> <proof_out> <primary_out>
//                     <value_old> <value> <value_s> <sk_hex> <r_old_hex> <r_hex>
//       - builds the reference mint circuit witness, proves with the
//         reference prover, writes proof + primary input for cross-checking
//         our verifier.
//
// This file is our own test-harness code; it only *links against* the
// read-only reference sources.
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>

#include <boost/foreach.hpp>
#include <boost/optional.hpp>

#include "libsnark/zk_proof_systems/ppzksnark/r1cs_gg_ppzksnark/r1cs_gg_ppzksnark.hpp"
#include "libsnark/common/default_types/r1cs_gg_ppzksnark_pp.hpp"
#include <libsnark/gadgetlib1/gadgets/hashes/sha256/sha256_gadget.hpp>
#include "libff/algebra/curves/alt_bn128/alt_bn128_pp.hpp"

#include "Note.h"
#include "uint256.h"

using namespace libsnark;
using namespace libff;
using namespace std;

#include "circuit/gadget.tcc"

typedef default_r1cs_gg_ppzksnark_pp ppT;
typedef libff::Fr<ppT> FieldT;

template <typename T>
static void load(const char *path, T &obj) {
  std::ifstream fh(path, std::ios::binary);
  if (!fh) { std::cerr << "cannot open " << path << "\n"; exit(2); }
  fh >> obj;
}

template <typename T>
static void save(const char *path, const T &obj) {
  std::ofstream fh(path, std::ios::binary);
  fh << obj;
}

static int do_verify(int argc, char **argv) {
  r1cs_gg_ppzksnark_verification_key<ppT> vk;
  load(argv[2], vk);
  r1cs_gg_ppzksnark_proof<ppT> proof;
  load(argv[3], proof);

  std::ifstream fh(argv[4]);
  size_t n;
  fh >> n;
  r1cs_primary_input<FieldT> primary;
  for (size_t i = 0; i < n; i++) {
    FieldT x;
    fh >> x;
    primary.push_back(x);
  }
  bool ok = r1cs_gg_ppzksnark_verifier_strong_IC<ppT>(vk, primary, proof);
  std::cout << (ok ? "VERIFY_OK" : "VERIFY_FAIL") << std::endl;
  return ok ? 0 : 1;
}

static int do_prove_redeem(int argc, char **argv) {
  if (argc < 11) { std::cerr << "bad args\n"; return 2; }
  r1cs_gg_ppzksnark_proving_key<ppT> pk;
  load(argv[2], pk);

  uint64_t value_old = strtoull(argv[5], nullptr, 10);
  uint64_t value = strtoull(argv[6], nullptr, 10);
  uint64_t value_s = strtoull(argv[7], nullptr, 10);
  uint256 sk = uint256S(argv[8]);
  uint256 r_old = uint256S(argv[9]);
  uint256 r = uint256S(argv[10]);

  uint256 sn_old = Compute_PRF(sk, r_old);
  Note note_old = Note(value_old, sn_old, r_old);
  uint256 cmtA_old = note_old.cm();
  uint256 sn = Compute_PRF(sk, r);
  Note note = Note(value, sn, r);
  uint256 cmtA = note.cm();

  protoboard<FieldT> pb;
  redeem_gadget<FieldT> g(pb);
  g.generate_r1cs_constraints();
  g.generate_r1cs_witness(note_old, note, cmtA_old, cmtA, value_s, sk);
  if (!pb.is_satisfied()) {
    std::cerr << "witness not satisfied\n";
    return 3;
  }
  auto proof =
      r1cs_gg_ppzksnark_prover<ppT>(pk, pb.primary_input(), pb.auxiliary_input());
  save(argv[3], proof);

  auto primary = pb.primary_input();
  std::ofstream fh(argv[4]);
  fh << primary.size() << "\n";
  for (auto &x : primary) fh << x << "\n";
  std::cout << "PROVE_OK" << std::endl;
  return 0;
}

// witness_redeem <primary_out> <aux_out> <value_old> <value> <value_s> <sk_hex> <r_old_hex> <r_hex>
// Dumps the full reference variable assignment (primary + auxiliary) so the
// TPU prover can be developed/tested against a known-good witness before our
// own gadget stack lands.
static int do_witness_redeem(int argc, char **argv) {
  if (argc < 10) { std::cerr << "bad args\n"; return 2; }
  uint64_t value_old = strtoull(argv[4], nullptr, 10);
  uint64_t value = strtoull(argv[5], nullptr, 10);
  uint64_t value_s = strtoull(argv[6], nullptr, 10);
  uint256 sk = uint256S(argv[7]);
  uint256 r_old = uint256S(argv[8]);
  uint256 r = uint256S(argv[9]);

  uint256 sn_old = Compute_PRF(sk, r_old);
  Note note_old = Note(value_old, sn_old, r_old);
  uint256 cmtA_old = note_old.cm();
  uint256 sn = Compute_PRF(sk, r);
  Note note = Note(value, sn, r);
  uint256 cmtA = note.cm();

  protoboard<FieldT> pb;
  redeem_gadget<FieldT> g(pb);
  g.generate_r1cs_constraints();
  g.generate_r1cs_witness(note_old, note, cmtA_old, cmtA, value_s, sk);
  if (!pb.is_satisfied()) { std::cerr << "witness not satisfied\n"; return 3; }

  auto primary = pb.primary_input();
  std::ofstream fh(argv[2]);
  fh << primary.size() << "\n";
  for (auto &x : primary) fh << x << "\n";
  auto aux = pb.auxiliary_input();
  std::ofstream fa(argv[3]);
  fa << aux.size() << "\n";
  for (auto &x : aux) fa << x << "\n";
  std::cout << "WITNESS_OK" << std::endl;
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) {
    std::cerr << "usage: oracle verify|prove_redeem ...\n";
    return 2;
  }
  ppT::init_public_params();
  std::string mode = argv[1];
  if (mode == "verify") return do_verify(argc, argv);
  if (mode == "prove_redeem") return do_prove_redeem(argc, argv);
  if (mode == "witness_redeem") return do_witness_redeem(argc, argv);
  std::cerr << "unknown mode " << mode << "\n";
  return 2;
}
