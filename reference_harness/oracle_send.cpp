// Interop oracle for the SEND circuit (see oracle.cpp for the mint one;
// separate binaries because each circuit's gadget headers define clashing
// template names).
//
//   oracle_send verify  <vk.txt> <proof.txt> <primary.txt>
//   oracle_send prove_send   <pk.txt> <proof_out> <primary_out>
//                             <value_old> <value> <value_s>
//                             <sk_hex> <r_old_hex> <r_hex>
//                             <pk_sender_hex160> <pk_recv_hex160>
//   oracle_send witness_send <primary_out> <aux_out> <same instance args...>
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

struct SendInstance {
  Note note_old{0, uint256(), uint256()};
  NoteS note_s{0, uint160(), uint256(), uint256()};
  Note note{0, uint256(), uint256()};
  uint256 cmtA_old, cmtS, cmtA, sk;
  uint160 pk_sender, pk_recv;
};

static SendInstance build_instance(char **a) {
  // a: value_old value value_s sk r_old r pk_sender pk_recv
  uint64_t value_old = strtoull(a[0], nullptr, 10);
  uint64_t value = strtoull(a[1], nullptr, 10);
  uint64_t value_s = strtoull(a[2], nullptr, 10);
  uint256 sk = uint256S(a[3]);
  uint256 r_old = uint256S(a[4]);
  uint256 r = uint256S(a[5]);
  uint160 pk_sender = uint160S(a[6]);
  uint160 pk_recv = uint160S(a[7]);

  SendInstance I;
  uint256 sn_old = Compute_PRF(sk, r_old);
  I.note_old = Note(value_old, sn_old, r_old);
  I.cmtA_old = I.note_old.cm();
  uint256 sn = Compute_PRF(sk, r);
  I.note = Note(value, sn, r);
  I.cmtA = I.note.cm();
  uint256 r_s = Compute_CRH(pk_sender, r);
  I.note_s = NoteS(value_s, pk_recv, r_s, sn_old);
  I.cmtS = I.note_s.cm();
  I.sk = sk;
  I.pk_sender = pk_sender;
  I.pk_recv = pk_recv;
  return I;
}

static void run_witness(const SendInstance &I, protoboard<FieldT> &pb) {
  send_gadget<FieldT> g(pb);
  g.generate_r1cs_constraints();
  g.generate_r1cs_witness(I.note_old, I.note_s, I.note, I.cmtA_old, I.cmtS,
                          I.cmtA, I.sk, I.pk_sender);
  if (!pb.is_satisfied()) {
    std::cerr << "witness not satisfied\n";
    exit(3);
  }
}

static int do_prove(int argc, char **argv) {
  if (argc < 13) { std::cerr << "bad args\n"; return 2; }
  r1cs_gg_ppzksnark_proving_key<ppT> pk;
  load(argv[2], pk);
  SendInstance I = build_instance(argv + 5);
  protoboard<FieldT> pb;
  run_witness(I, pb);
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

static int do_witness(int argc, char **argv) {
  if (argc < 12) { std::cerr << "bad args\n"; return 2; }
  SendInstance I = build_instance(argv + 4);
  protoboard<FieldT> pb;
  run_witness(I, pb);
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
  if (argc < 2) { std::cerr << "usage: oracle_send verify|prove_send|witness_send\n"; return 2; }
  ppT::init_public_params();
  std::string mode = argv[1];
  if (mode == "verify") return do_verify(argc, argv);
  if (mode == "prove_send") return do_prove(argc, argv);
  if (mode == "witness_send") return do_witness(argc, argv);
  std::cerr << "unknown mode " << mode << "\n";
  return 2;
}
