// Interop oracle for the DEPOSIT circuit (cf oracle.cpp / oracle_send.cpp).
//
//   oracle_deposit verify  <vk.txt> <proof.txt> <primary.txt>
//   oracle_deposit prove_deposit <pk.txt> <proof_out> <primary_out> <args...>
//   oracle_deposit witness_deposit <primary_out> <aux_out> <args...>
//
// args: value_old value value_s sk_hex r_old_hex r_hex r_s_hex sn_A_old_hex
//       pk_recv_hex160 leaf_index(0..15)
// Builds the same 16-leaf incremental tree as src/deposit/main.cpp:153-196
// (cmtS at leaf_index, other leaves uint256S("1".."16")).
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>

#include <boost/array.hpp>
#include <boost/foreach.hpp>
#include <boost/optional.hpp>
#include <boost/static_assert.hpp>

#include "libsnark/zk_proof_systems/ppzksnark/r1cs_gg_ppzksnark/r1cs_gg_ppzksnark.hpp"
#include "libsnark/common/default_types/r1cs_gg_ppzksnark_pp.hpp"
#include <libsnark/gadgetlib1/gadgets/hashes/sha256/sha256_gadget.hpp>
#include <libsnark/gadgetlib1/gadgets/merkle_tree/merkle_tree_check_read_gadget.hpp>
#include "libff/algebra/curves/alt_bn128/alt_bn128_pp.hpp"

#include "deposit/Note.h"
#include "deposit/uint256.h"
#include "deposit/IncrementalMerkleTree.hpp"

using namespace libsnark;
using namespace libff;
using namespace std;
using namespace libvnt;

#include "deposit/circuit/gadget.tcc"

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

struct DepositInstance {
  NoteS note_s{0, uint160(), uint256(), uint256()};
  Note note_old{0, uint256(), uint256()};
  Note note{0, uint256(), uint256()};
  uint256 cmtS, cmtB_old, cmtB, rt, sn_s, sk;
  MerklePath path;
};

static DepositInstance build_instance(char **a) {
  uint64_t value_old = strtoull(a[0], nullptr, 10);
  uint64_t value = strtoull(a[1], nullptr, 10);
  uint64_t value_s = strtoull(a[2], nullptr, 10);
  uint256 sk = uint256S(a[3]);
  uint256 r_old = uint256S(a[4]);
  uint256 r = uint256S(a[5]);
  uint256 r_s = uint256S(a[6]);
  uint256 sn_A_old = uint256S(a[7]);
  uint160 pk_recv = uint160S(a[8]);
  size_t leaf_index = strtoull(a[9], nullptr, 10);

  DepositInstance I;
  uint256 sn_old = Compute_PRF(sk, r_old);
  I.note_old = Note(value_old, sn_old, r_old);
  I.cmtB_old = I.note_old.cm();
  I.sn_s = Compute_PRF(sk, r_s);
  I.note_s = NoteS(value_s, pk_recv, r_s, sn_A_old);
  I.cmtS = I.note_s.cm();
  uint256 sn = Compute_PRF(sk, r);
  I.note = Note(value, sn, r);
  I.cmtB = I.note.cm();
  I.sk = sk;

  boost::array<uint256, 16> commitments;
  const char *str[] = {"1","2","3","4","5","6","7","8","9","10","11","12",
                       "13","14","15","16"};
  for (size_t i = 0; i < 16; i++)
    commitments[i] = (i == leaf_index) ? I.cmtS : uint256S(str[i]);

  ZCIncrementalMerkleTree tree;
  ZCIncrementalWitness wit = tree.witness();
  bool found = false;
  for (size_t i = 0; i < 16; i++) {
    if (found) {
      wit.append(commitments[i]);
    } else {
      tree.append(commitments[i]);
    }
    if (i == leaf_index) {
      wit = tree.witness();
      found = true;
    }
  }
  I.path = wit.path();
  I.rt = wit.root();
  return I;
}

static void run_witness(const DepositInstance &I, protoboard<FieldT> &pb) {
  deposit_gadget<FieldT> g(pb);
  g.generate_r1cs_constraints();
  g.generate_r1cs_witness(I.note_s, I.note_old, I.note, I.cmtS, I.cmtB_old,
                          I.cmtB, I.rt, I.path, I.sn_s, I.sk);
  if (!pb.is_satisfied()) {
    std::cerr << "witness not satisfied\n";
    exit(3);
  }
}

static int do_prove(int argc, char **argv) {
  if (argc < 15) { std::cerr << "bad args\n"; return 2; }
  r1cs_gg_ppzksnark_proving_key<ppT> pk;
  load(argv[2], pk);
  DepositInstance I = build_instance(argv + 5);
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
  if (argc < 14) { std::cerr << "bad args\n"; return 2; }
  DepositInstance I = build_instance(argv + 4);
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
  // also dump rt hex so the python side can cross-check its host tree
  std::cerr << "RT=" << I.rt.ToString() << "\n";
  std::cout << "WITNESS_OK" << std::endl;
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) { std::cerr << "usage: oracle_deposit verify|prove_deposit|witness_deposit\n"; return 2; }
  ppT::init_public_params();
  std::string mode = argv[1];
  if (mode == "verify") return do_verify(argc, argv);
  if (mode == "prove_deposit") return do_prove(argc, argv);
  if (mode == "witness_deposit") return do_witness(argc, argv);
  std::cerr << "unknown mode " << mode << "\n";
  return 2;
}
