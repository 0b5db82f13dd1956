// Native proving-key parser: libsnark decimal-text pk -> device limb tensors.
//
// The reference loads its proving key with ~20s of istream parsing
// (src/mint/mintcgo.cpp:300-301); the pure-Python parser in
// serialization/libsnark_io.py costs minutes on the 85-253 MB key files
// because every G1/G2 point needs a Tonelli-Shanks decompression. This
// C++ module does the full job natively:
//
//   * tokenizes the whole file in memory,
//   * decompresses points (Fq sqrt = a^((q+1)/4) since q = 3 mod 4;
//     Fq2 sqrt via the complex method over u^2 = -1, matching
//     alt_bn128_init.cpp's non_residue),
//   * converts coordinates to Montgomery form (R = 2^256, identical to
//     libff fp.tcc mul_reduce's in-memory layout),
//   * emits 16x16-bit little-endian limbs in uint32 lanes -- exactly the
//     tensors blockmaze_tpu.fields.jfield consumes.
//
// Exposed as a C ABI consumed via ctypes (serialization/native_io.py);
// no pybind11 dependency.
//
// Format reference: r1cs_gg_ppzksnark.tcc:52-66 (pk layout),
// alt_bn128_g1.cpp:404-476 (compressed point streams),
// sparse_vector.tcc:272, variable.tcc:411-421 (linear combinations).

#include <gmp.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

const char* Q_DEC =
    "21888242871839275222246405745257275088696311157297823662689037894645226"
    "208583";
const char* R_DEC =
    "21888242871839275222246405745257275088548364400416034343698204186575808"
    "495617";

struct Ctx {
    mpz_t q, r;          // field moduli
    mpz_t q_sqrt_exp;    // (q+1)/4
    mpz_t q_euler;       // (q-1)/2
    mpz_t two_inv_q;     // 1/2 mod q
    Ctx() {
        mpz_init_set_str(q, Q_DEC, 10);
        mpz_init_set_str(r, R_DEC, 10);
        mpz_init(q_sqrt_exp);
        mpz_add_ui(q_sqrt_exp, q, 1);
        mpz_fdiv_q_ui(q_sqrt_exp, q_sqrt_exp, 4);
        mpz_init(q_euler);
        mpz_sub_ui(q_euler, q, 1);
        mpz_fdiv_q_ui(q_euler, q_euler, 2);
        mpz_init(two_inv_q);
        mpz_set_ui(two_inv_q, 2);
        mpz_invert(two_inv_q, two_inv_q, q);
    }
};

Ctx& ctx() {
    static Ctx c;
    return c;
}

// ---------------------------------------------------------------------------
// Tokenizer over an in-memory buffer
// ---------------------------------------------------------------------------

struct Scanner {
    char* buf;
    size_t len;
    size_t pos = 0;

    explicit Scanner(const char* path) {
        FILE* f = fopen(path, "rb");
        if (!f) { buf = nullptr; len = 0; return; }
        fseek(f, 0, SEEK_END);
        len = ftell(f);
        fseek(f, 0, SEEK_SET);
        buf = static_cast<char*>(malloc(len + 1));
        if (fread(buf, 1, len, f) != len) { free(buf); buf = nullptr; }
        else buf[len] = '\0';
        fclose(f);
    }
    ~Scanner() { free(buf); }

    // returns a NUL-terminated token (mutates buffer in place)
    char* next() {
        while (pos < len && isspace(static_cast<unsigned char>(buf[pos]))) pos++;
        if (pos >= len) return nullptr;
        size_t start = pos;
        while (pos < len && !isspace(static_cast<unsigned char>(buf[pos]))) pos++;
        buf[pos] = '\0';
        if (pos < len) pos++;
        return buf + start;
    }
    long next_long() {
        char* t = next();
        return t ? strtol(t, nullptr, 10) : -1;
    }
    void next_mpz(mpz_t out) {
        char* t = next();
        if (!t) { mpz_set_ui(out, 0); return; }
        mpz_set_str(out, t, 10);
    }
};

// ---------------------------------------------------------------------------
// Field helpers
// ---------------------------------------------------------------------------

// value (standard form) -> 16 little-endian 16-bit limbs in uint32 lanes,
// Montgomery form (x * 2^256 mod p)
void to_mont_limbs(const mpz_t x, const mpz_t p, uint32_t* out16) {
    static thread_local mpz_t t;
    static thread_local bool init = false;
    if (!init) { mpz_init(t); init = true; }
    mpz_mul_2exp(t, x, 256);
    mpz_mod(t, t, p);
    unsigned char bytes[32] = {0};
    size_t count = 0;
    mpz_export(bytes, &count, -1, 1, -1, 0, t);  // little-endian bytes
    for (int i = 0; i < 16; i++)
        out16[i] = static_cast<uint32_t>(bytes[2 * i]) |
                   (static_cast<uint32_t>(bytes[2 * i + 1]) << 8);
}

void export_std_bytes(const mpz_t x, unsigned char* out32) {
    memset(out32, 0, 32);
    size_t count = 0;
    mpz_export(out32, &count, -1, 1, -1, 0, x);
}

// y^2 = x^3 + 3 over Fq; returns y with given parity. true on success.
bool g1_decompress(const mpz_t x, long lsb, mpz_t y_out) {
    Ctx& c = ctx();
    mpz_t y2;
    mpz_init(y2);
    mpz_powm_ui(y2, x, 3, c.q);
    mpz_add_ui(y2, y2, 3);
    mpz_mod(y2, y2, c.q);
    mpz_powm(y_out, y2, c.q_sqrt_exp, c.q);  // q = 3 mod 4
    // verify
    mpz_t chk;
    mpz_init(chk);
    mpz_powm_ui(chk, y_out, 2, c.q);
    bool ok = (mpz_cmp(chk, y2) == 0);
    if (ok && (mpz_tstbit(y_out, 0) != static_cast<int>(lsb)))
        mpz_sub(y_out, c.q, y_out);
    mpz_clears(y2, chk, nullptr);
    return ok;
}

// Fq2 = Fq[u]/(u^2+1). Twist curve y^2 = x^3 + b2 with
// b2 = 3 / (9 + u)  (alt_bn128_init.cpp twist coefficient).
struct Fq2 { mpz_t c0, c1; };

void fq2_init(Fq2& a) { mpz_inits(a.c0, a.c1, nullptr); }
void fq2_clear(Fq2& a) { mpz_clears(a.c0, a.c1, nullptr); }

void fq2_mul(Fq2& out, const Fq2& a, const Fq2& b) {
    Ctx& c = ctx();
    mpz_t t0, t1, t2;
    mpz_inits(t0, t1, t2, nullptr);
    mpz_mul(t0, a.c0, b.c0);
    mpz_mul(t1, a.c1, b.c1);
    // c0 = a0 b0 - a1 b1; c1 = a0 b1 + a1 b0
    mpz_mul(t2, a.c0, b.c1);
    mpz_addmul(t2, a.c1, b.c0);
    mpz_sub(t0, t0, t1);
    mpz_mod(out.c0, t0, c.q);
    mpz_mod(out.c1, t2, c.q);
    mpz_clears(t0, t1, t2, nullptr);
}

bool fq_is_square(const mpz_t a) {
    Ctx& c = ctx();
    if (mpz_sgn(a) == 0) return true;
    mpz_t e;
    mpz_init(e);
    mpz_powm(e, a, c.q_euler, c.q);
    bool ok = (mpz_cmp_ui(e, 1) == 0);
    mpz_clear(e);
    return ok;
}

// sqrt in Fq2 by the complex method (valid since u^2 = -1):
//   alpha = sqrt(a0^2 + a1^2); delta = (a0 + alpha)/2 (flip sign if non-QR)
//   x0 = sqrt(delta); x1 = a1 / (2 x0)
bool fq2_sqrt(const Fq2& a, Fq2& out) {
    Ctx& c = ctx();
    if (mpz_sgn(a.c1) == 0) {
        // pure Fq element: sqrt is either in Fq or in u*Fq
        if (fq_is_square(a.c0)) {
            mpz_powm(out.c0, a.c0, c.q_sqrt_exp, c.q);
            mpz_set_ui(out.c1, 0);
        } else {
            mpz_t na;
            mpz_init(na);
            mpz_sub(na, c.q, a.c0);  // -a0 = (u * sqrt)^2 / u^2 ... sqrt = u*sqrt(-a0)
            mpz_powm(out.c1, na, c.q_sqrt_exp, c.q);
            mpz_set_ui(out.c0, 0);
            mpz_clear(na);
        }
        return true;
    }
    mpz_t norm, alpha, delta, x0, x1, tmp;
    mpz_inits(norm, alpha, delta, x0, x1, tmp, nullptr);
    bool ok = false;
    // norm = a0^2 + a1^2
    mpz_mul(norm, a.c0, a.c0);
    mpz_addmul(norm, a.c1, a.c1);
    mpz_mod(norm, norm, c.q);
    if (fq_is_square(norm)) {
        mpz_powm(alpha, norm, c.q_sqrt_exp, c.q);
        mpz_add(delta, a.c0, alpha);
        mpz_mul(delta, delta, c.two_inv_q);
        mpz_mod(delta, delta, c.q);
        if (!fq_is_square(delta)) {
            mpz_sub(delta, a.c0, alpha);
            mpz_mul(delta, delta, c.two_inv_q);
            mpz_mod(delta, delta, c.q);
        }
        if (fq_is_square(delta)) {
            mpz_powm(x0, delta, c.q_sqrt_exp, c.q);
            // x1 = a1 / (2 x0)
            mpz_mul_ui(tmp, x0, 2);
            mpz_mod(tmp, tmp, c.q);
            if (mpz_invert(tmp, tmp, c.q)) {
                mpz_mul(x1, a.c1, tmp);
                mpz_mod(x1, x1, c.q);
                mpz_set(out.c0, x0);
                mpz_set(out.c1, x1);
                // verify
                Fq2 sq;
                fq2_init(sq);
                fq2_mul(sq, out, out);
                ok = (mpz_cmp(sq.c0, a.c0) == 0 && mpz_cmp(sq.c1, a.c1) == 0);
                fq2_clear(sq);
            }
        }
    }
    mpz_clears(norm, alpha, delta, x0, x1, tmp, nullptr);
    return ok;
}

// twist coefficient b2 = 3/(9+u)
void g2_coeff_b(Fq2& b) {
    Ctx& c = ctx();
    // (9+u)^-1 = (9-u)/82
    mpz_t inv82;
    mpz_init_set_ui(inv82, 82);
    mpz_invert(inv82, inv82, c.q);
    mpz_mul_ui(b.c0, inv82, 27);  // 3 * 9 / 82
    mpz_mod(b.c0, b.c0, c.q);
    mpz_mul_ui(b.c1, inv82, 3);   // 3 * (-1) / 82 -> negate
    mpz_mod(b.c1, b.c1, c.q);
    mpz_sub(b.c1, c.q, b.c1);
    mpz_clear(inv82);
}

bool g2_decompress(const Fq2& x, long lsb, Fq2& y_out) {
    static bool binit = false;
    static Fq2 b;
    if (!binit) { fq2_init(b); g2_coeff_b(b); binit = true; }
    Ctx& c = ctx();
    Fq2 y2;
    fq2_init(y2);
    fq2_mul(y2, x, x);
    fq2_mul(y2, y2, x);
    mpz_add(y2.c0, y2.c0, b.c0);
    mpz_mod(y2.c0, y2.c0, c.q);
    mpz_add(y2.c1, y2.c1, b.c1);
    mpz_mod(y2.c1, y2.c1, c.q);
    bool ok = fq2_sqrt(y2, y_out);
    if (ok && (mpz_tstbit(y_out.c0, 0) != static_cast<int>(lsb))) {
        if (mpz_sgn(y_out.c0)) mpz_sub(y_out.c0, c.q, y_out.c0);
        if (mpz_sgn(y_out.c1)) mpz_sub(y_out.c1, c.q, y_out.c1);
    }
    fq2_clear(y2);
    return ok;
}

// ---------------------------------------------------------------------------
// Parsed pk container
// ---------------------------------------------------------------------------

struct G1Rec { uint32_t x[16], y[16]; uint8_t inf; };
struct G2Rec { uint32_t x[32], y[32]; uint8_t inf; };  // (c0 limbs, c1 limbs)

struct CooRec { int32_t row, var; uint32_t coeff[16]; };

struct ParsedPK {
    long primary = 0, aux = 0, ncons = 0, b_domain = 0;
    unsigned char consts[32 * 14];  // alpha(2) beta_g1(2) beta_g2(4) delta_g1(2) delta_g2(4) as 32B LE each
    uint8_t const_inf[5] = {0, 0, 0, 0, 0};
    std::vector<G1Rec> A, B1, H, L;
    std::vector<G2Rec> B2;
    std::vector<int32_t> B_idx;
    std::vector<CooRec> a_coo, b_coo, c_coo;
    bool ok = false;
};

bool read_g1(Scanner& s, G1Rec& out, mpz_t x, mpz_t y) {
    Ctx& c = ctx();
    long is_zero = s.next_long();
    s.next_mpz(x);
    long lsb = s.next_long();
    if (is_zero) {
        memset(out.x, 0, sizeof out.x);
        memset(out.y, 0, sizeof out.y);
        out.inf = 1;
        return true;
    }
    if (!g1_decompress(x, lsb, y)) return false;
    to_mont_limbs(x, c.q, out.x);
    to_mont_limbs(y, c.q, out.y);
    out.inf = 0;
    return true;
}

bool read_g2(Scanner& s, G2Rec& out, Fq2& x, Fq2& y) {
    Ctx& c = ctx();
    long is_zero = s.next_long();
    s.next_mpz(x.c0);
    s.next_mpz(x.c1);
    long lsb = s.next_long();
    if (is_zero) {
        memset(out.x, 0, sizeof out.x);
        memset(out.y, 0, sizeof out.y);
        out.inf = 1;
        return true;
    }
    if (!g2_decompress(x, lsb, y)) return false;
    to_mont_limbs(x.c0, c.q, out.x);
    to_mont_limbs(x.c1, c.q, out.x + 16);
    to_mont_limbs(y.c0, c.q, out.y);
    to_mont_limbs(y.c1, c.q, out.y + 16);
    out.inf = 0;
    return true;
}

// read raw (uncompressed-to-bytes) G1/G2 for the scalar constants: we keep
// standard-form bytes so Python reconstructs exact host ints
bool read_g1_const(Scanner& s, unsigned char* out64, uint8_t* inf,
                   mpz_t x, mpz_t y) {
    long is_zero = s.next_long();
    s.next_mpz(x);
    long lsb = s.next_long();
    *inf = static_cast<uint8_t>(is_zero != 0);
    if (is_zero) { memset(out64, 0, 64); return true; }
    if (!g1_decompress(x, lsb, y)) return false;
    export_std_bytes(x, out64);
    export_std_bytes(y, out64 + 32);
    return true;
}

bool read_g2_const(Scanner& s, unsigned char* out128, uint8_t* inf,
                   Fq2& x, Fq2& y) {
    long is_zero = s.next_long();
    s.next_mpz(x.c0);
    s.next_mpz(x.c1);
    long lsb = s.next_long();
    *inf = static_cast<uint8_t>(is_zero != 0);
    if (is_zero) { memset(out128, 0, 128); return true; }
    if (!g2_decompress(x, lsb, y)) return false;
    export_std_bytes(x.c0, out128);
    export_std_bytes(x.c1, out128 + 32);
    export_std_bytes(y.c0, out128 + 64);
    export_std_bytes(y.c1, out128 + 96);
    return true;
}

void read_lc(Scanner& s, long row, std::vector<CooRec>& coo, mpz_t tmp) {
    Ctx& c = ctx();
    long n = s.next_long();
    for (long i = 0; i < n; i++) {
        CooRec rec;
        rec.row = static_cast<int32_t>(row);
        rec.var = static_cast<int32_t>(s.next_long());
        s.next_mpz(tmp);
        mpz_mod(tmp, tmp, c.r);
        to_mont_limbs(tmp, c.r, rec.coeff);
        coo.push_back(rec);
    }
}

}  // namespace

extern "C" {

// meta out layout:
// [0]=ok [1]=primary [2]=aux [3]=ncons [4]=nA [5]=nB [6]=nH [7]=nL
// [8]=nnzA [9]=nnzB [10]=nnzC [11]=b_domain
void* bmtpu_parse_pk(const char* path, long* meta) {
    Scanner s(path);
    meta[0] = 0;
    if (!s.buf) return nullptr;
    auto* pk = new ParsedPK();
    mpz_t x, y, tmp;
    mpz_inits(x, y, tmp, nullptr);
    Fq2 x2, y2;
    fq2_init(x2);
    fq2_init(y2);

    bool ok = true;
    ok = ok && read_g1_const(s, pk->consts + 0, &pk->const_inf[0], x, y);
    ok = ok && read_g1_const(s, pk->consts + 64, &pk->const_inf[1], x, y);
    ok = ok && read_g2_const(s, pk->consts + 128, &pk->const_inf[2], x2, y2);
    ok = ok && read_g1_const(s, pk->consts + 256, &pk->const_inf[3], x, y);
    ok = ok && read_g2_const(s, pk->consts + 320, &pk->const_inf[4], x2, y2);

    if (ok) {
        long nA = s.next_long();
        pk->A.resize(nA);
        for (long i = 0; ok && i < nA; i++) ok = read_g1(s, pk->A[i], x, y);
    }
    if (ok) {
        pk->b_domain = s.next_long();
        long nidx = s.next_long();
        pk->B_idx.resize(nidx);
        for (long i = 0; i < nidx; i++)
            pk->B_idx[i] = static_cast<int32_t>(s.next_long());
        long nval = s.next_long();
        ok = (nval == nidx);
        pk->B2.resize(nval);
        pk->B1.resize(nval);
        for (long i = 0; ok && i < nval; i++) {
            ok = read_g2(s, pk->B2[i], x2, y2) && read_g1(s, pk->B1[i], x, y);
        }
    }
    for (auto* vec : {&pk->H, &pk->L}) {
        if (!ok) break;
        long n = s.next_long();
        vec->resize(n);
        for (long i = 0; ok && i < n; i++) ok = read_g1(s, (*vec)[i], x, y);
    }
    if (ok) {
        pk->primary = s.next_long();
        pk->aux = s.next_long();
        pk->ncons = s.next_long();
        for (long i = 0; i < pk->ncons; i++) {
            read_lc(s, i, pk->a_coo, tmp);
            read_lc(s, i, pk->b_coo, tmp);
            read_lc(s, i, pk->c_coo, tmp);
        }
    }

    mpz_clears(x, y, tmp, nullptr);
    fq2_clear(x2);
    fq2_clear(y2);
    if (!ok) { delete pk; return nullptr; }
    pk->ok = true;
    meta[0] = 1;
    meta[1] = pk->primary;
    meta[2] = pk->aux;
    meta[3] = pk->ncons;
    meta[4] = static_cast<long>(pk->A.size());
    meta[5] = static_cast<long>(pk->B2.size());
    meta[6] = static_cast<long>(pk->H.size());
    meta[7] = static_cast<long>(pk->L.size());
    meta[8] = static_cast<long>(pk->a_coo.size());
    meta[9] = static_cast<long>(pk->b_coo.size());
    meta[10] = static_cast<long>(pk->c_coo.size());
    meta[11] = pk->b_domain;
    return pk;
}

static void fill_g1(const std::vector<G1Rec>& v, uint32_t* xs, uint32_t* ys,
                    uint8_t* inf) {
    for (size_t i = 0; i < v.size(); i++) {
        memcpy(xs + 16 * i, v[i].x, 64);
        memcpy(ys + 16 * i, v[i].y, 64);
        inf[i] = v[i].inf;
    }
}

static void fill_coo(const std::vector<CooRec>& v, int32_t* row, int32_t* var,
                     uint32_t* coeff) {
    for (size_t i = 0; i < v.size(); i++) {
        row[i] = v[i].row;
        var[i] = v[i].var;
        memcpy(coeff + 16 * i, v[i].coeff, 64);
    }
}

void bmtpu_fill_pk(void* handle,
                   uint32_t* A_x, uint32_t* A_y, uint8_t* A_inf,
                   int32_t* B_idx,
                   uint32_t* B2_x, uint32_t* B2_y, uint8_t* B2_inf,
                   uint32_t* B1_x, uint32_t* B1_y, uint8_t* B1_inf,
                   uint32_t* H_x, uint32_t* H_y, uint8_t* H_inf,
                   uint32_t* L_x, uint32_t* L_y, uint8_t* L_inf,
                   int32_t* a_row, int32_t* a_var, uint32_t* a_coeff,
                   int32_t* b_row, int32_t* b_var, uint32_t* b_coeff,
                   int32_t* c_row, int32_t* c_var, uint32_t* c_coeff,
                   unsigned char* consts, uint8_t* const_inf) {
    auto* pk = static_cast<ParsedPK*>(handle);
    fill_g1(pk->A, A_x, A_y, A_inf);
    memcpy(B_idx, pk->B_idx.data(), pk->B_idx.size() * sizeof(int32_t));
    for (size_t i = 0; i < pk->B2.size(); i++) {
        memcpy(B2_x + 32 * i, pk->B2[i].x, 128);
        memcpy(B2_y + 32 * i, pk->B2[i].y, 128);
        B2_inf[i] = pk->B2[i].inf;
    }
    fill_g1(pk->B1, B1_x, B1_y, B1_inf);
    fill_g1(pk->H, H_x, H_y, H_inf);
    fill_g1(pk->L, L_x, L_y, L_inf);
    fill_coo(pk->a_coo, a_row, a_var, a_coeff);
    fill_coo(pk->b_coo, b_row, b_var, b_coeff);
    fill_coo(pk->c_coo, c_row, c_var, c_coeff);
    memcpy(consts, pk->consts, sizeof pk->consts);
    memcpy(const_inf, pk->const_inf, sizeof pk->const_inf);
}

void bmtpu_free_pk(void* handle) {
    delete static_cast<ParsedPK*>(handle);
}

}  // extern "C"
