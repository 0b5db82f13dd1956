/* Minimal ABI-compatible gmp.h shim.
 *
 * The build image ships the GMP runtime (libgmp.so.10) but not its headers.
 * This header declares ONLY the documented public GMP entry points that the
 * reference libsnark/libff stack actually calls (see SURVEY.md §2.1), with
 * the standard symbol aliasing (mpz_* -> __gmpz_*, mpn_* -> __gmpn_*) so we
 * can link directly against the system libgmp.so.10.
 *
 * This is original code written from the public GMP documentation; it is not
 * copied from GMP (whose gmp.h is a generated, much larger file).
 */
#ifndef __GMP_H_SHIM__
#define __GMP_H_SHIM__

#include <stddef.h>

#if defined(__cplusplus)
#include <iosfwd>
extern "C" {
#endif

typedef unsigned long mp_limb_t;
typedef long mp_size_t;
typedef long mp_exp_t;
typedef unsigned long mp_bitcnt_t;

#define GMP_LIMB_BITS 64
#define GMP_NAIL_BITS 0
#define GMP_NUMB_BITS (GMP_LIMB_BITS - GMP_NAIL_BITS)
#define GMP_NUMB_MASK (~(mp_limb_t)0)

typedef struct {
  int _mp_alloc;
  int _mp_size;
  mp_limb_t *_mp_d;
} __mpz_struct;

typedef __mpz_struct mpz_t[1];
typedef __mpz_struct *mpz_ptr;
typedef const __mpz_struct *mpz_srcptr;

typedef mp_limb_t *mp_ptr;
typedef const mp_limb_t *mp_srcptr;

/* ---- mpn (low-level) ---- */
#define mpn_add_1 __gmpn_add_1
#define mpn_add_n __gmpn_add_n
#define mpn_addmul_1 __gmpn_addmul_1
#define mpn_cmp __gmpn_cmp
#define mpn_copyi __gmpn_copyi
#define mpn_gcdext __gmpn_gcdext
#define mpn_get_str __gmpn_get_str
#define mpn_lshift __gmpn_lshift
#define mpn_mul __gmpn_mul
#define mpn_mul_1 __gmpn_mul_1
#define mpn_mul_n __gmpn_mul_n
#define mpn_rshift __gmpn_rshift
#define mpn_set_str __gmpn_set_str
#define mpn_sub __gmpn_sub
#define mpn_sub_1 __gmpn_sub_1
#define mpn_sub_n __gmpn_sub_n
#define mpn_tdiv_qr __gmpn_tdiv_qr
#define mpn_zero __gmpn_zero

mp_limb_t mpn_add_1(mp_ptr, mp_srcptr, mp_size_t, mp_limb_t);
mp_limb_t mpn_add_n(mp_ptr, mp_srcptr, mp_srcptr, mp_size_t);
mp_limb_t mpn_addmul_1(mp_ptr, mp_srcptr, mp_size_t, mp_limb_t);
int mpn_cmp(mp_srcptr, mp_srcptr, mp_size_t);
void mpn_copyi(mp_ptr, mp_srcptr, mp_size_t);
mp_size_t mpn_gcdext(mp_ptr, mp_ptr, mp_size_t *, mp_ptr, mp_size_t, mp_ptr,
                     mp_size_t);
size_t mpn_get_str(unsigned char *, int, mp_ptr, mp_size_t);
mp_limb_t mpn_lshift(mp_ptr, mp_srcptr, mp_size_t, unsigned int);
mp_limb_t mpn_mul(mp_ptr, mp_srcptr, mp_size_t, mp_srcptr, mp_size_t);
mp_limb_t mpn_mul_1(mp_ptr, mp_srcptr, mp_size_t, mp_limb_t);
void mpn_mul_n(mp_ptr, mp_srcptr, mp_srcptr, mp_size_t);
mp_limb_t mpn_rshift(mp_ptr, mp_srcptr, mp_size_t, unsigned int);
mp_size_t mpn_set_str(mp_ptr, const unsigned char *, size_t, int);
mp_limb_t mpn_sub(mp_ptr, mp_srcptr, mp_size_t, mp_srcptr, mp_size_t);
mp_limb_t mpn_sub_1(mp_ptr, mp_srcptr, mp_size_t, mp_limb_t);
mp_limb_t mpn_sub_n(mp_ptr, mp_srcptr, mp_srcptr, mp_size_t);
void mpn_tdiv_qr(mp_ptr, mp_ptr, mp_size_t, mp_srcptr, mp_size_t, mp_srcptr,
                 mp_size_t);
void mpn_zero(mp_ptr, mp_size_t);

/* ---- mpz ---- */
#define mpz_init __gmpz_init
#define mpz_init_set __gmpz_init_set
#define mpz_init_set_ui __gmpz_init_set_ui
#define mpz_clear __gmpz_clear
#define mpz_set __gmpz_set
#define mpz_set_ui __gmpz_set_ui
#define mpz_set_str __gmpz_set_str
#define mpz_get_ui __gmpz_get_ui
#define mpz_get_str __gmpz_get_str
#define mpz_add __gmpz_add
#define mpz_add_ui __gmpz_add_ui
#define mpz_sub __gmpz_sub
#define mpz_mul __gmpz_mul
#define mpz_mul_2exp __gmpz_mul_2exp
#define mpz_fdiv_q_2exp __gmpz_fdiv_q_2exp
#define mpz_fdiv_r_2exp __gmpz_fdiv_r_2exp
#define mpz_tdiv_q_2exp __gmpz_tdiv_q_2exp
#define mpz_mod __gmpz_mod
#define mpz_import __gmpz_import
#define mpz_export __gmpz_export
#define mpz_cmp __gmpz_cmp
#define mpz_cmp_ui __gmpz_cmp_ui
#define mpz_sizeinbase __gmpz_sizeinbase
#define mpz_tstbit __gmpz_tstbit

void mpz_init(mpz_ptr);
void mpz_init_set(mpz_ptr, mpz_srcptr);
void mpz_init_set_ui(mpz_ptr, unsigned long);
void mpz_clear(mpz_ptr);
void mpz_set(mpz_ptr, mpz_srcptr);
void mpz_set_ui(mpz_ptr, unsigned long);
int mpz_set_str(mpz_ptr, const char *, int);
unsigned long mpz_get_ui(mpz_srcptr);
char *mpz_get_str(char *, int, mpz_srcptr);
void mpz_add(mpz_ptr, mpz_srcptr, mpz_srcptr);
void mpz_add_ui(mpz_ptr, mpz_srcptr, unsigned long);
void mpz_sub(mpz_ptr, mpz_srcptr, mpz_srcptr);
void mpz_mul(mpz_ptr, mpz_srcptr, mpz_srcptr);
void mpz_mul_2exp(mpz_ptr, mpz_srcptr, mp_bitcnt_t);
void mpz_fdiv_q_2exp(mpz_ptr, mpz_srcptr, mp_bitcnt_t);
void mpz_fdiv_r_2exp(mpz_ptr, mpz_srcptr, mp_bitcnt_t);
void mpz_tdiv_q_2exp(mpz_ptr, mpz_srcptr, mp_bitcnt_t);
void mpz_mod(mpz_ptr, mpz_srcptr, mpz_srcptr);
void mpz_import(mpz_ptr, size_t, int, size_t, int, size_t, const void *);
void *mpz_export(void *, size_t *, int, size_t, int, size_t, mpz_srcptr);
int mpz_cmp(mpz_srcptr, mpz_srcptr);
int mpz_cmp_ui(mpz_srcptr, unsigned long);
size_t mpz_sizeinbase(mpz_srcptr, int);
int mpz_tstbit(mpz_srcptr, mp_bitcnt_t);

/* additional documented entry points used by blockmaze_tpu/native */
#define mpz_inits __gmpz_inits
#define mpz_clears __gmpz_clears
#define mpz_init_set_str __gmpz_init_set_str
#define mpz_powm __gmpz_powm
#define mpz_powm_ui __gmpz_powm_ui
#define mpz_invert __gmpz_invert
#define mpz_addmul __gmpz_addmul
#define mpz_mul_ui __gmpz_mul_ui
#define mpz_sub_ui __gmpz_sub_ui
#define mpz_fdiv_q_ui __gmpz_fdiv_q_ui

void mpz_inits(mpz_ptr, ...);
void mpz_clears(mpz_ptr, ...);
int mpz_init_set_str(mpz_ptr, const char *, int);
void mpz_powm(mpz_ptr, mpz_srcptr, mpz_srcptr, mpz_srcptr);
void mpz_powm_ui(mpz_ptr, mpz_srcptr, unsigned long, mpz_srcptr);
int mpz_invert(mpz_ptr, mpz_srcptr, mpz_srcptr);
void mpz_addmul(mpz_ptr, mpz_srcptr, mpz_srcptr);
void mpz_mul_ui(mpz_ptr, mpz_srcptr, unsigned long);
void mpz_sub_ui(mpz_ptr, mpz_srcptr, unsigned long);
unsigned long mpz_fdiv_q_ui(mpz_ptr, mpz_srcptr, unsigned long);

#define mpz_sgn(z) ((z)->_mp_size < 0 ? -1 : ((z)->_mp_size > 0 ? 1 : 0))

/* ---- formatted output ---- */
#define gmp_printf __gmp_printf
#define gmp_sprintf __gmp_sprintf
int gmp_printf(const char *, ...);
int gmp_sprintf(char *, const char *, ...);

#if defined(__cplusplus)
} /* extern "C" */

/* iostream insertion for mpz (normally provided by GMP's C++ support).
 * Implemented in gmp_iostream_shim.cpp. */
std::ostream &operator<<(std::ostream &, mpz_srcptr);
std::istream &operator>>(std::istream &, mpz_ptr);
#endif

#endif /* __GMP_H_SHIM__ */
