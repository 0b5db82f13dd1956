/* Minimal openssl/sha.h shim: only the legacy SHA512 surface used by
 * libff/common/rng.tcc, ABI-compatible with the system libcrypto.so.3.
 * Written from the public OpenSSL documentation. */
#ifndef OPENSSL_SHA_SHIM_H
#define OPENSSL_SHA_SHIM_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define SHA512_DIGEST_LENGTH 64
#define SHA_LBLOCK 16
#define SHA512_CBLOCK (SHA_LBLOCK * 8)

typedef struct SHA512state_st {
  uint64_t h[8];
  uint64_t Nl, Nh;
  union {
    uint64_t d[SHA_LBLOCK];
    unsigned char p[SHA512_CBLOCK];
  } u;
  unsigned int num, md_len;
} SHA512_CTX;

int SHA512_Init(SHA512_CTX *c);
int SHA512_Update(SHA512_CTX *c, const void *data, size_t len);
int SHA512_Final(unsigned char *md, SHA512_CTX *c);
unsigned char *SHA512(const unsigned char *d, size_t n, unsigned char *md);

#ifdef __cplusplus
}
#endif

#endif
