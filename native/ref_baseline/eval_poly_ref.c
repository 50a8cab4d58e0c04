/* Reference-equivalent hot-loop microbenchmark: eval_poly terms/sec.
 *
 * The C reference (mangiafuoco) publishes no numbers and cannot be built
 * here (no GMP/FLINT dev headers).  This microbenchmark reproduces the
 * exact per-term work of its prover hot loop eval_poly
 * (reference src/lwe.c:176-186) with the same primitives the reference
 * uses — OpenSSL AES-256-CTR keystream (src/aes.c:92-144 default build)
 * and GMP limb mul-accumulate (mpz_addmul_ui == mpn_addmul_1 at this
 * size, src/lwe.c:141-149) — linked directly against the installed
 * runtime libraries with locally declared prototypes.
 *
 * Per term i < d (release params n=1470, 736-bit samples, mod 2^704):
 *   - 92*n = 135,240 keystream bytes (ct_import re-expansion,
 *     src/lwe.c:122-126)
 *   - (n+1) x { 12-limb addmul_1 by a u32 scalar + mod-2^704 truncation }
 *     (ct_addmul_ui, src/lwe.c:141-149)
 *
 * Output: one line `terms_per_sec=<float>` (plus a breakdown to stderr).
 * This is an upper bound on the single-threaded reference (no mpz
 * normalization overhead, batched keystream) — a conservative baseline
 * to beat.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

/* ---- OpenSSL EVP (libcrypto.so.3), prototypes declared locally ---- */
typedef struct evp_cipher_ctx_st EVP_CIPHER_CTX;
typedef struct evp_cipher_st EVP_CIPHER;
EVP_CIPHER_CTX *EVP_CIPHER_CTX_new(void);
const EVP_CIPHER *EVP_aes_256_ctr(void);
int EVP_EncryptInit_ex(EVP_CIPHER_CTX *, const EVP_CIPHER *, void *,
                       const unsigned char *, const unsigned char *);
int EVP_EncryptUpdate(EVP_CIPHER_CTX *, unsigned char *, int *,
                      const unsigned char *, int);

/* ---- GMP mpn layer (libgmp.so.10) ---- */
typedef unsigned long mp_limb_t;
mp_limb_t __gmpn_addmul_1(mp_limb_t *, const mp_limb_t *, long, mp_limb_t);

#define N 1470
#define CT_BYTES 92
#define LIMBS 12 /* ceil(736/64); accumulator truncates to 11 (mod 2^704) */
#define CTR_CT (CT_BYTES * N)

static double now(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main(int argc, char **argv) {
  int d = argc > 1 ? atoi(argv[1]) : 2048;

  static unsigned char zeros[CTR_CT], ks[CTR_CT];
  unsigned char key[32], iv[16];
  for (int i = 0; i < 32; i++) key[i] = (unsigned char)(i + 40);
  memset(iv, 0x17, 16);
  EVP_CIPHER_CTX *ctx = EVP_CIPHER_CTX_new();
  EVP_EncryptInit_ex(ctx, EVP_aes_256_ctr(), NULL, key, iv);

  mp_limb_t(*rop)[LIMBS] = calloc(N + 1, sizeof *rop);
  mp_limb_t a[LIMBS];
  int outl;
  mp_limb_t sink = 0;

  double t_ks = 0.0, t0 = now();
  for (int i = 0; i < d; i++) {
    double k0 = now();
    EVP_EncryptUpdate(ctx, ks, &outl, zeros, CTR_CT); /* a-vector expand */
    t_ks += now() - k0;
    mp_limb_t c = (mp_limb_t)(2654435761u * (unsigned)i) & 0xffffffffu;
    for (int j = 0; j < N; j++) {
      memcpy(a, ks + j * CT_BYTES, CT_BYTES);
      a[LIMBS - 1] &= 0xffffffffu; /* 92-byte (736-bit) sample */
      sink += __gmpn_addmul_1(rop[j], a, LIMBS, c);
      rop[j][LIMBS - 1] = 0; /* modq: truncate to 2^704 */
    }
    /* b coordinate: import 92 bytes (reuse head of ks) + addmul */
    memcpy(a, ks, CT_BYTES);
    a[LIMBS - 1] &= 0xffffffffu;
    sink += __gmpn_addmul_1(rop[N], a, LIMBS, c);
    rop[N][LIMBS - 1] = 0;
  }
  double dt = now() - t0;
  fprintf(stderr,
          "d=%d total=%.3fs keystream=%.3fs muladd=%.3fs sink=%lu\n", d, dt,
          t_ks, dt - t_ks, (unsigned long)sink);
  printf("terms_per_sec=%.2f\n", d / dt);
  free(rop);
  return 0;
}
