/* Native host runtime for c_lwe_snarks_tpu: AES-CTR keystream + limb
 * arithmetic hot loops, used by the Python host oracle via ctypes.
 *
 * The compute path of the framework is JAX/Pallas on TPU; this library is
 * the host-side runtime analog of the reference's C core — the same role
 * the reference's aes.c/entropy.c/lwe.c play for its CPU pipeline:
 *   - keystream: AES-256 in CTR mode with the reference's block layout
 *     (bytes 0-7 nonce LE, 8-15 counter LE, src/aes.c:104-144).  OpenSSL
 *     EVP-CTR increments big-endian, so blocks are built explicitly and
 *     encrypted with EVP ECB (identical output).
 *   - mod-2^704 ciphertext algebra on 11/12-limb arrays via GMP's mpn
 *     layer (mpz_addmul_ui == mpn_addmul_1 at this size, src/lwe.c:141).
 *   - eval_poly: the prover hot loop (src/lwe.c:176-186) — import d
 *     compressed ciphertexts from the stream, MAC with u32 coefficients.
 *
 * No GMP/OpenSSL dev headers exist in this environment; the few required
 * prototypes are declared locally and the build links directly against
 * the installed runtime libraries (see build.sh).
 */

#include <stdint.h>
#include <stddef.h>
#include <stdlib.h>
#include <string.h>

/* ---- OpenSSL EVP (libcrypto.so.3) ---- */
typedef struct evp_cipher_ctx_st EVP_CIPHER_CTX;
typedef struct evp_cipher_st EVP_CIPHER;
EVP_CIPHER_CTX *EVP_CIPHER_CTX_new(void);
void EVP_CIPHER_CTX_free(EVP_CIPHER_CTX *);
const EVP_CIPHER *EVP_aes_256_ecb(void);
int EVP_EncryptInit_ex(EVP_CIPHER_CTX *, const EVP_CIPHER *, void *,
                       const unsigned char *, const unsigned char *);
int EVP_CIPHER_CTX_set_padding(EVP_CIPHER_CTX *, int);
int EVP_EncryptUpdate(EVP_CIPHER_CTX *, unsigned char *, int *,
                      const unsigned char *, int);

/* ---- GMP mpn layer (libgmp.so.10) ---- */
typedef unsigned long mp_limb_t;
mp_limb_t __gmpn_addmul_1(mp_limb_t *, const mp_limb_t *, long, mp_limb_t);

#define LIMBS 12       /* ceil(736/64) sampled width */
#define LIVE_LIMBS 11  /* mod 2^704 accumulator width */
#define CT_BYTES 92

/* Keystream bytes [byte_offset, byte_offset + nbytes) of the stream keyed
 * by (key32, nonce LE).  Returns 0 on success. */
int cls_keystream(const unsigned char key[32], uint64_t nonce,
                  uint64_t byte_offset, uint64_t nbytes,
                  unsigned char *out) {
  int rc = 0;
  EVP_CIPHER_CTX *ctx = EVP_CIPHER_CTX_new();
  if (!ctx) return -1;
  if (EVP_EncryptInit_ex(ctx, EVP_aes_256_ecb(), 0, key, 0) != 1) {
    rc = -2;
    goto cleanup;
  }
  EVP_CIPHER_CTX_set_padding(ctx, 0);

  enum { CHUNK = 4096 }; /* blocks per batch */
  static const int BS = 16;
  unsigned char in[CHUNK * 16], enc[CHUNK * 16];
  uint64_t ctr = byte_offset / BS;
  unsigned skip = (unsigned)(byte_offset % BS);
  uint64_t remaining = nbytes;
  while (remaining > 0) {
    uint64_t blocks = (skip + remaining + BS - 1) / BS;
    if (blocks > CHUNK) blocks = CHUNK;
    for (uint64_t b = 0; b < blocks; b++) {
      memcpy(in + 16 * b, &nonce, 8); /* little-endian host assumed (x86) */
      uint64_t c = ctr + b;
      memcpy(in + 16 * b + 8, &c, 8);
    }
    int outl = 0;
    if (EVP_EncryptUpdate(ctx, enc, &outl, in, (int)(16 * blocks)) != 1 ||
        outl != (int)(16 * blocks)) {
      rc = -3;
      goto cleanup;
    }
    uint64_t take = 16 * blocks - skip;
    if (take > remaining) take = remaining;
    memcpy(out, enc + skip, take);
    out += take;
    remaining -= take;
    ctr += blocks;
    skip = 0;
  }
cleanup:
  EVP_CIPHER_CTX_free(ctx);
  return rc;
}

/* rop[(n+1) x LIVE_LIMBS] += ct * c mod 2^704, where ct's a-vector is
 * expanded from `ks` (n x CT_BYTES keystream bytes) and its b-part is
 * `b92` (CT_BYTES).  Matches ct_addmul_ui over an imported ciphertext
 * (src/lwe.c:122-149). */
static void ct_addmul(mp_limb_t *rop, const unsigned char *ks,
                      const unsigned char *b92, uint32_t c, int n) {
  mp_limb_t a[LIMBS];
  for (int j = 0; j <= n; j++) {
    const unsigned char *src = (j < n) ? ks + (size_t)j * CT_BYTES : b92;
    a[LIMBS - 1] = 0;
    memcpy(a, src, CT_BYTES);
    __gmpn_addmul_1(rop + (size_t)j * LIMBS, a, LIMBS, (mp_limb_t)c);
    rop[(size_t)j * LIMBS + LIVE_LIMBS] = 0; /* modq: truncate to 2^704 */
  }
}

/* eval_poly (src/lwe.c:176-186): rop = sum_i coeff_i * ct_i with ct_i
 * re-expanded from the stream at section_offset.  `out` must hold
 * (n+1) * 12 * 8 bytes; coordinate j's 88 live digits are bytes
 * [96j, 96j+88) (limb 11 is always zero).  x86-64 little-endian assumed.
 * Keystream scratch is heap-allocated per call (thread-safe). */
int cls_eval_poly(const unsigned char key[32], uint64_t nonce,
                  uint64_t section_offset, const unsigned char *b_rows,
                  size_t b_stride, const uint32_t *coeffs, int d, int n,
                  unsigned char *out) {
  size_t ct_ct = (size_t)CT_BYTES * n;
  unsigned char *ks = malloc(ct_ct);
  if (!ks) return -1;
  mp_limb_t *rop = (mp_limb_t *)out; /* caller provides (n+1)*LIMBS*8 B */
  memset(rop, 0, (size_t)(n + 1) * LIMBS * 8);
  for (int i = 0; i < d; i++) {
    if (cls_keystream(key, nonce, section_offset + (uint64_t)i * ct_ct,
                      ct_ct, ks) != 0) {
      free(ks);
      return -2;
    }
    ct_addmul(rop, ks, b_rows + (size_t)i * b_stride, coeffs[i], n);
  }
  free(ks);
  return 0;
}
