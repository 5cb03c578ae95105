/* Minimal CBLAS header shim for building the reference CTranslate2 with
 * the OpenBLAS backend in this environment (no system cblas.h is
 * installed; the actual symbols are resolved from an OpenBLAS shared
 * library bundled with a Python wheel — see CMakeLists.txt).
 *
 * Only cblas_sgemm is used by the reference
 * (/root/reference/src/cpu/primitives.cc:719-729). */
#pragma once

#ifdef __cplusplus
extern "C" {
#endif

typedef enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum CBLAS_TRANSPOSE {
  CblasNoTrans = 111,
  CblasTrans = 112,
  CblasConjTrans = 113
} CBLAS_TRANSPOSE;

void cblas_sgemm(CBLAS_ORDER order, CBLAS_TRANSPOSE trans_a,
                 CBLAS_TRANSPOSE trans_b, int m, int n, int k, float alpha,
                 const float* a, int lda, const float* b, int ldb, float beta,
                 float* c, int ldc);

#ifdef __cplusplus
}
#endif
