// Native CPU attention library.
//
// Role of the reference's common/standard.h (OpenMP CPU oracle for the CUDA
// drivers): a C-ABI shared library the Python test suite loads via ctypes
// and the standalone benchmark driver links against.  Two entry points:
//
//   fa_naive_attention_f32 : materialized-scores oracle, stable softmax,
//                            OpenMP-parallel over batch*head
//   fa_flash_attention_f32 : online-softmax tiled implementation (the
//                            process_kv_tile contract of sim/tile_loop.py)
//                            — the C++ rung of the algorithm ladder
//
// Layout: row-major [B, H, L, d] (the repo-wide contract).
// Cross-length (Lq != Lkv) and causal masking supported.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// O = softmax(Q K^T * scale [+ causal mask]) V
// q: [B,H,Lq,d]  k,v: [B,H,Lkv,d]  o: [B,H,Lq,d]
void fa_naive_attention_f32(const float* q, const float* k, const float* v,
                            float* o, int64_t B, int64_t H, int64_t Lq,
                            int64_t Lkv, int64_t d, float scale, int causal) {
  const int64_t nbh = B * H;
#pragma omp parallel for schedule(dynamic)
  for (int64_t bh = 0; bh < nbh; ++bh) {
    const float* qb = q + bh * Lq * d;
    const float* kb = k + bh * Lkv * d;
    const float* vb = v + bh * Lkv * d;
    float* ob = o + bh * Lq * d;
    std::vector<float> row(Lkv);
    for (int64_t i = 0; i < Lq; ++i) {
      const int64_t kmax = causal ? (i + (Lkv - Lq) + 1) : Lkv;
      float m = -std::numeric_limits<float>::infinity();
      for (int64_t j = 0; j < kmax; ++j) {
        float s = 0.f;
        for (int64_t c = 0; c < d; ++c) s += qb[i * d + c] * kb[j * d + c];
        s *= scale;
        row[j] = s;
        if (s > m) m = s;
      }
      float l = 0.f;
      for (int64_t j = 0; j < kmax; ++j) {
        row[j] = std::exp(row[j] - m);
        l += row[j];
      }
      const float inv = 1.0f / l;
      for (int64_t c = 0; c < d; ++c) {
        float acc = 0.f;
        for (int64_t j = 0; j < kmax; ++j) acc += row[j] * vb[j * d + c];
        ob[i * d + c] = acc * inv;
      }
    }
  }
}

// Online-softmax tiled flash attention (block_q x block_kv tiles), the same
// 10-step update as the Python spec; memory O(block_q * (block_kv + d)).
void fa_flash_attention_f32(const float* q, const float* k, const float* v,
                            float* o, int64_t B, int64_t H, int64_t Lq,
                            int64_t Lkv, int64_t d, float scale, int causal,
                            int64_t block_q, int64_t block_kv) {
  const int64_t nbh = B * H;
#pragma omp parallel for schedule(dynamic)
  for (int64_t bh = 0; bh < nbh; ++bh) {
    const float* qb = q + bh * Lq * d;
    const float* kb = k + bh * Lkv * d;
    const float* vb = v + bh * Lkv * d;
    float* ob = o + bh * Lq * d;

    std::vector<float> m(block_q), l(block_q);
    std::vector<float> acc(block_q * d), s(block_q * block_kv);

    for (int64_t q0 = 0; q0 < Lq; q0 += block_q) {
      const int64_t bq = std::min(block_q, Lq - q0);
      std::fill(m.begin(), m.end(),
                -std::numeric_limits<float>::infinity());
      std::fill(l.begin(), l.end(), 0.f);
      std::fill(acc.begin(), acc.end(), 0.f);

      for (int64_t k0 = 0; k0 < Lkv; k0 += block_kv) {
        const int64_t bk = std::min(block_kv, Lkv - k0);
        // S = Q_tile K_tile^T * scale (+ causal mask)
        for (int64_t i = 0; i < bq; ++i) {
          for (int64_t j = 0; j < bk; ++j) {
            float acc_s = 0.f;
            for (int64_t c = 0; c < d; ++c)
              acc_s += qb[(q0 + i) * d + c] * kb[(k0 + j) * d + c];
            acc_s *= scale;
            if (causal && (k0 + j) > (q0 + i) + (Lkv - Lq))
              acc_s = -std::numeric_limits<float>::infinity();
            s[i * block_kv + j] = acc_s;
          }
        }
        // online-softmax state update
        for (int64_t i = 0; i < bq; ++i) {
          float m_tile = -std::numeric_limits<float>::infinity();
          for (int64_t j = 0; j < bk; ++j)
            m_tile = std::max(m_tile, s[i * block_kv + j]);
          const float m_new = std::max(m[i], m_tile);
          const float alpha =
              std::isinf(m_new) ? 0.f : std::exp(m[i] - m_new);
          float l_tile = 0.f;
          for (int64_t j = 0; j < bk; ++j) {
            float& sij = s[i * block_kv + j];
            sij = std::isinf(sij) ? 0.f : std::exp(sij - m_new);
            l_tile += sij;
          }
          m[i] = m_new;
          l[i] = l[i] * alpha + l_tile;
          for (int64_t c = 0; c < d; ++c) {
            float a = acc[i * d + c] * alpha;
            for (int64_t j = 0; j < bk; ++j)
              a += s[i * block_kv + j] * vb[(k0 + j) * d + c];
            acc[i * d + c] = a;
          }
        }
      }
      for (int64_t i = 0; i < bq; ++i) {
        const float inv = l[i] > 0.f ? 1.0f / l[i] : 0.f;
        for (int64_t c = 0; c < d; ++c)
          ob[(q0 + i) * d + c] = acc[i * d + c] * inv;
      }
    }
  }
}

int fa_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
