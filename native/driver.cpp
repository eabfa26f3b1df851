// Self-validating native benchmark driver.
//
// Role of the reference's */CUDA/driver.cu harnesses: seeded random data,
// oracle run, warmup + timed loops, max-abs / filtered max-rel comparison
// with worst-offender reporting, PASS/FAIL exit code.  Here the "kernel
// under test" is the C++ online-softmax flash implementation vs the naive
// oracle (the TPU kernels are benchmarked by the Python drivers — bench.py
// and bench/ — since TPUs are only reachable through the JAX runtime).
//
// Usage: ./fa_driver [B H Lq Lkv d causal iters block_q block_kv]
// Defaults: the reference's canonical shape B=32 H=8 L=1024 d=128.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
void fa_naive_attention_f32(const float*, const float*, const float*, float*,
                            int64_t, int64_t, int64_t, int64_t, int64_t,
                            float, int);
void fa_flash_attention_f32(const float*, const float*, const float*, float*,
                            int64_t, int64_t, int64_t, int64_t, int64_t,
                            float, int, int64_t, int64_t);
int fa_num_threads();
}

namespace {

double now_ms() {
  using clk = std::chrono::steady_clock;
  return std::chrono::duration<double, std::milli>(
             clk::now().time_since_epoch())
      .count();
}

struct ErrStats {
  double max_abs = 0, max_rel = 0, mean_rel = 0;
  int64_t worst = 0;
};

ErrStats compare(const std::vector<float>& out, const std::vector<float>& ref,
                 double rel_floor = 1e-3) {
  ErrStats e;
  double rel_sum = 0;
  int64_t rel_n = 0;
  for (size_t i = 0; i < out.size(); ++i) {
    const double a = std::abs(double(out[i]) - double(ref[i]));
    if (a > e.max_abs) {
      e.max_abs = a;
      e.worst = int64_t(i);
    }
    if (std::abs(ref[i]) > rel_floor) {
      const double r = a / std::abs(double(ref[i]));
      e.max_rel = std::max(e.max_rel, r);
      rel_sum += r;
      ++rel_n;
    }
  }
  e.mean_rel = rel_n ? rel_sum / double(rel_n) : 0.0;
  return e;
}

}  // namespace

int main(int argc, char** argv) {
  int64_t B = 32, H = 8, Lq = 1024, Lkv = 1024, d = 128;
  int causal = 0;
  int iters = 3;
  int64_t bq = 64, bk = 64;
  if (argc > 1) B = atoll(argv[1]);
  if (argc > 2) H = atoll(argv[2]);
  if (argc > 3) Lq = atoll(argv[3]);
  if (argc > 4) Lkv = atoll(argv[4]);
  if (argc > 5) d = atoll(argv[5]);
  if (argc > 6) causal = atoi(argv[6]);
  if (argc > 7) iters = atoi(argv[7]);
  if (argc > 8) bq = atoll(argv[8]);
  if (argc > 9) bk = atoll(argv[9]);

  const float scale = 1.0f / std::sqrt(float(d));
  printf("fa_driver: B=%lld H=%lld Lq=%lld Lkv=%lld d=%lld causal=%d "
         "threads=%d blocks=(%lld,%lld)\n",
         (long long)B, (long long)H, (long long)Lq, (long long)Lkv,
         (long long)d, causal, fa_num_threads(), (long long)bq,
         (long long)bk);

  std::mt19937_64 rng(42);
  std::normal_distribution<float> dist(0.f, 1.f);
  const size_t nq = size_t(B * H * Lq * d), nk = size_t(B * H * Lkv * d);
  std::vector<float> q(nq), k(nk), v(nk), o_ref(nq), o_flash(nq);
  for (auto& x : q) x = dist(rng);
  for (auto& x : k) x = dist(rng);
  for (auto& x : v) x = dist(rng);

  // oracle (timed once — it IS the CPU baseline number)
  double t0 = now_ms();
  fa_naive_attention_f32(q.data(), k.data(), v.data(), o_ref.data(), B, H,
                         Lq, Lkv, d, scale, causal);
  const double oracle_ms = now_ms() - t0;
  printf("naive oracle: %.1f ms\n", oracle_ms);

  // flash: warmup + timed
  fa_flash_attention_f32(q.data(), k.data(), v.data(), o_flash.data(), B, H,
                         Lq, Lkv, d, scale, causal, bq, bk);
  t0 = now_ms();
  for (int it = 0; it < iters; ++it)
    fa_flash_attention_f32(q.data(), k.data(), v.data(), o_flash.data(), B,
                           H, Lq, Lkv, d, scale, causal, bq, bk);
  const double flash_ms = (now_ms() - t0) / iters;
  const double flops = 4.0 * double(B * H) * double(Lq) * double(Lkv) *
                       double(d) * (causal ? 0.5 : 1.0);
  printf("flash (tiled): %.1f ms  %.1f GFLOP/s\n", flash_ms,
         flops / flash_ms / 1e6);

  const ErrStats e = compare(o_flash, o_ref);
  printf("max_abs=%.3e max_rel=%.3e mean_rel=%.3e (worst idx %lld: "
         "out=%f ref=%f)\n",
         e.max_abs, e.max_rel, e.mean_rel, (long long)e.worst,
         o_flash[e.worst], o_ref[e.worst]);

  const bool pass = e.max_abs < 1e-3;
  printf("%s\n", pass ? "PASS" : "FAIL");
  return pass ? 0 : 1;
}
