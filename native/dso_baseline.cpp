// Measured CPU baseline for BENCH: one DSO-class photometric-BA
// Gauss-Newton iteration at the reference operating point, timed.
//
// The reference repository publishes no perf numbers (SURVEY §6) and cannot
// be built here (Eigen/Ceres/OpenCV absent), so this standalone harness
// replicates the computational shape of its BA hot path so the bench's
// vs_baseline is measurement/measurement instead of an estimate:
//
//   - P=2000 active points x F=7 keyframe window x 8-pixel pattern
//     (src/utils/settings.cpp:72-82, settings.h:215)
//   - linearize each (point, target) residual with analytic Jacobians and
//     bilinear gradient interpolation (shape of Residuals.cpp:69-265:
//     projection, Jpdxi/Jpdc/Jpdd, per-pattern-pixel residual + Huber +
//     gradient-weighted weights, JIdx/Jab inner products)
//   - accumulate per-(host,target) 13x13 top systems with the
//     AccumulatorApprox semantics incl. its 1/1k/1M shift-register cascade
//     (src/bundles/MatrixAccumulators.h:595-980: rank-style update from
//     x[10], y[10] and the (a,b,c) 2x2 inner products; upper-triangle
//     10x10 + 10x3 top-right + 3x3 bottom-right)
//   - per-point Schur scalars Hdd/bd and pair-block Schur-complement
//     accumulation from JpJdF (AccumulatedSCHessian.{h,cpp} shape)
//   - stitch pair blocks through 8x8 adjoints into the 60x60 reduced
//     camera system, LDLT-solve, back-substitute per-point idepth steps
//     (EnergyFunctional::solveSystemF, EnergyFunctional.cpp:775-913)
//   - NUM_THREADS=6 worker threads over point chunks (IndexThreadReduce,
//     src/utils/NumType.h:43) with per-thread accumulators merged at the
//     barrier; built -O3 -march=native so the compiler's AVX2 replaces the
//     reference's hand-written 128-bit SSE (a strictly stronger baseline).
//
// Usage: dso_baseline [iters]   -> prints one line:
//   {"gn_iters_per_s": R, "ms_per_iter": M}
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr int kW = 640, kH = 480;
constexpr int kF = 7;          // window keyframes
constexpr int kP = 2000;       // active points
constexpr int kPat = 8;        // residual pattern
constexpr int kThreads = 6;    // reference NUM_THREADS
constexpr int kCPARS = 4;
constexpr int kDim = kCPARS + 8 * kF;  // 60

// DSO 8-point pattern offsets (settings.h:203-205 staticPattern[8])
constexpr int kPatDx[kPat] = {0, -2, 2, -1, 1, -1, 1, 0};
constexpr int kPatDy[kPat] = {0, 0, 0, -1, -1, 1, 1, 2};

// [I, dx, dy] per pixel per frame (HessianBlocks dIp level 0)
struct Frame {
  std::vector<float> dI;  // kH*kW*3
  float xi[6];            // pose tangent (arbitrary small)
  float aff[2];
};

struct Point {
  float u, v;      // host pixel
  float idepth;
  int host;
  float color[kPat];
  float weights[kPat];
};

// --- AccumulatorApprox (MatrixAccumulators.h:595): 10x10 upper triangle +
// 10x3 top right + 3x3 bottom right, with the 1/1k/1M cascade.
struct AccApprox {
  float Data[60], Data1k[60], Data1m[60];
  float TR[32], TR1k[32], TR1m[32];
  float BR[8], BR1k[8], BR1m[8];
  int numIn1 = 0, numIn1k = 0;

  void initialize() {
    std::memset(this, 0, sizeof(*this));
  }
  void shiftUp(bool force) {
    if (numIn1 > 1000 || force) {
      for (int i = 0; i < 60; ++i) { Data1k[i] += Data[i]; Data[i] = 0; }
      for (int i = 0; i < 32; ++i) { TR1k[i] += TR[i]; TR[i] = 0; }
      for (int i = 0; i < 8; ++i) { BR1k[i] += BR[i]; BR[i] = 0; }
      numIn1k += numIn1; numIn1 = 0;
    }
    if (numIn1k > 1000 || force) {
      for (int i = 0; i < 60; ++i) { Data1m[i] += Data1k[i]; Data1k[i] = 0; }
      for (int i = 0; i < 32; ++i) { TR1m[i] += TR1k[i]; TR1k[i] = 0; }
      for (int i = 0; i < 8; ++i) { BR1m[i] += BR1k[i]; BR1k[i] = 0; }
      numIn1k = 0;
    }
  }
  // the reference's update(x, y, a, b, c): upper triangle of
  // a x x^T + b (x y^T + y x^T) + c y y^T over the 10-dim block
  inline void update(const float* x, const float* y, float a, float b,
                     float c) {
    int idx = 0;
    for (int r = 0; r < 10; ++r) {
      const float axr = a * x[r] + b * y[r];
      const float cyr = c * y[r] + b * x[r];
      for (int col = r; col < 10; ++col) {
        Data[idx++] += axr * x[col] + cyr * y[col];
      }
    }
    numIn1++;
    shiftUp(false);
  }
  // updateTopRight(x, y, TR-block inputs): 10x3 from the residual terms
  inline void updateTopRight(const float* x, const float* y, float rA,
                             float rB, float rC) {
    for (int r = 0; r < 10; ++r) {
      TR[3 * r] += x[r] * rA + y[r] * rB;
      TR[3 * r + 1] += x[r] * rB + y[r] * rC;
      TR[3 * r + 2] += x[r] * rC - y[r] * rA;
    }
  }
  inline void updateBotRight(float a00, float a01, float a02, float a11,
                             float a12, float a22) {
    BR[0] += a00; BR[1] += a01; BR[2] += a02;
    BR[3] += a11; BR[4] += a12; BR[5] += a22;
  }
  void finish(float H[13][13]) {
    shiftUp(true);
    std::memset(H, 0, sizeof(float) * 169);
    int idx = 0;
    for (int r = 0; r < 10; ++r)
      for (int c = r; c < 10; ++c) { H[r][c] = H[c][r] = Data1m[idx++]; }
    idx = 0;
    for (int r = 0; r < 10; ++r)
      for (int c = 0; c < 3; ++c) { H[r][c + 10] = H[c + 10][r] = TR1m[idx++]; }
    H[10][10] = BR1m[0]; H[10][11] = H[11][10] = BR1m[1];
    H[10][12] = H[12][10] = BR1m[2]; H[11][11] = BR1m[3];
    H[11][12] = H[12][11] = BR1m[4]; H[12][12] = BR1m[5];
  }
};

inline float bilin(const float* im, int c, float x, float y) {
  const int ix = (int)x, iy = (int)y;
  const float dx = x - ix, dy = y - iy;
  const float* p = im + (iy * kW + ix) * 3 + c;
  return (1 - dx) * (1 - dy) * p[0] + dx * (1 - dy) * p[3] +
         (1 - dx) * dy * p[kW * 3] + dx * dy * p[kW * 3 + 3];
}

struct PairAcc {
  AccApprox acc[kF][kF];  // (host, target)
  // Schur: per point Hdd/bd, per pair accE (8x4), accEB (8), accD (8x8)
  float accE[kF][kF][8][kCPARS];
  float accEB[kF][kF][8];
  float accD[kF][kF][8][8];
  void init() {
    for (int h = 0; h < kF; ++h)
      for (int t = 0; t < kF; ++t) acc[h][t].initialize();
    std::memset(accE, 0, sizeof(accE));
    std::memset(accEB, 0, sizeof(accEB));
    std::memset(accD, 0, sizeof(accD));
  }
};

struct World {
  std::vector<Frame> frames;
  std::vector<Point> points;
  float fx = 400, fy = 400, cx = 319.5f, cy = 239.5f;
  std::vector<float> Hdd, bd;          // per point
  std::vector<float> JpJdF;            // per (point,target) 13
  std::vector<float> step_out;         // per point idepth step
};

void make_world(World& w) {
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> uni(0, 1);
  w.frames.resize(kF);
  for (int f = 0; f < kF; ++f) {
    auto& fr = w.frames[f];
    fr.dI.resize(kH * kW * 3);
    for (int y = 0; y < kH; ++y)
      for (int x = 0; x < kW; ++x) {
        const float I = 128 + 90 * std::sin(x * 0.05f + f) *
                                  std::cos(y * 0.07f);
        const float gx = 90 * 0.05f * std::cos(x * 0.05f + f) *
                         std::cos(y * 0.07f);
        const float gy = -90 * 0.07f * std::sin(x * 0.05f + f) *
                         std::sin(y * 0.07f);
        float* p = &fr.dI[(y * kW + x) * 3];
        p[0] = I; p[1] = gx; p[2] = gy;
      }
    for (int i = 0; i < 6; ++i) fr.xi[i] = 0.02f * (uni(rng) - 0.5f);
    fr.aff[0] = 0.01f * uni(rng); fr.aff[1] = uni(rng);
  }
  w.points.resize(kP);
  for (int i = 0; i < kP; ++i) {
    auto& pt = w.points[i];
    pt.u = 8 + uni(rng) * (kW - 16);
    pt.v = 8 + uni(rng) * (kH - 16);
    pt.idepth = 0.3f + 0.7f * uni(rng);
    pt.host = i % kF;
    for (int k = 0; k < kPat; ++k) {
      pt.color[k] = 20 + 200 * uni(rng);
      pt.weights[k] = 1.0f;
    }
  }
  w.Hdd.assign(kP, 0); w.bd.assign(kP, 0);
  w.JpJdF.assign((size_t)kP * kF * 13, 0);
  w.step_out.assign(kP, 0);
}

// Linearize + accumulate the chunk [lo, hi) of points into `pa`
// (the per-thread body IndexThreadReduce dispatches,
// EnergyFunctional::accumulateAF_MT + AccumulatedSCHessian::addPoint).
void worker(const World& w, int lo, int hi, PairAcc* pa) {
  const float fx = w.fx, fy = w.fy, cx = w.cx, cy = w.cy;
  const float huberTH = 9.0f;  // setting_huberTH (settings.cpp:127)
  for (int i = lo; i < hi; ++i) {
    const Point& pt = w.points[i];
    const int h = pt.host;
    float HddA = 0, bdA = 0;
    float JpJdF_loc[kF][13];
    int tgt_mask[kF] = {0};
    for (int t = 0; t < kF; ++t) {
      if (t == h) continue;
      const Frame& fr = w.frames[t];
      // --- projection with a small relative pose (Residuals.cpp:94-110)
      const float* xi = fr.xi;
      const float X = (pt.u - cx) / fx / pt.idepth;
      const float Y = (pt.v - cy) / fy / pt.idepth;
      const float Z = 1.0f / pt.idepth;
      // first-order rotation (small angles) + translation
      const float Xp = X - xi[5] * Y + xi[4] * Z + xi[0];
      const float Yp = xi[5] * X + Y - xi[3] * Z + xi[1];
      const float Zp = -xi[4] * X + xi[3] * Y + Z + xi[2];
      const float id_new = 1.0f / Zp;
      const float u = Xp * id_new, v = Yp * id_new;
      const float Ku = fx * u + cx, Kv = fy * v + cy;
      if (Ku < 4 || Ku > kW - 5 || Kv < 4 || Kv > kH - 5 || Zp < 1e-4f)
        continue;
      tgt_mask[t] = 1;
      // --- geometric jacobians (Residuals.cpp:110-161)
      float Jpdxi0[6], Jpdxi1[6];
      Jpdxi0[0] = id_new * fx; Jpdxi0[1] = 0;
      Jpdxi0[2] = -id_new * u * fx;
      Jpdxi0[3] = -u * v * fx; Jpdxi0[4] = (1 + u * u) * fx;
      Jpdxi0[5] = -v * fx;
      Jpdxi1[0] = 0; Jpdxi1[1] = id_new * fy;
      Jpdxi1[2] = -id_new * v * fy;
      Jpdxi1[3] = -(1 + v * v) * fy; Jpdxi1[4] = u * v * fy;
      Jpdxi1[5] = u * fy;
      float Jpdc0[4], Jpdc1[4];
      Jpdc0[0] = u; Jpdc0[1] = 0; Jpdc0[2] = 1; Jpdc0[3] = 0;
      Jpdc1[0] = 0; Jpdc1[1] = v; Jpdc1[2] = 0; Jpdc1[3] = 1;
      const float Jpdd0 = fx * (xi[0] - u * xi[2]) * id_new / pt.idepth;
      const float Jpdd1 = fy * (xi[1] - v * xi[2]) * id_new / pt.idepth;

      // --- pattern loop (Residuals.cpp:174-236): residual, Huber,
      // gradient-weighted weight, JIdx/Jab inner products
      float JI2_00 = 0, JI2_01 = 0, JI2_11 = 0;
      float JabJI_00 = 0, JabJI_01 = 0, JabJI_10 = 0, JabJI_11 = 0;
      float Jab2_00 = 0, Jab2_01 = 0, Jab2_11 = 0;
      float JIdxr_0 = 0, JIdxr_1 = 0, Jabr_0 = 0, Jabr_1 = 0;
      const float affA = std::exp(fr.aff[0]), affB = fr.aff[1];
      for (int k = 0; k < kPat; ++k) {
        const float px = Ku + kPatDx[k], py = Kv + kPatDy[k];
        const float I = bilin(fr.dI.data(), 0, px, py);
        const float gx = bilin(fr.dI.data(), 1, px, py);
        const float gy = bilin(fr.dI.data(), 2, px, py);
        const float res = I - affA * pt.color[k] - affB;
        const float hw = std::fabs(res) < huberTH
                             ? 1.0f : huberTH / std::fabs(res);
        const float gw = std::sqrt(
            50.0f / (50.0f + gx * gx + gy * gy));  // settings weightsG
        const float wgt = hw * gw * gw * pt.weights[k];
        const float drdA = pt.color[k];
        JI2_00 += wgt * gx * gx; JI2_01 += wgt * gx * gy;
        JI2_11 += wgt * gy * gy;
        JabJI_00 += wgt * drdA * gx; JabJI_01 += wgt * drdA * gy;
        JabJI_10 += wgt * gx; JabJI_11 += wgt * gy;
        Jab2_00 += wgt * drdA * drdA; Jab2_01 += wgt * drdA;
        Jab2_11 += wgt;
        JIdxr_0 += wgt * res * gx; JIdxr_1 += wgt * res * gy;
        Jabr_0 += wgt * res * drdA; Jabr_1 += wgt * res;
      }

      // --- AccumulatorApprox update (addPoint mode 0,
      // AccumulatedTopHessian.cpp:39-162): x = [Jpdc | Jpdxi] row 0,
      // y = row 1, (a,b,c) = JIdx2
      float x10[10], y10[10];
      for (int k = 0; k < 4; ++k) { x10[k] = Jpdc0[k]; y10[k] = Jpdc1[k]; }
      for (int k = 0; k < 6; ++k) {
        x10[4 + k] = Jpdxi0[k]; y10[4 + k] = Jpdxi1[k];
      }
      AccApprox& A = pa->acc[h][t];
      A.update(x10, y10, JI2_00, JI2_01, JI2_11);
      A.updateTopRight(x10, y10, JabJI_00, JabJI_01, JIdxr_0);
      A.updateBotRight(Jab2_00, Jab2_01, Jabr_0, Jab2_11, Jabr_1,
                       JIdxr_0 * 0 + JIdxr_1);  // residual-energy slot

      // --- per-point Schur scalars + JpJdF (addPoint tail,
      // AccumulatedTopHessian.cpp:132-151)
      const float Jd0 = Jpdd0, Jd1 = Jpdd1;
      HddA += Jd0 * (JI2_00 * Jd0 + JI2_01 * Jd1) +
              Jd1 * (JI2_01 * Jd0 + JI2_11 * Jd1);
      bdA += Jd0 * JIdxr_0 + Jd1 * JIdxr_1;
      float* JpJd = JpJdF_loc[t];
      for (int k = 0; k < 10; ++k) {
        JpJd[k] = x10[k] * (JI2_00 * Jd0 + JI2_01 * Jd1) +
                  y10[k] * (JI2_01 * Jd0 + JI2_11 * Jd1);
      }
      JpJd[10] = JabJI_00 * Jd0 + JabJI_01 * Jd1;
      JpJd[11] = JabJI_10 * Jd0 + JabJI_11 * Jd1;
      JpJd[12] = Jd0 * JIdxr_0 + Jd1 * JIdxr_1;
    }
    // --- Schur-complement pair blocks (AccumulatedSCHessian::addPoint):
    // accD[t1][t2] += JpJdF_t1 (8) x JpJdF_t2 (8) / Hdd; accE/accEB
    const float HdiF = 1.0f / (HddA + 1e-10f);
    const_cast<World&>(w).Hdd[i] = HddA;
    const_cast<World&>(w).bd[i] = bdA;
    for (int t1 = 0; t1 < kF; ++t1) {
      if (!tgt_mask[t1]) continue;
      const float* J1 = JpJdF_loc[t1];
      std::memcpy(const_cast<World&>(w).JpJdF.data() +
                      ((size_t)i * kF + t1) * 13,
                  J1, 13 * sizeof(float));
      for (int r = 0; r < 8; ++r) {
        pa->accEB[h][t1][r] += J1[2 + r] * HdiF * bdA;
        for (int c = 0; c < kCPARS; ++c)
          pa->accE[h][t1][r][c] += J1[2 + r] * HdiF * J1[c];
      }
      for (int t2 = 0; t2 < kF; ++t2) {
        if (!tgt_mask[t2]) continue;
        const float* J2 = JpJdF_loc[t2];
        for (int r = 0; r < 8; ++r)
          for (int c = 0; c < 8; ++c)
            pa->accD[t1][t2][r][c] += J1[2 + r] * HdiF * J2[2 + c];
      }
    }
  }
}

// LDLT in place for the 60x60 system (EnergyFunctional.cpp:888-893 shape)
void ldlt_solve(double H[kDim][kDim], double b[kDim], double x[kDim]) {
  double L[kDim][kDim] = {{0}}, D[kDim] = {0};
  for (int j = 0; j < kDim; ++j) {
    double d = H[j][j];
    for (int k = 0; k < j; ++k) d -= L[j][k] * L[j][k] * D[k];
    D[j] = d;
    L[j][j] = 1;
    for (int i2 = j + 1; i2 < kDim; ++i2) {
      double s = H[i2][j];
      for (int k = 0; k < j; ++k) s -= L[i2][k] * L[j][k] * D[k];
      L[i2][j] = (std::fabs(d) > 1e-12) ? s / d : 0;
    }
  }
  double y[kDim];
  for (int i2 = 0; i2 < kDim; ++i2) {
    double s = b[i2];
    for (int k = 0; k < i2; ++k) s -= L[i2][k] * y[k];
    y[i2] = s;
  }
  for (int i2 = 0; i2 < kDim; ++i2)
    y[i2] = (std::fabs(D[i2]) > 1e-12) ? y[i2] / D[i2] : 0;
  for (int i2 = kDim - 1; i2 >= 0; --i2) {
    double s = y[i2];
    for (int k = i2 + 1; k < kDim; ++k) s -= L[k][i2] * x[k];
    x[i2] = s;
  }
}

double one_iteration(World& w, std::vector<PairAcc>& pas) {
  // fork-join over point chunks (IndexThreadReduce::reduce)
  std::vector<std::thread> threads;
  const int chunk = (kP + kThreads - 1) / kThreads;
  for (int t = 0; t < kThreads; ++t) {
    pas[t].init();
    const int lo = t * chunk, hi = std::min(kP, lo + chunk);
    threads.emplace_back(worker, std::cref(w), lo, hi, &pas[t]);
  }
  for (auto& th : threads) th.join();

  // stitch (stitchDoubleMT, AccumulatedTopHessian.h:91-139): merge thread
  // accumulators, map pair blocks through host/target adjoints into the
  // global system; adjoints here are dense 8x8 (setAdjointsF shape).
  static double H[kDim][kDim];
  static double b[kDim];
  std::memset(H, 0, sizeof(H));
  std::memset(b, 0, sizeof(b));
  float Hp[13][13];
  float adj[8][8];
  for (int r = 0; r < 8; ++r)
    for (int c = 0; c < 8; ++c) adj[r][c] = (r == c) ? 1.0f : 0.01f;
  for (int h = 0; h < kF; ++h)
    for (int t = 0; t < kF; ++t) {
      if (h == t) continue;
      // merge thread accumulators into thread 0's
      float Hsum[13][13];
      std::memset(Hsum, 0, sizeof(Hsum));
      for (int th = 0; th < kThreads; ++th) {
        pas[th].acc[h][t].finish(Hp);
        for (int r = 0; r < 13; ++r)
          for (int c = 0; c < 13; ++c) Hsum[r][c] += Hp[r][c];
      }
      // block layout: [0:4] calib, [4:10] pose-rel, [10:12] affine, 12 = b
      // transport the 8x8 pose+affine block through adjoints to host AND
      // target frame slots (stitchDouble's AH/AT application)
      float blk[8][8], tmp[8][8];
      for (int r = 0; r < 8; ++r)
        for (int c = 0; c < 8; ++c)
          blk[r][c] = Hsum[2 + r][2 + c];
      for (int r = 0; r < 8; ++r)
        for (int c = 0; c < 8; ++c) {
          float s = 0;
          for (int k = 0; k < 8; ++k) s += adj[r][k] * blk[k][c];
          tmp[r][c] = s;
        }
      const int oh = kCPARS + 8 * h, ot = kCPARS + 8 * t;
      for (int r = 0; r < 8; ++r)
        for (int c = 0; c < 8; ++c) {
          float s = 0;
          for (int k = 0; k < 8; ++k) s += tmp[r][k] * adj[c][k];
          H[oh + r][oh + c] += s;
          H[ot + r][ot + c] += s;
          H[oh + r][ot + c] -= s;
          H[ot + r][oh + c] -= s;
        }
      // calib rows/cols + rhs
      for (int r = 0; r < kCPARS; ++r) {
        for (int c = 0; c < kCPARS; ++c) H[r][c] += Hsum[r][c];
        for (int c = 0; c < 8; ++c) {
          H[r][oh + c] += Hsum[r][2 + c];
          H[oh + c][r] += Hsum[r][2 + c];
        }
      }
      for (int r = 0; r < 8; ++r) b[oh + r] += Hsum[2 + r][12];
      // Schur subtraction: H -= accE/accD blocks (stitched the same way)
      for (int r = 0; r < 8; ++r) {
        float eb = 0;
        for (int th = 0; th < kThreads; ++th)
          eb += pas[th].accEB[h][t][r];
        b[ot + r] -= eb;
        for (int c = 0; c < kCPARS; ++c) {
          float e = 0;
          for (int th = 0; th < kThreads; ++th)
            e += pas[th].accE[h][t][r][c];
          H[ot + r][c] -= e;
          H[c][ot + r] -= e;
        }
      }
    }
  for (int t1 = 0; t1 < kF; ++t1)
    for (int t2 = 0; t2 < kF; ++t2) {
      const int o1 = kCPARS + 8 * t1, o2 = kCPARS + 8 * t2;
      for (int r = 0; r < 8; ++r)
        for (int c = 0; c < 8; ++c) {
          float d = 0;
          for (int th = 0; th < kThreads; ++th)
            d += pas[th].accD[t1][t2][r][c];
          H[o1 + r][o2 + c] -= d;
        }
    }
  for (int d = 0; d < kDim; ++d) H[d][d] += 10.0;  // LM damping

  static double x[kDim];
  ldlt_solve(H, b, x);

  // back-substitution (resubstituteF_MT/FPt, EnergyFunctional.cpp:263-317):
  // step_i = -(bd - sum_t JpJdF_t . x_t) / Hdd
  double checksum = 0;
  for (int i = 0; i < kP; ++i) {
    double acc = w.bd[i];
    const int h = w.points[i].host;
    for (int t = 0; t < kF; ++t) {
      if (t == h) continue;
      const float* J = &w.JpJdF[((size_t)i * kF + t) * 13];
      for (int k = 0; k < kCPARS; ++k) acc -= J[k] * x[k];
      for (int k = 0; k < 8; ++k) acc -= J[2 + k] * x[kCPARS + 8 * t + k];
    }
    w.step_out[i] = (float)(-acc / (w.Hdd[i] + 1e-10));
    checksum += w.step_out[i];
  }
  return checksum;
}

}  // namespace

int main(int argc, char** argv) {
  const int iters = argc > 1 ? std::atoi(argv[1]) : 30;
  World w;
  make_world(w);
  std::vector<PairAcc> pas(kThreads);
  // warmup
  volatile double sink = one_iteration(w, pas);
  const auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; ++i) sink += one_iteration(w, pas);
  const auto t1 = std::chrono::steady_clock::now();
  const double s =
      std::chrono::duration_cast<std::chrono::duration<double>>(t1 - t0)
          .count();
  std::printf("{\"gn_iters_per_s\": %.2f, \"ms_per_iter\": %.3f, "
              "\"checksum\": %.3g}\n",
              iters / s, 1e3 * s / iters, (double)sink);
  return 0;
}
