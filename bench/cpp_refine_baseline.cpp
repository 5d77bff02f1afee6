// Single-threaded CPU baseline for the photometric-refinement DISTANCE block
// (the dominant stage of PsOptimizer::alternatingOptimize), measured because
// the reference repo cannot be built here (empty vendored submodules, no
// network).  This reimplements the reference's per-iteration work with the
// same algorithm and budgets (PsOptimizer.cpp:124-172, PsOptimizerJa.cpp:
// 160-289,479-562,567-626):
//
//   1. computeResidual: for every visible (surface voxel, keyframe) pair,
//      project x = c_v - d*ghat, bilinear-sample RGB, shade SH1
//      rho_c*(l^T [1; n]) with n from one-sided finite differences,
//      Cauchy IRLS weight per channel.
//   2. distJacobian: per pair, bilinear image gradient (2 extra bilinear
//      samples per axis), projection gradient, normal Jacobians for the
//      4-voxel coupled stencil {d0,d1,d2,d3}, SH shading chain rule.
//   3. Normal equations H = J^T W J (+ multiplicative diagonal damping)
//      assembled sparsely, then conjugate gradient.
//
// ONE deliberate improvement over the reference is granted to the baseline:
// surface-set membership lookups use std::lower_bound on the (sorted)
// surface vector instead of the reference's std::find linear scan
// (PsOptimizerJa.cpp:523,541; Optimizer.cpp:462-474).  The std::find
// variant is also measured (at reduced frame count, it is O(N) per lookup)
// and reported as `find_variant_dist_block_s` scaled to the full frame
// count, so both the faithful and the improved baselines are on record.
//
// Plain C++17, no external deps, -O3, one thread — the reference's own
// execution model.
//
// Usage: cpp_refine_baseline W H DIM FRAMES  -> prints one JSON line.

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <vector>

struct V3 { float x, y, z; };
static inline V3 v3(float x, float y, float z) { return {x, y, z}; }
static inline V3 add(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 mul(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline float norm(V3 a) { return std::sqrt(dot(a, a)); }
static inline V3 normalized(V3 a) {
    float n = norm(a);
    return n > 1e-12f ? mul(a, 1.f / n) : v3(0, 0, 0);
}

struct Mat3 { float m[9]; };
static inline V3 mv(const Mat3 &R, V3 p) {
    return {R.m[0] * p.x + R.m[1] * p.y + R.m[2] * p.z,
            R.m[3] * p.x + R.m[4] * p.y + R.m[5] * p.z,
            R.m[6] * p.x + R.m[7] * p.y + R.m[8] * p.z};
}
static inline V3 mtv(const Mat3 &R, V3 p) {
    return {R.m[0] * p.x + R.m[3] * p.y + R.m[6] * p.z,
            R.m[1] * p.x + R.m[4] * p.y + R.m[7] * p.z,
            R.m[2] * p.x + R.m[5] * p.y + R.m[8] * p.z};
}

struct SdfVoxel { float dist; V3 grad; float weight; float r, g, b; };

int W, H, DIM;
float fx, fy, cx, cy, h, T;
V3 origin;
std::vector<float> img;   // H*W*3 RGB
std::vector<float> depth;
std::vector<V3> nrm;
std::vector<SdfVoxel> vox;

static inline size_t lin3(int i, int j, int k) {
    return (size_t)i + (size_t)DIM * j + (size_t)DIM * DIM * k;
}

// bilinear RGB sample (Auxilary.h:41-61 semantics)
static inline V3 bilinear(float r, float c) {
    int r0 = (int)std::floor(r), c0 = (int)std::floor(c);
    float fr = r - r0, fc = c - c0;
    int r1 = std::min(r0 + 1, H - 1), c1 = std::min(c0 + 1, W - 1);
    r0 = std::max(r0, 0); c0 = std::max(c0, 0);
    const float *p00 = &img[3 * (r0 * W + c0)], *p01 = &img[3 * (r0 * W + c1)];
    const float *p10 = &img[3 * (r1 * W + c0)], *p11 = &img[3 * (r1 * W + c1)];
    V3 out;
    float w00 = (1 - fr) * (1 - fc), w01 = (1 - fr) * fc;
    float w10 = fr * (1 - fc), w11 = fr * fc;
    out.x = w00 * p00[0] + w01 * p01[0] + w10 * p10[0] + w11 * p11[0];
    out.y = w00 * p00[1] + w01 * p01[1] + w10 * p10[1] + w11 * p11[1];
    out.z = w00 * p00[2] + w01 * p01[2] + w10 * p10[2] + w11 * p11[2];
    return out;
}

// central-difference image gradient via 2 bilinear samples
// (computeImageGradient, Auxilary.h:64-123)
static inline V3 img_grad(float r, float c, int axis) {
    float dr = axis == 1 ? 0.5f : 0.f, dc = axis == 0 ? 0.5f : 0.f;
    V3 a = bilinear(r + dr, c + dc), b = bilinear(r - dr, c - dc);
    return sub(a, b);
}

// membership lookup in the sorted surface vector
static const std::vector<int> *surf_ptr;
static bool use_find;               // faithful std::find variant
static inline long surf_col(int lin) {
    if (use_find) {
        auto it = std::find(surf_ptr->begin(), surf_ptr->end(), lin);
        return it == surf_ptr->end() ? -1 : it - surf_ptr->begin();
    }
    auto it = std::lower_bound(surf_ptr->begin(), surf_ptr->end(), lin);
    return (it != surf_ptr->end() && *it == lin) ? it - surf_ptr->begin() : -1;
}

// one-sided FD gradient + per-axis direction (computeDistGrad,
// Optimizer.cpp:287-364: forward iff +1 neighbor inside grid AND in the
// surface set — `ifValidDirection`, each check a membership lookup)
static inline void dist_grad(int i, int j, int k, V3 &grad, V3 &dir) {
    float d0 = vox[lin3(i, j, k)].dist;
    int c[3] = {i, j, k};
    float g[3], dr[3];
    for (int ax = 0; ax < 3; ++ax) {
        int f[3] = {c[0], c[1], c[2]};
        f[ax] += 1;
        bool fwd = f[ax] < DIM && surf_col(lin3(f[0], f[1], f[2])) >= 0;
        dr[ax] = fwd ? 1.f : -1.f;
        int n[3] = {c[0], c[1], c[2]};
        n[ax] += (int)dr[ax];
        n[ax] = std::max(0, std::min(DIM - 1, n[ax]));
        float dn = vox[lin3(n[0], n[1], n[2])].dist;
        g[ax] = dr[ax] * (dn - d0) / h;
    }
    grad = v3(g[0], g[1], g[2]);
    dir = v3(dr[0], dr[1], dr[2]);
}

// d(normalize(g))/dd_x for perturbation dg (normalJacobian pattern)
static inline V3 normal_jac(V3 g, V3 dg) {
    float gn = norm(g);
    if (gn < 1e-12f) return v3(0, 0, 0);
    float inv = 1.f / gn;
    V3 ghat = mul(g, inv);
    return mul(sub(dg, mul(ghat, dot(ghat, dg))), inv);
}

int main(int argc, char **argv) {
    W = argc > 1 ? atoi(argv[1]) : 640;
    H = argc > 2 ? atoi(argv[2]) : 480;
    DIM = argc > 3 ? atoi(argv[3]) : 128;
    int FRAMES = argc > 4 ? atoi(argv[4]) : 20;

    fx = 0.9f * W; fy = 0.9f * W; cx = W / 2.f; cy = H / 2.f;
    h = 1.8f / DIM;
    T = 5.f * h;
    const V3 shift = v3(0.f, 0.f, 1.2f);
    origin = sub(shift, mul(v3(1, 1, 1), 0.5f * h * DIM));

    // synthetic wavy scene (identical to cpp_baseline.cpp / bench.py)
    depth.resize(W * H);
    nrm.resize(W * H);
    img.resize(W * H * 3);
    for (int v = 0; v < H; ++v)
        for (int u = 0; u < W; ++u) {
            float x0 = (u - cx) / fx, y0 = (v - cy) / fy;
            float z = 1.2f + 0.08f * std::sin(6 * x0) * std::cos(5 * y0)
                      + 0.05f * std::sin(3 * (x0 + y0));
            depth[v * W + u] = z;
            float dgx = 0.08f * 6 * std::cos(6 * x0) * std::cos(5 * y0)
                        + 0.15f * std::cos(3 * (x0 + y0));
            float dgy = -0.08f * 5 * std::sin(6 * x0) * std::sin(5 * y0)
                        + 0.15f * std::cos(3 * (x0 + y0));
            V3 n = normalized(v3(-dgx, -dgy, 1.f));
            nrm[v * W + u] = n;
            float shade = 0.3f + 0.5f * std::fabs(n.z);
            img[3 * (v * W + u)] = shade;
            img[3 * (v * W + u) + 1] = shade * 0.9f;
            img[3 * (v * W + u) + 2] = shade * 0.8f;
        }

    // fuse one identity frame to build the volume (VolumetricGradSdf.cpp:78-134)
    size_t NV = (size_t)DIM * DIM * DIM;
    vox.assign(NV, SdfVoxel{T, {0, 0, 0}, 0, 0.5f, 0.5f, 0.5f});
    for (int k = 0; k < DIM; ++k)
        for (int j = 0; j < DIM; ++j)
            for (int i = 0; i < DIM; ++i) {
                V3 pw = add(origin, mul(v3((float)i, (float)j, (float)k), h));
                if (pw.z <= 0) continue;
                int u = (int)(cx + fx * pw.x / pw.z + 0.5f);
                int v = (int)(cy + fy * pw.y / pw.z + 0.5f);
                if (u < 0 || u >= W || v < 0 || v >= H) continue;
                float z = depth[v * W + u];
                float sdf = z - pw.z;
                float w = sdf >= 0.f ? 1.f : (sdf >= -T ? 1.f + sdf / T : 0.f);
                if (w == 0.f) continue;
                SdfVoxel &vx = vox[lin3(i, j, k)];
                vx.weight += w;
                float tr = std::max(-T, std::min(T, sdf));
                vx.dist += (tr - vx.dist) * w / vx.weight;
                vx.grad = sub(vx.grad, mul(nrm[v * W + u], w));
            }

    // surface extraction: |d| <= sqrt(3) h, seen (OptimizerAux.cpp:237-257);
    // vector is sorted ascending by construction (grid iteration order)
    std::vector<int> surf;
    for (size_t l = 0; l < NV; ++l)
        if (vox[l].weight > 0.f && std::fabs(vox[l].dist) <= std::sqrt(3.f) * h)
            surf.push_back((int)l);
    surf_ptr = &surf;
    size_t N = surf.size();

    // per-keyframe SH1 lights l = [0.02; R (0,0,-1)] with identity poses
    // (PsOptimizer.cpp:25-42); identity keyframe poses => all voxels visible
    // in all frames — the maximal-work visibility pattern.
    float light[4] = {0.02f, 0.f, 0.f, -1.f};
    const float lam = 0.2f;  // cauchy (config_skorates.json)
    Mat3 Rid{{1, 0, 0, 0, 1, 0, 0, 0, 1}};
    V3 tid = v3(0, 0, 0);

    struct PairRow { int cols[4]; V3 Jc[4]; V3 r; V3 w; };
    std::vector<PairRow> rows;
    rows.reserve(N * FRAMES);

    auto run_block = [&](int frames) -> double {
        auto t0 = std::chrono::steady_clock::now();
        rows.clear();
        // ---- residual + Jacobian assembly over (voxel, frame) pairs ----
        for (int f = 0; f < frames; ++f) {
            for (size_t s = 0; s < N; ++s) {
                int l = surf[s];
                int i = l % DIM, j = (l / DIM) % DIM, k = l / (DIM * DIM);
                SdfVoxel &v = vox[l];
                V3 cv = add(origin, mul(v3((float)i, (float)j, (float)k), h));
                V3 ghat = normalized(v.grad);
                V3 x = sub(cv, mul(ghat, v.dist));
                V3 pc = mtv(Rid, sub(x, tid));
                if (pc.z <= 1e-6f) continue;
                float m = fx * pc.x / pc.z + cx;
                float n = fy * pc.y / pc.z + cy;
                if (m < 0 || m >= W || n < 0 || n >= H) continue;

                // FD shading normal (2 membership lookups per axis worst case)
                V3 grad, dir;
                dist_grad(i, j, k, grad, dir);
                V3 nh = normalized(grad);

                // residual + cauchy IRLS weights
                V3 I = bilinear(n, m);
                float irr = light[0] + light[1] * nh.x + light[2] * nh.y
                            + light[3] * nh.z;
                V3 rr = v3(I.x - v.r * irr, I.y - v.g * irr, I.z - v.b * irr);
                V3 ww = v3(1.f / (1.f + rr.x * rr.x / (lam * lam)),
                           1.f / (1.f + rr.y * rr.y / (lam * lam)),
                           1.f / (1.f + rr.z * rr.z / (lam * lam)));

                // image/projection gradient chain (PsOptimizerJa.cpp:160-225)
                V3 gu = img_grad(n, m, 0), gv = img_grad(n, m, 1);
                float zi = 1.f / pc.z, zi2 = zi * zi;
                // rows of dpi/dx (2x3), then dI/dx = gu*pi0 + gv*pi1 (3x3)
                V3 pi0 = v3(fx * zi, 0, -fx * pc.x * zi2);
                V3 pi1 = v3(0, fy * zi, -fy * pc.y * zi2);

                // normal Jacobians for the 4-voxel stencil
                float ih = 1.f / h;
                V3 gd0 = v3(-dir.x * ih, -dir.y * ih, -dir.z * ih);
                V3 dn0 = normal_jac(grad, gd0);
                V3 dn1 = normal_jac(grad, v3(dir.x * ih, 0, 0));
                V3 dn2 = normal_jac(grad, v3(0, dir.y * ih, 0));
                V3 dn3 = normal_jac(grad, v3(0, 0, dir.z * ih));

                V3 dx0 = sub(mul(ghat, -1.f), mul(dn0, v.dist));
                auto chain = [&](V3 dx) {
                    V3 rdx = mtv(Rid, dx);
                    float du = dot(pi0, rdx), dv = dot(pi1, rdx);
                    return v3(gu.x * du + gv.x * dv, gu.y * du + gv.y * dv,
                              gu.z * du + gv.z * dv);
                };
                V3 dI0 = chain(dx0);
                V3 dI1 = chain(mul(dn1, -v.dist));
                V3 dI2 = chain(mul(dn2, -v.dist));
                V3 dI3 = chain(mul(dn3, -v.dist));

                auto shade_term = [&](V3 dn) {
                    float dl = light[1] * dn.x + light[2] * dn.y + light[3] * dn.z;
                    return v3(v.r * dl, v.g * dl, v.b * dl);
                };
                PairRow row;
                row.r = rr; row.w = ww;
                row.Jc[0] = sub(dI0, shade_term(dn0));
                row.Jc[1] = sub(dI1, shade_term(dn1));
                row.Jc[2] = sub(dI2, shade_term(dn2));
                row.Jc[3] = sub(dI3, shade_term(dn3));
                // column lookups (the reference std::finds all four,
                // PsOptimizerJa.cpp:523,541 — even the diagonal)
                row.cols[0] = (int)surf_col(l);
                int cc[3] = {i, j, k};
                for (int ax = 0; ax < 3; ++ax) {
                    int nb[3] = {cc[0], cc[1], cc[2]};
                    nb[ax] += (int)((&dir.x)[ax]);
                    nb[ax] = std::max(0, std::min(DIM - 1, nb[ax]));
                    row.cols[1 + ax] = (int)surf_col(lin3(nb[0], nb[1], nb[2]));
                }
                rows.push_back(row);
            }
        }

        // ---- CG on H = J^T W J + damping*diag (PsOptimizer.cpp:128-170) ----
        std::vector<float> diag(N, 0.f), b(N, 0.f);
        for (auto &row : rows)
            for (int a = 0; a < 4; ++a) {
                if (row.cols[a] < 0) continue;
                const V3 &J = row.Jc[a];
                diag[row.cols[a]] += row.w.x * J.x * J.x + row.w.y * J.y * J.y
                                     + row.w.z * J.z * J.z;
                b[row.cols[a]] += row.w.x * J.x * row.r.x + row.w.y * J.y * row.r.y
                                  + row.w.z * J.z * row.r.z;
            }
        const float damping = 1.0f;
        std::vector<float> x(N, 0.f), r(b), p(b), Ap(N);
        auto matvec = [&](const std::vector<float> &in, std::vector<float> &out) {
            std::fill(out.begin(), out.end(), 0.f);
            for (auto &row : rows) {
                V3 acc = v3(0, 0, 0);
                for (int a = 0; a < 4; ++a) {
                    if (row.cols[a] < 0) continue;
                    float xa = in[row.cols[a]];
                    acc = add(acc, mul(row.Jc[a], xa));
                }
                acc = v3(acc.x * row.w.x, acc.y * row.w.y, acc.z * row.w.z);
                for (int a = 0; a < 4; ++a) {
                    if (row.cols[a] < 0) continue;
                    out[row.cols[a]] += dot(row.Jc[a], acc);
                }
            }
            for (size_t q = 0; q < N; ++q) out[q] += damping * diag[q] * in[q];
        };
        float rs = 0;
        for (size_t q = 0; q < N; ++q) rs += r[q] * r[q];
        for (int it = 0; it < 100 && rs > 1e-12f; ++it) {
            matvec(p, Ap);
            float pAp = 0;
            for (size_t q = 0; q < N; ++q) pAp += p[q] * Ap[q];
            if (pAp <= 0) break;
            float alpha = rs / pAp;
            float rs2 = 0;
            for (size_t q = 0; q < N; ++q) {
                x[q] += alpha * p[q];
                r[q] -= alpha * Ap[q];
                rs2 += r[q] * r[q];
            }
            float beta = rs2 / rs;
            rs = rs2;
            for (size_t q = 0; q < N; ++q) p[q] = r[q] + beta * p[q];
        }
        // clamped update (OptimizerAux.cpp:162-188)
        float lim = std::sqrt(3.f) * h;
        volatile float sink = 0.f;
        for (size_t s = 0; s < N; ++s)
            if (std::fabs(x[s]) < lim) sink += x[s];
        auto t1 = std::chrono::steady_clock::now();
        return std::chrono::duration<double>(t1 - t0).count();
    };

    use_find = false;
    double lb_s = run_block(FRAMES);
    size_t pairs = rows.size();

    // faithful std::find variant, measured at 1 frame (linear in frames)
    use_find = true;
    int find_frames = 1;
    double find_1f = run_block(find_frames);
    use_find = false;
    double find_full = find_1f * (double)FRAMES;  // assembly dominates; CG shared

    printf("{\"surface_voxels\": %zu, \"frames\": %d, \"pairs\": %zu, "
           "\"dist_block_s\": %.6f, \"find_variant_dist_block_s\": %.6f, "
           "\"find_frames_measured\": %d}\n",
           N, FRAMES, pairs, lb_s, find_full, find_frames);
    return 0;
}
