// Refinement parity ORACLE: single-threaded plain-C++ implementation of the
// reference's photometric-refinement residual pass and one Gauss-Newton step
// of each block (albedo / light / distance / pose, SH1), dumped as raw
// arrays for tests/test_refine_oracle.py to pin the JAX blocks against.
//
// Implements, with the reference's exact semantics:
//   * residual pass (PsOptimizerJa.cpp:567-626): x = c_v - d*ghat_stored,
//     project, bilinear sample (Auxilary.h:41-61 border cases), SH1 shading
//     rho_c*(l^T [1;n_fd]) with the one-sided FD normal
//     (Optimizer.cpp:287-364 direction rule), Cauchy IRLS weights
//     (Optimizer.cpp:140-161).
//   * albedo block (PsOptimizerJa.cpp:118-129, PsOptimizer.cpp:85-121):
//     J = -(l^T SH(ghat_stored)); diagonal normal equations with
//     multiplicative damping; clamped update to (0,1)
//     (OptimizerAux.cpp:120-150).
//   * light block (PsOptimizerJa.cpp:132-157, PsOptimizer.cpp:175-203):
//     J = -rho_c SH(ghat_stored); per-frame 4x4 solve (block-diagonal),
//     no damping.
//   * distance block (PsOptimizerJa.cpp:160-289,479-562; PsOptimizer.cpp:
//     124-172): 4-voxel coupled stencil {d0,d1,d2,d3} with reprojection +
//     shading-normal chain rule (image gradient = Auxilary.h:64-123
//     blended forward differences; normalJacobian = Optimizer.cpp:269-284
//     with the 1e-3 norm clamp), Jacobi-preconditioned CG on
//     J^T W J + damping*diag.
//   * pose block (PsOptimizerJa.cpp:61-115, PsOptimizer.cpp:207-234):
//     J = [-G R^T | G skew(p_cam)], per-frame 6x6 solve with
//     multiplicative damping.
//
// The reference repo itself cannot be built here (empty vendored
// submodules) — this oracle is an independent reimplementation of the
// algorithm from its sources, written for numeric comparison.
//
// Usage: cpp_refine_oracle W H DIM F OUTDIR
// Writes OUTDIR/{meta.json, image.f32, dist.f32, grad.f32, weight.f32,
// surf.i32, poses.f32, lights.f32, r.f32, w.f32, mask.u8, alb_new.f32,
// light_delta.f32, dist_delta.f32, pose_delta.f32}

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

struct V3 { float x, y, z; };
static inline V3 v3(float x, float y, float z) { return {x, y, z}; }
static inline V3 add(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 mul(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline float norm(V3 a) { return std::sqrt(dot(a, a)); }
static inline V3 normalized(V3 a) {            // geometry.normalize (eps 1e-12)
    float n = std::max(norm(a), 1e-12f);
    return mul(a, 1.f / n);
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

int W, H, DIM, F;
float fx, fy, cx, cy, h, T;
V3 origin;
std::vector<float> img;      // H*W*3
std::vector<float> vdist, vweight;
std::vector<V3> vgrad;
std::vector<float> valb;     // NV*3 (constant 0.5 after fusion here)

static inline size_t lin3(int i, int j, int k) {
    return (size_t)i + (size_t)DIM * j + (size_t)DIM * DIM * k;
}

// ---- image sampling with ops/image.py == Auxilary.h semantics ----
static inline const float *px(int r, int c) {
    r = std::max(0, std::min(H - 1, r));
    c = std::max(0, std::min(W - 1, c));
    return &img[3 * ((size_t)r * W + c)];
}

static V3 bilinear(float r, float c) {
    int r0 = (int)std::floor(r), c0 = (int)std::floor(c);
    float fr = r - r0, fc = c - c0;
    bool row_ok = r0 + 1 < H, col_ok = c0 + 1 < W;
    const float *v00 = px(r0, c0), *v01 = px(r0, c0 + 1);
    const float *v10 = px(r0 + 1, c0), *v11 = px(r0 + 1, c0 + 1);
    V3 out;
    for (int ch = 0; ch < 3; ++ch) {
        float full = (1 - fc) * (fr * v10[ch] + (1 - fr) * v00[ch])
                     + fc * (fr * v11[ch] + (1 - fr) * v01[ch]);
        float col_only = (1 - fc) * v00[ch] + fc * v01[ch];
        float row_only = fr * v10[ch] + (1 - fr) * v00[ch];
        float val = (row_ok && col_ok) ? full
                    : (col_ok ? col_only : (row_ok ? row_only : v00[ch]));
        (&out.x)[ch] = val;
    }
    return out;
}

// axis 0 = d/d(col) (u), axis 1 = d/d(row) (v) — blended forward differences
// with the border fallbacks of computeImageGradient (Auxilary.h:64-123)
static V3 img_grad(float r, float c, int axis) {
    int r0 = (int)std::floor(r), c0 = (int)std::floor(c);
    float fr = r - r0, fc = c - c0;
    bool row_ok = r0 + 1 < H, col_ok = c0 + 1 < W;
    V3 out;
    for (int ch = 0; ch < 3; ++ch) {
        float val;
        if (axis == 0) {
            float d_r0 = px(r0, c0 + 1)[ch] - px(r0, c0)[ch];
            float d_r1 = px(r0 + 1, c0 + 1)[ch] - px(r0 + 1, c0)[ch];
            float b_r0 = px(r0, c0)[ch] - px(r0, c0 - 1)[ch];
            float b_r1 = px(r0 + 1, c0)[ch] - px(r0 + 1, c0 - 1)[ch];
            float blended = (1 - fr) * d_r0 + fr * d_r1;
            float blended_back = (1 - fr) * b_r0 + fr * b_r1;
            val = (row_ok && col_ok) ? blended : (!row_ok ? d_r0 : blended_back);
        } else {
            float d_c0 = px(r0 + 1, c0)[ch] - px(r0, c0)[ch];
            float d_c1 = px(r0 + 1, c0 + 1)[ch] - px(r0, c0 + 1)[ch];
            float b_c0 = px(r0, c0)[ch] - px(r0 - 1, c0)[ch];
            float b_c1 = px(r0, c0 + 1)[ch] - px(r0 - 1, c0 + 1)[ch];
            float blended = (1 - fc) * d_c0 + fc * d_c1;
            float blended_back = (1 - fc) * b_c0 + fc * b_c1;
            val = (row_ok && col_ok) ? blended : (!col_ok ? d_c0 : blended_back);
        }
        (&out.x)[ch] = val;
    }
    return out;
}

// normalJacobian (Optimizer.cpp:269-284): n_d = -direction/h,
// N_inv = 1/max(||grad||, 1e-3), J = N_inv*n_d - N_inv^3 (n_d.grad) grad
static inline V3 normal_jac(V3 grad, V3 direction) {
    V3 n_d = mul(direction, -1.f / h);
    float N_inv = 1.f / std::max(norm(grad), 1e-3f);
    float dN = N_inv * N_inv * N_inv * dot(n_d, grad);
    return sub(mul(n_d, N_inv), mul(grad, dN));
}

// dense linear solve (partial pivoting) for the tiny per-frame systems
static void solve_dense(int n, std::vector<double> A, std::vector<double> b,
                        float *out) {
    for (int k = 0; k < n; ++k) {
        int piv = k;
        for (int i = k + 1; i < n; ++i)
            if (std::fabs(A[i * n + k]) > std::fabs(A[piv * n + k])) piv = i;
        if (piv != k) {
            for (int j = 0; j < n; ++j) std::swap(A[k * n + j], A[piv * n + j]);
            std::swap(b[k], b[piv]);
        }
        double d = A[k * n + k];
        for (int i = k + 1; i < n; ++i) {
            double f = A[i * n + k] / d;
            for (int j = k; j < n; ++j) A[i * n + j] -= f * A[k * n + j];
            b[i] -= f * b[k];
        }
    }
    for (int k = n - 1; k >= 0; --k) {
        double s = b[k];
        for (int j = k + 1; j < n; ++j) s -= A[k * n + j] * out[j];
        out[k] = (float)(s / A[k * n + k]);
    }
}

static void wbin(const std::string &path, const void *data, size_t bytes) {
    FILE *f = fopen(path.c_str(), "wb");
    if (!f) { perror(path.c_str()); exit(1); }
    fwrite(data, 1, bytes, f);
    fclose(f);
}

int main(int argc, char **argv) {
    W = argc > 1 ? atoi(argv[1]) : 160;
    H = argc > 2 ? atoi(argv[2]) : 120;
    DIM = argc > 3 ? atoi(argv[3]) : 48;
    F = argc > 4 ? atoi(argv[4]) : 3;
    std::string out = argc > 5 ? argv[5] : "/tmp/refine_oracle";
    out += "/";

    fx = 0.9f * W; fy = 0.9f * W; cx = W / 2.f; cy = H / 2.f;
    h = 1.8f / DIM;
    T = 5.f * h;
    const V3 shift = v3(0.f, 0.f, 1.2f);
    origin = sub(shift, mul(v3(1, 1, 1), 0.5f * h * DIM));
    const float damping = 1.0f;
    const float lam = 0.2f;

    // ---- synthetic wavy scene (identical formula to bench.py) ----
    std::vector<float> depth(W * H);
    std::vector<V3> nrm(W * H);
    img.resize((size_t)W * H * 3);
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
            img[3 * ((size_t)v * W + u)] = shade;
            img[3 * ((size_t)v * W + u) + 1] = shade * 0.9f;
            img[3 * ((size_t)v * W + u) + 2] = shade * 0.8f;
        }

    // ---- fuse one identity frame (VolumetricGradSdf.cpp:78-134, no
    // normal/angle gates — the dump carries the volume, so the JAX side
    // loads it verbatim rather than re-fusing) ----
    size_t NV = (size_t)DIM * DIM * DIM;
    vdist.assign(NV, T);
    vweight.assign(NV, 0.f);
    vgrad.assign(NV, v3(0, 0, 0));
    valb.assign(NV * 3, 0.5f);
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
                size_t l = lin3(i, j, k);
                vweight[l] += w;
                float tr = std::max(-T, std::min(T, sdf));
                vdist[l] += (tr - vdist[l]) * w / vweight[l];
                vgrad[l] = sub(vgrad[l], mul(nrm[v * W + u], w));
            }

    // ---- surface set (|d| <= sqrt(3) h && seen) ----
    std::vector<int> surf;
    for (size_t l = 0; l < NV; ++l)
        if (vweight[l] > 0.f && std::fabs(vdist[l]) <= std::sqrt(3.f) * h)
            surf.push_back((int)l);
    size_t N = surf.size();
    std::vector<int> cmap(NV, -1);
    for (size_t s = 0; s < N; ++s) cmap[surf[s]] = (int)s;

    // ---- keyframe poses (camera-to-world): Rz(a_f) + small translation ----
    std::vector<Mat3> Rs(F);
    std::vector<V3> ts(F);
    std::vector<float> poses_out(F * 16, 0.f);
    for (int f = 0; f < F; ++f) {
        float a = 0.004f * f;
        float ca = std::cos(a), sa = std::sin(a);
        Rs[f] = Mat3{{ca, -sa, 0, sa, ca, 0, 0, 0, 1}};
        ts[f] = v3(0.003f * f, -0.002f * f, 0.001f * f);
        float *P = &poses_out[f * 16];
        P[0] = ca; P[1] = -sa; P[2] = 0; P[3] = ts[f].x;
        P[4] = sa; P[5] = ca; P[6] = 0; P[7] = ts[f].y;
        P[8] = 0; P[9] = 0; P[10] = 1; P[11] = ts[f].z;
        P[15] = 1;
    }
    // per-frame SH1 lights (slightly varied so the frame axis is exercised)
    std::vector<float> lights(F * 4);
    for (int f = 0; f < F; ++f) {
        lights[f * 4 + 0] = 0.02f + 0.004f * f;
        lights[f * 4 + 1] = 0.03f * f;
        lights[f * 4 + 2] = -0.02f * f;
        lights[f * 4 + 3] = -1.0f + 0.01f * f;
    }

    // ---- FD stencil per surface voxel (forward iff +1 in-bounds AND in
    // the surface set; frozen neighbors read the grid, no column) ----
    std::vector<float> sdir(N * 3);
    std::vector<int> snbr(N * 3);             // compact index, -1 frozen
    std::vector<float> snbr_d(N * 3);         // neighbor dist (always)
    for (size_t s = 0; s < N; ++s) {
        int l = surf[s];
        int i = l % DIM, j = (l / DIM) % DIM, k = l / (DIM * DIM);
        int c[3] = {i, j, k};
        for (int ax = 0; ax < 3; ++ax) {
            int f3[3] = {c[0], c[1], c[2]};
            f3[ax] += 1;
            bool fwd = f3[ax] < DIM && cmap[lin3(f3[0], f3[1], f3[2])] >= 0;
            float dr = fwd ? 1.f : -1.f;
            int n3[3] = {c[0], c[1], c[2]};
            n3[ax] += (int)dr;
            n3[ax] = std::max(0, std::min(DIM - 1, n3[ax]));
            size_t ln = lin3(n3[0], n3[1], n3[2]);
            sdir[s * 3 + ax] = dr;
            snbr[s * 3 + ax] = cmap[ln];
            snbr_d[s * 3 + ax] = vdist[ln];
        }
    }

    // ---- residual pass + per-pair Jacobian pieces ----
    std::vector<float> r_out(N * F * 3, 0.f), w_out(N * F * 3, 0.f);
    std::vector<uint8_t> mask_out(N * F, 0);
    // dist-block rows
    struct Row { int cols[4]; V3 Jc[4]; V3 r, w; };
    std::vector<Row> rows;
    rows.reserve(N * F);
    // pose normal equations
    std::vector<std::vector<double>> Hp(F, std::vector<double>(36, 0.0));
    std::vector<std::vector<double>> gp(F, std::vector<double>(6, 0.0));
    // light normal equations
    std::vector<std::vector<double>> Hl(F, std::vector<double>(16, 0.0));
    std::vector<std::vector<double>> gl(F, std::vector<double>(4, 0.0));
    // albedo diagonal equations
    std::vector<double> alb_b(N * 3, 0.0), alb_diag(N * 3, 0.0);

    for (size_t s = 0; s < N; ++s) {
        int l = surf[s];
        int i = l % DIM, j = (l / DIM) % DIM, k = l / (DIM * DIM);
        float d0 = vdist[l];
        V3 cv = add(origin, mul(v3((float)i, (float)j, (float)k), h));
        V3 ghat = normalized(vgrad[l]);
        V3 xw = sub(cv, mul(ghat, d0));       // surface point (stored grad)
        float rho[3] = {valb[3 * (size_t)l], valb[3 * (size_t)l + 1],
                        valb[3 * (size_t)l + 2]};

        // FD gradient + shading normal (shared across frames)
        V3 grad_fd;
        {
            float g[3];
            for (int ax = 0; ax < 3; ++ax)
                g[ax] = sdir[s * 3 + ax] * (snbr_d[s * 3 + ax] - d0) / h;
            grad_fd = v3(g[0], g[1], g[2]);
        }
        V3 n_fd = normalized(grad_fd);
        // SH basis of the STORED-gradient normal (albedo/light Jacobians,
        // PsOptimizerJa.cpp:118-143)
        float sh_st[4] = {1.f, ghat.x, ghat.y, ghat.z};

        // normal Jacobians for the stencil (dn_stencil conventions)
        V3 dir = v3(sdir[s * 3], sdir[s * 3 + 1], sdir[s * 3 + 2]);
        V3 dn0 = normal_jac(grad_fd, dir);                  // self: +pos
        V3 dni[3] = {normal_jac(grad_fd, v3(-dir.x, 0, 0)), // nbr: -pos_i e_i
                     normal_jac(grad_fd, v3(0, -dir.y, 0)),
                     normal_jac(grad_fd, v3(0, 0, -dir.z))};
        V3 dx0 = sub(mul(ghat, -1.f), mul(dn0, d0));        // d x / d d0

        for (int f = 0; f < F; ++f) {
            V3 pc = mtv(Rs[f], sub(xw, ts[f]));
            float zc = pc.z;
            float safe_z = std::fabs(zc) > 1e-12f ? zc : 1e-12f;
            float u = fx * pc.x / safe_z + cx;
            float v = fy * pc.y / safe_z + cy;
            bool in_img = u >= 0 && u < W && v >= 0 && v < H;
            if (!in_img) continue;            // mask=0, r=w=0 stay
            mask_out[s * F + f] = 1;

            V3 I = bilinear(v, u);
            const float *lf = &lights[f * 4];
            float irr = lf[0] + lf[1] * n_fd.x + lf[2] * n_fd.y + lf[3] * n_fd.z;
            V3 rr = v3(I.x - rho[0] * irr, I.y - rho[1] * irr, I.z - rho[2] * irr);
            V3 ww = v3(1.f / (1.f + rr.x * rr.x / (lam * lam)),
                       1.f / (1.f + rr.y * rr.y / (lam * lam)),
                       1.f / (1.f + rr.z * rr.z / (lam * lam)));
            for (int ch = 0; ch < 3; ++ch) {
                r_out[(s * F + f) * 3 + ch] = (&rr.x)[ch];
                w_out[(s * F + f) * 3 + ch] = (&ww.x)[ch];
            }

            // ---- albedo: J = -(l^T SH(ghat_stored)), same all channels ----
            float irr_st = lf[0] + lf[1] * sh_st[1] + lf[2] * sh_st[2]
                           + lf[3] * sh_st[3];
            float Ja = -irr_st;
            for (int ch = 0; ch < 3; ++ch) {
                alb_b[s * 3 + ch] += (double)Ja * (&ww.x)[ch] * (&rr.x)[ch];
                alb_diag[s * 3 + ch] += (double)Ja * Ja * (&ww.x)[ch];
            }

            // ---- light: J = -rho_c SH(ghat_stored) ----
            for (int ch = 0; ch < 3; ++ch) {
                float Jl[4] = {-rho[ch] * sh_st[0], -rho[ch] * sh_st[1],
                               -rho[ch] * sh_st[2], -rho[ch] * sh_st[3]};
                float wch = (&ww.x)[ch], rch = (&rr.x)[ch];
                for (int a = 0; a < 4; ++a) {
                    gl[f][a] += (double)wch * Jl[a] * rch;
                    for (int b = 0; b < 4; ++b)
                        Hl[f][a * 4 + b] += (double)wch * Jl[a] * Jl[b];
                }
            }

            // ---- image/projection gradient G [3ch x 3x] ----
            V3 gu = img_grad(v, u, 0), gv = img_grad(v, u, 1);
            float zi = 1.f / safe_z, zi2 = zi * zi;
            V3 pi0 = v3(fx * zi, 0, -fx * pc.x * zi2);
            V3 pi1 = v3(0, fy * zi, -fy * pc.y * zi2);
            V3 Grow[3];   // per channel: gu_c*pi0 + gv_c*pi1 (d I_c / d p_cam)
            for (int ch = 0; ch < 3; ++ch)
                Grow[ch] = add(mul(pi0, (&gu.x)[ch]), mul(pi1, (&gv.x)[ch]));

            // ---- pose: J = [-G R^T | G skew(p_cam)] ----
            for (int ch = 0; ch < 3; ++ch) {
                // -G R^T row: -(R G^T)... row_c of G R^T = R applied to row
                V3 GR = mv(Rs[f], Grow[ch]);   // (G R^T)_c = R * Grow_c
                V3 leftc = mul(GR, -1.f);
                // (G hat(p))_cy = sum_x G_cx hat(p)_xy = (hat(p)^T Grow_c)_y
                //              = -(p x Grow_c)_y = (Grow_c x p)_y
                V3 rightc = v3(
                    Grow[ch].y * pc.z - Grow[ch].z * pc.y,
                    Grow[ch].z * pc.x - Grow[ch].x * pc.z,
                    Grow[ch].x * pc.y - Grow[ch].y * pc.x);
                float Jp[6] = {leftc.x, leftc.y, leftc.z,
                               rightc.x, rightc.y, rightc.z};
                float wch = (&ww.x)[ch], rch = (&rr.x)[ch];
                for (int a = 0; a < 6; ++a) {
                    gp[f][a] += (double)wch * Jp[a] * rch;
                    for (int b = 0; b < 6; ++b)
                        Hp[f][a * 6 + b] += (double)wch * Jp[a] * Jp[b];
                }
            }

            // ---- distance rows ----
            auto chain = [&](V3 dx) {
                V3 rdx = mtv(Rs[f], dx);
                return v3(dot(Grow[0], rdx), dot(Grow[1], rdx), dot(Grow[2], rdx));
            };
            auto shade_term = [&](V3 dn) {
                float dl = lf[1] * dn.x + lf[2] * dn.y + lf[3] * dn.z;
                return v3(rho[0] * dl, rho[1] * dl, rho[2] * dl);
            };
            Row row;
            row.r = rr; row.w = ww;
            row.Jc[0] = sub(chain(dx0), shade_term(dn0));
            row.cols[0] = (int)s;
            for (int ax = 0; ax < 3; ++ax) {
                V3 dx = mul(dni[ax], -d0);
                row.Jc[1 + ax] = sub(chain(dx), shade_term(dni[ax]));
                row.cols[1 + ax] = snbr[s * 3 + ax];
            }
            rows.push_back(row);
        }
    }

    // ---- albedo solve: delta = b / ((1+damping) diag), clamped update ----
    std::vector<float> alb_new(N * 3);
    for (size_t q = 0; q < N * 3; ++q) {
        float delta = alb_diag[q] > 0.0
                          ? (float)(alb_b[q] / ((1.0 + damping) * alb_diag[q]))
                          : 0.f;
        float cur = 0.5f;
        float cand = cur - delta;
        alb_new[q] = (cand > 0.f && cand < 1.f) ? cand : cur;
    }

    // ---- light solve: (H + 1e-8 I) delta = g (no damping) ----
    std::vector<float> light_delta(F * 4);
    for (int f = 0; f < F; ++f) {
        std::vector<double> A = Hl[f];
        for (int a = 0; a < 4; ++a) A[a * 4 + a] += 1e-8;
        solve_dense(4, A, gl[f], &light_delta[f * 4]);
    }

    // ---- pose solve: multiplicative damping + 1e-8 jitter ----
    std::vector<float> pose_delta(F * 6);
    for (int f = 0; f < F; ++f) {
        std::vector<double> A = Hp[f];
        for (int a = 0; a < 6; ++a)
            A[a * 6 + a] += damping * Hp[f][a * 6 + a] + 1e-8;
        solve_dense(6, A, gp[f], &pose_delta[f * 6]);
    }

    // ---- distance solve: Jacobi-PCG on J^T W J + damping*diag ----
    std::vector<double> b(N, 0.0), diag(N, 0.0);
    for (auto &row : rows)
        for (int a = 0; a < 4; ++a) {
            if (row.cols[a] < 0) continue;
            const V3 &J = row.Jc[a];
            diag[row.cols[a]] += (double)row.w.x * J.x * J.x
                                 + (double)row.w.y * J.y * J.y
                                 + (double)row.w.z * J.z * J.z;
            b[row.cols[a]] += (double)row.w.x * J.x * row.r.x
                              + (double)row.w.y * J.y * row.r.y
                              + (double)row.w.z * J.z * row.r.z;
        }
    std::vector<double> x(N, 0.0), r(b), z(N), p(N), Ap(N);
    auto matvec = [&](const std::vector<double> &in, std::vector<double> &out) {
        std::fill(out.begin(), out.end(), 0.0);
        for (auto &row : rows) {
            double ax_ = 0, ay = 0, az = 0;
            for (int a = 0; a < 4; ++a) {
                if (row.cols[a] < 0) continue;
                double xa = in[row.cols[a]];
                ax_ += row.Jc[a].x * xa;
                ay += row.Jc[a].y * xa;
                az += row.Jc[a].z * xa;
            }
            ax_ *= row.w.x; ay *= row.w.y; az *= row.w.z;
            for (int a = 0; a < 4; ++a) {
                if (row.cols[a] < 0) continue;
                out[row.cols[a]] += row.Jc[a].x * ax_ + row.Jc[a].y * ay
                                    + row.Jc[a].z * az;
            }
        }
        for (size_t q = 0; q < N; ++q) out[q] += damping * diag[q] * in[q];
    };
    std::vector<double> dsafe(N);
    for (size_t q = 0; q < N; ++q)
        dsafe[q] = diag[q] > 0.0 ? (1.0 + damping) * diag[q] : 1.0;
    double bb = 0;
    for (size_t q = 0; q < N; ++q) bb += b[q] * b[q];
    double tol2 = 1e-20 * bb;     // tight: both sides converge to the solution
    for (size_t q = 0; q < N; ++q) z[q] = r[q] / dsafe[q];
    p = z;
    double rz = 0;
    for (size_t q = 0; q < N; ++q) rz += r[q] * z[q];
    for (int it = 0; it < 400; ++it) {
        double rr2 = 0;
        for (size_t q = 0; q < N; ++q) rr2 += r[q] * r[q];
        if (rr2 <= tol2) break;
        matvec(p, Ap);
        double pAp = 0;
        for (size_t q = 0; q < N; ++q) pAp += p[q] * Ap[q];
        if (pAp <= 0) break;
        double alpha = rz / pAp;
        for (size_t q = 0; q < N; ++q) { x[q] += alpha * p[q]; r[q] -= alpha * Ap[q]; }
        double rz2 = 0;
        for (size_t q = 0; q < N; ++q) { z[q] = r[q] / dsafe[q]; rz2 += r[q] * z[q]; }
        double beta = rz2 / rz;
        rz = rz2;
        for (size_t q = 0; q < N; ++q) p[q] = z[q] + beta * p[q];
    }
    std::vector<float> dist_delta(N);
    for (size_t q = 0; q < N; ++q) dist_delta[q] = (float)x[q];

    // ---- dumps ----
    std::vector<float> grad_flat(NV * 3);
    for (size_t l = 0; l < NV; ++l) {
        grad_flat[3 * l] = vgrad[l].x;
        grad_flat[3 * l + 1] = vgrad[l].y;
        grad_flat[3 * l + 2] = vgrad[l].z;
    }
    wbin(out + "image.f32", img.data(), img.size() * 4);
    wbin(out + "dist.f32", vdist.data(), NV * 4);
    wbin(out + "grad.f32", grad_flat.data(), NV * 12);
    wbin(out + "weight.f32", vweight.data(), NV * 4);
    wbin(out + "surf.i32", surf.data(), N * 4);
    wbin(out + "poses.f32", poses_out.data(), poses_out.size() * 4);
    wbin(out + "lights.f32", lights.data(), lights.size() * 4);
    wbin(out + "r.f32", r_out.data(), r_out.size() * 4);
    wbin(out + "w.f32", w_out.data(), w_out.size() * 4);
    wbin(out + "mask.u8", mask_out.data(), mask_out.size());
    wbin(out + "alb_new.f32", alb_new.data(), alb_new.size() * 4);
    wbin(out + "light_delta.f32", light_delta.data(), light_delta.size() * 4);
    wbin(out + "dist_delta.f32", dist_delta.data(), dist_delta.size() * 4);
    wbin(out + "pose_delta.f32", pose_delta.data(), pose_delta.size() * 4);

    FILE *f = fopen((out + "meta.json").c_str(), "w");
    fprintf(f,
            "{\"W\": %d, \"H\": %d, \"DIM\": %d, \"F\": %d, \"N\": %zu, "
            "\"fx\": %.9g, \"fy\": %.9g, \"cx\": %.9g, \"cy\": %.9g, "
            "\"h\": %.9g, \"T\": %.9g, \"shift\": [0.0, 0.0, 1.2], "
            "\"damping\": %.9g, \"lambda\": %.9g}\n",
            W, H, DIM, F, N, fx, fy, cx, cy, h, T, damping, lam);
    fclose(f);
    printf("{\"N\": %zu, \"pairs\": %zu}\n", N, rows.size());
    return 0;
}
