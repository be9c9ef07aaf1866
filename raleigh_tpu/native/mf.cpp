// Supernodal multifrontal LDL^T factorization with BLAS3 fronts.
//
// Second-generation numeric engine behind SparseSymmetricSolver (the
// PARDISO replacement; reference raleigh/algebra/mkl_wrap.py:350-545):
// the up-looking simplicial code in ldlt.cpp is the robust fallback, this
// engine processes relaxed supernodes as dense frontal matrices so the
// flops run through dgemm/dtrsm (resolved at runtime from SciPy's bundled
// OpenBLAS via dlopen; scalar kernels otherwise).
//
// Pipeline: postorder the elimination tree, detect fundamental supernodes
// (parent chain + equal column counts, width-capped), then for each
// supernode in postorder: assemble its A columns and its children's
// update matrices into a dense column-major front, partial-LDL the pivot
// block (with PARDISO-style static pivot perturbation for shifted
// indefinite systems), dtrsm the subdiagonal panel, dgemm the Schur
// complement, and push it on the update stack for the parent.
// Triangular solves are supernodal too: per supernode one trsm-like sweep
// plus a dgemm against the block of right-hand sides.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdio>
#include <string>
#include <vector>
#include <algorithm>
#include <dlfcn.h>

namespace {

typedef void (*dgemm_t)(const char*, const char*, const int*, const int*,
                        const int*, const double*, const double*, const int*,
                        const double*, const int*, const double*, double*,
                        const int*);
typedef void (*dtrsm_t)(const char*, const char*, const char*, const char*,
                        const int*, const int*, const double*, const double*,
                        const int*, double*, const int*);

dgemm_t g_dgemm = nullptr;
dtrsm_t g_dtrsm = nullptr;

void naive_dgemm(const char* ta, const char* tb, const int* m, const int* n,
                 const int* k, const double* alpha, const double* a,
                 const int* lda, const double* b, const int* ldb,
                 const double* beta, double* c, const int* ldc) {
    // only the variants this file uses: ('N','T') and ('T','N')
    int M = *m, N = *n, K = *k;
    double al = *alpha, be = *beta;
    if (*ta == 'N' && *tb == 'T') {
        for (int j = 0; j < N; ++j)
            for (int i = 0; i < M; ++i) {
                double s = 0;
                for (int p = 0; p < K; ++p)
                    s += a[i + (size_t)p * *lda] * b[j + (size_t)p * *ldb];
                c[i + (size_t)j * *ldc] = be * c[i + (size_t)j * *ldc]
                                          + al * s;
            }
    } else if (*ta == 'T' && *tb == 'N') {
        for (int j = 0; j < N; ++j)
            for (int i = 0; i < M; ++i) {
                double s = 0;
                for (int p = 0; p < K; ++p)
                    s += a[p + (size_t)i * *lda] * b[p + (size_t)j * *ldb];
                c[i + (size_t)j * *ldc] = be * c[i + (size_t)j * *ldc]
                                          + al * s;
            }
    }
}

void naive_dtrsm(const char* side, const char* uplo, const char* ta,
                 const char* diag, const int* m, const int* n,
                 const double* alpha, const double* a, const int* lda,
                 double* b, const int* ldb) {
    // only the variant used: side='R', uplo='L', ta='T', diag='U':
    // B := B * inv(L^T) for unit lower L  ->  column sweep
    int M = *m, N = *n;
    (void)side; (void)uplo; (void)ta; (void)diag; (void)alpha;
    for (int j = 0; j < N; ++j) {
        for (int p = 0; p < j; ++p) {
            double l = a[j + (size_t)p * *lda];   // L(j,p)
            for (int i = 0; i < M; ++i)
                b[i + (size_t)j * *ldb] -= l * b[i + (size_t)p * *ldb];
        }
    }
}

struct Supernode {
    int64_t c0, c1;                  // column range [c0, c1)
    std::vector<int64_t> rows;       // rows strictly below the supernode
    std::vector<double> L11;         // (w x w) column-major, unit lower + D
    std::vector<double> L21;         // (r x w) column-major
    std::vector<double> D;           // (w)
};

struct MfHandle {
    int64_t n = 0;
    std::vector<int64_t> Ap, Ai;     // relabeled upper CSC
    std::vector<double> Ax;
    std::vector<int64_t> Lp_low, Li_low;   // relabeled lower CSC (pattern)
    std::vector<double> Lx_low;
    std::vector<int64_t> post;       // postorder relabel: new = post_of[old]
    std::vector<int64_t> ipost;
    std::vector<Supernode> snodes;
    std::vector<int64_t> snode_of_col;
    int64_t n_neg = 0, n_pos = 0, n_zero = 0, n_perturbed = 0;
    int64_t factor_nnz = 0;
    bool factorized = false;
};

void etree_upper_csc(int64_t n, const int64_t* Ap, const int64_t* Ai,
                     std::vector<int64_t>& parent,
                     std::vector<int64_t>& lnz) {
    parent.assign(n, -1);
    lnz.assign(n, 0);
    std::vector<int64_t> flag(n, -1);
    for (int64_t k = 0; k < n; ++k) {
        flag[k] = k;
        for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
            int64_t i = Ai[p];
            if (i >= k) continue;
            while (flag[i] != k) {
                if (parent[i] == -1) parent[i] = k;
                lnz[i]++;
                flag[i] = k;
                i = parent[i];
            }
        }
    }
}

}  // namespace

extern "C" {

int64_t ldltmf_set_blas(const char* path, const char* prefix) {
    void* h = dlopen(path, RTLD_NOW | RTLD_LOCAL);
    if (!h) return -1;
    std::string pre = prefix ? prefix : "";
    g_dgemm = (dgemm_t)dlsym(h, (pre + "dgemm_").c_str());
    g_dtrsm = (dtrsm_t)dlsym(h, (pre + "dtrsm_").c_str());
    if (!g_dgemm || !g_dtrsm) {
        g_dgemm = nullptr;
        g_dtrsm = nullptr;
        return -2;
    }
    return 0;
}

void* ldltmf_create(int64_t n, const int64_t* Ap, const int64_t* Ai,
                    const double* Ax) {
    MfHandle* h = new MfHandle();
    h->n = n;

    // 1) elimination tree of the input, then its postorder
    std::vector<int64_t> parent, lnz;
    etree_upper_csc(n, Ap, Ai, parent, lnz);
    std::vector<std::vector<int64_t>> kids(n);
    std::vector<int64_t> roots;
    for (int64_t v = 0; v < n; ++v) {
        if (parent[v] >= 0) kids[parent[v]].push_back(v);
        else roots.push_back(v);
    }
    h->post.assign(n, -1);       // post[old] = new label
    h->ipost.assign(n, -1);
    {
        int64_t label = 0;
        std::vector<std::pair<int64_t, size_t>> stack;
        for (int64_t r : roots) {
            stack.emplace_back(r, 0);
            while (!stack.empty()) {
                auto& top = stack.back();
                if (top.second < kids[top.first].size()) {
                    int64_t c = kids[top.first][top.second++];
                    stack.emplace_back(c, 0);
                } else {
                    h->post[top.first] = label;
                    h->ipost[label] = top.first;
                    ++label;
                    stack.pop_back();
                }
            }
        }
    }

    // 2) relabel the matrix by the postorder (upper CSC of P A P^T)
    int64_t nnz = Ap[n];
    std::vector<int64_t> cnt(n + 1, 0);
    std::vector<int64_t> ri(nnz), ci(nnz);
    for (int64_t j = 0; j < n; ++j)
        for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
            int64_t i2 = h->post[Ai[p]], j2 = h->post[j];
            if (i2 > j2) std::swap(i2, j2);
            ri[p] = i2;
            ci[p] = j2;
            cnt[j2 + 1]++;
        }
    for (int64_t j = 0; j < n; ++j) cnt[j + 1] += cnt[j];
    h->Ap = cnt;
    h->Ai.assign(nnz, 0);
    h->Ax.assign(nnz, 0.0);
    {
        std::vector<int64_t> next(h->Ap.begin(), h->Ap.end() - 1);
        for (int64_t p = 0; p < nnz; ++p) {
            int64_t q = next[ci[p]]++;
            h->Ai[q] = ri[p];
            h->Ax[q] = Ax[p];
        }
        // sort each column by row
        for (int64_t j = 0; j < n; ++j) {
            int64_t a = h->Ap[j], b = h->Ap[j + 1];
            std::vector<std::pair<int64_t, double>> col;
            col.reserve(b - a);
            for (int64_t p = a; p < b; ++p)
                col.emplace_back(h->Ai[p], h->Ax[p]);
            std::sort(col.begin(), col.end());
            for (int64_t p = a; p < b; ++p) {
                h->Ai[p] = col[p - a].first;
                h->Ax[p] = col[p - a].second;
            }
        }
    }
    // lower CSC (= transpose of upper CSC) for per-column assembly
    {
        std::vector<int64_t> c2(n + 1, 0);
        for (int64_t p = 0; p < nnz; ++p) c2[h->Ai[p] + 1]++;
        for (int64_t j = 0; j < n; ++j) c2[j + 1] += c2[j];
        h->Lp_low = c2;
        h->Li_low.assign(nnz, 0);
        h->Lx_low.assign(nnz, 0.0);
        std::vector<int64_t> next(h->Lp_low.begin(), h->Lp_low.end() - 1);
        for (int64_t j = 0; j < n; ++j)
            for (int64_t p = h->Ap[j]; p < h->Ap[j + 1]; ++p) {
                int64_t i = h->Ai[p];
                int64_t q = next[i]++;
                h->Li_low[q] = j;     // (row j of lower col i) -> j >= i
                h->Lx_low[q] = h->Ax[p];
            }
    }

    // 3) supernode partition on the relabeled tree: fundamental supernodes
    // plus relaxed amalgamation along parent chains — small column-count
    // jumps are absorbed as explicit zeros so the fronts get wide enough
    // to keep dgemm on the BLAS3 fast path (FE meshes with few dofs per
    // node otherwise yield width-3 fronts)
    std::vector<int64_t> parent2, lnz2;
    etree_upper_csc(n, h->Ap.data(), h->Ai.data(), parent2, lnz2);
    // fundamental chains may grow to WCAP (wide separator supernodes are
    // factored with a blocked in-front panel sweep, so width costs no
    // extra update traffic); relaxed amalgamation stays narrow
    const int64_t WCAP = 1024;
    const int64_t WRELAX = 64;
    h->snode_of_col.assign(n, -1);
    for (int64_t j = 0; j < n;) {
        int64_t c0 = j;
        int64_t w = 1;
        while (c0 + w < n && parent2[c0 + w - 1] == c0 + w && w < WCAP) {
            int64_t prev = lnz2[c0 + w - 1], next = lnz2[c0 + w];
            bool fundamental = (prev == next + 1);
            // relaxed: tolerate a bounded count jump (explicit zeros)
            int64_t jump = prev - 1 - next;
            bool relaxed = (w < WRELAX)
                && jump >= 0 && jump <= std::max<int64_t>(24, next / 3);
            if (!(fundamental || relaxed)) break;
            ++w;
        }
        Supernode s;
        s.c0 = c0;
        s.c1 = c0 + w;
        for (int64_t c = c0; c < s.c1; ++c)
            h->snode_of_col[c] = (int64_t)h->snodes.size();
        h->snodes.push_back(std::move(s));
        j = c0 + w;
    }
    return h;
}

void ldltmf_destroy(void* vh) { delete static_cast<MfHandle*>(vh); }

int64_t ldltmf_factorize(void* vh, double pivot_rel_eps) {
    MfHandle* h = static_cast<MfHandle*>(vh);
    const int64_t n = h->n;
    dgemm_t xgemm = g_dgemm ? g_dgemm : naive_dgemm;
    dtrsm_t xtrsm = g_dtrsm ? g_dtrsm : naive_dtrsm;

    double amax = 0.0;
    for (double v : h->Ax) amax = std::max(amax, std::fabs(v));
    const double piv_floor = pivot_rel_eps * amax;

    struct Update {
        std::vector<int64_t> rows;
        std::vector<double> m;       // (r x r) column-major, full
    };
    std::vector<Update> stack;

    h->n_neg = h->n_pos = h->n_zero = h->n_perturbed = 0;
    h->factor_nnz = 0;
    std::vector<int64_t> loc(n, -1);

    for (auto& s : h->snodes) {
        const int64_t w = s.c1 - s.c0;
        // children updates sit on top of the stack: count how many by
        // checking row ownership (their first row lies in this supernode
        // or beyond; by postorder all pending updates whose first row is
        // within [c0, c1) belong to children of this supernode)
        size_t first_child = stack.size();
        while (first_child > 0) {
            const auto& u = stack[first_child - 1];
            if (!u.rows.empty() && u.rows[0] >= s.c0 && u.rows[0] < s.c1)
                --first_child;
            else
                break;
        }
        // rows below the supernode: union of A-lower patterns of its
        // columns and the children's update rows
        std::vector<int64_t> rows;
        for (int64_t c = s.c0; c < s.c1; ++c)
            for (int64_t p = h->Lp_low[c]; p < h->Lp_low[c + 1]; ++p) {
                int64_t r = h->Li_low[p];
                if (r >= s.c1) rows.push_back(r);
            }
        for (size_t u = first_child; u < stack.size(); ++u)
            for (int64_t r : stack[u].rows)
                if (r >= s.c1) rows.push_back(r);
        std::sort(rows.begin(), rows.end());
        rows.erase(std::unique(rows.begin(), rows.end()), rows.end());
        const int64_t r = (int64_t)rows.size();
        const int64_t d = w + r;

        // local index map
        for (int64_t c = s.c0; c < s.c1; ++c) loc[c] = c - s.c0;
        for (int64_t t = 0; t < r; ++t) loc[rows[t]] = w + t;

        // the front is held as a (d x w) column-major PANEL only; the
        // trailing (r x r) Schur block is produced straight into the
        // update buffer by dgemm (beta=0) and children's F22 pieces are
        // scatter-added afterwards — no d x d buffer, no copy-out
        std::vector<double> F((size_t)d * w, 0.0);
        // assemble A columns (lower part; columns are always in-supernode)
        for (int64_t c = s.c0; c < s.c1; ++c) {
            int64_t lc = loc[c];
            for (int64_t p = h->Lp_low[c]; p < h->Lp_low[c + 1]; ++p) {
                int64_t i = h->Li_low[p];
                F[(size_t)lc * d + loc[i]] += h->Lx_low[p];
            }
        }
        // extend-add children contributions that land in panel columns
        for (size_t u = first_child; u < stack.size(); ++u) {
            const auto& up = stack[u];
            const int64_t rc = (int64_t)up.rows.size();
            for (int64_t j = 0; j < rc; ++j) {
                int64_t lj = loc[up.rows[j]];
                if (lj >= w) break;   // rows sorted: rest is F22 territory
                const double* src = up.m.data() + (size_t)j * rc;
                double* dst = F.data() + (size_t)lj * d;
                for (int64_t i = j; i < rc; ++i)
                    dst[loc[up.rows[i]]] += src[i];
            }
        }

        // blocked partial LDL of the (w x w) pivot block + panel: process
        // PB-wide panels left to right; within each panel a scalar LDL of
        // the diagonal block, a trsm for everything below it, and a dgemm
        // rank-PB update of the remaining columns — wide separator
        // supernodes run at BLAS3 speed instead of through the update
        // stack.  After this sweep the subdiagonal part of F holds
        // W = L * D (the trsm images), exactly as the one-shot path.
        const int64_t PB = 64;
        s.D.assign(w, 0.0);
        std::vector<double> ltmp;
        for (int64_t p0 = 0; p0 < w; p0 += PB) {
            const int64_t pw = std::min(PB, w - p0);
            const int64_t p1 = p0 + pw;
            // scalar LDL of the (pw x pw) diagonal block; normalize to
            // unit lower within the block
            for (int64_t j = p0; j < p1; ++j) {
                double dj = F[(size_t)j * d + j];
                if (std::fabs(dj) <= piv_floor) {
                    if (amax == 0.0) return -(s.c0 + j) - 1;
                    dj = (dj < 0 ? -1.0 : 1.0)
                         * (piv_floor > 0 ? piv_floor : pivot_rel_eps);
                    h->n_perturbed++;
                }
                s.D[j] = dj;
                if (dj < 0) h->n_neg++; else if (dj > 0) h->n_pos++;
                else h->n_zero++;
                for (int64_t k = j + 1; k < p1; ++k) {
                    double ljk = F[(size_t)j * d + k] / dj;
                    double* colk = F.data() + (size_t)k * d;
                    const double* colj = F.data() + (size_t)j * d;
                    for (int64_t i = k; i < p1; ++i)
                        colk[i] -= colj[i] * ljk;
                }
                for (int64_t i = j + 1; i < p1; ++i)
                    F[(size_t)j * d + i] /= dj;
            }
            // trsm: rows p1..d of the panel become W = L*D images
            const int64_t below = d - p1;
            if (below > 0) {
                int m_i = (int)below, n_i = (int)pw, d_i = (int)d;
                double one = 1.0;
                xtrsm("R", "L", "T", "U", &m_i, &n_i, &one,
                      F.data() + (size_t)p0 * d + p0, &d_i,
                      F.data() + (size_t)p0 * d + p1, &d_i);
            }
            // rank-pw update of the remaining pivot columns [p1, w):
            // F[p1:d, p1:w] -= W * Lpanel^T, Lpanel = W[p1:w] * D^-1
            const int64_t rem = w - p1;
            if (rem > 0 && below > 0) {
                ltmp.assign((size_t)rem * pw, 0.0);
                for (int64_t j = 0; j < pw; ++j) {
                    double inv = 1.0 / s.D[p0 + j];
                    const double* wcol = F.data() + (size_t)(p0 + j) * d + p1;
                    for (int64_t i = 0; i < rem; ++i)
                        ltmp[(size_t)j * rem + i] = wcol[i] * inv;
                }
                int m_i = (int)below, n_i = (int)rem, k_i = (int)pw;
                int lda = (int)d, ldb = (int)rem, ldc = (int)d;
                double mone = -1.0, one = 1.0;
                xgemm("N", "T", &m_i, &n_i, &k_i, &mone,
                      F.data() + (size_t)p0 * d + p1, &lda,
                      ltmp.data(), &ldb, &one,
                      F.data() + (size_t)p1 * d + p1, &ldc);
            }
        }
        // normalize the subdiagonal pivot-block rows to unit lower
        // (rows within [p1_j, w) of every panel hold W; convert to L)
        for (int64_t j = 0; j < w; ++j) {
            int64_t pend = std::min(((j / PB) + 1) * PB, w);
            double inv = 1.0 / s.D[j];
            double* col = F.data() + (size_t)j * d;
            for (int64_t i = pend; i < w; ++i) col[i] *= inv;
        }
        // store factors; build L21 = W * D^{-1}
        s.L11.assign((size_t)w * w, 0.0);
        for (int64_t j = 0; j < w; ++j)
            for (int64_t i = j; i < w; ++i)
                s.L11[(size_t)j * w + i] = (i == j)
                    ? 1.0 : F[(size_t)j * d + i];
        s.L21.assign((size_t)r * w, 0.0);
        for (int64_t j = 0; j < w; ++j) {
            double inv = 1.0 / s.D[j];
            const double* wcol = F.data() + (size_t)j * d + w;
            double* lcol = s.L21.data() + (size_t)j * r;
            for (int64_t i = 0; i < r; ++i) lcol[i] = wcol[i] * inv;
        }
        h->factor_nnz += w * (w - 1) / 2 + r * w;

        // Schur complement straight into the update buffer:
        //   up.m = -W * L21^T   (W = L21 * D lives in the panel)
        if (r > 0) {
            Update up;
            up.rows = rows;
            up.m.resize((size_t)r * r);
            int m_i = (int)r, n_i = (int)r, k_i = (int)w;
            int lda = (int)d, ldb = (int)r, ldc = (int)r;
            double mone = -1.0, zero = 0.0;
            xgemm("N", "T", &m_i, &n_i, &k_i, &mone, F.data() + w, &lda,
                  s.L21.data(), &ldb, &zero, up.m.data(), &ldc);
            // now add the children's F22 contributions
            for (size_t u = first_child; u < stack.size(); ++u) {
                const auto& cu = stack[u];
                const int64_t rc = (int64_t)cu.rows.size();
                for (int64_t j = 0; j < rc; ++j) {
                    int64_t lj = loc[cu.rows[j]];
                    if (lj < w) continue;    // panel part, already added
                    const double* src = cu.m.data() + (size_t)j * rc;
                    double* dst = up.m.data() + (size_t)(lj - w) * r;
                    for (int64_t i = j; i < rc; ++i)
                        dst[loc[cu.rows[i]] - w] += src[i];
                }
            }
            stack.push_back(std::move(up));
        }
        // pop the children updates (keep the new one if it was pushed)
        if (r > 0) {
            Update mine = std::move(stack.back());
            stack.resize(first_child);
            stack.push_back(std::move(mine));
        } else {
            stack.resize(first_child);
        }
        for (int64_t c = s.c0; c < s.c1; ++c) loc[c] = -1;
        for (int64_t t = 0; t < r; ++t) loc[rows[t]] = -1;
        s.rows = std::move(rows);
    }
    h->factorized = true;
    return 0;
}

// Solve (P^T L D L^T P) X = B where P is the internal postorder; b/x are
// RHS-contiguous (n rows x nrhs) in the caller's (pre-postorder) labels.
void ldltmf_solve(void* vh, int64_t nrhs, const double* b, double* x) {
    MfHandle* h = static_cast<MfHandle*>(vh);
    const int64_t n = h->n;
    dgemm_t xgemm = g_dgemm ? g_dgemm : naive_dgemm;
    // y (column-major n x nrhs) in postorder labels
    std::vector<double> y((size_t)n * nrhs);
    for (int64_t i = 0; i < n; ++i) {
        int64_t ip = h->post[i];
        for (int64_t rr = 0; rr < nrhs; ++rr)
            y[(size_t)rr * n + ip] = b[(size_t)i * nrhs + rr];
    }
    std::vector<double> t1, t2;
    int nr = (int)nrhs;
    dtrsm_t xtrsm2 = g_dtrsm;
    // forward: L z = y  (gather y1 column-major, dtrsm, scatter; one gemm
    // against the whole RHS block per supernode)
    for (auto& s : h->snodes) {
        int64_t w = s.c1 - s.c0, r = (int64_t)s.rows.size();
        t1.assign((size_t)w * nrhs, 0.0);
        for (int64_t rr = 0; rr < nrhs; ++rr)
            for (int64_t j = 0; j < w; ++j)
                t1[(size_t)rr * w + j] = y[(size_t)rr * n + s.c0 + j];
        if (w > 1) {
            if (xtrsm2) {
                int m_i = (int)w, w_i = (int)w;
                double one = 1.0;
                xtrsm2("L", "L", "N", "U", &m_i, &nr, &one, s.L11.data(),
                       &w_i, t1.data(), &m_i);
            } else {
                for (int64_t j = 0; j < w; ++j)
                    for (int64_t i = j + 1; i < w; ++i) {
                        double l = s.L11[(size_t)j * w + i];
                        if (l == 0.0) continue;
                        for (int64_t rr = 0; rr < nrhs; ++rr)
                            t1[(size_t)rr * w + i]
                                -= l * t1[(size_t)rr * w + j];
                    }
            }
        }
        for (int64_t rr = 0; rr < nrhs; ++rr)
            for (int64_t j = 0; j < w; ++j)
                y[(size_t)rr * n + s.c0 + j] = t1[(size_t)rr * w + j];
        if (r > 0 && w > 0) {
            t2.assign((size_t)r * nrhs, 0.0);
            int m_i = (int)r, k_i = (int)w, ldb = (int)w, ldc = (int)r;
            int lda = (int)r;
            double one = 1.0, zero = 0.0;
            xgemm("N", "N", &m_i, &nr, &k_i, &one, s.L21.data(), &lda,
                  t1.data(), &ldb, &zero, t2.data(), &ldc);
            for (int64_t rr = 0; rr < nrhs; ++rr)
                for (int64_t i = 0; i < r; ++i)
                    y[(size_t)rr * n + s.rows[i]]
                        -= t2[(size_t)rr * r + i];
        }
    }
    // diagonal
    for (auto& s : h->snodes) {
        int64_t w = s.c1 - s.c0;
        for (int64_t j = 0; j < w; ++j) {
            double inv = 1.0 / s.D[j];
            for (int64_t rr = 0; rr < nrhs; ++rr)
                y[(size_t)rr * n + s.c0 + j] *= inv;
        }
    }
    // backward: L^T x = z (reverse supernode order)
    for (auto it = h->snodes.rbegin(); it != h->snodes.rend(); ++it) {
        auto& s = *it;
        int64_t w = s.c1 - s.c0, r = (int64_t)s.rows.size();
        t1.assign((size_t)w * nrhs, 0.0);
        for (int64_t rr = 0; rr < nrhs; ++rr)
            for (int64_t j = 0; j < w; ++j)
                t1[(size_t)rr * w + j] = y[(size_t)rr * n + s.c0 + j];
        if (r > 0 && w > 0) {
            // y1 -= L21^T * y(rows)
            t2.assign((size_t)r * nrhs, 0.0);
            for (int64_t rr = 0; rr < nrhs; ++rr)
                for (int64_t i = 0; i < r; ++i)
                    t2[(size_t)rr * r + i] = y[(size_t)rr * n + s.rows[i]];
            int m_i = (int)w, k_i = (int)r, lda = (int)r, ldb = (int)r;
            int ldc = (int)w;
            double mone = -1.0, one = 1.0;
            xgemm("T", "N", &m_i, &nr, &k_i, &mone, s.L21.data(), &lda,
                  t2.data(), &ldb, &one, t1.data(), &ldc);
        }
        // L11^T solve
        if (w > 1) {
            if (xtrsm2) {
                int m_i = (int)w, w_i = (int)w;
                double one = 1.0;
                xtrsm2("L", "L", "T", "U", &m_i, &nr, &one, s.L11.data(),
                       &w_i, t1.data(), &m_i);
            } else {
                for (int64_t j = w - 1; j >= 0; --j)
                    for (int64_t i = j + 1; i < w; ++i) {
                        double l = s.L11[(size_t)j * w + i];
                        if (l == 0.0) continue;
                        for (int64_t rr = 0; rr < nrhs; ++rr)
                            t1[(size_t)rr * w + j]
                                -= l * t1[(size_t)rr * w + i];
                    }
            }
        }
        for (int64_t rr = 0; rr < nrhs; ++rr)
            for (int64_t j = 0; j < w; ++j)
                y[(size_t)rr * n + s.c0 + j] = t1[(size_t)rr * w + j];
    }
    for (int64_t i = 0; i < n; ++i) {
        int64_t ip = h->post[i];
        for (int64_t rr = 0; rr < nrhs; ++rr)
            x[(size_t)i * nrhs + rr] = y[(size_t)rr * n + ip];
    }
}

void ldltmf_inertia(void* vh, int64_t* neg, int64_t* pos, int64_t* zero) {
    MfHandle* h = static_cast<MfHandle*>(vh);
    *neg = h->n_neg;
    *pos = h->n_pos;
    *zero = h->n_zero;
}

int64_t ldltmf_factor_nnz(void* vh) {
    return static_cast<MfHandle*>(vh)->factor_nnz;
}

int64_t ldltmf_perturbed(void* vh) {
    return static_cast<MfHandle*>(vh)->n_perturbed;
}

}  // extern "C"
