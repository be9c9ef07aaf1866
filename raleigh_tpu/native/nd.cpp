// Incomplete nested-dissection fill-reducing ordering.
//
// Second fill-reducing engine of the PARDISO-replacement pipeline
// (reference raleigh/algebra/mkl_wrap.py:411-434 relies on PARDISO's
// internal METIS nested dissection): recursive bisection by level-set
// vertex separators with one-pass separator thinning, minimum-degree
// (amd.cpp) ordering of the leaf subgraphs and of the separators
// themselves — the classical incomplete-ND-with-MD-leaves recipe.  On
// 3D FE meshes nested dissection asymptotically beats pure minimum
// degree on fill; the Python layer counts symbolic fill for both
// orderings (symbolic_lnz below) and keeps the better one.
//
// C API:
//   nd_order(n, Ap, Ai, perm)      perm[k] = index of the k-th pivot
//   symbolic_lnz(n, Ap, Ai, perm)  exact LDL^T factor nnz under perm
// Input: symmetric pattern, full or triangular (symmetrized internally),
// 64-bit indices.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" int64_t amd_order(int64_t n, const int64_t* Ap, const int64_t* Ai,
                             int64_t* perm);

namespace {

struct Ctx {
    int64_t n = 0;
    std::vector<int64_t> xadj, adjv;   // symmetric adjacency, no diagonal
    std::vector<int64_t> tag;          // vertex -> active subgraph tag
    std::vector<int64_t> seen;         // BFS visit stamps
    std::vector<int64_t> lev;          // BFS levels
    std::vector<int64_t> loc;          // vertex -> local index scratch
    std::vector<int64_t> out;          // out[pos] = vertex
    int64_t next_pos = 0;
    int64_t next_tag = 1;
    int64_t epoch = 0;
    // reusable leaf-extraction buffers
    std::vector<int64_t> lAp, lAi, lperm;
};

// breadth-first levels within the subgraph identified by ``t`` starting
// from ``root``; returns the visited vertices in BFS order and fills
// c.lev (c.seen stamps with the current epoch)
int64_t bfs(Ctx& c, int64_t root, int64_t t, std::vector<int64_t>& order) {
    order.clear();
    ++c.epoch;
    c.seen[root] = c.epoch;
    c.lev[root] = 0;
    order.push_back(root);
    int64_t maxlev = 0;
    for (size_t q = 0; q < order.size(); ++q) {
        int64_t v = order[q];
        for (int64_t p = c.xadj[v]; p < c.xadj[v + 1]; ++p) {
            int64_t w = c.adjv[p];
            if (c.tag[w] != t || c.seen[w] == c.epoch) continue;
            c.seen[w] = c.epoch;
            c.lev[w] = c.lev[v] + 1;
            maxlev = std::max(maxlev, c.lev[w]);
            order.push_back(w);
        }
    }
    return maxlev;
}

// order a subgraph with minimum degree on its induced pattern
void order_leaf(Ctx& c, const std::vector<int64_t>& S, int64_t t) {
    const int64_t m = (int64_t)S.size();
    if (m == 0) return;
    if (m == 1) {
        c.out[c.next_pos++] = S[0];
        return;
    }
    for (int64_t i = 0; i < m; ++i) c.loc[S[i]] = i;
    c.lAp.assign(m + 1, 0);
    c.lAi.clear();
    for (int64_t i = 0; i < m; ++i) {
        int64_t v = S[i];
        for (int64_t p = c.xadj[v]; p < c.xadj[v + 1]; ++p) {
            int64_t w = c.adjv[p];
            if (c.tag[w] == t) c.lAi.push_back(c.loc[w]);
        }
        c.lAp[i + 1] = (int64_t)c.lAi.size();
    }
    c.lperm.assign(m, 0);
    amd_order(m, c.lAp.data(), c.lAi.data(), c.lperm.data());
    for (int64_t k = 0; k < m; ++k)
        c.out[c.next_pos++] = S[c.lperm[k]];
}

// leaf size below which minimum degree takes over: ND's asymptotic win
// only materializes on subgraphs with real separators
const int64_t LEAF = 160;

void dissect(Ctx& c, std::vector<int64_t> S, int64_t t) {
    const int64_t m = (int64_t)S.size();
    if (m <= LEAF) {
        order_leaf(c, S, t);
        return;
    }

    // connected components: retag each as soon as it is found (the tag is
    // the membership test, so an already-claimed vertex is never revisited)
    // and recurse on each separately
    std::vector<int64_t> comp;
    bfs(c, S[0], t, comp);
    if ((int64_t)comp.size() < m) {
        std::vector<std::pair<std::vector<int64_t>, int64_t>> comps;
        int64_t t0 = c.next_tag++;
        for (int64_t v : comp) c.tag[v] = t0;
        comps.emplace_back(std::move(comp), t0);
        for (int64_t v : S) {
            if (c.tag[v] != t) continue;
            std::vector<int64_t> more;
            bfs(c, v, t, more);
            int64_t tc = c.next_tag++;
            for (int64_t w : more) c.tag[w] = tc;
            comps.emplace_back(std::move(more), tc);
        }
        for (auto& cc : comps)
            dissect(c, std::move(cc.first), cc.second);
        return;
    }

    // pseudo-peripheral root: two BFS sweeps
    int64_t u = comp.back();
    int64_t nlev = bfs(c, u, t, comp);
    if (nlev < 3) {               // dense blob: no useful level separator
        order_leaf(c, S, t);
        return;
    }

    // pick the thinnest level in the middle band as the separator,
    // weighted toward balance
    std::vector<int64_t> lcount(nlev + 1, 0);
    for (int64_t v : comp) lcount[c.lev[v]]++;
    std::vector<int64_t> below(nlev + 2, 0);
    for (int64_t l = 0; l <= nlev; ++l) below[l + 1] = below[l] + lcount[l];
    int64_t best_k = -1;
    double best_cost = 1e300;
    for (int64_t k = 1; k < nlev; ++k) {
        int64_t na = below[k];                 // levels < k
        int64_t nb = m - below[k + 1];         // levels > k
        if (na < m / 5 || nb < m / 5) continue;
        double balance = (double)std::max(na, nb) / std::max<int64_t>(
            std::min(na, nb), 1);
        double cost = (double)lcount[k] * (1.0 + 0.1 * balance);
        if (cost < best_cost) {
            best_cost = cost;
            best_k = k;
        }
    }
    if (best_k < 0 || lcount[best_k] > m / 2) {
        // no acceptable separator (e.g. expander-like subgraph)
        order_leaf(c, S, t);
        return;
    }

    // split; thin the separator from both sides: a level-k vertex with no
    // neighbor in level k-1 does not separate and joins B (its neighbors
    // are all in levels k / k+1); after that, a remaining one with no
    // neighbor in level k+1 nor among the just-moved vertices joins A
    std::vector<int64_t> A, B, sep, Lk;
    A.reserve(below[best_k]);
    B.reserve(m - below[best_k + 1]);
    for (int64_t v : comp) {
        int64_t l = c.lev[v];
        if (l < best_k) A.push_back(v);
        else if (l > best_k) B.push_back(v);
        else Lk.push_back(v);
    }
    ++c.epoch;                         // stamp = moved to B
    for (int64_t v : Lk) {
        bool touches_a = false;
        for (int64_t p = c.xadj[v]; p < c.xadj[v + 1] && !touches_a; ++p) {
            int64_t w = c.adjv[p];
            touches_a = (c.tag[w] == t && c.lev[w] == best_k - 1);
        }
        if (!touches_a) {
            B.push_back(v);
            c.seen[v] = c.epoch;
        }
    }
    for (int64_t v : Lk) {
        if (c.seen[v] == c.epoch) continue;
        bool touches_b = false;
        for (int64_t p = c.xadj[v]; p < c.xadj[v + 1] && !touches_b; ++p) {
            int64_t w = c.adjv[p];
            touches_b = (c.tag[w] == t
                         && (c.lev[w] == best_k + 1
                             || (c.lev[w] == best_k
                                 && c.seen[w] == c.epoch)));
        }
        (touches_b ? sep : A).push_back(v);
    }
    if (A.empty() || B.empty() || sep.empty()) {
        order_leaf(c, S, t);
        return;
    }
    int64_t ta = c.next_tag++;
    int64_t tb = c.next_tag++;
    int64_t ts = c.next_tag++;
    for (int64_t v : A) c.tag[v] = ta;
    for (int64_t v : B) c.tag[v] = tb;
    for (int64_t v : sep) c.tag[v] = ts;
    dissect(c, std::move(A), ta);
    dissect(c, std::move(B), tb);
    order_leaf(c, sep, ts);       // separator eliminated last
}

// exact LDL^T column counts of the relabeled matrix via the standard
// elimination-tree path traversal (same scheme mf.cpp uses)
int64_t etree_fill(int64_t n, const std::vector<int64_t>& Ap,
                   const std::vector<int64_t>& Ai) {
    std::vector<int64_t> parent(n, -1), flag(n, -1);
    int64_t total = n;             // the diagonal
    for (int64_t k = 0; k < n; ++k) {
        flag[k] = k;
        for (int64_t p = Ap[k]; p < Ap[k + 1]; ++p) {
            int64_t i = Ai[p];
            if (i >= k) continue;
            while (flag[i] != k) {
                if (parent[i] == -1) parent[i] = k;
                ++total;
                flag[i] = k;
                i = parent[i];
            }
        }
    }
    return total;
}

}  // namespace

extern "C" {

int64_t nd_order(int64_t n, const int64_t* Ap, const int64_t* Ai,
                 int64_t* perm) {
    if (n <= 0) return 0;
    Ctx c;
    c.n = n;
    // symmetrized adjacency without the diagonal
    std::vector<int64_t> deg(n, 0);
    int64_t nnz = Ap[n];
    for (int64_t j = 0; j < n; ++j)
        for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
            int64_t i = Ai[p];
            if (i == j || i < 0 || i >= n) continue;
            deg[i]++;
            deg[j]++;
        }
    c.xadj.assign(n + 1, 0);
    for (int64_t v = 0; v < n; ++v) c.xadj[v + 1] = c.xadj[v] + deg[v];
    c.adjv.assign(c.xadj[n], 0);
    {
        std::vector<int64_t> next(c.xadj.begin(), c.xadj.end() - 1);
        for (int64_t j = 0; j < n; ++j)
            for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
                int64_t i = Ai[p];
                if (i == j || i < 0 || i >= n) continue;
                c.adjv[next[i]++] = j;
                c.adjv[next[j]++] = i;
            }
        // dedup (the input may be full-symmetric already)
        int64_t w = 0;
        std::vector<int64_t> xnew(n + 1, 0);
        for (int64_t v = 0; v < n; ++v) {
            int64_t a = c.xadj[v], b = c.xadj[v + 1];
            std::sort(c.adjv.begin() + a, c.adjv.begin() + b);
            int64_t start = w;
            for (int64_t p = a; p < b; ++p)
                if (p == a || c.adjv[p] != c.adjv[p - 1])
                    c.adjv[w++] = c.adjv[p];
            xnew[v + 1] = xnew[v] + (w - start);
        }
        c.xadj = std::move(xnew);
        c.adjv.resize(c.xadj[n]);
    }
    (void)nnz;
    c.tag.assign(n, 0);
    c.seen.assign(n, -1);
    c.lev.assign(n, 0);
    c.loc.assign(n, -1);
    c.out.assign(n, -1);
    std::vector<int64_t> all(n);
    for (int64_t v = 0; v < n; ++v) all[v] = v;
    dissect(c, std::move(all), 0);
    if (c.next_pos != n) return -1;
    std::memcpy(perm, c.out.data(), sizeof(int64_t) * n);
    return 0;
}

int64_t symbolic_lnz(int64_t n, const int64_t* Ap, const int64_t* Ai,
                     const int64_t* perm) {
    if (n <= 0) return 0;
    std::vector<int64_t> ipos(n);
    for (int64_t k = 0; k < n; ++k) ipos[perm[k]] = k;
    // upper CSC of the relabeled pattern
    int64_t nnz = Ap[n];
    std::vector<int64_t> cnt(n + 1, 0), ri(nnz), ci(nnz);
    for (int64_t j = 0; j < n; ++j)
        for (int64_t p = Ap[j]; p < Ap[j + 1]; ++p) {
            int64_t i2 = ipos[Ai[p]], j2 = ipos[j];
            if (i2 > j2) std::swap(i2, j2);
            ri[p] = i2;
            ci[p] = j2;
            cnt[j2 + 1]++;
        }
    for (int64_t j = 0; j < n; ++j) cnt[j + 1] += cnt[j];
    std::vector<int64_t> Bp = cnt, Bi(nnz);
    {
        std::vector<int64_t> next(Bp.begin(), Bp.end() - 1);
        for (int64_t p = 0; p < nnz; ++p) Bi[next[ci[p]]++] = ri[p];
    }
    return etree_fill(n, Bp, Bi);
}

}  // extern "C"
