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
#include <queue>
#include <tuple>
#include <algorithm>

extern "C" int64_t amd_order(int64_t n, const int64_t* Ap, const int64_t* Ai,
                             int64_t* perm);

namespace {

struct Ctx {
    int64_t n = 0;
    int64_t leaf = 160;                // MD-takeover subgraph size
    std::vector<int64_t> xadj, adjv;   // symmetric adjacency, no diagonal
    std::vector<int64_t> tag;          // vertex -> active subgraph tag
    std::vector<int64_t> seen;         // BFS visit stamps
    std::vector<int64_t> lev;          // BFS levels
    std::vector<int64_t> loc;          // vertex -> local index scratch
    std::vector<int64_t> out;          // out[pos] = vertex
    std::vector<int8_t> side;          // FM refinement: 0=A, 1=B, 2=sep
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

// Fiduccia-Mattheyses refinement of a vertex separator.  Moves separator
// vertices into A or B (pulling the opposite side's neighbors into the
// separator to keep it a separator), accepting negative-gain moves and
// rolling back to the best state seen — the hill-climbing that closes
// most of the fill gap between raw level-set separators and METIS-grade
// ones on irregular meshes.  Invariant maintained throughout: no edge
// joins A and B.
void fm_refine(Ctx& c, std::vector<int64_t>& A, std::vector<int64_t>& B,
               std::vector<int64_t>& sep, int64_t t) {
    const int8_t SA = 0, SB = 1, SS = 2;
    const int64_t m = (int64_t)(A.size() + B.size() + sep.size());
    if (sep.empty() || m < 4) return;
    std::vector<int64_t> members;
    members.reserve(m);
    for (int64_t v : A) { c.side[v] = SA; members.push_back(v); }
    for (int64_t v : B) { c.side[v] = SB; members.push_back(v); }
    for (int64_t v : sep) { c.side[v] = SS; members.push_back(v); }
    int64_t na = (int64_t)A.size(), nb = (int64_t)B.size();
    int64_t ns = (int64_t)sep.size();
    const int64_t min_part = std::max<int64_t>(1, m / 8);

    // moving v (side SS) toward ``to`` pulls its opposite-side neighbors
    // into the separator: gain in separator size = 1 - #pulls
    auto gain = [&](int64_t v, int8_t to) -> int64_t {
        int8_t other = (to == SA) ? SB : SA;
        int64_t pulls = 0;
        for (int64_t p = c.xadj[v]; p < c.xadj[v + 1]; ++p) {
            int64_t w = c.adjv[p];
            if (c.tag[w] == t && c.side[w] == other) ++pulls;
        }
        return 1 - pulls;
    };

    struct Rec {
        int64_t v;
        int8_t to;
        int64_t pull_begin, pull_end;
    };
    std::vector<Rec> log;
    std::vector<int64_t> pulled;
    bool improved_any = true;
    for (int pass = 0; pass < 8 && improved_any; ++pass) {
        improved_any = false;
        ++c.epoch;                              // ``moved`` lock stamp
        log.clear();
        pulled.clear();
        std::priority_queue<std::tuple<int64_t, int64_t, int8_t>> heap;
        for (int64_t v : members)
            if (c.side[v] == SS) {
                heap.emplace(gain(v, SA), v, SA);
                heap.emplace(gain(v, SB), v, SB);
            }
        int64_t best_ns = ns, best_bal = std::max(na, nb);
        size_t best_len = 0;
        int64_t budget = 2 * ns + 64;
        while (!heap.empty() && budget > 0) {
            auto [g, v, to] = heap.top();
            heap.pop();
            if (c.side[v] != SS || c.seen[v] == c.epoch) continue;
            int64_t g2 = gain(v, to);
            if (g2 != g) {                      // stale entry: refresh
                heap.emplace(g2, v, to);
                continue;
            }
            int64_t pulls = 1 - g;
            int64_t na2 = (to == SA) ? na + 1 : na - pulls;
            int64_t nb2 = (to == SA) ? nb - pulls : nb + 1;
            if (std::min(na2, nb2) < min_part) continue;
            // apply the move
            --budget;
            Rec r{v, to, (int64_t)pulled.size(), 0};
            int8_t other = (to == SA) ? SB : SA;
            c.side[v] = to;
            c.seen[v] = c.epoch;
            for (int64_t p = c.xadj[v]; p < c.xadj[v + 1]; ++p) {
                int64_t w = c.adjv[p];
                if (c.tag[w] != t || c.side[w] != other) continue;
                c.side[w] = SS;
                pulled.push_back(w);
                if (c.seen[w] != c.epoch) {
                    heap.emplace(gain(w, SA), w, SA);
                    heap.emplace(gain(w, SB), w, SB);
                }
            }
            r.pull_end = (int64_t)pulled.size();
            log.push_back(r);
            na = na2;
            nb = nb2;
            ns = ns - 1 + pulls;
            if (ns < best_ns
                || (ns == best_ns && std::max(na, nb) < best_bal)) {
                if (ns < best_ns) improved_any = true;
                best_ns = ns;
                best_bal = std::max(na, nb);
                best_len = log.size();
            }
        }
        // roll back past the best point (reverse order restores exactly)
        while (log.size() > best_len) {
            const Rec& r = log.back();
            int8_t other = (r.to == SA) ? SB : SA;
            for (int64_t q = r.pull_end - 1; q >= r.pull_begin; --q)
                c.side[pulled[q]] = other;
            c.side[r.v] = SS;
            if (r.to == SA) { --na; nb += r.pull_end - r.pull_begin; }
            else { --nb; na += r.pull_end - r.pull_begin; }
            ns = ns + 1 - (r.pull_end - r.pull_begin);
            pulled.resize(r.pull_begin);
            log.pop_back();
        }
    }
    A.clear();
    B.clear();
    sep.clear();
    for (int64_t v : members) {
        if (c.side[v] == SA) A.push_back(v);
        else if (c.side[v] == SB) B.push_back(v);
        else sep.push_back(v);
    }
}


void dissect(Ctx& c, std::vector<int64_t> S, int64_t t) {
    const int64_t m = (int64_t)S.size();
    if (m <= c.leaf) {
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
    fm_refine(c, A, B, sep, t);
    if (A.empty() || B.empty()) {
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

// run the whole dissection pipeline on the adjacency already loaded in
// ``c``; fills c.out with the ordering
int64_t run_dissect(Ctx& c) {
    const int64_t n = c.n;
    c.tag.assign(n, 0);
    c.side.assign(n, -1);
    c.seen.assign(n, -1);
    c.lev.assign(n, 0);
    c.loc.assign(n, -1);
    c.out.assign(n, -1);
    c.next_pos = 0;
    c.next_tag = 1;
    std::vector<int64_t> all(n);
    for (int64_t v = 0; v < n; ++v) all[v] = v;
    dissect(c, std::move(all), 0);
    return (c.next_pos == n) ? 0 : -1;
}

uint64_t splitmix64(uint64_t x) {
    x += 0x9e3779b97f4a7c15ULL;
    x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
    x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
    return x ^ (x >> 31);
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

    // Supervariable compression: vertices with identical closed
    // neighborhoods N[v] = N(v) ∪ {v} are indistinguishable for fill (FE
    // matrices with d dofs/node compress ~d×).  Dissect the quotient graph
    // — separators then align with mesh nodes — and expand members
    // consecutively at the end.
    std::vector<int64_t> leader(n);
    int64_t n_groups = 0;
    {
        std::vector<uint64_t> h(n);
        for (int64_t v = 0; v < n; ++v) {
            uint64_t s = splitmix64((uint64_t)v);
            for (int64_t p = c.xadj[v]; p < c.xadj[v + 1]; ++p)
                s += splitmix64((uint64_t)c.adjv[p]);
            h[v] = s;
        }
        std::vector<int64_t> byh(n);
        for (int64_t v = 0; v < n; ++v) byh[v] = v;
        std::sort(byh.begin(), byh.end(), [&](int64_t a, int64_t b) {
            return h[a] < h[b] || (h[a] == h[b] && a < b);
        });
        // exact closed-neighborhood equality (degrees equal + merged walk
        // treating the self vertex as an inserted element)
        auto closed_eq = [&](int64_t u, int64_t v) -> bool {
            int64_t du = c.xadj[u + 1] - c.xadj[u];
            int64_t dv = c.xadj[v + 1] - c.xadj[v];
            if (du != dv) return false;
            int64_t pu = c.xadj[u], pv = c.xadj[v];
            int64_t eu = c.xadj[u + 1], ev = c.xadj[v + 1];
            bool su = false, sv = false;   // self id consumed
            for (int64_t k = 0; k < du + 1; ++k) {
                int64_t a = (pu < eu) ? c.adjv[pu] : INT64_MAX;
                if (!su && u < a) { a = u; su = true; } else ++pu;
                int64_t b = (pv < ev) ? c.adjv[pv] : INT64_MAX;
                if (!sv && v < b) { b = v; sv = true; } else ++pv;
                if (a != b) return false;
            }
            return true;
        };
        for (int64_t i = 0; i < n; ++i) {
            int64_t v = byh[i];
            leader[v] = v;
            for (int64_t j = i - 1;
                 j >= 0 && h[byh[j]] == h[v] && i - j <= 16; --j) {
                int64_t u = byh[j];
                if (leader[u] == u && closed_eq(u, v)) {
                    leader[v] = u;
                    break;
                }
            }
            if (leader[v] == v) ++n_groups;
        }
    }

    if (n_groups > (9 * n) / 10) {
        // compression not worthwhile: dissect the full graph directly
        if (run_dissect(c) != 0) return -1;
        std::memcpy(perm, c.out.data(), sizeof(int64_t) * n);
        return 0;
    }

    // build the quotient graph
    std::vector<int64_t> gid(n, -1);        // vertex -> supervariable id
    std::vector<int64_t> reps;
    reps.reserve(n_groups);
    for (int64_t v = 0; v < n; ++v)
        if (leader[v] == v) {
            gid[v] = (int64_t)reps.size();
            reps.push_back(v);
        }
    for (int64_t v = 0; v < n; ++v) gid[v] = gid[leader[v]];
    // members grouped by supervariable (counting sort preserving id order)
    std::vector<int64_t> gcount(n_groups + 1, 0);
    for (int64_t v = 0; v < n; ++v) gcount[gid[v] + 1]++;
    for (int64_t g = 0; g < n_groups; ++g) gcount[g + 1] += gcount[g];
    std::vector<int64_t> gmem(n);
    {
        std::vector<int64_t> next(gcount.begin(), gcount.end() - 1);
        for (int64_t v = 0; v < n; ++v) gmem[next[gid[v]]++] = v;
    }
    Ctx q;
    q.n = n_groups;
    // keep the MD-takeover threshold in *original* vertices: a quotient
    // leaf of leaf/ratio supervariables expands to ~leaf vertices
    q.leaf = std::max<int64_t>(32, (c.leaf * n_groups) / n);
    q.xadj.assign(n_groups + 1, 0);
    q.adjv.clear();
    q.adjv.reserve(c.xadj[n] / 2);
    // indistinguishable vertices share the neighborhood, so the
    // representative's adjacency suffices
    for (int64_t g = 0; g < n_groups; ++g) {
        int64_t v = reps[g];
        int64_t start = (int64_t)q.adjv.size();
        for (int64_t p = c.xadj[v]; p < c.xadj[v + 1]; ++p) {
            int64_t wg = gid[c.adjv[p]];
            if (wg != g) q.adjv.push_back(wg);
        }
        std::sort(q.adjv.begin() + start, q.adjv.end());
        q.adjv.erase(std::unique(q.adjv.begin() + start, q.adjv.end()),
                     q.adjv.end());
        q.xadj[g + 1] = (int64_t)q.adjv.size();
    }
    if (run_dissect(q) != 0) return -1;
    int64_t pos = 0;
    for (int64_t k = 0; k < n_groups; ++k) {
        int64_t g = q.out[k];
        for (int64_t p = gcount[g]; p < gcount[g + 1]; ++p)
            perm[pos++] = gmem[p];
    }
    return (pos == n) ? 0 : -1;
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
