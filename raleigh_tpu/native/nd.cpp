// Multilevel nested-dissection fill-reducing ordering.
//
// Second fill-reducing engine of the PARDISO-replacement pipeline
// (reference raleigh/algebra/mkl_wrap.py:411-434 relies on PARDISO's
// internal METIS nested dissection): recursive bisection by vertex
// separators found with the multilevel scheme METIS made standard —
// coarsen by heavy-edge matching, find a level-set separator on the
// coarsest graph, then uncoarsen with weighted Fiduccia-Mattheyses
// vertex-separator refinement at every level.  Leaf subgraphs and the
// separators themselves are ordered with minimum degree (amd.cpp).  On
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
    std::vector<int64_t> vwt;          // vertex weights (empty = unit)
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

uint64_t splitmix64(uint64_t x) {
    x += 0x9e3779b97f4a7c15ULL;
    x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
    x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
    return x ^ (x >> 31);
}

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

// ---------------------------------------------------------------------
// Multilevel vertex-separator machinery.  Works on a compact local graph
// with vertex weights (= number of original vertices a multilevel or
// supervariable vertex represents) and edge weights (= number of fine
// edges a coarse edge aggregates, used to steer heavy-edge matching).
// ---------------------------------------------------------------------

const int8_t SA = 0, SB = 1, SS = 2;

struct WG {
    int64_t nv = 0;
    int64_t totw = 0;
    std::vector<int64_t> xadj, adj, ewt, vwt;
};

// Weighted Fiduccia-Mattheyses refinement of a vertex separator.  Moves
// separator vertices into A or B (pulling the opposite side's neighbors
// into the separator to keep it a separator), accepting negative-gain
// moves and rolling back to the best state seen.  Invariant maintained
// throughout: no edge joins A and B.  All sizes are vertex-weighted so
// refinement on coarse graphs optimizes the true (fine) separator size.
void fm_refine_w(const WG& g, std::vector<int8_t>& side) {
    const int64_t nv = g.nv;
    if (nv < 4) return;
    int64_t wa = 0, wb = 0, ws = 0, nsep0 = 0;
    for (int64_t v = 0; v < nv; ++v) {
        if (side[v] == SA) wa += g.vwt[v];
        else if (side[v] == SB) wb += g.vwt[v];
        else { ws += g.vwt[v]; ++nsep0; }
    }
    if (nsep0 == 0) return;
    // balance floor: never let a side drop below totw/4 — unless the
    // incoming cut is already more lopsided, in which case hold the line
    // at its current smaller side (keeps refinement feasible while
    // forbidding further drift; imbalance compounding through the
    // uncoarsening hierarchy was the round-1 quality regression)
    const int64_t min_part = std::max<int64_t>(
        1, std::min(g.totw / 4, std::min(wa, wb)));

    // moving v (side SS) toward ``to`` pulls its opposite-side neighbors
    // into the separator: gain in separator weight = vwt[v] - pulled wt
    auto gain = [&](int64_t v, int8_t to) -> int64_t {
        int8_t other = (to == SA) ? SB : SA;
        int64_t pulls = 0;
        for (int64_t p = g.xadj[v]; p < g.xadj[v + 1]; ++p) {
            int64_t w = g.adj[p];
            if (side[w] == other) pulls += g.vwt[w];
        }
        return g.vwt[v] - pulls;
    };

    struct Rec {
        int64_t v;
        int8_t to;
        int64_t pull_begin, pull_end;
    };
    std::vector<Rec> log;
    std::vector<int64_t> pulled;
    std::vector<int64_t> locked(nv, -1);
    int64_t epoch = 0;
    bool improved_any = true;
    for (int pass = 0; pass < 10 && improved_any; ++pass) {
        improved_any = false;
        ++epoch;
        log.clear();
        pulled.clear();
        std::priority_queue<std::tuple<int64_t, int64_t, int8_t>> heap;
        int64_t nsep = 0;
        for (int64_t v = 0; v < nv; ++v)
            if (side[v] == SS) {
                ++nsep;
                heap.emplace(gain(v, SA), v, SA);
                heap.emplace(gain(v, SB), v, SB);
            }
        int64_t best_ws = ws, best_bal = std::max(wa, wb);
        size_t best_len = 0;
        int64_t budget = 2 * nsep + 64;
        while (!heap.empty() && budget > 0) {
            auto [gn, v, to] = heap.top();
            heap.pop();
            if (side[v] != SS || locked[v] == epoch) continue;
            int64_t g2 = gain(v, to);
            if (g2 != gn) {                     // stale entry: refresh
                heap.emplace(g2, v, to);
                continue;
            }
            int64_t pullw = g.vwt[v] - gn;
            int64_t wa2 = (to == SA) ? wa + g.vwt[v] : wa - pullw;
            int64_t wb2 = (to == SA) ? wb - pullw : wb + g.vwt[v];
            if (std::min(wa2, wb2) < min_part) continue;
            // apply the move
            --budget;
            Rec r{v, to, (int64_t)pulled.size(), 0};
            int8_t other = (to == SA) ? SB : SA;
            side[v] = to;
            locked[v] = epoch;
            for (int64_t p = g.xadj[v]; p < g.xadj[v + 1]; ++p) {
                int64_t w = g.adj[p];
                if (side[w] != other) continue;
                side[w] = SS;
                pulled.push_back(w);
                if (locked[w] != epoch) {
                    heap.emplace(gain(w, SA), w, SA);
                    heap.emplace(gain(w, SB), w, SB);
                }
            }
            r.pull_end = (int64_t)pulled.size();
            log.push_back(r);
            wa = wa2;
            wb = wb2;
            ws -= gn;
            if (ws < best_ws
                || (ws == best_ws && std::max(wa, wb) < best_bal)) {
                if (ws < best_ws) improved_any = true;
                best_ws = ws;
                best_bal = std::max(wa, wb);
                best_len = log.size();
            }
        }
        // roll back past the best point (reverse order restores exactly)
        while (log.size() > best_len) {
            const Rec& r = log.back();
            int8_t other = (r.to == SA) ? SB : SA;
            int64_t pullw = 0;
            for (int64_t q = r.pull_end - 1; q >= r.pull_begin; --q) {
                side[pulled[q]] = other;
                pullw += g.vwt[pulled[q]];
            }
            side[r.v] = SS;
            if (r.to == SA) { wa -= g.vwt[r.v]; wb += pullw; }
            else { wb -= g.vwt[r.v]; wa += pullw; }
            ws += g.vwt[r.v] - pullw;
            pulled.resize(r.pull_begin);
            log.pop_back();
        }
    }
}

// Initial separator on a (small) connected graph: weighted BFS level cut
// from a pseudo-peripheral root, falling back to a weighted-median split
// of the BFS order when no balanced thin level exists.  Returns false if
// no valid separator could be built (caller orders the subgraph whole).
bool init_vsep(const WG& g, std::vector<int8_t>& side) {
    const int64_t nv = g.nv;
    if (nv < 4) return false;
    std::vector<int64_t> lev(nv, -1), order;
    order.reserve(nv);
    auto run_bfs = [&](int64_t root) -> int64_t {
        std::fill(lev.begin(), lev.end(), -1);
        order.clear();
        lev[root] = 0;
        order.push_back(root);
        int64_t maxlev = 0;
        for (size_t q = 0; q < order.size(); ++q) {
            int64_t v = order[q];
            for (int64_t p = g.xadj[v]; p < g.xadj[v + 1]; ++p) {
                int64_t w = g.adj[p];
                if (lev[w] >= 0) continue;
                lev[w] = lev[v] + 1;
                maxlev = std::max(maxlev, lev[w]);
                order.push_back(w);
            }
        }
        return maxlev;
    };
    run_bfs(0);
    if ((int64_t)order.size() < nv) return false;   // disconnected
    int64_t nlev = run_bfs(order.back());           // pseudo-peripheral

    side.assign(nv, SA);
    int64_t best_k = -1;
    if (nlev >= 3) {
        std::vector<int64_t> wlev(nlev + 1, 0);
        for (int64_t v = 0; v < nv; ++v) wlev[lev[v]] += g.vwt[v];
        std::vector<int64_t> below(nlev + 2, 0);
        for (int64_t l = 0; l <= nlev; ++l)
            below[l + 1] = below[l] + wlev[l];
        double best_cost = 1e300;
        for (int64_t k = 1; k < nlev; ++k) {
            int64_t na = below[k];                 // levels < k
            int64_t nb = g.totw - below[k + 1];    // levels > k
            if (na < g.totw / 5 || nb < g.totw / 5) continue;
            double balance = (double)std::max(na, nb)
                / (double)std::max<int64_t>(std::min(na, nb), 1);
            double cost = (double)wlev[k] * (1.0 + 0.1 * balance);
            if (cost < best_cost) {
                best_cost = cost;
                best_k = k;
            }
        }
    }
    if (best_k >= 0) {
        // A = levels < k; level-k vertices touching level k-1 separate,
        // the rest of level k joins B with the deeper levels
        for (int64_t v = 0; v < nv; ++v) {
            if (lev[v] < best_k) { side[v] = SA; continue; }
            if (lev[v] > best_k) { side[v] = SB; continue; }
            bool touches_a = false;
            for (int64_t p = g.xadj[v]; p < g.xadj[v + 1] && !touches_a;
                 ++p)
                touches_a = (lev[g.adj[p]] == best_k - 1);
            side[v] = touches_a ? SS : SB;
        }
    } else {
        // weighted-median split of the BFS order; B's boundary separates
        int64_t acc = 0;
        for (int64_t v : order) {
            if (acc < g.totw / 2) { side[v] = SA; acc += g.vwt[v]; }
            else side[v] = SB;
        }
        for (int64_t v = 0; v < nv; ++v) {
            if (side[v] != SB) continue;
            for (int64_t p = g.xadj[v]; p < g.xadj[v + 1]; ++p)
                if (side[g.adj[p]] == SA) { side[v] = SS; break; }
        }
    }
    bool has_a = false, has_b = false;
    for (int64_t v = 0; v < nv; ++v) {
        has_a |= (side[v] == SA);
        has_b |= (side[v] == SB);
    }
    return has_a && has_b;
}

// One coarsening step: heavy-edge matching in pseudo-random visit order;
// matched pairs merge, edge weights accumulate, vertex weights add.
// Matches whose combined weight exceeds ``wcap`` are skipped so balanced
// cuts stay representable on the coarse graph (METIS does the same).
void coarsen(const WG& g, WG& cg, std::vector<int64_t>& cmap,
             int64_t wcap) {
    const int64_t nv = g.nv;
    cmap.assign(nv, -1);
    std::vector<int64_t> ord(nv);
    for (int64_t v = 0; v < nv; ++v) ord[v] = v;
    std::sort(ord.begin(), ord.end(), [](int64_t a, int64_t b) {
        uint64_t ha = splitmix64((uint64_t)a), hb = splitmix64((uint64_t)b);
        return ha < hb || (ha == hb && a < b);
    });
    int64_t nc = 0;
    for (int64_t i = 0; i < nv; ++i) {
        int64_t v = ord[i];
        if (cmap[v] >= 0) continue;
        int64_t best = -1, bw = -1;
        for (int64_t p = g.xadj[v]; p < g.xadj[v + 1]; ++p) {
            int64_t w = g.adj[p];
            if (cmap[w] >= 0) continue;
            if (g.vwt[v] + g.vwt[w] > wcap) continue;
            if (g.ewt[p] > bw) {
                bw = g.ewt[p];
                best = w;
            }
        }
        cmap[v] = nc;
        if (best >= 0) cmap[best] = nc;
        ++nc;
    }
    cg.nv = nc;
    cg.totw = g.totw;
    cg.vwt.assign(nc, 0);
    for (int64_t v = 0; v < nv; ++v) cg.vwt[cmap[v]] += g.vwt[v];
    // members grouped by coarse vertex (counting sort)
    std::vector<int64_t> cnt(nc + 1, 0), mem(nv);
    for (int64_t v = 0; v < nv; ++v) cnt[cmap[v] + 1]++;
    for (int64_t c2 = 0; c2 < nc; ++c2) cnt[c2 + 1] += cnt[c2];
    {
        std::vector<int64_t> next(cnt.begin(), cnt.end() - 1);
        for (int64_t v = 0; v < nv; ++v) mem[next[cmap[v]]++] = v;
    }
    cg.xadj.assign(nc + 1, 0);
    cg.adj.clear();
    cg.ewt.clear();
    cg.adj.reserve(g.adj.size());
    cg.ewt.reserve(g.adj.size());
    std::vector<int64_t> pos(nc, -1);   // coarse nbr -> index in cg.adj
    for (int64_t c2 = 0; c2 < nc; ++c2) {
        int64_t start = (int64_t)cg.adj.size();
        for (int64_t q = cnt[c2]; q < cnt[c2 + 1]; ++q) {
            int64_t v = mem[q];
            for (int64_t p = g.xadj[v]; p < g.xadj[v + 1]; ++p) {
                int64_t wc = cmap[g.adj[p]];
                if (wc == c2) continue;
                if (pos[wc] >= start) {        // older entries are < start
                    cg.ewt[pos[wc]] += g.ewt[p];
                } else {
                    pos[wc] = (int64_t)cg.adj.size();
                    cg.adj.push_back(wc);
                    cg.ewt.push_back(g.ewt[p]);
                }
            }
        }
        cg.xadj[c2 + 1] = (int64_t)cg.adj.size();
    }
}

// cut quality = (separator weight, larger-side weight); smaller is better
// on both axes, lexicographically.  Returns {INT64_MAX, INT64_MAX} for an
// invalid cut (an empty side).
std::pair<int64_t, int64_t> cut_cost(const WG& g,
                                     const std::vector<int8_t>& side) {
    int64_t wa = 0, wb = 0, ws = 0;
    bool has_a = false, has_b = false;
    for (int64_t v = 0; v < g.nv; ++v) {
        if (side[v] == SA) { wa += g.vwt[v]; has_a = true; }
        else if (side[v] == SB) { wb += g.vwt[v]; has_b = true; }
        else ws += g.vwt[v];
    }
    if (!has_a || !has_b) return {INT64_MAX, INT64_MAX};
    return {ws, std::max(wa, wb)};
}

// Multilevel vertex separator: coarsen until small (or matching stalls),
// cut the coarsest graph, then project + FM-refine back up the levels.
// At every level the projected-and-refined cut competes against a direct
// fine-level cut (BFS level set + FM); the better of the two survives —
// projection can carry imbalance down the hierarchy that refinement alone
// cannot repair, and the direct cut is the safety net.
bool multilevel_vsep(const WG& g, std::vector<int8_t>& side) {
    std::pair<int64_t, int64_t> ml_cost{INT64_MAX, INT64_MAX};
    std::vector<int8_t> ml_side;
    if (g.nv > 240) {
        WG cg;
        std::vector<int64_t> cmap;
        // cap merged supervertices at ~1.5x the average weight of a
        // 240-vertex coarsest graph so balanced coarse cuts stay possible
        int64_t wcap = std::max<int64_t>(1, (3 * g.totw) / (2 * 240));
        coarsen(g, cg, cmap, wcap);
        if (cg.nv < (g.nv * 17) / 20) {          // made real progress
            std::vector<int8_t> cside;
            if (multilevel_vsep(cg, cside)) {
                ml_side.resize(g.nv);
                for (int64_t v = 0; v < g.nv; ++v)
                    ml_side[v] = cside[cmap[v]];
                fm_refine_w(g, ml_side);
                ml_cost = cut_cost(g, ml_side);
            }
        }
        // fall through: matching stalled or coarse cut failed
    }
    std::pair<int64_t, int64_t> dir_cost{INT64_MAX, INT64_MAX};
    if (init_vsep(g, side)) {
        fm_refine_w(g, side);
        dir_cost = cut_cost(g, side);
    }
    if (ml_cost < dir_cost) side = std::move(ml_side);
    return std::min(ml_cost, dir_cost).first != INT64_MAX;
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

    // compact local weighted graph of the (connected) subgraph
    WG g;
    g.nv = m;
    for (int64_t i = 0; i < m; ++i) c.loc[S[i]] = i;
    g.xadj.assign(m + 1, 0);
    g.adj.clear();
    for (int64_t i = 0; i < m; ++i) {
        int64_t v = S[i];
        for (int64_t p = c.xadj[v]; p < c.xadj[v + 1]; ++p) {
            int64_t w = c.adjv[p];
            if (c.tag[w] == t) g.adj.push_back(c.loc[w]);
        }
        g.xadj[i + 1] = (int64_t)g.adj.size();
    }
    g.ewt.assign(g.adj.size(), 1);
    g.vwt.resize(m);
    g.totw = 0;
    for (int64_t i = 0; i < m; ++i) {
        g.vwt[i] = c.vwt.empty() ? 1 : c.vwt[S[i]];
        g.totw += g.vwt[i];
    }

    std::vector<int8_t> side;
    if (!multilevel_vsep(g, side)) {
        // dense blob / expander-like subgraph: no useful separator
        order_leaf(c, S, t);
        return;
    }
    std::vector<int64_t> A, B, sep;
    int64_t sepw = 0;
    for (int64_t i = 0; i < m; ++i) {
        if (side[i] == SA) A.push_back(S[i]);
        else if (side[i] == SB) B.push_back(S[i]);
        else { sep.push_back(S[i]); sepw += g.vwt[i]; }
    }
    // quality gate: a separator covering a third of the subgraph means
    // recursing is worse than minimum degree on the whole subgraph
    // (expander-like blobs); MD-order it and stop
    if (A.empty() || B.empty() || sep.empty() || sepw > g.totw / 3) {
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
    // supervariable sizes weight the dissection so separator/balance
    // decisions are made in original-vertex units
    q.vwt.resize(n_groups);
    for (int64_t g = 0; g < n_groups; ++g)
        q.vwt[g] = gcount[g + 1] - gcount[g];
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
