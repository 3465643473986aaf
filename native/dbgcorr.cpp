// De-Bruijn-graph long-read correction — native host engine.
//
// Equivalent of the reference's wtcorr (short-read DBG corrector,
// wtcorr.c: small-k hash DBG + counting-bloom big-K path verification +
// k-mer-moving alignment, README-tools.md:283-318).  The graph here is a
// sorted canonical k-mer array with counts (built device/host-side by the
// index machinery); correction anchors the long read on runs of solid
// k-mers and replaces the weak gaps with graph paths.  Candidate paths
// through the small-k graph are verified with a counting bloom filter of
// bigger K-mers (reference counting_bloom_filter.h; K <= 32 here vs the
// reference's 41 — same role, 2-bit-packed 64-bit codes) and ranked by
// banded edit distance against the read's gap segment (the reference's
// k-mer-moving alignment ranks paths by alignment score the same way).
//
// C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>

namespace {

struct Cbf;

struct Dbg {
    const uint64_t* kmers;  // sorted canonical
    const uint32_t* counts;
    int64_t n;
    int k;
    uint32_t min_cov;
    uint64_t mask;
    // optional big-K verifier (reference counting bloom, wtcorr -K)
    const Cbf* verifier = nullptr;
    uint32_t min_bigk = 1;
    double min_bigk_frac = 1.0;
    int max_cands = 8;

    bool solid(uint64_t canon) const {
        const uint64_t* p = std::lower_bound(kmers, kmers + n, canon);
        if (p == kmers + n || *p != canon) return false;
        return counts[p - kmers] >= min_cov;
    }

    uint32_t count(uint64_t canon) const {
        const uint64_t* p = std::lower_bound(kmers, kmers + n, canon);
        if (p == kmers + n || *p != canon) return 0;
        return counts[p - kmers];
    }
};

uint64_t revcomp(uint64_t x, int k) {
    x = ~x;
    x = ((x & 0x3333333333333333ull) << 2) | ((x & 0xCCCCCCCCCCCCCCCCull) >> 2);
    x = ((x & 0x0F0F0F0F0F0F0F0Full) << 4) | ((x & 0xF0F0F0F0F0F0F0F0ull) >> 4);
    x = __builtin_bswap64(x);
    return x >> (64 - (k << 1));
}

uint64_t canon_of(uint64_t fwd, int k) {
    uint64_t rc = revcomp(fwd, k);
    return fwd < rc ? fwd : rc;
}

// ---- counting bloom filter for big-K verification ----------------------

uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ull;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ull;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBull;
    return x ^ (x >> 31);
}

struct Cbf {
    std::vector<uint8_t> cells;  // 8-bit saturating counters
    uint64_t mask;               // cells-1 (pow2 size)
    int nh;                      // hash functions
    int K;                       // big kmer size (<= 32)
    uint64_t kmask;

    uint8_t count(uint64_t canon) const {
        uint8_t m = 255;
        uint64_t h = splitmix64(canon);
        for (int i = 0; i < nh; i++) {
            m = std::min(m, cells[h & mask]);
            h = splitmix64(h + 0x5851F42D4C957F2Dull * (i + 1));
        }
        return m;
    }

    void add(uint64_t canon) {
        // conservative (min-increment) update limits overestimation
        uint8_t cur = count(canon);
        if (cur == 255) return;
        uint64_t h = splitmix64(canon);
        for (int i = 0; i < nh; i++) {
            uint8_t& c = cells[h & mask];
            if (c == cur) c++;
            h = splitmix64(h + 0x5851F42D4C957F2Dull * (i + 1));
        }
    }
};

// verify every big-K kmer of `seq[0:len)` against the bloom filter;
// returns the fraction of verified K-mers (1.0 when len < K: vacuous)
double verify_bigk(const Cbf& v, const uint8_t* seq, int len, uint32_t min_cov) {
    if (len < v.K) return 1.0;
    int total = 0, ok = 0;
    uint64_t fwd = 0;
    for (int i = 0; i < len; i++) {
        fwd = ((fwd << 2) | (seq[i] & 3)) & v.kmask;
        if (i >= v.K - 1) {
            total++;
            if (v.count(canon_of(fwd, v.K)) >= min_cov) ok++;
        }
    }
    return total ? (double)ok / total : 1.0;
}

// banded edit distance path-vs-read-gap (small bands; gaps are short)
int edit_distance_banded(const uint8_t* a, int la, const uint8_t* b, int lb,
                         int band) {
    if (la == 0) return lb;
    if (lb == 0) return la;
    band = std::max(band, std::abs(la - lb) + 1);
    std::vector<int> prev(lb + 1), cur(lb + 1);
    const int INF = 1 << 28;
    for (int j = 0; j <= lb; j++) prev[j] = j;
    for (int i = 1; i <= la; i++) {
        int jlo = std::max(1, i - band), jhi = std::min(lb, i + band);
        cur[jlo - 1] = (jlo == 1) ? i : INF;
        for (int j = jlo; j <= jhi; j++) {
            int d = prev[j - 1] + (a[i - 1] != b[j - 1]);
            int u = (j <= i + band - 1 && prev[j] < INF) ? prev[j] + 1 : INF;
            int l = (cur[j - 1] < INF) ? cur[j - 1] + 1 : INF;
            cur[j] = std::min(d, std::min(u, l));
        }
        if (jhi < lb) cur[jhi + 1 <= lb ? jhi + 1 : lb] = INF;
        for (int j = 0; j < jlo - 1; j++) cur[j] = INF;
        std::swap(prev, cur);
    }
    return prev[lb];
}

// bounded DFS from kmer `cur` (forward code) to kmer `goal` within
// [min_len, max_len] added bases; appends path bases to out.
bool dfs_path(const Dbg& g, uint64_t cur, uint64_t goal, int min_len,
              int max_len, int& budget, std::vector<uint8_t>& out) {
    if ((int)out.size() >= min_len && cur == goal) return true;
    if ((int)out.size() >= max_len) return false;
    if (--budget <= 0) return false;
    // order extensions by count desc
    struct Ext { uint32_t cnt; uint8_t b; uint64_t nxt; };
    Ext exts[4];
    int ne = 0;
    for (uint8_t b = 0; b < 4; b++) {
        uint64_t nxt = ((cur << 2) | b) & g.mask;
        uint32_t c = g.count(canon_of(nxt, g.k));
        if (c >= g.min_cov) exts[ne++] = Ext{c, b, nxt};
    }
    std::sort(exts, exts + ne, [](const Ext& a, const Ext& b) { return a.cnt > b.cnt; });
    for (int e = 0; e < ne; e++) {
        out.push_back(exts[e].b);
        if (dfs_path(g, exts[e].nxt, goal, min_len, max_len, budget, out)) return true;
        out.pop_back();
    }
    return false;
}

// enumerate up to `max_cands` goal-reaching paths (count-ordered DFS)
void collect_paths(const Dbg& g, uint64_t cur, uint64_t goal, int min_len,
                   int max_len, int& budget, std::vector<uint8_t>& path,
                   std::vector<std::vector<uint8_t>>& cands, int max_cands) {
    if ((int)cands.size() >= max_cands) return;
    if ((int)path.size() >= min_len && cur == goal) {
        cands.push_back(path);
        return;  // longer paths through the goal are rarely better
    }
    if ((int)path.size() >= max_len) return;
    if (--budget <= 0) return;
    struct Ext { uint32_t cnt; uint8_t b; uint64_t nxt; };
    Ext exts[4];
    int ne = 0;
    for (uint8_t b = 0; b < 4; b++) {
        uint64_t nxt = ((cur << 2) | b) & g.mask;
        uint32_t c = g.count(canon_of(nxt, g.k));
        if (c >= g.min_cov) exts[ne++] = Ext{c, b, nxt};
    }
    std::sort(exts, exts + ne, [](const Ext& a, const Ext& b) { return a.cnt > b.cnt; });
    for (int e = 0; e < ne; e++) {
        path.push_back(exts[e].b);
        collect_paths(g, exts[e].nxt, goal, min_len, max_len, budget, path,
                      cands, max_cands);
        path.pop_back();
    }
}

// pick the best gap path: big-K-verified candidates ranked by banded edit
// distance to the read's raw gap bases (wtcorr's kmer-moving alignment +
// counting-bloom verification roles)
bool best_gap_path(const Dbg& g, const std::vector<uint8_t>& res,
                   uint64_t curk, uint64_t goalk,
                   const uint8_t* raw, int raw_len, int min_len, int max_len,
                   int budget, std::vector<uint8_t>& out) {
    std::vector<std::vector<uint8_t>> cands;
    std::vector<uint8_t> path;
    collect_paths(g, curk, goalk, min_len, max_len, budget, path, cands,
                  g.max_cands);
    if (cands.empty()) return false;
    int best = -1, best_ed = 1 << 30;
    for (size_t c = 0; c < cands.size(); c++) {
        if (g.verifier) {
            // verify big-K kmers across [left ctx][path][goal kmer bases]
            std::vector<uint8_t> win;
            int ctx = g.verifier->K - 1;
            int lo = std::max(0, (int)res.size() - ctx);
            win.insert(win.end(), res.begin() + lo, res.end());
            // the path's tail spells the goal kmer already
            win.insert(win.end(), cands[c].begin(), cands[c].end());
            double vf = verify_bigk(*g.verifier, win.data(), (int)win.size(),
                                    g.min_bigk);
            if (getenv("SDTPU_CORR_DEBUG"))
                fprintf(stderr, "[corrdbg] cand=%zu len=%zu win=%zu frac=%.3f min=%u\n",
                        c, cands[c].size(), win.size(), vf, g.min_bigk);
            if (vf < g.min_bigk_frac)
                continue;
        }
        int ed = edit_distance_banded(cands[c].data(), (int)cands[c].size(),
                                      raw, raw_len, 16);
        if (ed < best_ed) { best_ed = ed; best = (int)c; }
    }
    if (best < 0) return false;
    out = cands[best];
    return true;
}

}  // namespace

extern "C" {

void* dbg_new(const uint64_t* kmers, const uint32_t* counts, int64_t n, int k,
              uint32_t min_cov) {
    Dbg* g = new Dbg();
    g->kmers = kmers;  // caller keeps arrays alive
    g->counts = counts;
    g->n = n;
    g->k = k;
    g->min_cov = min_cov;
    g->mask = (k >= 32) ? ~0ull : ((1ull << (2 * k)) - 1);
    return g;
}

void dbg_free(void* h) { delete (Dbg*)h; }

// counting bloom of big-K kmers (reference wtcorr -K / counting bloom)
void* cbf_new(int log2_cells, int n_hashes, int K) {
    Cbf* v = new Cbf();
    v->cells.assign(1ull << log2_cells, 0);
    v->mask = (1ull << log2_cells) - 1;
    v->nh = n_hashes;
    v->K = K;
    v->kmask = (K >= 32) ? ~0ull : ((1ull << (2 * K)) - 1);
    return v;
}

void cbf_free(void* h) { delete (Cbf*)h; }

// roll all K-mers of a 2-bit read into the filter (codes > 3 reset)
void cbf_add_seq(void* h, const uint8_t* codes, int len) {
    Cbf& v = *(Cbf*)h;
    uint64_t fwd = 0;
    int run = 0;
    for (int i = 0; i < len; i++) {
        if (codes[i] > 3) { run = 0; fwd = 0; continue; }
        fwd = ((fwd << 2) | codes[i]) & v.kmask;
        if (++run >= v.K) v.add(canon_of(fwd, v.K));
    }
}

uint32_t cbf_count_kmer(void* h, uint64_t canon) {
    return ((Cbf*)h)->count(canon);
}

// attach the big-K verifier + candidate ranking to a DBG corrector
void dbg_set_verifier(void* dbg, void* cbf, uint32_t min_bigk_cov,
                      double min_frac, int max_cands) {
    Dbg& g = *(Dbg*)dbg;
    g.verifier = (const Cbf*)cbf;
    g.min_bigk = min_bigk_cov;
    g.min_bigk_frac = min_frac;
    g.max_cands = max_cands;
}

// Correct `read` (2-bit codes); writes corrected codes into out (cap).
// Returns corrected length, or -1 if nothing was anchored.
int dbg_correct(void* h, const uint8_t* read, int len, uint8_t* out, int cap,
                int max_branch) {
    Dbg& g = *(Dbg*)h;
    int k = g.k;
    if (len < k + 2) {
        if (len > cap) return -1;
        memcpy(out, read, len);
        return len;
    }
    int nk = len - k + 1;
    std::vector<uint8_t> is_solid(nk, 0);
    uint64_t fwd = 0;
    for (int i = 0; i < len; i++) {
        fwd = ((fwd << 2) | read[i]) & g.mask;
        if (i >= k - 1) is_solid[i - k + 1] = g.solid(canon_of(fwd, k)) ? 1 : 0;
    }
    // anchors: runs of >=2 consecutive solid kmers
    std::vector<std::pair<int, int>> anchors;  // kmer-index ranges [s, e)
    int s = -1;
    for (int i = 0; i <= nk; i++) {
        bool sol = i < nk && is_solid[i];
        if (sol && s < 0) s = i;
        if (!sol && s >= 0) {
            if (i - s >= 2) anchors.push_back({s, i});
            s = -1;
        }
    }
    if (anchors.empty()) return -1;
    std::vector<uint8_t> res;
    res.reserve(len + len / 4);
    // head: keep raw bases before the first anchor
    int a0 = anchors[0].first;
    for (int i = 0; i < a0; i++) res.push_back(read[i]);
    // first anchor's kmer bases
    for (int i = a0; i < a0 + k; i++) res.push_back(read[i]);
    uint64_t curk = 0;
    for (int i = a0; i < a0 + k; i++) curk = ((curk << 2) | read[i]) & g.mask;
    int cur_end = anchors[0].first;  // kmer index of current position
    for (size_t ai = 0; ai + 1 <= anchors.size(); ai++) {
        auto [as, ae] = anchors[ai];
        // extend through the anchor run (solid region: trust the read)
        for (int i = std::max(cur_end, as) + 1; i < ae; i++) {
            uint8_t b = read[i + k - 1];
            res.push_back(b);
            curk = ((curk << 2) | b) & g.mask;
        }
        cur_end = ae - 1;
        if (ai + 1 == anchors.size()) break;
        auto [bs, be] = anchors[ai + 1];
        // gap: read bases between kmer (ae-1) end and kmer bs start
        int gap_bases = bs - (ae - 1);  // bases the path must add
        uint64_t goalk = 0;
        for (int i = bs; i < bs + k; i++) goalk = ((goalk << 2) | read[i]) & g.mask;
        std::vector<uint8_t> path;
        int budget = max_branch;
        int min_len = std::max(1, gap_bases - std::max(8, gap_bases / 3));
        int max_len = gap_bases + std::max(8, gap_bases / 3);
        bool ok;
        if (g.verifier || g.max_cands > 1) {
            ok = best_gap_path(g, res, curk, goalk,
                               read + (ae - 1 + k),
                               std::max(0, bs - (ae - 1)),
                               min_len, max_len, budget, path);
        } else {
            ok = dfs_path(g, curk, goalk, min_len, max_len, budget, path);
        }
        if (ok) {
            for (uint8_t b : path) res.push_back(b);
            curk = goalk;
        } else {
            // keep the raw gap bases
            for (int i = ae - 1 + 1; i <= bs; i++) {
                uint8_t b = read[i + k - 1];
                res.push_back(b);
                curk = ((curk << 2) | b) & g.mask;
            }
        }
        cur_end = bs;
    }
    // tail: raw bases after the last anchor's last kmer
    int last_k = anchors.back().second - 1;
    for (int i = last_k + k; i < len; i++) res.push_back(read[i]);
    int m = (int)res.size();
    if (m > cap) m = cap;
    memcpy(out, res.data(), m);
    return (int)res.size();
}

}  // extern "C"

extern "C" {
// debug/test helper: fraction of verified big-K kmers in a code window
double cbf_verify(void* h, const uint8_t* codes, int len, uint32_t min_cov) {
    return verify_bigk(*(Cbf*)h, codes, len, min_cov);
}
}
