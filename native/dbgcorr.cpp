// De-Bruijn-graph long-read correction — native host engine.
//
// Equivalent of the reference's wtcorr (short-read DBG corrector,
// wtcorr.c: small-k hash DBG + counting-bloom path verification +
// k-mer-moving alignment, README-tools.md:283-318).  The graph here is a
// sorted canonical k-mer array with counts (built device/host-side by the
// index machinery); correction anchors the long read on runs of solid
// k-mers and replaces the weak gaps with bounded DFS paths through the
// graph.
//
// C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Dbg {
    const uint64_t* kmers;  // sorted canonical
    const uint32_t* counts;
    int64_t n;
    int k;
    uint32_t min_cov;
    uint64_t mask;

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
        bool ok = dfs_path(g, curk, goalk, min_len, max_len, budget, path);
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
