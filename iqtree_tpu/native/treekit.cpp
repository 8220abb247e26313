// treekit: native host-side tree runtime for iqtree_tpu.
//
// The search driver rebuilds device schedules (level-batched row layout,
// post-order traversals, stepwise-addition layouts) on EVERY hill-climb
// step; these are pointer-chasing loops that Python executes in
// interpreted time.  This library is the native runtime counterpart of
// the reference's C++ tree machinery (/root/reference/mtree.cpp,
// phylotree.cpp traversal code) re-targeted at the array encoding used
// by the TPU engine (trees/tree.py).
//
// Build: g++ -O2 -shared -fPIC -o libtreekit.so treekit.cpp
// Interface: plain C ABI over int32 arrays (ctypes).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Post-order of internal nodes (tips excluded), writing n_taxa-1 entries.
// parent/children describe the rooted view (trees/tree.py encoding):
// nodes 0..N-1 tips, N..2N-2 internal, root = 2N-2.
// Returns the number of entries written, or -1 on malformed input.
int32_t tk_postorder(int32_t n_taxa, const int32_t* children,
                     int32_t* out_order) {
    const int32_t n_nodes = 2 * n_taxa - 1;
    const int32_t root = n_nodes - 1;
    std::vector<int32_t> stack;
    std::vector<uint8_t> state;
    stack.reserve(n_nodes);
    state.reserve(n_nodes);
    stack.push_back(root);
    state.push_back(0);
    int32_t w = 0;
    while (!stack.empty()) {
        int32_t v = stack.back();
        uint8_t s = state.back();
        if (v < n_taxa) { stack.pop_back(); state.pop_back(); continue; }
        if (s == 0) {
            state.back() = 1;
            int32_t l = children[2 * v], r = children[2 * v + 1];
            if (l < 0 || r < 0 || l >= n_nodes || r >= n_nodes) return -1;
            // match the Python traversal: LIFO pops child 1 first
            stack.push_back(l); state.push_back(0);
            stack.push_back(r); state.push_back(0);
        } else {
            if (w >= n_taxa - 1) return -1;
            out_order[w++] = v;
            stack.pop_back(); state.pop_back();
        }
    }
    return w;
}

// Level-contiguous device layout (PhyloTree.device_layout): internal
// nodes grouped into rows of <= width same-depth nodes, children always
// in earlier rows.  Outputs:
//   out_d2h  [2N-1]  device id -> host id (tips identity)
//   out_h2d  [2N-1]
//   out_row_start / out_row_len  [N-1]
// Returns n_rows, or -1 on malformed input.
int32_t tk_device_layout(int32_t n_taxa, const int32_t* children,
                         int32_t width, int32_t* out_d2h, int32_t* out_h2d,
                         int32_t* out_row_start, int32_t* out_row_len) {
    const int32_t n_nodes = 2 * n_taxa - 1;
    std::vector<int32_t> po(n_taxa - 1);
    if (tk_postorder(n_taxa, children, po.data()) != n_taxa - 1) return -1;
    std::vector<int32_t> depth(n_nodes, 0);
    int32_t max_depth = 0;
    for (int32_t v : po) {
        int32_t l = children[2 * v], r = children[2 * v + 1];
        int32_t d = (depth[l] > depth[r] ? depth[l] : depth[r]) + 1;
        depth[v] = d;
        if (d > max_depth) max_depth = d;
    }
    // bucket post-order nodes by depth, preserving post-order within a
    // depth (matches the Python layout: stable grouping by depth)
    std::vector<std::vector<int32_t>> levels(max_depth + 1);
    for (int32_t v : po) levels[depth[v]].push_back(v);

    for (int32_t i = 0; i < n_taxa; i++) out_d2h[i] = i;
    int32_t next_id = n_taxa;
    int32_t n_rows = 0;
    for (int32_t d = 1; d <= max_depth; d++) {
        const std::vector<int32_t>& lv = levels[d];
        for (size_t i = 0; i < lv.size(); i += width) {
            int32_t len = (int32_t)((lv.size() - i) < (size_t)width
                                        ? (lv.size() - i)
                                        : (size_t)width);
            out_row_start[n_rows] = next_id;
            out_row_len[n_rows] = len;
            n_rows++;
            for (int32_t k = 0; k < len; k++)
                out_d2h[next_id++] = lv[i + k];
        }
    }
    for (int32_t i = 0; i < n_nodes; i++) out_h2d[out_d2h[i]] = i;
    return n_rows;
}

// Sethi-Ullman-style slot schedule for the fused Pallas kernel
// (kernels/schedule.py): emits one step per internal node in post-order
// with VMEM slot ids assigned so partials are freed as soon as the
// parent consumes them.  Each step: l, r, l_slot, r_slot (-1 = tip),
// out_slot, node_id (host).  Returns the number of slots used, -1 on
// error.
int32_t tk_slot_schedule(int32_t n_taxa, const int32_t* children,
                         int32_t* out_steps /* [(N-1) * 6] */) {
    const int32_t n_nodes = 2 * n_taxa - 1;
    const int32_t root = n_nodes - 1;
    std::vector<int32_t> po(n_taxa - 1);
    if (tk_postorder(n_taxa, children, po.data()) != n_taxa - 1) return -1;
    // register need (Strahler number), bottom-up over the post-order
    std::vector<int32_t> need(n_nodes, 1);
    for (int32_t v : po) {
        int32_t nl = need[children[2 * v]], nr = need[children[2 * v + 1]];
        need[v] = (nl == nr) ? nl + 1 : (nl > nr ? nl : nr);
    }
    // Sethi-Ullman order: evaluate the child with larger need first
    std::vector<int32_t> slot_of(n_nodes, -1);
    std::vector<int32_t> free_slots;
    std::vector<int32_t> stack;
    std::vector<uint8_t> state;
    stack.push_back(root);
    state.push_back(0);
    int32_t n_slots = 0;
    int32_t w = 0;
    while (!stack.empty()) {
        int32_t v = stack.back();
        uint8_t s = state.back();
        if (v < n_taxa) { stack.pop_back(); state.pop_back(); continue; }
        int32_t l = children[2 * v], r = children[2 * v + 1];
        if (s == 0) {
            state.back() = 1;
            int32_t first = (need[l] >= need[r]) ? l : r;
            int32_t second = (first == l) ? r : l;
            stack.push_back(second); state.push_back(0);
            stack.push_back(first); state.push_back(0);
        } else {
            stack.pop_back(); state.pop_back();
            int32_t ls = (l < n_taxa) ? -1 : slot_of[l];
            int32_t rs = (r < n_taxa) ? -1 : slot_of[r];
            if (ls >= 0) free_slots.push_back(ls);
            if (rs >= 0) free_slots.push_back(rs);
            int32_t os;
            if (!free_slots.empty()) {
                os = free_slots.back();
                free_slots.pop_back();
            } else {
                os = n_slots++;
            }
            slot_of[v] = os;
            out_steps[w * 6 + 0] = l;
            out_steps[w * 6 + 1] = r;
            out_steps[w * 6 + 2] = ls;
            out_steps[w * 6 + 3] = rs;
            out_steps[w * 6 + 4] = os;
            out_steps[w * 6 + 5] = v;
            w++;
        }
    }
    if (w != n_taxa - 1) return -1;
    return n_slots;
}

// Robinson-Foulds distance between two trees over the same taxa:
// canonical split fingerprints (FNV-1a over the taxon bitset, canonical
// side = the one containing taxon 0) compared via sorted vectors.
static void split_hashes(int32_t n_taxa, const int32_t* children,
                         std::vector<uint64_t>& out) {
    const int32_t n_nodes = 2 * n_taxa - 1;
    const int32_t root = n_nodes - 1;
    const int32_t words = (n_taxa + 63) / 64;
    std::vector<uint64_t> below((size_t)n_nodes * words, 0);
    std::vector<int32_t> po(n_taxa - 1);
    tk_postorder(n_taxa, children, po.data());
    for (int32_t t = 0; t < n_taxa; t++)
        below[(size_t)t * words + t / 64] = 1ULL << (t % 64);
    for (int32_t v : po) {
        int32_t l = children[2 * v], r = children[2 * v + 1];
        for (int32_t w = 0; w < words; w++)
            below[(size_t)v * words + w] =
                below[(size_t)l * words + w] | below[(size_t)r * words + w];
    }
    out.clear();
    for (int32_t v = n_taxa; v < n_nodes - 1; v++) {
        // edge above v is internal iff its parent is internal != root and
        // the split is nontrivial; count taxa below
        int32_t cnt = 0;
        for (int32_t w = 0; w < words; w++)
            cnt += __builtin_popcountll(below[(size_t)v * words + w]);
        if (cnt < 2 || cnt > n_taxa - 2) continue;
        // canonicalize: side containing taxon 0
        std::vector<uint64_t> side(words);
        bool has0 = below[(size_t)v * words] & 1ULL;
        for (int32_t w = 0; w < words; w++) {
            uint64_t b = below[(size_t)v * words + w];
            side[w] = has0 ? b : ~b;
        }
        // mask the last word to n_taxa bits
        if (n_taxa % 64) side[words - 1] &= (1ULL << (n_taxa % 64)) - 1;
        uint64_t h = 1469598103934665603ULL;
        for (int32_t w = 0; w < words; w++) {
            uint64_t x = side[w];
            for (int b = 0; b < 8; b++) {
                h ^= (x >> (8 * b)) & 0xff;
                h *= 1099511628211ULL;
            }
        }
        out.push_back(h);
    }
}

int32_t tk_robinson_foulds(int32_t n_taxa, const int32_t* children_a,
                           const int32_t* children_b) {
    std::vector<uint64_t> ha, hb;
    split_hashes(n_taxa, children_a, ha);
    split_hashes(n_taxa, children_b, hb);
    // symmetric difference via sorting
    std::sort(ha.begin(), ha.end());
    std::sort(hb.begin(), hb.end());
    size_t i = 0, j = 0;
    int32_t diff = 0;
    while (i < ha.size() && j < hb.size()) {
        if (ha[i] == hb[j]) { i++; j++; }
        else if (ha[i] < hb[j]) { diff++; i++; }
        else { diff++; j++; }
    }
    diff += (int32_t)(ha.size() - i) + (int32_t)(hb.size() - j);
    return diff;
}

}  // extern "C"
