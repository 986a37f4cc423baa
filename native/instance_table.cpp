// Single-pass per-instance statistics over an int32 label map.
//
// The host finalization step (bbox / centroid / size / majority-vote
// type per nucleus) is the reference's per-instance Python+cv2 loop
// (models/hovernet/post_proc.py:120-181), which rescans the full map
// once per instance — O(instances * area). This kernel computes all
// per-instance tables in ONE pass over the map, O(area), and is called
// through ctypes (hover_net_tpu/ops/instance_table.py).
//
// Labels must be contiguous 1..n_labels (remap first). Type histogram
// is optional (pass nullptr).

#include <cstdint>
#include <cstring>

extern "C" {

// out_bbox:     [n_labels, 4]  (rmin, rmax_excl, cmin, cmax_excl)
// out_sum_yx:   [n_labels, 2]  (sum_y, sum_x)  for centroids
// out_size:     [n_labels]
// out_type_hist:[n_labels, n_types]  (optional)
void instance_table(const int32_t* labels, const int32_t* type_map,
                    int64_t height, int64_t width, int32_t n_labels,
                    int32_t n_types, int64_t* out_bbox,
                    int64_t* out_sum_yx, int64_t* out_size,
                    int64_t* out_type_hist) {
    for (int32_t i = 0; i < n_labels; ++i) {
        out_bbox[i * 4 + 0] = height;  // rmin
        out_bbox[i * 4 + 1] = 0;       // rmax
        out_bbox[i * 4 + 2] = width;   // cmin
        out_bbox[i * 4 + 3] = 0;       // cmax
    }
    std::memset(out_sum_yx, 0, sizeof(int64_t) * (size_t)n_labels * 2);
    std::memset(out_size, 0, sizeof(int64_t) * (size_t)n_labels);
    if (out_type_hist && type_map) {
        std::memset(out_type_hist, 0,
                    sizeof(int64_t) * (size_t)n_labels * (size_t)n_types);
    }

    for (int64_t y = 0; y < height; ++y) {
        const int32_t* row = labels + y * width;
        const int32_t* trow = type_map ? type_map + y * width : nullptr;
        for (int64_t x = 0; x < width; ++x) {
            int32_t lab = row[x];
            if (lab <= 0 || lab > n_labels) continue;
            int64_t i = (int64_t)(lab - 1);
            int64_t* bb = out_bbox + i * 4;
            if (y < bb[0]) bb[0] = y;
            if (y + 1 > bb[1]) bb[1] = y + 1;
            if (x < bb[2]) bb[2] = x;
            if (x + 1 > bb[3]) bb[3] = x + 1;
            out_sum_yx[i * 2 + 0] += y;
            out_sum_yx[i * 2 + 1] += x;
            out_size[i] += 1;
            if (trow && out_type_hist) {
                int32_t t = trow[x];
                if (t >= 0 && t < n_types) {
                    out_type_hist[i * n_types + t] += 1;
                }
            }
        }
    }
}

// Relabel via a lookup table in place: labels[i] = lut[labels[i]].
// Used for contiguous-id remapping of big WSI maps without a Python
// fancy-indexing round trip.
void apply_lut(int32_t* labels, int64_t count, const int32_t* lut,
               int32_t lut_size) {
    for (int64_t i = 0; i < count; ++i) {
        int32_t v = labels[i];
        labels[i] = (v >= 0 && v < lut_size) ? lut[v] : 0;
    }
}

}  // extern "C"
