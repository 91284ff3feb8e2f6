// Native host-runtime components for mcrat_tpu.
//
// The reference's entire runtime is C (SURVEY.md section 2); in this framework
// the device compute path is JAX/XLA, and the host runtime pieces that benefit
// from native code live here, loaded through ctypes (mcrat_tpu/native.py) with
// numpy fallbacks:
//
//  * uniform-bin spatial index construction (counting sort + prefix sums),
//    the equivalent of buildSpatialGrid (reference: Src/geometry.c:526-676);
//  * PLUTO .dbl raw binary load with optional byte-swap and per-variable
//    deinterleave (reference: readPluto's fread + reshape loops,
//    Src/mclib_pluto.c:1139-1246);
//  * photon compaction: gather the live-photon subset of the SoA arrays
//    (the host side of the transport tail compaction).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>

extern "C" {

// ---------------------------------------------------------------------------
// Spatial index: counting-sort cells into uniform bins.
// Inputs: cell centers (r0, r1, r2) of n cells; grid params (lo, inv_bin,
// dims). Outputs: cell_ids (n), bin_start (nbins), bin_count (nbins).
// Returns 0 on success.
// ---------------------------------------------------------------------------
int build_binned_index(
    const double* r0, const double* r1, const double* r2, int64_t n,
    const double* lo, const double* inv_bin, const int64_t* dims,
    int32_t* cell_ids, int32_t* bin_start, int32_t* bin_count)
{
    const int64_t d0 = dims[0], d1 = dims[1], d2 = dims[2];
    const int64_t nbins = d0 * d1 * d2;
    std::memset(bin_count, 0, nbins * sizeof(int32_t));

    auto bin_of = [&](int64_t i) -> int64_t {
        int64_t bi = (int64_t)((r0[i] - lo[0]) * inv_bin[0]);
        int64_t bj = (int64_t)((r1[i] - lo[1]) * inv_bin[1]);
        int64_t bk = d2 > 1 ? (int64_t)((r2[i] - lo[2]) * inv_bin[2]) : 0;
        bi = std::min(std::max(bi, (int64_t)0), d0 - 1);
        bj = std::min(std::max(bj, (int64_t)0), d1 - 1);
        bk = std::min(std::max(bk, (int64_t)0), d2 - 1);
        return (bk * d1 + bj) * d0 + bi;
    };

    for (int64_t i = 0; i < n; i++) bin_count[bin_of(i)]++;
    int64_t acc = 0;
    for (int64_t b = 0; b < nbins; b++) {
        bin_start[b] = (int32_t)acc;
        acc += bin_count[b];
    }
    // second pass: stable fill
    std::unique_ptr<int32_t[]> cursor(new int32_t[nbins]);
    std::memcpy(cursor.get(), bin_start, nbins * sizeof(int32_t));
    for (int64_t i = 0; i < n; i++) {
        int64_t b = bin_of(i);
        cell_ids[cursor[b]++] = (int32_t)i;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// PLUTO .dbl load: read num_vars * grid_size doubles, optional byteswap,
// write the deinterleaved per-variable blocks into out (same layout — the
// file is already variable-major; this is a bulk fread with validation).
// Returns number of doubles read, or -1 on error.
// ---------------------------------------------------------------------------
int64_t read_dbl(const char* path, int64_t count, int swap, double* out)
{
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    int64_t got = (int64_t)std::fread(out, sizeof(double), (size_t)count, f);
    std::fclose(f);
    if (swap) {
        uint64_t* u = reinterpret_cast<uint64_t*>(out);
        for (int64_t i = 0; i < got; i++) {
            uint64_t v = u[i];
            v = ((v & 0x00000000FFFFFFFFULL) << 32) | ((v & 0xFFFFFFFF00000000ULL) >> 32);
            v = ((v & 0x0000FFFF0000FFFFULL) << 16) | ((v & 0xFFFF0000FFFF0000ULL) >> 16);
            v = ((v & 0x00FF00FF00FF00FFULL) << 8) | ((v & 0xFF00FF00FF00FF00ULL) >> 8);
            u[i] = v;
        }
    }
    return got;
}

// ---------------------------------------------------------------------------
// Photon compaction: gather rows of a (n, width) float64 array at the given
// indices into out (n_idx, width).  Used by the transport tail compaction and
// checkpoint packing.
// ---------------------------------------------------------------------------
void gather_rows(const double* src, int64_t width, const int64_t* idx,
                 int64_t n_idx, double* out)
{
    for (int64_t i = 0; i < n_idx; i++) {
        std::memcpy(out + i * width, src + idx[i] * width, width * sizeof(double));
    }
}

}  // extern "C"
