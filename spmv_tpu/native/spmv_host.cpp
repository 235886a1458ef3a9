// libspmv_host — native host-side tier of spmv_tpu.
//
// The reference implements its loader and assembly hot paths in C++
// (reference spmv/read_petsc.cpp: per-value byte swaps + seeks;
// reference spmv/Matrix.cpp:226-318: ghost-row redistribution/renumbering).
// spmv_tpu keeps the TPU compute path in JAX/Pallas and puts the host-side
// heavy lifting here: PETSc binary parsing (big-endian, mmap'd, swapped with
// a vectorizable loop) and CSR->padded-ELL packing. Exposed over a plain C
// ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC spmv_host.cpp -o libspmv_host.so
// (spmv_tpu.native.lib compiles lazily on first use and caches the .so).

#include <cstdint>
#include <cstdio>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int32_t kMatClassId = 1211216;
constexpr int32_t kVecClassId = 1211214;

inline int32_t bswap32(int32_t v) {
  return __builtin_bswap32(static_cast<uint32_t>(v));
}
inline double bswap64d(double v) {
  uint64_t u;
  std::memcpy(&u, &v, 8);
  u = __builtin_bswap64(u);
  std::memcpy(&v, &u, 8);
  return v;
}

struct MappedFile {
  const uint8_t* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
};

MappedFile map_file(const char* path) {
  MappedFile m;
  m.fd = open(path, O_RDONLY);
  if (m.fd < 0) return m;
  struct stat st;
  if (fstat(m.fd, &st) != 0) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  m.size = static_cast<size_t>(st.st_size);
  void* p = mmap(nullptr, m.size, PROT_READ, MAP_PRIVATE, m.fd, 0);
  if (p == MAP_FAILED) {
    close(m.fd);
    m.fd = -1;
    return m;
  }
  m.data = static_cast<const uint8_t*>(p);
  return m;
}

void unmap(MappedFile& m) {
  if (m.data) munmap(const_cast<uint8_t*>(reinterpret_cast<const uint8_t*>(m.data)), m.size);
  if (m.fd >= 0) close(m.fd);
  m.data = nullptr;
  m.fd = -1;
}

}  // namespace

extern "C" {

// Parse header: returns 0 on success; fills nrows/ncols/nnz.
// Error codes: -1 open/map failed, -2 bad magic, -3 truncated.
int spmv_petsc_matrix_header(const char* path, int64_t* nrows, int64_t* ncols,
                             int64_t* nnz) {
  MappedFile m = map_file(path);
  if (!m.ok()) return -1;
  int rc = 0;
  if (m.size < 16) {
    rc = -3;
  } else {
    const int32_t* h = reinterpret_cast<const int32_t*>(m.data);
    if (bswap32(h[0]) != kMatClassId) {
      rc = -2;
    } else {
      *nrows = bswap32(h[1]);
      *ncols = bswap32(h[2]);
      *nnz = bswap32(h[3]);
      size_t need = 16 + static_cast<size_t>(*nrows) * 4 +
                    static_cast<size_t>(*nnz) * 12;
      if (m.size < need) rc = -3;
    }
  }
  unmap(m);
  return rc;
}

// Read rows [row0, row1): fills rowptr (row1-row0+1, int64), colind (int32),
// values (double). colind/values must have capacity for the slice nnz, which
// the caller gets from a first call with colind == nullptr (returned via
// *slice_nnz). Returns 0 on success.
int spmv_petsc_matrix_read_slice(const char* path, int64_t row0, int64_t row1,
                                 int64_t* rowptr, int32_t* colind,
                                 double* values, int64_t* slice_nnz) {
  MappedFile m = map_file(path);
  if (!m.ok()) return -1;
  int rc = 0;
  do {
    if (m.size < 16) { rc = -3; break; }
    const int32_t* h = reinterpret_cast<const int32_t*>(m.data);
    if (bswap32(h[0]) != kMatClassId) { rc = -2; break; }
    const int64_t nrows = bswap32(h[1]);
    const int64_t nnz = bswap32(h[3]);
    if (row0 < 0 || row1 < row0 || row1 > nrows) { rc = -4; break; }
    const int32_t* row_nnz = h + 4;
    // prefix-sum to the slice's file offsets (reference read_petsc.cpp:109-124)
    int64_t lo = 0;
    for (int64_t r = 0; r < row0; ++r) lo += bswap32(row_nnz[r]);
    int64_t acc = lo;
    rowptr[0] = 0;
    for (int64_t r = row0; r < row1; ++r) {
      acc += bswap32(row_nnz[r]);
      rowptr[r - row0 + 1] = acc - lo;
    }
    const int64_t cnt = acc - lo;
    *slice_nnz = cnt;
    if (colind == nullptr) break;  // size query only
    size_t col_off = 16 + static_cast<size_t>(nrows) * 4;
    size_t val_off = col_off + static_cast<size_t>(nnz) * 4;
    if (m.size < val_off + static_cast<size_t>(nnz) * 8) { rc = -3; break; }
    const int32_t* cols =
        reinterpret_cast<const int32_t*>(m.data + col_off) + lo;
    const double* vals =
        reinterpret_cast<const double*>(m.data + val_off) + lo;
    for (int64_t i = 0; i < cnt; ++i) colind[i] = bswap32(cols[i]);
    for (int64_t i = 0; i < cnt; ++i) values[i] = bswap64d(vals[i]);
  } while (false);
  unmap(m);
  return rc;
}

int spmv_petsc_vector_header(const char* path, int64_t* n) {
  MappedFile m = map_file(path);
  if (!m.ok()) return -1;
  int rc = 0;
  if (m.size < 8) {
    rc = -3;
  } else {
    const int32_t* h = reinterpret_cast<const int32_t*>(m.data);
    if (bswap32(h[0]) != kVecClassId) rc = -2;
    else *n = bswap32(h[1]);
  }
  unmap(m);
  return rc;
}

int spmv_petsc_vector_read(const char* path, int64_t i0, int64_t i1,
                           double* out) {
  MappedFile m = map_file(path);
  if (!m.ok()) return -1;
  int rc = 0;
  do {
    if (m.size < 8) { rc = -3; break; }
    const int32_t* h = reinterpret_cast<const int32_t*>(m.data);
    if (bswap32(h[0]) != kVecClassId) { rc = -2; break; }
    const int64_t n = bswap32(h[1]);
    if (i0 < 0 || i1 < i0 || i1 > n) { rc = -4; break; }
    if (m.size < 8 + static_cast<size_t>(n) * 8) { rc = -3; break; }
    const double* vals = reinterpret_cast<const double*>(m.data + 8) + i0;
    for (int64_t i = 0; i < i1 - i0; ++i) out[i] = bswap64d(vals[i]);
  } while (false);
  unmap(m);
  return rc;
}

// ---------------------------------------------------------------------------
// CSR -> DIA assembly (the csr_to_dia hot path; replaces the numpy
// unique/searchsorted/bincount passes, which sort nnz-sized arrays).
// Two single-pass functions over the CSR arrays:
//   spmv_dia_scan  — distinct diagonal offsets WITHOUT sorting (small sorted
//                    insert table, <= max_track entries) + kept-entry count;
//   spmv_dia_pack  — accumulate values into the (ndiags, nrows_pad) planes
//                    via an offset->plane lookup table (duplicates sum,
//                    matching CSR semantics).
// ---------------------------------------------------------------------------

// Returns 0 on success, -4 if more than max_track distinct offsets exist.
// lower_only != 0 keeps only offsets <= 0 (symmetric lower-triangle storage,
// reference spmv/Matrix.cpp:337-349 semantics). offsets_out must have
// capacity max_track; filled ascending. *nnz_kept = number of kept entries.
int spmv_dia_scan(const int64_t* rowptr, const int32_t* colind, int64_t nrows,
                  int32_t lower_only, int64_t max_track, int64_t* offsets_out,
                  int64_t* ndiags_out, int64_t* nnz_kept) {
  int64_t nd = 0;
  int64_t kept = 0;
  for (int64_t r = 0; r < nrows; ++r) {
    const int64_t lo = rowptr[r], hi = rowptr[r + 1];
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t off = static_cast<int64_t>(colind[i]) - r;
      if (lower_only && off > 0) continue;
      ++kept;
      // binary search in the (tiny, L1-resident) sorted table
      int64_t a = 0, b = nd;
      while (a < b) {
        const int64_t mid = (a + b) / 2;
        if (offsets_out[mid] < off) a = mid + 1;
        else b = mid;
      }
      if (a < nd && offsets_out[a] == off) continue;
      if (nd == max_track) return -4;
      std::memmove(offsets_out + a + 1, offsets_out + a,
                   static_cast<size_t>(nd - a) * sizeof(int64_t));
      offsets_out[a] = off;
      ++nd;
    }
  }
  *ndiags_out = nd;
  *nnz_kept = kept;
  return 0;
}

}  // extern "C" (template below needs C++ linkage)

namespace {

template <typename T>
int dia_pack_impl(const int64_t* rowptr, const int32_t* colind,
                  const T* values, int64_t nrows, int64_t nrows_pad,
                  int32_t lower_only, int32_t interleaved,
                  const int64_t* offsets, int64_t ndiags, T* data) {
  if (ndiags <= 0) return 0;
  const int64_t omin = offsets[0], omax = offsets[ndiags - 1];
  const int64_t range = omax - omin + 1;
  // offset -> plane lookup table when the band is narrow enough; binary
  // search fallback for extreme spreads (range can reach ~2*nrows)
  constexpr int64_t kLutCap = int64_t(1) << 24;
  int16_t* lut = nullptr;
  if (range <= kLutCap && ndiags <= 32766) {
    lut = new int16_t[range];
    std::memset(lut, 0xff, static_cast<size_t>(range) * sizeof(int16_t));
    for (int64_t d = 0; d < ndiags; ++d)
      lut[offsets[d] - omin] = static_cast<int16_t>(d);
  }
  int rc = 0;
  for (int64_t r = 0; r < nrows && rc == 0; ++r) {
    const int64_t lo = rowptr[r], hi = rowptr[r + 1];
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t off = static_cast<int64_t>(colind[i]) - r;
      if (lower_only && off > 0) continue;
      int64_t d;
      if (lut != nullptr) {
        if (off < omin || off > omax || lut[off - omin] < 0) { rc = -5; break; }
        d = lut[off - omin];
      } else {
        int64_t a = 0, b = ndiags;
        while (a < b) {
          const int64_t mid = (a + b) / 2;
          if (offsets[mid] < off) a = mid + 1;
          else b = mid;
        }
        if (a >= ndiags || offsets[a] != off) { rc = -5; break; }
        d = a;
      }
      // interleaved: the DiaMatrix device layout (nrows_pad/128, ndiags*128)
      // written directly — skips the flat->interleaved numpy transpose pass
      const int64_t idx = interleaved
          ? ((r >> 7) * ndiags + d) * 128 + (r & 127)
          : d * nrows_pad + r;
      data[idx] += values[i];
    }
  }
  delete[] lut;
  return rc;
}

}  // namespace

extern "C" {

// data must be pre-zeroed (ndiags, nrows_pad) in the matching dtype.
// Returns 0 on success, -5 if an entry's offset is not in offsets[].
int spmv_dia_pack_f64(const int64_t* rowptr, const int32_t* colind,
                      const double* values, int64_t nrows, int64_t nrows_pad,
                      int32_t lower_only, int32_t interleaved,
                      const int64_t* offsets, int64_t ndiags, double* data) {
  return dia_pack_impl(rowptr, colind, values, nrows, nrows_pad, lower_only,
                       interleaved, offsets, ndiags, data);
}

int spmv_dia_pack_f32(const int64_t* rowptr, const int32_t* colind,
                      const float* values, int64_t nrows, int64_t nrows_pad,
                      int32_t lower_only, int32_t interleaved,
                      const int64_t* offsets, int64_t ndiags, float* data) {
  return dia_pack_impl(rowptr, colind, values, nrows, nrows_pad, lower_only,
                       interleaved, offsets, ndiags, data);
}

// Pack a CSR slice into padded ELL rectangles (row-major (nrows_pad, k)).
// Padded slots must be pre-zeroed by the caller (calloc'd numpy arrays).
int spmv_pack_ell(const int64_t* rowptr, const int32_t* colind,
                  const double* values, int64_t nrows, int64_t nrows_pad,
                  int64_t k, int32_t* ell_colind, double* ell_values) {
  (void)nrows_pad;
  for (int64_t r = 0; r < nrows; ++r) {
    const int64_t lo = rowptr[r], hi = rowptr[r + 1];
    if (hi - lo > k) return -4;
    int32_t* cr = ell_colind + r * k;
    double* vr = ell_values + r * k;
    for (int64_t i = lo; i < hi; ++i) {
      cr[i - lo] = colind[i];
      vr[i - lo] = values[i];
    }
  }
  return 0;
}

}  // extern "C"
