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
