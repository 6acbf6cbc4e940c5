// Native ETL kernels for the DAG parquet codec.
//
// The hot host-side loop of corpus loading is decoding the reference's
// lower-triangular edge-bitstring columns (e{i}: length-i '0'/'1' strings,
// src/toolkit/labeled.py:116-185) into dense adjacency tensors, and the
// reverse when writing corpora. The Python path does this with per-column
// string joins + numpy reshapes; these kernels do one pass over contiguous
// byte buffers. Exposed via ctypes (see native/__init__.py); the Python
// implementation remains the portable fallback.
//
// Build: make -C dags_vae_search_tpu/native  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// Decode edge bitstrings into adj[rows, n, n] (row-major float32).
// cols: array of n pointers; cols[i] points at the concatenation of all
// rows' e{i} strings (each exactly i bytes of '0'/'1'; cols[0] unused).
void decode_edges(const char** cols, int64_t n, int64_t rows, float* adj) {
    const int64_t nn = n * n;
    std::memset(adj, 0, sizeof(float) * rows * nn);
    for (int64_t i = 1; i < n; ++i) {
        const char* src = cols[i];
        if (!src) continue;
        for (int64_t r = 0; r < rows; ++r) {
            float* out = adj + r * nn + i;  // column i, rows j -> adj[j, i]
            const char* bits = src + r * i;
            for (int64_t j = 0; j < i; ++j) {
                out[j * n] = (float)(bits[j] - '0');
            }
        }
    }
}

// Encode adj[rows, n, n] into per-column byte buffers: out[i] receives
// rows * i bytes of '0'/'1' (out[0] may be null).
void encode_edges(const float* adj, int64_t n, int64_t rows, char** out) {
    const int64_t nn = n * n;
    for (int64_t i = 1; i < n; ++i) {
        char* dst = out[i];
        if (!dst) continue;
        for (int64_t r = 0; r < rows; ++r) {
            const float* col = adj + r * nn + i;
            char* bits = dst + r * i;
            for (int64_t j = 0; j < i; ++j) {
                bits[j] = col[j * n] > 0.0f ? '1' : '0';
            }
        }
    }
}

// Decode a batch of label columns (uint16 parquet) is already a plain numpy
// cast; no native kernel needed.

}  // extern "C"
