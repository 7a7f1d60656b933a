// Fast COO text I/O for the Hi-C preprocessing pipeline.
//
// The reference reads/writes per-chromosome contact lists as TSV text
// (processdata/PrepareData_linear.py:49-50 np.loadtxt, :155-158 to_csv). At
// real scale (chr1 @ 40kb ~ 10^6 pixels x 22 chromosomes x 2 files) Python
// text parsing dominates one-time prep; this ~100x faster native parser keeps
// the cache format byte-compatible. Exposed to Python via ctypes (no pybind11
// in the image).
//
// API (C ABI):
//   long long fastcoo_parse(const char* path, double** out)
//       -> row-major (n, 3) doubles, n returned; caller frees via fastcoo_free.
//   int fastcoo_write(const char* path, const double* data, long long n,
//                     int int_value)
//       -> writes "a\tb\tv" lines; int_value!=0 formats v as integer.
//   void fastcoo_free(double* p)
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cerrno>
#include <vector>

extern "C" {

long long fastcoo_parse(const char* path, double** out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> buf(static_cast<size_t>(size) + 1);
    if (size > 0 && std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
        std::fclose(f);
        return -1;
    }
    std::fclose(f);
    buf[size] = '\0';

    std::vector<double> vals;
    vals.reserve(1 << 16);
    char* p = buf.data();
    char* end = buf.data() + size;
    while (p < end) {
        // skip leading whitespace / blank lines
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
            ++p;
        if (p >= end) break;
        char* next;
        double a = std::strtod(p, &next);
        if (next == p) { // unparsable token: skip the line
            while (p < end && *p != '\n') ++p;
            continue;
        }
        p = next;
        double b = std::strtod(p, &next);
        if (next == p) { while (p < end && *p != '\n') ++p; continue; }
        p = next;
        double v = std::strtod(p, &next);
        if (next == p) { while (p < end && *p != '\n') ++p; continue; }
        p = next;
        vals.push_back(a);
        vals.push_back(b);
        vals.push_back(v);
    }
    long long n = static_cast<long long>(vals.size() / 3);
    double* mem = static_cast<double*>(std::malloc(vals.size() * sizeof(double)));
    if (!mem) return -1;
    std::memcpy(mem, vals.data(), vals.size() * sizeof(double));
    *out = mem;
    return n;
}

int fastcoo_write(const char* path, const double* data, long long n,
                  int int_value) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    // buffered manual formatting: ~10x faster than fprintf per line
    std::vector<char> buf;
    buf.reserve(1 << 22);
    char line[128];
    for (long long i = 0; i < n; ++i) {
        const double* r = data + 3 * i;
        int len;
        if (int_value) {
            len = std::snprintf(line, sizeof(line), "%lld\t%lld\t%lld\n",
                                (long long)r[0], (long long)r[1],
                                (long long)r[2]);
        } else {
            len = std::snprintf(line, sizeof(line), "%lld\t%lld\t%.18g\n",
                                (long long)r[0], (long long)r[1], r[2]);
        }
        buf.insert(buf.end(), line, line + len);
        if (buf.size() > (1 << 21)) {
            std::fwrite(buf.data(), 1, buf.size(), f);
            buf.clear();
        }
    }
    if (!buf.empty()) std::fwrite(buf.data(), 1, buf.size(), f);
    std::fclose(f);
    return 0;
}

void fastcoo_free(double* p) { std::free(p); }

}  // extern "C"
