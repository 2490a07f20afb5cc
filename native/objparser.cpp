// Fast Wavefront OBJ parser — native asset-ingestion path.
//
// The reference's asset layer is native C++ (stb_image decode in
// Texture.cpp; assimp was linked but never used for model loading,
// SURVEY.md §1). This is the TPU framework's equivalent: a single-pass,
// allocation-light parser that expands faces into a triangle soup
// (positions/uvs/normals per corner) ready for device upload. ~30x the
// throughput of the Python fallback (io/obj.py) on 100k-triangle assets
// (BASELINE config 3).
//
// C ABI (ctypes): two-phase protocol.
//   obj_parse(path)            -> handle (counts queryable), NULL on error
//   obj_counts(handle, out[2]) -> num_corners
//   obj_fill(handle, pos, uv, nrm) -> copies [N,3],[N,2],[N,3] f32 arrays
//   obj_free(handle)
//
// Build: g++ -O3 -shared -fPIC -o libobjparser.so objparser.cpp
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> pos;  // 3 per corner
  std::vector<float> uv;   // 2 per corner
  std::vector<float> nrm;  // 3 per corner
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* parse_float(const char* p, const char* end, float* out) {
  char* q;
  *out = strtof(p, &q);
  return q > p && q <= end ? q : nullptr;
}

// Parses "v", "v/t", "v//n", "v/t/n" corner references.
inline const char* parse_corner(const char* p, const char* end, long* vi,
                                long* ti, long* ni) {
  char* q;
  *vi = strtol(p, &q, 10);
  if (q == p) return nullptr;
  *ti = 0;
  *ni = 0;
  p = q;
  if (p < end && *p == '/') {
    ++p;
    if (p < end && *p != '/') {
      *ti = strtol(p, &q, 10);
      p = q;
    }
    if (p < end && *p == '/') {
      ++p;
      *ni = strtol(p, &q, 10);
      p = q;
    }
  }
  return p;
}

inline void fetch3(const std::vector<float>& src, long idx, long count,
                   float* out) {
  long i = idx > 0 ? idx - 1 : count + idx;
  if (i < 0 || i >= count) {
    out[0] = out[1] = out[2] = 0.0f;
    return;
  }
  out[0] = src[3 * i];
  out[1] = src[3 * i + 1];
  out[2] = src[3 * i + 2];
}

inline void fetch2(const std::vector<float>& src, long idx, long count,
                   float* out) {
  long i = idx > 0 ? idx - 1 : count + idx;
  if (i < 0 || i >= count) {
    out[0] = out[1] = 0.0f;
    return;
  }
  out[0] = src[2 * i];
  out[1] = src[2 * i + 1];
}

}  // namespace

extern "C" {

void* obj_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  // +2: trailing '\n' ends a final unterminated line, trailing '\0' stops
  // strtof/strtol (which treat '\n' as skippable whitespace) from reading
  // past the buffer when that final line ends mid-record.
  std::vector<char> buf(size + 2);
  if (fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    fclose(f);
    return nullptr;
  }
  fclose(f);
  buf[size] = '\n';
  buf[size + 1] = '\0';

  std::vector<float> vs, ts, ns;
  vs.reserve(1 << 16);
  ts.reserve(1 << 16);
  ns.reserve(1 << 16);

  auto* out = new ObjData();
  out->pos.reserve(1 << 18);

  const char* p = buf.data();
  const char* end = buf.data() + size;
  // Face corners of the current polygon (indices).
  std::vector<long> fv, ft, fn;

  while (p < end) {
    const char* line_end = static_cast<const char*>(
        memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    const char* q = skip_ws(p, line_end);

    if (q + 1 < line_end && q[0] == 'v' &&
        (q[1] == ' ' || q[1] == '\t')) {
      float x = 0, y = 0, z = 0;
      const char* r = q + 2;
      if ((r = parse_float(r, line_end, &x)) &&
          (r = parse_float(r, line_end, &y)) &&
          (r = parse_float(r, line_end, &z))) {
        vs.push_back(x);
        vs.push_back(y);
        vs.push_back(z);
      }
    } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 't' &&
               (q[2] == ' ' || q[2] == '\t')) {
      float u = 0, v = 0;
      const char* r = q + 3;
      if ((r = parse_float(r, line_end, &u)) &&
          (r = parse_float(r, line_end, &v))) {
        ts.push_back(u);
        ts.push_back(v);
      }
    } else if (q + 2 < line_end && q[0] == 'v' && q[1] == 'n' &&
               (q[2] == ' ' || q[2] == '\t')) {
      float x = 0, y = 0, z = 0;
      const char* r = q + 3;
      if ((r = parse_float(r, line_end, &x)) &&
          (r = parse_float(r, line_end, &y)) &&
          (r = parse_float(r, line_end, &z))) {
        ns.push_back(x);
        ns.push_back(y);
        ns.push_back(z);
      }
    } else if (q + 1 < line_end && q[0] == 'f' &&
               (q[1] == ' ' || q[1] == '\t')) {
      fv.clear();
      ft.clear();
      fn.clear();
      const char* r = q + 1;
      while (r && r < line_end) {
        r = skip_ws(r, line_end);
        if (r >= line_end) break;
        long vi, ti, ni;
        const char* nxt = parse_corner(r, line_end, &vi, &ti, &ni);
        if (!nxt || nxt == r) break;
        fv.push_back(vi);
        ft.push_back(ti);
        fn.push_back(ni);
        r = nxt;
      }
      const long vcount = static_cast<long>(vs.size() / 3);
      const long tcount = static_cast<long>(ts.size() / 2);
      const long ncount = static_cast<long>(ns.size() / 3);
      // Fan triangulation (preserves winding), flat-normal fallback.
      for (size_t k = 1; k + 1 < fv.size(); ++k) {
        const size_t corners[3] = {0, k, k + 1};
        float tri_pos[9];
        for (int c = 0; c < 3; ++c) {
          fetch3(vs, fv[corners[c]], vcount, tri_pos + 3 * c);
        }
        float fnx = 0, fny = 0, fnz = 0;
        {
          const float ux = tri_pos[3] - tri_pos[0];
          const float uy = tri_pos[4] - tri_pos[1];
          const float uz = tri_pos[5] - tri_pos[2];
          const float wx = tri_pos[6] - tri_pos[0];
          const float wy = tri_pos[7] - tri_pos[1];
          const float wz = tri_pos[8] - tri_pos[2];
          fnx = uy * wz - uz * wy;
          fny = uz * wx - ux * wz;
          fnz = ux * wy - uy * wx;
          const float len = sqrtf(fnx * fnx + fny * fny + fnz * fnz);
          if (len > 1e-20f) {
            fnx /= len;
            fny /= len;
            fnz /= len;
          }
        }
        for (int c = 0; c < 3; ++c) {
          out->pos.insert(out->pos.end(), tri_pos + 3 * c,
                          tri_pos + 3 * c + 3);
          float uvv[2] = {0.0f, 0.0f};
          if (ft[corners[c]] != 0) fetch2(ts, ft[corners[c]], tcount, uvv);
          out->uv.push_back(uvv[0]);
          out->uv.push_back(uvv[1]);
          float nn[3] = {fnx, fny, fnz};
          if (fn[corners[c]] != 0) fetch3(ns, fn[corners[c]], ncount, nn);
          out->nrm.insert(out->nrm.end(), nn, nn + 3);
        }
      }
    }
    p = line_end + 1;
  }
  return out;
}

long obj_counts(void* handle) {
  if (!handle) return 0;
  return static_cast<long>(static_cast<ObjData*>(handle)->pos.size() / 3);
}

void obj_fill(void* handle, float* pos, float* uv, float* nrm) {
  auto* d = static_cast<ObjData*>(handle);
  memcpy(pos, d->pos.data(), d->pos.size() * sizeof(float));
  memcpy(uv, d->uv.data(), d->uv.size() * sizeof(float));
  memcpy(nrm, d->nrm.data(), d->nrm.size() * sizeof(float));
}

void obj_free(void* handle) { delete static_cast<ObjData*>(handle); }

}  // extern "C"
