// mmio: native I/O kernels for multimodars_tpu.
//
// The reference implementation's file I/O lives in Rust
// (src/intravascular/io/{input,output}.rs); this library provides the
// native-speed equivalents for the TPU rebuild, exposed through a plain C
// ABI consumed via ctypes (no pybind11 in this environment):
//
//   - mm_read_contour_csv: headerless "frame,x,y,z[,aortic]" rows with
//     tab/comma sniffing and malformed-row skipping (input.rs:149-194)
//   - mm_write_obj_mesh: quad-strip OBJ shell with UV/normals/watertight
//     caps (output.rs:10-147), given flat vertex/uv/normal buffers
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmmio.so mmio.cpp

#include <cctype>
#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <limits>
#include <utility>
#include <vector>
#include <string>
#include <vector>

extern "C" {

// Parse a headerless contour CSV. Each valid row yields 5 doubles:
// frame, x, y, z, aortic(0/1). Returns 0 on success; caller frees with
// mm_free. Malformed rows are skipped (counted in *out_skipped).
int mm_read_contour_csv(const char* path, double** out_data, int64_t* out_rows,
                        int64_t* out_skipped) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(static_cast<size_t>(size));
  if (size > 0 && std::fread(&buf[0], 1, static_cast<size_t>(size), f) !=
                      static_cast<size_t>(size)) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);

  // Delimiter sniffing on the first line (input.rs:149-170).
  char delim = ',';
  {
    size_t eol = buf.find('\n');
    std::string first = buf.substr(0, eol == std::string::npos ? buf.size() : eol);
    size_t tabs = 0, commas = 0;
    for (char c : first) {
      if (c == '\t') tabs++;
      if (c == ',') commas++;
    }
    if (tabs > commas) delim = '\t';
  }

  std::vector<double> rows;
  rows.reserve(1 << 16);
  int64_t skipped = 0;

  const char* p = buf.c_str();
  const char* end = p + buf.size();
  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;

    // parse up to 5 fields
    double fields[5] = {0, 0, 0, 0, 0};
    int nfields = 0;
    const char* q = p;
    bool bad = false;
    while (q < line_end && nfields < 5) {
      // skip leading spaces
      while (q < line_end && (*q == ' ' || *q == '\r')) q++;
      const char* field_end = q;
      while (field_end < line_end && *field_end != delim) field_end++;
      if (q == field_end) {
        if (nfields < 4) bad = true;
        break;
      }
      // trim surrounding spaces/tabs/CR for token-exact fields (the
      // Python fallback's str.strip())
      const char* tok_end = field_end;
      while (tok_end > q && (tok_end[-1] == ' ' || tok_end[-1] == '\t' ||
                             tok_end[-1] == '\r'))
        tok_end--;
      while (q < tok_end && (*q == ' ' || *q == '\t')) q++;
      if (nfields == 0) {
        // frame id: non-negative integer only (the reference deserializes
        // u32; '3.0', '-3' and exponents must skip the row, matching the
        // Python fallback's int() + sign check)
        const char* c = q;
        if (c < tok_end && *c == '+') c++;
        if (c == tok_end) {
          bad = true;
          break;
        }
        uint64_t fv = 0;
        for (; c < tok_end; ++c) {
          if (*c < '0' || *c > '9' || fv > 0xFFFFFFFFull) {
            bad = true;
            break;
          }
          fv = fv * 10u + static_cast<uint64_t>(*c - '0');
        }
        if (bad || fv > 0xFFFFFFFFull) {
          bad = true;
          break;
        }
        fields[0] = static_cast<double>(fv);
      } else if (nfields == 4) {
        // aortic flag: exact token "1" or "true" (case-insensitive), like
        // the fallback's strip().lower() in ("true", "1")
        size_t len = static_cast<size_t>(tok_end - q);
        fields[4] = ((len == 1 && *q == '1') ||
                     (len == 4 && strncasecmp(q, "true", 4) == 0))
                        ? 1.0
                        : 0.0;
      } else {
        char* conv_end = nullptr;
        double v = std::strtod(q, &conv_end);
        if (conv_end == q) {
          bad = true;
          break;
        }
        fields[nfields] = v;
      }
      nfields++;
      q = field_end < line_end ? field_end + 1 : line_end;
    }

    bool blank = (line_end == p) || (line_end == p + 1 && *p == '\r');
    if (!blank) {
      if (!bad && nfields >= 4) {
        rows.insert(rows.end(), fields, fields + 5);
      } else {
        skipped++;
      }
    }
    p = line_end + 1;
  }

  int64_t n = static_cast<int64_t>(rows.size() / 5);
  double* data = static_cast<double*>(std::malloc(rows.size() * sizeof(double)));
  if (!data && !rows.empty()) return -3;
  if (!rows.empty()) std::memcpy(data, rows.data(), rows.size() * sizeof(double));
  *out_data = data;
  *out_rows = n;
  *out_skipped = skipped;
  return 0;
}

void mm_free(double* ptr) { std::free(ptr); }

static void write_double(std::string& out, double v) {
  // std::to_chars emits the shortest f64 round-trip form (Ryu) and is
  // several times faster than snprintf("%.17g")
  char tmp[32];
  auto res = std::to_chars(tmp, tmp + sizeof(tmp), v);
  if (res.ec == std::errc()) {
    out.append(tmp, static_cast<size_t>(res.ptr - tmp));
  } else {
    int len = std::snprintf(tmp, sizeof(tmp), "%.17g", v);
    out.append(tmp, static_cast<size_t>(len));
  }
}

// Write a quad-strip OBJ shell (output.rs:10-147).
//
// vertices: n_contours * points_per_contour * 3 doubles
// uvs:      n_contours * points_per_contour * 2 doubles
// normals:  n_contours * points_per_contour * 3 doubles
// centroids: n_contours * 3 doubles (used for watertight end caps)
int mm_write_obj_mesh(const char* path, const char* mtl_filename,
                      const double* vertices, const double* uvs,
                      const double* normals, const double* centroids,
                      int64_t n_contours, int64_t points_per_contour,
                      int watertight) {
  if (n_contours < 2 || points_per_contour < 1) return -1;
  std::string out;
  out.reserve(static_cast<size_t>(n_contours * points_per_contour) * 96);

  const int64_t total = n_contours * points_per_contour;
  for (int64_t i = 0; i < total; i++) {
    out += "v ";
    write_double(out, vertices[i * 3]);
    out += ' ';
    write_double(out, vertices[i * 3 + 1]);
    out += ' ';
    write_double(out, vertices[i * 3 + 2]);
    out += '\n';
  }

  out += "mtllib ";
  out += mtl_filename;
  out += "\nusemtl displacement_material\n";

  for (int64_t i = 0; i < total; i++) {
    out += "vt ";
    write_double(out, uvs[i * 2]);
    out += ' ';
    write_double(out, uvs[i * 2 + 1]);
    out += '\n';
  }
  for (int64_t i = 0; i < total; i++) {
    out += "vn ";
    write_double(out, normals[i * 3]);
    out += ' ';
    write_double(out, normals[i * 3 + 1]);
    out += ' ';
    write_double(out, normals[i * 3 + 2]);
    out += '\n';
  }

  char tmp[160];
  for (int64_t c = 0; c < n_contours - 1; c++) {
    int64_t o1 = c * points_per_contour + 1;
    int64_t o2 = (c + 1) * points_per_contour + 1;
    for (int64_t j = 0; j < points_per_contour; j++) {
      int64_t jn = (j + 1) % points_per_contour;
      long long v1 = o1 + j, v2 = o1 + jn, v3 = o2 + j;
      int len = std::snprintf(tmp, sizeof(tmp),
                              "f %lld/%lld/%lld %lld/%lld/%lld %lld/%lld/%lld\n",
                              v1, v1, v1, v2, v2, v2, v3, v3, v3);
      out.append(tmp, static_cast<size_t>(len));
      long long w1 = o2 + j, w2 = o1 + jn, w3 = o2 + jn;
      len = std::snprintf(tmp, sizeof(tmp),
                          "f %lld/%lld/%lld %lld/%lld/%lld %lld/%lld/%lld\n",
                          w1, w1, w1, w2, w2, w2, w3, w3, w3);
      out.append(tmp, static_cast<size_t>(len));
    }
  }

  if (watertight) {
    long long proximal_idx = total + 1;
    long long distal_idx = total + 2;
    const double* c0 = centroids;
    const double* cn = centroids + (n_contours - 1) * 3;
    out += "v ";
    write_double(out, c0[0]);
    out += ' ';
    write_double(out, c0[1]);
    out += ' ';
    write_double(out, c0[2]);
    out += "\nvt 0.5 0.5\nvn 0.0 0.0 -1.0\n";
    out += "v ";
    write_double(out, cn[0]);
    out += ' ';
    write_double(out, cn[1]);
    out += ' ';
    write_double(out, cn[2]);
    out += "\nvt 0.5 0.5\nvn 0.0 0.0 1.0\n";

    for (int64_t i = 0; i < points_per_contour; i++) {
      int64_t ni = (i + 1) % points_per_contour;
      long long v1 = 1 + i, v2 = 1 + ni, v3 = proximal_idx;
      int len = std::snprintf(tmp, sizeof(tmp),
                              "f %lld/%lld/%lld %lld/%lld/%lld %lld/%lld/%lld\n",
                              v1, v1, v1, v2, v2, v2, v3, v3, v3);
      out.append(tmp, static_cast<size_t>(len));
    }
    int64_t last_off = (n_contours - 1) * points_per_contour + 1;
    for (int64_t i = 0; i < points_per_contour; i++) {
      int64_t ni = (i + 1) % points_per_contour;
      long long v1 = last_off + i, v2 = last_off + ni, v3 = distal_idx;
      int len = std::snprintf(tmp, sizeof(tmp),
                              "f %lld/%lld/%lld %lld/%lld/%lld %lld/%lld/%lld\n",
                              v3, v3, v3, v2, v2, v2, v1, v1, v1);
      out.append(tmp, static_cast<size_t>(len));
    }
  }

  FILE* f = std::fopen(path, "wb");
  if (!f) return -2;
  size_t written = std::fwrite(out.data(), 1, out.size(), f);
  std::fclose(f);
  return written == out.size() ? 0 : -3;
}


// Moller-Trumbore occlusion scan: for every ray (origin -> direction), count
// triangle hits (t > eps, barycentric bounds inclusive) and record the face
// index of the nearest hit.  Scalar early-outs beat vectorized evaluation on
// the mostly-missing triangle population.  Mirrors the Python/JAX kernel
// (u/v in [0,1], u+v <= 1, t > 1e-8).
void mm_ray_occlusion(const double* origins, const double* directions,
                      int64_t n_rays, const double* tris, int64_t n_faces,
                      int64_t* out_hits, int64_t* out_closest) {
  const double eps = 1e-8;
  for (int64_t r = 0; r < n_rays; r++) {
    const double ox = origins[r * 3], oy = origins[r * 3 + 1], oz = origins[r * 3 + 2];
    const double dx = directions[r * 3], dy = directions[r * 3 + 1], dz = directions[r * 3 + 2];
    int64_t hits = 0;
    int64_t closest = 0;
    double best_t = 1.0 / 0.0;
    for (int64_t f = 0; f < n_faces; f++) {
      const double* t0 = tris + f * 9;
      const double e1x = t0[3] - t0[0], e1y = t0[4] - t0[1], e1z = t0[5] - t0[2];
      const double e2x = t0[6] - t0[0], e2y = t0[7] - t0[1], e2z = t0[8] - t0[2];
      const double hx = dy * e2z - dz * e2y;
      const double hy = dz * e2x - dx * e2z;
      const double hz = dx * e2y - dy * e2x;
      const double a = e1x * hx + e1y * hy + e1z * hz;
      if (a > -eps && a < eps) continue;
      const double finv = 1.0 / a;
      const double sx = ox - t0[0], sy = oy - t0[1], sz = oz - t0[2];
      const double u = finv * (sx * hx + sy * hy + sz * hz);
      if (u < 0.0 || u > 1.0) continue;
      const double qx = sy * e1z - sz * e1y;
      const double qy = sz * e1x - sx * e1z;
      const double qz = sx * e1y - sy * e1x;
      const double v = finv * (dx * qx + dy * qy + dz * qz);
      if (v < 0.0 || u + v > 1.0) continue;
      const double t = finv * (e2x * qx + e2y * qy + e2z * qz);
      if (t <= eps) continue;
      hits++;
      if (t < best_t) {
        best_t = t;
        closest = f;
      }
    }
    out_hits[r] = hits;
    out_closest[r] = closest;
  }
}


// Grid-accelerated variant: triangles are binned into a uniform grid by
// their bounding boxes; each ray walks its cells with a 3D-DDA and tests
// only local candidates (deduplicated with a per-ray stamp).  Semantics
// identical to mm_ray_occlusion.
void mm_ray_occlusion_grid(const double* origins, const double* directions,
                           int64_t n_rays, const double* tris, int64_t n_faces,
                           int64_t* out_hits, int64_t* out_closest) {
  const double eps = 1e-8;
  // triangle bounds + global bbox
  std::vector<double> tmin(n_faces * 3), tmax(n_faces * 3);
  double gmin[3] = {1e300, 1e300, 1e300}, gmax[3] = {-1e300, -1e300, -1e300};
  for (int64_t f = 0; f < n_faces; f++) {
    for (int k = 0; k < 3; k++) {
      double a = tris[f * 9 + k], b = tris[f * 9 + 3 + k], c = tris[f * 9 + 6 + k];
      double lo = a < b ? (a < c ? a : c) : (b < c ? b : c);
      double hi = a > b ? (a > c ? a : c) : (b > c ? b : c);
      tmin[f * 3 + k] = lo;
      tmax[f * 3 + k] = hi;
      if (lo < gmin[k]) gmin[k] = lo;
      if (hi > gmax[k]) gmax[k] = hi;
    }
  }
  int G = (int)std::cbrt((double)n_faces / 4.0);
  if (G < 4) G = 4;
  if (G > 96) G = 96;
  double cell[3], inv_cell[3];
  for (int k = 0; k < 3; k++) {
    double span = gmax[k] - gmin[k];
    if (span <= 0) span = 1e-9;
    gmin[k] -= span * 1e-6;
    gmax[k] += span * 1e-6;
    cell[k] = (gmax[k] - gmin[k]) / G;
    inv_cell[k] = 1.0 / cell[k];
  }
  auto cell_of = [&](double x, int k) {
    int c = (int)((x - gmin[k]) * inv_cell[k]);
    if (c < 0) c = 0;
    if (c >= G) c = G - 1;
    return c;
  };
  const int64_t n_cells = (int64_t)G * G * G;
  std::vector<int64_t> counts(n_cells + 1, 0);
  std::vector<int> c0(n_faces * 3), c1(n_faces * 3);
  for (int64_t f = 0; f < n_faces; f++) {
    int64_t span = 1;
    for (int k = 0; k < 3; k++) {
      c0[f * 3 + k] = cell_of(tmin[f * 3 + k], k);
      c1[f * 3 + k] = cell_of(tmax[f * 3 + k], k);
      span *= (c1[f * 3 + k] - c0[f * 3 + k] + 1);
    }
    for (int x = c0[f * 3]; x <= c1[f * 3]; x++)
      for (int y = c0[f * 3 + 1]; y <= c1[f * 3 + 1]; y++)
        for (int z = c0[f * 3 + 2]; z <= c1[f * 3 + 2]; z++)
          counts[((int64_t)x * G + y) * G + z + 1]++;
    (void)span;
  }
  for (int64_t i = 0; i < n_cells; i++) counts[i + 1] += counts[i];
  if (counts[n_cells] > n_faces * 24) {
    // triangles span too many cells (degenerate/huge faces) — the grid
    // would not pay off; use the plain scan
    mm_ray_occlusion(origins, directions, n_rays, tris, n_faces, out_hits,
                     out_closest);
    return;
  }
  std::vector<int64_t> items(counts[n_cells]);
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  for (int64_t f = 0; f < n_faces; f++) {
    for (int x = c0[f * 3]; x <= c1[f * 3]; x++)
      for (int y = c0[f * 3 + 1]; y <= c1[f * 3 + 1]; y++)
        for (int z = c0[f * 3 + 2]; z <= c1[f * 3 + 2]; z++)
          items[cursor[((int64_t)x * G + y) * G + z]++] = f;
  }

  std::vector<int64_t> stamp(n_faces, -1);
  for (int64_t r = 0; r < n_rays; r++) {
    const double ox = origins[r * 3], oy = origins[r * 3 + 1], oz = origins[r * 3 + 2];
    const double dx = directions[r * 3], dy = directions[r * 3 + 1], dz = directions[r * 3 + 2];
    int64_t hits = 0;
    int64_t closest = 0;
    double best_t = 1.0 / 0.0;
    const double o[3] = {ox, oy, oz}, d[3] = {dx, dy, dz};

    // clip the t>0 half-line against the global bbox
    double t_enter = 0.0, t_exit = 1e300;
    bool miss = false;
    for (int k = 0; k < 3; k++) {
      if (d[k] == 0.0) {
        if (o[k] < gmin[k] || o[k] > gmax[k]) { miss = true; break; }
      } else {
        double ta = (gmin[k] - o[k]) / d[k];
        double tb = (gmax[k] - o[k]) / d[k];
        if (ta > tb) { double tmp = ta; ta = tb; tb = tmp; }
        if (ta > t_enter) t_enter = ta;
        if (tb < t_exit) t_exit = tb;
      }
    }
    if (miss || t_enter > t_exit) { out_hits[r] = 0; out_closest[r] = 0; continue; }

    double px = ox + dx * t_enter, py = oy + dy * t_enter, pz = oz + dz * t_enter;
    int cx = cell_of(px, 0), cy = cell_of(py, 1), cz = cell_of(pz, 2);
    int sx = dx > 0 ? 1 : -1, sy = dy > 0 ? 1 : -1, sz = dz > 0 ? 1 : -1;
    auto next_boundary = [&](int c, int k, int s) {
      return gmin[k] + cell[k] * (c + (s > 0 ? 1 : 0));
    };
    double tx_next = dx != 0.0 ? (next_boundary(cx, 0, sx) - ox) / dx : 1e300;
    double ty_next = dy != 0.0 ? (next_boundary(cy, 1, sy) - oy) / dy : 1e300;
    double tz_next = dz != 0.0 ? (next_boundary(cz, 2, sz) - oz) / dz : 1e300;
    double tx_step = dx != 0.0 ? cell[0] / (dx * sx) : 1e300;
    double ty_step = dy != 0.0 ? cell[1] / (dy * sy) : 1e300;
    double tz_step = dz != 0.0 ? cell[2] / (dz * sz) : 1e300;

    while (true) {
      const int64_t base = ((int64_t)cx * G + cy) * G + cz;
      for (int64_t ii = counts[base]; ii < counts[base + 1]; ii++) {
        const int64_t f = items[ii];
        if (stamp[f] == r) continue;
        stamp[f] = r;
        const double* t0 = tris + f * 9;
        const double e1x = t0[3] - t0[0], e1y = t0[4] - t0[1], e1z = t0[5] - t0[2];
        const double e2x = t0[6] - t0[0], e2y = t0[7] - t0[1], e2z = t0[8] - t0[2];
        const double hx = dy * e2z - dz * e2y;
        const double hy = dz * e2x - dx * e2z;
        const double hz = dx * e2y - dy * e2x;
        const double a = e1x * hx + e1y * hy + e1z * hz;
        if (a > -eps && a < eps) continue;
        const double finv = 1.0 / a;
        const double sxv = ox - t0[0], syv = oy - t0[1], szv = oz - t0[2];
        const double u = finv * (sxv * hx + syv * hy + szv * hz);
        if (u < 0.0 || u > 1.0) continue;
        const double qx = syv * e1z - szv * e1y;
        const double qy = szv * e1x - sxv * e1z;
        const double qz = sxv * e1y - syv * e1x;
        const double v = finv * (dx * qx + dy * qy + dz * qz);
        if (v < 0.0 || u + v > 1.0) continue;
        const double t = finv * (e2x * qx + e2y * qy + e2z * qz);
        if (t <= eps) continue;
        hits++;
        if (t < best_t || (t == best_t && f < closest)) { best_t = t; closest = f; }
      }
      // advance DDA
      if (tx_next <= ty_next && tx_next <= tz_next) {
        if (tx_next > t_exit) break;
        cx += sx; if (cx < 0 || cx >= G) break; tx_next += tx_step;
      } else if (ty_next <= tz_next) {
        if (ty_next > t_exit) break;
        cy += sy; if (cy < 0 || cy >= G) break; ty_next += ty_step;
      } else {
        if (tz_next > t_exit) break;
        cz += sz; if (cz < 0 || cz >= G) break; tz_next += tz_step;
      }
    }
    out_hits[r] = hits;
    out_closest[r] = closest;
  }
}


// Winding-consistency BFS (port of trimesh.repair.fix_winding, matching the
// Python implementation in ccta/mesh.py exactly): manifold edges pair faces;
// BFS from each unvisited face flips neighbours traversing a shared edge in
// the same direction.  Adjacency insertion order = undirected-edge-key sort
// order, so flip decisions match the Python BFS bit for bit.
struct WindEdge { int64_t key; int64_t fi; int64_t u; int64_t v; };

// Shared pair/adjacency/BFS tail over edges already sorted by undirected
// key.  Pair-internal order is irrelevant (both adjacency entries of a
// pair are written symmetrically to per-face slots), and the pair sequence
// follows the key order, so any sort that groups equal keys contiguously
// in ascending order yields identical flips.
static void winding_bfs_sorted(const std::vector<WindEdge>& edges,
                               int64_t n_faces, uint8_t* out_flipped) {
  const int64_t n_edges = (int64_t)edges.size();
  struct Nb { int64_t fb; int64_t ua, va, ub, vb; };
  std::vector<int64_t> deg(n_faces + 1, 0);
  std::vector<std::pair<WindEdge, WindEdge>> pairs;
  pairs.reserve(n_edges / 2);
  for (int64_t i = 0; i < n_edges;) {
    int64_t j = i + 1;
    while (j < n_edges && edges[j].key == edges[i].key) j++;
    if (j - i == 2) {
      pairs.push_back({edges[i], edges[i + 1]});
      deg[edges[i].fi + 1]++;
      deg[edges[i + 1].fi + 1]++;
    }
    i = j;
  }
  for (int64_t f = 0; f < n_faces; f++) deg[f + 1] += deg[f];
  std::vector<Nb> adj(pairs.size() * 2);
  std::vector<int64_t> cur(deg.begin(), deg.end() - 1);
  for (const auto& pr : pairs) {
    const WindEdge& ea = pr.first;
    const WindEdge& eb = pr.second;
    adj[cur[ea.fi]++] = {eb.fi, ea.u, ea.v, eb.u, eb.v};
    adj[cur[eb.fi]++] = {ea.fi, eb.u, eb.v, ea.u, ea.v};
  }

  std::vector<uint8_t> visited(n_faces, 0);
  std::vector<int64_t> queue(n_faces);
  for (int64_t f = 0; f < n_faces; f++) out_flipped[f] = 0;
  for (int64_t start = 0; start < n_faces; start++) {
    if (visited[start]) continue;
    visited[start] = 1;
    int64_t qh = 0, qt = 0;
    queue[qt++] = start;
    while (qh < qt) {
      const int64_t current = queue[qh++];
      for (int64_t i = deg[current]; i < deg[current + 1]; i++) {
        const Nb& nb = adj[i];
        if (visited[nb.fb]) continue;
        const int64_t cur_start = out_flipped[current] ? nb.va : nb.ua;
        if (cur_start == nb.ub) out_flipped[nb.fb] = 1;
        visited[nb.fb] = 1;
        queue[qt++] = nb.fb;
      }
    }
  }
}

void mm_fix_winding(const int64_t* faces, int64_t n_faces, uint8_t* out_flipped) {
  if (n_faces == 0) return;
  const int64_t n_edges = n_faces * 3;
  std::vector<WindEdge> edges(n_edges);
  int64_t n_verts = 0;
  for (int64_t i = 0; i < n_edges; i++) {
    int64_t m = faces[i];
    if (m + 1 > n_verts) n_verts = m + 1;
  }
  for (int64_t f = 0; f < n_faces; f++) {
    const int64_t a = faces[f * 3], b = faces[f * 3 + 1], c = faces[f * 3 + 2];
    const int64_t uv[3][2] = {{a, b}, {b, c}, {c, a}};
    for (int k = 0; k < 3; k++) {
      int64_t u = uv[k][0], v = uv[k][1];
      int64_t lo = u < v ? u : v, hi = u < v ? v : u;
      edges[f * 3 + k] = {lo * n_verts + hi, f, u, v};
    }
  }
  std::stable_sort(edges.begin(), edges.end(),
                   [](const WindEdge& x, const WindEdge& y) { return x.key < y.key; });
  winding_bfs_sorted(edges, n_faces, out_flipped);
}

// Sort-free variant: ``order`` is the caller's argsort of the undirected
// edge keys in BLOCK slot layout (slot = k * n_faces + f for edge k of
// face f, the layout of Mesh.edges / _edge_keys_sorted) — the sort the
// Python side has usually already paid for (and caches).  Recomputing the
// key per slot is O(n); equal keys are contiguous in ``order`` for any
// injective packing, so the BFS tail sees the identical pair sequence.
void mm_fix_winding_ordered(const int64_t* faces, int64_t n_faces,
                            const int64_t* order, uint8_t* out_flipped) {
  if (n_faces == 0) return;
  const int64_t n_edges = n_faces * 3;
  int64_t n_verts = 0;
  for (int64_t i = 0; i < n_edges; i++) {
    int64_t m = faces[i];
    if (m + 1 > n_verts) n_verts = m + 1;
  }
  std::vector<WindEdge> edges(n_edges);
  for (int64_t i = 0; i < n_edges; i++) {
    const int64_t s = order[i];
    const int64_t k = s / n_faces, f = s % n_faces;
    const int64_t u = faces[f * 3 + k];
    const int64_t v = faces[f * 3 + (k + 1) % 3];
    const int64_t lo = u < v ? u : v, hi = u < v ? v : u;
    edges[i] = {lo * n_verts + hi, f, u, v};
  }
  winding_bfs_sorted(edges, n_faces, out_flipped);
}

// ---------------------------------------------------------------------------
// Alignment-epilogue kernels
//
// Native mirrors of the numpy hot loops in the single-pullback finish path
// (TensorGeometry.finish_transform and pipelines.align_within._wall_tensor;
// reference semantics: align_within.rs:24-171 epilogue + wall.rs:52-100).
// On the single-core benchmark host the fused one-pass C loops replace four
// full-array numpy passes plus their freshly-faulted temporaries, which is
// where most of the epilogue wall-clock went.
//
// Bit-exactness contract (asserted by tests/test_native_finish.py): every
// floating expression reproduces the numpy evaluation order exactly —
// xp = ((x0*ct) - (y0*st) + cx) + dx etc. — and the build disables FP
// contraction (-ffp-contract=off in the Makefile) so no FMA changes the
// rounding.  The wall centroid uses numpy's strided-mean order (sequential
// over points, starting from +0.0).

// Fused per-frame rotate-about-centroid + translate (+ optional CCW start
// roll) over one [F, N, 3] C-contiguous coordinate block.
//   ct/st: cos/sin of the per-frame total angle [F]
//   cx/cy: per-frame pivot (pre-transform frame centroid) [F]
//   dx/dy/dz: per-frame translation [F] (dz ignored unless add_z)
//   do_roll: re-establish the last-highest-Y start convention; requires z
//            constant within each frame (caller-verified); roll_start[f]
//            receives the roll offset so the caller can permute per-point
//            metadata.  NaN coordinates are caller-excluded (funnel-built
//            geometries are finite).
// out may alias xyz only when do_roll == 0.
void mm_finish_roll(const double* xyz, const double* ct, const double* st,
                    const double* cx, const double* cy,
                    const double* dx, const double* dy, const double* dz,
                    int add_z, int do_roll,
                    double* out, int64_t* roll_start,
                    int64_t F, int64_t N) {
  if (N <= 0) {
    if (roll_start)
      for (int64_t f = 0; f < F; ++f) roll_start[f] = 0;
    return;
  }
  std::vector<double> xp(static_cast<size_t>(N));
  std::vector<double> yp(static_cast<size_t>(N));
  for (int64_t f = 0; f < F; ++f) {
    const double* in = xyz + f * N * 3;
    double* o = out + f * N * 3;
    const double c = ct[f], s = st[f], px = cx[f], py = cy[f];
    const double tx = dx[f], ty = dy[f];
    for (int64_t i = 0; i < N; ++i) {
      const double x0 = in[3 * i] - px;
      const double y0 = in[3 * i + 1] - py;
      xp[i] = ((x0 * c) - (y0 * s) + px) + tx;
      yp[i] = ((x0 * s) + (y0 * c) + py) + ty;
    }
    if (do_roll) {
      // last index of the maximum (numpy: n-1-argmax(y[::-1]))
      int64_t start = N - 1;
      double best = yp[start];
      for (int64_t i = N - 2; i >= 0; --i)
        if (yp[i] > best) { best = yp[i]; start = i; }
      if (roll_start) roll_start[f] = start;
      const double zc = in[2];  // constant per frame (caller-verified)
      const double z = add_z ? zc + dz[f] : zc;
      int64_t j = start;
      for (int64_t i = 0; i < N; ++i) {
        o[3 * i] = xp[j];
        o[3 * i + 1] = yp[j];
        o[3 * i + 2] = z;
        if (++j == N) j = 0;
      }
    } else {
      if (roll_start) roll_start[f] = 0;
      const double tz = add_z ? dz[f] : 0.0;
      for (int64_t i = 0; i < N; ++i) {
        o[3 * i] = xp[i];
        o[3 * i + 1] = yp[i];
        o[3 * i + 2] = in[3 * i + 2] + tz;
      }
    }
  }
}

// Farthest point pair, 3-D, exact reference scan order (contour.rs:227-242):
// i outer, j inner (j > i), strictly-greater comparison so the FIRST pair
// attaining the maximum wins.  Distances are computed directly per pair
// (no Gram-form cancellation).
void mm_farthest_pair(const double* xyz, int64_t n,
                      int64_t* out_i, int64_t* out_j, double* out_d2) {
  int64_t bi = 0, bj = 0;
  double best = -1.0;
  for (int64_t i = 0; i < n; ++i) {
    const double xi = xyz[3 * i], yi = xyz[3 * i + 1], zi = xyz[3 * i + 2];
    for (int64_t j = i + 1; j < n; ++j) {
      const double dx = xi - xyz[3 * j];
      const double dy = yi - xyz[3 * j + 1];
      const double dz = zi - xyz[3 * j + 2];
      const double d2 = ((dx * dx) + (dy * dy)) + (dz * dz);
      if (d2 > best) { best = d2; bi = i; bj = j; }
    }
  }
  *out_i = bi;
  *out_j = bj;
  *out_d2 = best < 0.0 ? 0.0 : best;
}

// Radial 1 mm wall offset (wall.rs:52-100 2-D reduction): out = src +
// rel/|rel| per point about the freshly recomputed per-frame centroid,
// zero offset for degenerate radii (|rel| <= DBL_EPSILON).  centroids
// receives the [F, 3] per-frame means (numpy strided-mean order).
void mm_wall_offset(const double* src, double* out, double* centroids,
                    int64_t F, int64_t N) {
  const double eps = 2.2204460492503131e-16;  // np.finfo(np.float64).eps
  for (int64_t f = 0; f < F; ++f) {
    const double* in = src + f * N * 3;
    double* o = out + f * N * 3;
    double sx = 0.0, sy = 0.0, sz = 0.0;
    for (int64_t i = 0; i < N; ++i) {
      sx += in[3 * i];
      sy += in[3 * i + 1];
      sz += in[3 * i + 2];
    }
    const double nd = static_cast<double>(N);
    const double cxm = sx / nd, cym = sy / nd, czm = sz / nd;
    centroids[3 * f] = cxm;
    centroids[3 * f + 1] = cym;
    centroids[3 * f + 2] = czm;
    for (int64_t i = 0; i < N; ++i) {
      const double relx = in[3 * i] - cxm;
      const double rely = in[3 * i + 1] - cym;
      const double len = std::sqrt((relx * relx) + (rely * rely));
      const double scale = (len > eps) ? (1.0 / len) : 0.0;
      o[3 * i] = in[3 * i] + (relx * scale);
      o[3 * i + 1] = in[3 * i + 1] + (rely * scale);
      o[3 * i + 2] = in[3 * i + 2];
    }
  }
}

}  // extern "C"

// Exact f64 per-row nearest neighbour against a small column set — the
// native form of kernels._min_sqdist_host's column sweep: the first j
// strictly below the running best wins (numpy's `d < best` update), and
// the squared distance uses the identical ((dx*dx)+(dy*dy))+(dz*dz)
// summation order (the build disables FP contraction).
extern "C" void mm_min_sqdist_cols(const double* a, int64_t n,
                                   const double* b, int64_t m,
                                   double* out_d2, int64_t* out_j) {
  for (int64_t i = 0; i < n; ++i) {
    const double ax = a[3 * i], ay = a[3 * i + 1], az = a[3 * i + 2];
    double best = std::numeric_limits<double>::infinity();
    int64_t bj = 0;
    for (int64_t j = 0; j < m; ++j) {
      const double dx = ax - b[3 * j];
      const double dy = ay - b[3 * j + 1];
      const double dz = az - b[3 * j + 2];
      const double d2 = ((dx * dx) + (dy * dy)) + (dz * dz);
      if (d2 < best) { best = d2; bj = j; }
    }
    out_d2[i] = best;
    out_j[i] = bj;
  }
}

// CCW contour sort: per frame, stable argsort of the caller-computed point
// angles (numpy semantics: NaN sorts last, equal keys keep original order),
// rolled so the LAST highest-y point lands at index 0, with the permuted
// coordinates written in one gather.
//   ang   [F, N] f64 angles (np.arctan2 of the centered points — computed
//         by the caller so the transcendental matches numpy bit for bit)
//   xyz   [F, N, 3] f64 C-contiguous coordinates
//   out   [F, N, 3] permuted coordinates (must not alias xyz)
//   order [F, N] the final permutation (sorted-then-rolled original
//         indices) for the caller's per-point metadata
extern "C" void mm_ccw_sort(const double* xyz, const double* ang,
                            double* out, int64_t* order,
                            int64_t F, int64_t N) {
  if (N <= 0) return;
  std::vector<int64_t> idx(static_cast<size_t>(N));
  for (int64_t f = 0; f < F; ++f) {
    const double* a = ang + f * N;
    const double* in = xyz + f * N * 3;
    double* o = out + f * N * 3;
    int64_t* ord = order + f * N;
    for (int64_t i = 0; i < N; ++i) idx[i] = i;
    // numpy 'stable' order: NaN greater than everything, ties keep input
    // order (std::stable_sort + this strict-weak comparator replicates it)
    std::stable_sort(idx.begin(), idx.end(), [a](int64_t i, int64_t j) {
      const double ai = a[i], aj = a[j];
      if (ai != ai) return false;        // NaN is never less
      if (aj != aj) return true;         // finite < NaN
      return ai < aj;
    });
    // last index of the maximum sorted y (numpy: n-1-argmax(y[::-1]))
    int64_t start = N - 1;
    double best = in[3 * idx[start] + 1];
    for (int64_t i = N - 2; i >= 0; --i) {
      const double yi = in[3 * idx[i] + 1];
      if (yi > best) { best = yi; start = i; }
    }
    int64_t j = start;
    for (int64_t i = 0; i < N; ++i) {
      const int64_t src = idx[j];
      ord[i] = src;
      o[3 * i] = in[3 * src];
      o[3 * i + 1] = in[3 * src + 1];
      o[3 * i + 2] = in[3 * src + 2];
      if (++j == N) j = 0;
    }
  }
}
