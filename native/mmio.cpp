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
      if (nfields == 4) {
        // aortic flag: "true"/"1"
        fields[4] = (strncasecmp(q, "true", 4) == 0 || *q == '1') ? 1.0 : 0.0;
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

}  // extern "C"
