// Native scan-IO runtime: threaded, prefetching loader for organized
// point-cloud sequences.
//
// The reference's IO path is ROS deserialization on the callback thread
// (sensor_msgs/PointCloud2 -> pcl::fromROSMsg, src/odometry/odom.cc:624)
// with rosbag replay feeding it. Here the equivalent runtime concern —
// keep the accelerator fed without the Python interpreter on the decode
// path — is a small C++ library: it parses PCD v0.7 files (binary or
// ascii, the format the reference round-trips maps through,
// src/odometry/map.cc:177) into fixed-size organized buffers
// (H*W x 3 float32 + validity mask) and prefetches ahead of the consumer
// on a background thread with a bounded ring of slots.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cctype>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <queue>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Scan {
  std::vector<float> xyz;     // H*W*3, NaN rows zeroed
  std::vector<uint8_t> mask;  // H*W
  double stamp = 0.0;
  bool ok = false;
};

struct PcdHeader {
  std::vector<std::string> fields;
  std::vector<int> sizes;
  std::vector<char> types;
  std::vector<int> counts;
  size_t points = 0;
  int width = 0, height = 0;
  std::string data;  // "binary" | "ascii"
  size_t header_end = 0;
};

bool parse_header(std::ifstream& f, PcdHeader& h) {
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string key;
    ss >> key;
    if (key == "FIELDS") {
      std::string v;
      while (ss >> v) h.fields.push_back(v);
    } else if (key == "SIZE") {
      int v;
      while (ss >> v) h.sizes.push_back(v);
    } else if (key == "TYPE") {
      char v;
      while (ss >> v) h.types.push_back(v);
    } else if (key == "COUNT") {
      int v;
      while (ss >> v) h.counts.push_back(v);
    } else if (key == "WIDTH") {
      ss >> h.width;
    } else if (key == "HEIGHT") {
      ss >> h.height;
    } else if (key == "POINTS") {
      ss >> h.points;
    } else if (key == "DATA") {
      ss >> h.data;
      h.header_end = static_cast<size_t>(f.tellg());
      return !h.fields.empty() && h.points > 0;
    }
  }
  return false;
}

// Load one PCD into a fixed H*W organized buffer. Files smaller than the
// buffer are padded invalid; larger ones are truncated.
bool load_pcd(const std::string& path, size_t cap, Scan& out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  PcdHeader h;
  if (!parse_header(f, h)) return false;
  if (h.counts.empty()) h.counts.assign(h.fields.size(), 1);

  int xi = -1, yi = -1, zi = -1;
  size_t stride = 0;
  std::vector<size_t> offsets(h.fields.size());
  for (size_t i = 0; i < h.fields.size(); ++i) {
    offsets[i] = stride;
    stride += static_cast<size_t>(h.sizes[i]) * h.counts[i];
    if (h.fields[i] == "x") xi = static_cast<int>(i);
    if (h.fields[i] == "y") yi = static_cast<int>(i);
    if (h.fields[i] == "z") zi = static_cast<int>(i);
  }
  if (xi < 0 || yi < 0 || zi < 0) return false;

  out.xyz.assign(cap * 3, 0.f);
  out.mask.assign(cap, 0);
  const size_t n = std::min(h.points, cap);

  if (h.data == "binary") {
    std::vector<char> buf(h.points * stride);
    f.read(buf.data(), static_cast<std::streamsize>(buf.size()));
    if (static_cast<size_t>(f.gcount()) < n * stride) return false;
    for (size_t i = 0; i < n; ++i) {
      const char* row = buf.data() + i * stride;
      float p[3];
      std::memcpy(&p[0], row + offsets[xi], 4);
      std::memcpy(&p[1], row + offsets[yi], 4);
      std::memcpy(&p[2], row + offsets[zi], 4);
      const bool valid = std::isfinite(p[0]) && std::isfinite(p[1]) &&
                         std::isfinite(p[2]);
      if (valid) {
        out.xyz[i * 3 + 0] = p[0];
        out.xyz[i * 3 + 1] = p[1];
        out.xyz[i * 3 + 2] = p[2];
        out.mask[i] = 1;
      }
    }
  } else if (h.data == "ascii") {
    size_t total_cols = 0;
    for (size_t i = 0; i < h.fields.size(); ++i) total_cols += h.counts[i];
    size_t cx = 0, cy = 0, cz = 0, col = 0;
    for (size_t i = 0; i < h.fields.size(); ++i) {
      if (static_cast<int>(i) == xi) cx = col;
      if (static_cast<int>(i) == yi) cy = col;
      if (static_cast<int>(i) == zi) cz = col;
      col += h.counts[i];
    }
    std::vector<double> vals(total_cols);
    std::string tok;
    for (size_t i = 0; i < n; ++i) {
      for (size_t c = 0; c < total_cols; ++c) {
        // operator>> rejects "nan"/"inf" in libstdc++; strtod takes them
        if (!(f >> tok)) return i > 0;  // tolerate short files
        vals[c] = std::strtod(tok.c_str(), nullptr);
      }
      const float p[3] = {static_cast<float>(vals[cx]),
                          static_cast<float>(vals[cy]),
                          static_cast<float>(vals[cz])};
      const bool valid = std::isfinite(p[0]) && std::isfinite(p[1]) &&
                         std::isfinite(p[2]);
      if (valid) {
        out.xyz[i * 3 + 0] = p[0];
        out.xyz[i * 3 + 1] = p[1];
        out.xyz[i * 3 + 2] = p[2];
        out.mask[i] = 1;
      }
    }
  } else {
    return false;
  }
  out.ok = true;
  return true;
}

struct Sequence {
  std::vector<std::string> paths;
  std::vector<double> stamps;
  size_t cap = 0;  // H*W

  // bounded prefetch ring
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::queue<Scan> ready;
  size_t max_ready = 4;
  size_t next_to_read = 0;
  std::atomic<bool> stop{false};

  void start() {
    worker = std::thread([this] {
      for (size_t i = 0; i < paths.size() && !stop.load(); ++i) {
        Scan s;
        s.stamp = stamps[i];
        load_pcd(paths[i], cap, s);
        std::unique_lock<std::mutex> lk(mu);
        cv_put.wait(lk, [this] {
          return ready.size() < max_ready || stop.load();
        });
        if (stop.load()) return;
        ready.push(std::move(s));
        cv_get.notify_one();
      }
    });
  }

  bool next(float* xyz, uint8_t* mask, double* stamp) {
    if (next_to_read >= paths.size()) return false;
    Scan s;
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_get.wait(lk, [this] { return !ready.empty() || stop.load(); });
      if (ready.empty()) return false;
      s = std::move(ready.front());
      ready.pop();
      cv_put.notify_one();
    }
    ++next_to_read;
    if (!s.ok) return false;
    std::memcpy(xyz, s.xyz.data(), s.xyz.size() * sizeof(float));
    std::memcpy(mask, s.mask.data(), s.mask.size());
    *stamp = s.stamp;
    return true;
  }

  ~Sequence() {
    stop.store(true);
    cv_put.notify_all();
    cv_get.notify_all();
    if (worker.joinable()) worker.join();
  }
};

}  // namespace

extern "C" {

// paths: '\n'-separated PCD file list; stamps: per-file seconds (may be
// null -> 0,1,2,...). cap = H*W slots per scan.
void* ddlo_seq_open(const char* paths, const double* stamps, int n_paths,
                    int cap, int prefetch) {
  auto* seq = new Sequence();
  seq->cap = static_cast<size_t>(cap);
  seq->max_ready = prefetch > 0 ? static_cast<size_t>(prefetch) : 4;
  std::istringstream ss(paths);
  std::string line;
  while (std::getline(ss, line))
    if (!line.empty()) seq->paths.push_back(line);
  if (static_cast<int>(seq->paths.size()) != n_paths) {
    delete seq;
    return nullptr;
  }
  seq->stamps.resize(seq->paths.size());
  for (size_t i = 0; i < seq->paths.size(); ++i)
    seq->stamps[i] = stamps ? stamps[i] : static_cast<double>(i);
  seq->start();
  return seq;
}

int ddlo_seq_len(void* h) {
  return static_cast<int>(static_cast<Sequence*>(h)->paths.size());
}

// Blocks until the prefetcher has the next scan. Returns 1 on success.
int ddlo_seq_next(void* h, float* xyz, uint8_t* mask, double* stamp) {
  return static_cast<Sequence*>(h)->next(xyz, mask, stamp) ? 1 : 0;
}

void ddlo_seq_close(void* h) { delete static_cast<Sequence*>(h); }

// Binary PCD v0.7 writer — the native counterpart of the reference's
// save_pcd service (pcl::io::savePCDFileBinary, src/odometry/map.cc:177).
// Writes only rows with mask!=0. Returns points written, -1 on error.
int ddlo_save_pcd(const char* path, const float* xyz, const uint8_t* mask,
                  int n) {
  std::ofstream f(path, std::ios::binary);
  if (!f) return -1;
  int kept = 0;
  for (int i = 0; i < n; ++i) kept += mask ? (mask[i] ? 1 : 0) : 1;
  f << "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
    << "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
    << "WIDTH " << kept << "\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
    << "POINTS " << kept << "\nDATA binary\n";
  std::vector<float> buf;
  buf.reserve(static_cast<size_t>(kept) * 3);
  for (int i = 0; i < n; ++i) {
    if (mask && !mask[i]) continue;
    buf.push_back(xyz[3 * i]);
    buf.push_back(xyz[3 * i + 1]);
    buf.push_back(xyz[3 * i + 2]);
  }
  f.write(reinterpret_cast<const char*>(buf.data()),
          static_cast<std::streamsize>(buf.size() * sizeof(float)));
  return f ? kept : -1;
}

// One-shot PCD load (no thread), for tools/tests.
int ddlo_load_pcd(const char* path, int cap, float* xyz, uint8_t* mask) {
  Scan s;
  if (!load_pcd(path, static_cast<size_t>(cap), s)) return -1;
  std::memcpy(xyz, s.xyz.data(), s.xyz.size() * sizeof(float));
  std::memcpy(mask, s.mask.data(), s.mask.size());
  int n = 0;
  for (auto m : s.mask) n += m;
  return n;
}

}  // extern "C"
