// fastloader: multithreaded .npz (zip + deflate + .npy) decoder with a
// prefetch ring, exposed through a C ABI for ctypes.
//
// Role: the GAN input pipeline reads one compressed per-image npz per sample
// (pseudo-ground-truth cache; reference reads them with numpy inside torch
// DataLoader worker *processes*, code/data/abstract_dataset.py:68-81).  In
// this framework the host side is Python threads, where zlib inflation of
// ~1-4 MB per item serializes on the GIL; this native pool decodes in
// parallel and hands back raw buffers.
//
// Supports the subset of the formats the caches use: zip entries that are
// stored (method 0) or deflated (method 8, raw), containing .npy v1/v2
// files of little-endian numeric dtypes, C-contiguous.  Object arrays
// (pickled dicts) are returned as raw bytes for Python-side unpickling.
//
// Build: native/build.sh  ->  im23d_tpu/data/_fastloader.so

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Buffer {
  std::vector<uint8_t> data;
};

struct Entry {
  std::string name;
  uint64_t comp_size = 0;
  uint64_t raw_size = 0;
  uint16_t method = 0;
  uint64_t offset = 0;  // file offset of the local header
};

bool read_file(const std::string& path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = fread(out.data(), 1, out.size(), f);
  fclose(f);
  return got == out.size();
}

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

// Parse the zip central directory into entries.
bool parse_zip(const std::vector<uint8_t>& file, std::vector<Entry>& entries) {
  if (file.size() < 22) return false;
  // find EOCD (scan back for signature 0x06054b50)
  size_t eocd = std::string::npos;
  size_t lo = file.size() >= 65558 ? file.size() - 65558 : 0;
  for (size_t i = file.size() - 22 + 1; i-- > lo;) {
    if (rd32(&file[i]) == 0x06054b50) {
      eocd = i;
      break;
    }
  }
  if (eocd == std::string::npos) return false;
  uint16_t n_entries = rd16(&file[eocd + 10]);
  uint32_t cd_offset = rd32(&file[eocd + 16]);
  size_t p = cd_offset;
  for (int i = 0; i < n_entries; ++i) {
    if (p + 46 > file.size() || rd32(&file[p]) != 0x02014b50) return false;
    Entry e;
    e.method = rd16(&file[p + 10]);
    e.comp_size = rd32(&file[p + 20]);
    e.raw_size = rd32(&file[p + 24]);
    uint16_t name_len = rd16(&file[p + 28]);
    uint16_t extra_len = rd16(&file[p + 30]);
    uint16_t comment_len = rd16(&file[p + 32]);
    e.offset = rd32(&file[p + 42]);
    e.name.assign(reinterpret_cast<const char*>(&file[p + 46]), name_len);
    entries.push_back(std::move(e));
    p += 46 + name_len + extra_len + comment_len;
  }
  return true;
}

// Decompress one entry into out (raw .npy bytes).
bool extract_entry(const std::vector<uint8_t>& file, const Entry& e,
                   std::vector<uint8_t>& out) {
  size_t p = e.offset;
  if (p + 30 > file.size() || rd32(&file[p]) != 0x04034b50) return false;
  uint16_t name_len = rd16(&file[p + 26]);
  uint16_t extra_len = rd16(&file[p + 28]);
  size_t data_off = p + 30 + name_len + extra_len;
  if (data_off + e.comp_size > file.size()) return false;
  if (e.method == 0) {
    out.assign(file.begin() + data_off, file.begin() + data_off + e.raw_size);
    return true;
  }
  if (e.method != 8) return false;
  out.resize(e.raw_size);
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;  // raw deflate
  zs.next_in = const_cast<Bytef*>(file.data() + data_off);
  zs.avail_in = static_cast<uInt>(e.comp_size);
  zs.next_out = out.data();
  zs.avail_out = static_cast<uInt>(out.size());
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END;
}

struct Job {
  int64_t ticket;
  std::string path;
};

struct Result {
  // concatenated raw npy payloads + an index (name -> offset/size)
  std::vector<uint8_t> blob;
  std::string index;  // lines: name\toffset\tsize\n
  bool ok = false;
};

class Pool {
 public:
  explicit Pool(int n_threads) : stop_(false) {
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { worker(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> g(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  int64_t submit(const char* path) {
    std::lock_guard<std::mutex> g(mu_);
    int64_t t = next_ticket_++;
    jobs_.push_back(Job{t, path});
    cv_.notify_one();
    return t;
  }

  Result* wait(int64_t ticket) {
    std::unique_lock<std::mutex> g(mu_);
    done_cv_.wait(g, [&] { return results_.count(ticket) > 0; });
    Result* r = results_[ticket];
    results_.erase(ticket);
    return r;
  }

 private:
  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> g(mu_);
        cv_.wait(g, [&] { return stop_ || !jobs_.empty(); });
        if (stop_ && jobs_.empty()) return;
        job = jobs_.front();
        jobs_.pop_front();
      }
      Result* r = new Result();
      process(job.path, *r);
      {
        std::lock_guard<std::mutex> g(mu_);
        results_[job.ticket] = r;
      }
      done_cv_.notify_all();
    }
  }

  static void process(const std::string& path, Result& r) {
    std::vector<uint8_t> file;
    if (!read_file(path, file)) return;
    std::vector<Entry> entries;
    if (!parse_zip(file, entries)) return;
    char line[512];
    for (const Entry& e : entries) {
      std::vector<uint8_t> raw;
      if (!extract_entry(file, e, raw)) return;
      size_t off = r.blob.size();
      r.blob.insert(r.blob.end(), raw.begin(), raw.end());
      std::snprintf(line, sizeof(line), "%s\t%zu\t%zu\n", e.name.c_str(), off,
                    raw.size());
      r.index += line;
    }
    r.ok = true;
  }

  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::deque<Job> jobs_;
  std::unordered_map<int64_t, Result*> results_;
  std::vector<std::thread> workers_;
  std::atomic<int64_t> next_ticket_{0};
  bool stop_;
};

}  // namespace

extern "C" {

void* fl_create_pool(int n_threads) { return new Pool(n_threads); }
void fl_destroy_pool(void* pool) { delete static_cast<Pool*>(pool); }

long long fl_submit(void* pool, const char* path) {
  return static_cast<Pool*>(pool)->submit(path);
}

// Wait for a ticket; returns an opaque result handle (or null on failure).
void* fl_wait(void* pool, long long ticket) {
  Result* r = static_cast<Pool*>(pool)->wait(ticket);
  if (!r->ok) {
    delete r;
    return nullptr;
  }
  return r;
}

long long fl_result_blob_size(void* result) {
  return static_cast<Result*>(result)->blob.size();
}
const void* fl_result_blob(void* result) {
  return static_cast<Result*>(result)->blob.data();
}
const char* fl_result_index(void* result) {
  return static_cast<Result*>(result)->index.c_str();
}
void fl_free_result(void* result) { delete static_cast<Result*>(result); }

}  // extern "C"
