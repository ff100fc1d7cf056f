// shardio — native (C++17) npz shard decoder + threaded prefetch pool.
//
// TPU-native equivalent of the reference's data-loading worker processes
// (`adjusted_RAFT/core/datasets.py:354-358`, `adjusted_gmflow/main.py:419-422`:
// torch DataLoader num_workers=4 forked CPU workers decoding np.savez npz
// shards). On TPU hosts the input pipeline must keep a single Python process
// fed without stealing cycles from dispatch; this library decodes ZIP/DEFLATE
// npz shards on a native thread pool (zero GIL contention — the GIL is
// released for the whole decode, not just inner zlib calls) and hands numpy-
// ready buffers back through a ticket API (see data/native_io.py bindings).
//
// Supports: ZIP entries stored (method 0) or deflated (method 8, raw zlib
// windowBits=-15), NPY format versions 1.0/2.0, little-endian simple dtypes.
// Not supported (clear error, Python falls back to np.load): ZIP64, nested
// object arrays, pickled entries.

#include <zlib.h>

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Entry {
  std::string name;              // npz key (".npy" stripped)
  std::string dtype;             // numpy descr, e.g. "<f4", "|u1"
  int ndim = 0;
  long long shape[8] = {0};
  bool fortran = false;
  std::vector<char> data;
};

struct NpzFile {
  std::vector<Entry> entries;
  std::string error;             // empty on success
};

uint16_t le16(const unsigned char* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}
uint32_t le32(const unsigned char* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

bool inflate_raw(const unsigned char* src, size_t src_len, char* dst,
                 size_t dst_len, std::string* err) {
  z_stream strm;
  std::memset(&strm, 0, sizeof(strm));
  if (inflateInit2(&strm, -15) != Z_OK) {  // raw deflate (zip)
    *err = "inflateInit2 failed";
    return false;
  }
  strm.next_in = const_cast<unsigned char*>(src);
  strm.avail_in = static_cast<uInt>(src_len);
  strm.next_out = reinterpret_cast<unsigned char*>(dst);
  strm.avail_out = static_cast<uInt>(dst_len);
  int rc = inflate(&strm, Z_FINISH);
  inflateEnd(&strm);
  if (rc != Z_STREAM_END || strm.total_out != dst_len) {
    *err = "deflate stream corrupt (rc=" + std::to_string(rc) + ")";
    return false;
  }
  return true;
}

// Parse the NPY container (magic, version, header dict) in `buf`; fill
// dtype/shape/fortran and set *payload/*payload_len to the raw array bytes.
bool parse_npy(const std::vector<char>& buf, Entry* e, const char** payload,
               size_t* payload_len, std::string* err) {
  const auto* p = reinterpret_cast<const unsigned char*>(buf.data());
  if (buf.size() < 10 || std::memcmp(p, "\x93NUMPY", 6) != 0) {
    *err = "bad npy magic";
    return false;
  }
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = le16(p + 8);
    hoff = 10;
  } else if (major == 2 || major == 3) {
    if (buf.size() < 12) { *err = "truncated npy header"; return false; }
    hlen = le32(p + 8);
    hoff = 12;
  } else {
    *err = "unsupported npy version";
    return false;
  }
  if (buf.size() < hoff + hlen) { *err = "truncated npy header"; return false; }
  std::string h(buf.data() + hoff, hlen);

  auto find_val = [&](const std::string& key) -> size_t {
    size_t k = h.find("'" + key + "'");
    if (k == std::string::npos) return std::string::npos;
    k = h.find(':', k);
    return k == std::string::npos ? k : k + 1;
  };

  size_t dpos = find_val("descr");
  if (dpos == std::string::npos) { *err = "npy header: no descr"; return false; }
  size_t q0 = h.find('\'', dpos);
  size_t q1 = (q0 == std::string::npos) ? q0 : h.find('\'', q0 + 1);
  if (q1 == std::string::npos) { *err = "npy header: bad descr"; return false; }
  e->dtype = h.substr(q0 + 1, q1 - q0 - 1);
  if (e->dtype.size() < 2 || e->dtype[0] == '>' ||
      e->dtype.find('O') != std::string::npos ||
      e->dtype.find('V') != std::string::npos) {
    *err = "unsupported dtype " + e->dtype;
    return false;
  }

  size_t fpos = find_val("fortran_order");
  e->fortran = fpos != std::string::npos && h.find("True", fpos) == fpos + 1;

  size_t spos = find_val("shape");
  size_t o0 = (spos == std::string::npos) ? spos : h.find('(', spos);
  size_t o1 = (o0 == std::string::npos) ? o0 : h.find(')', o0);
  if (o1 == std::string::npos) { *err = "npy header: bad shape"; return false; }
  e->ndim = 0;
  size_t i = o0 + 1;
  while (i < o1) {
    while (i < o1 && (h[i] == ' ' || h[i] == ',')) ++i;
    if (i >= o1) break;
    if (e->ndim >= 8) { *err = "ndim > 8"; return false; }
    e->shape[e->ndim++] = std::strtoll(h.c_str() + i, nullptr, 10);
    while (i < o1 && h[i] != ',') ++i;
  }

  *payload = buf.data() + hoff + hlen;
  *payload_len = buf.size() - hoff - hlen;
  return true;
}

NpzFile* load_npz(const std::string& path) {
  auto* f = new NpzFile();
  std::ifstream in(path, std::ios::binary | std::ios::ate);
  if (!in) { f->error = "cannot open " + path; return f; }
  const long long fsize = static_cast<long long>(in.tellg());

  // --- End-Of-Central-Directory: scan the last 66000 bytes for PK\5\6.
  const long long tail_len = fsize < 66000 ? fsize : 66000;
  std::vector<unsigned char> tail(static_cast<size_t>(tail_len));
  in.seekg(fsize - tail_len);
  in.read(reinterpret_cast<char*>(tail.data()), tail_len);
  long long eocd = -1;
  for (long long i = tail_len - 22; i >= 0; --i) {
    if (tail[i] == 0x50 && tail[i + 1] == 0x4b && tail[i + 2] == 0x05 &&
        tail[i + 3] == 0x06) {
      eocd = i;
      break;
    }
  }
  if (eocd < 0) { f->error = "no zip EOCD in " + path; return f; }
  const uint16_t n_entries = le16(&tail[eocd + 10]);
  const uint32_t cd_size = le32(&tail[eocd + 12]);
  const uint32_t cd_off = le32(&tail[eocd + 16]);
  if (cd_off == 0xffffffffu) { f->error = "zip64 unsupported"; return f; }

  std::vector<unsigned char> cd(cd_size);
  in.seekg(cd_off);
  in.read(reinterpret_cast<char*>(cd.data()), cd_size);
  if (!in) { f->error = "truncated central directory"; return f; }

  size_t pos = 0;
  for (int k = 0; k < n_entries; ++k) {
    if (pos + 46 > cd.size() || le32(&cd[pos]) != 0x02014b50) {
      f->error = "bad central directory entry";
      return f;
    }
    const uint16_t method = le16(&cd[pos + 10]);
    const uint32_t csize = le32(&cd[pos + 20]);
    const uint32_t usize = le32(&cd[pos + 24]);
    const uint16_t nlen = le16(&cd[pos + 28]);
    const uint16_t xlen = le16(&cd[pos + 30]);
    const uint16_t clen = le16(&cd[pos + 32]);
    const uint32_t lho = le32(&cd[pos + 42]);
    std::string name(reinterpret_cast<char*>(&cd[pos + 46]), nlen);
    pos += 46 + nlen + xlen + clen;

    // local header: skip its (possibly different) name/extra lengths
    unsigned char lh[30];
    in.seekg(lho);
    in.read(reinterpret_cast<char*>(lh), 30);
    if (!in || le32(lh) != 0x04034b50) {
      f->error = "bad local header for " + name;
      return f;
    }
    const size_t data_off = lho + 30 + le16(lh + 26) + le16(lh + 28);

    std::vector<char> raw(csize);
    in.seekg(static_cast<std::streamoff>(data_off));
    in.read(raw.data(), csize);
    if (!in) { f->error = "truncated entry " + name; return f; }

    std::vector<char> npy;
    if (method == 0) {
      npy = std::move(raw);
    } else if (method == 8) {
      npy.resize(usize);
      std::string zerr;
      if (!inflate_raw(reinterpret_cast<unsigned char*>(raw.data()), csize,
                       npy.data(), usize, &zerr)) {
        f->error = name + ": " + zerr;
        return f;
      }
    } else {
      f->error = "unsupported zip method " + std::to_string(method);
      return f;
    }

    Entry e;
    e.name = name.size() > 4 && name.compare(name.size() - 4, 4, ".npy") == 0
                 ? name.substr(0, name.size() - 4)
                 : name;
    const char* payload = nullptr;
    size_t plen = 0;
    if (!parse_npy(npy, &e, &payload, &plen, &f->error)) {
      f->error = name + ": " + f->error;
      return f;
    }
    e.data.assign(payload, payload + plen);
    f->entries.push_back(std::move(e));
  }
  return f;
}

// ---------------------------------------------------------------------------
// Prefetch pool: N native decode threads, ticket-based completion.
// ---------------------------------------------------------------------------

struct Pool {
  std::vector<std::thread> workers;
  std::deque<std::pair<long long, std::string>> jobs;
  std::map<long long, NpzFile*> done;
  std::mutex mu;
  std::condition_variable cv_job, cv_done;
  bool stop = false;
  long long next_ticket = 1;

  explicit Pool(int threads) {
    for (int i = 0; i < threads; ++i)
      workers.emplace_back([this] { run(); });
  }

  void run() {
    for (;;) {
      std::pair<long long, std::string> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [this] { return stop || !jobs.empty(); });
        if (stop && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      NpzFile* f = load_npz(job.second);
      {
        std::lock_guard<std::mutex> lk(mu);
        done[job.first] = f;
      }
      cv_done.notify_all();
    }
  }

  long long submit(const char* path) {
    long long t;
    {
      std::lock_guard<std::mutex> lk(mu);
      t = next_ticket++;
      jobs.emplace_back(t, path);
    }
    cv_job.notify_one();
    return t;
  }

  NpzFile* take(long long ticket) {
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return done.count(ticket) > 0; });
    NpzFile* f = done[ticket];
    done.erase(ticket);
    return f;
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_job.notify_all();
    for (auto& w : workers) w.join();
    for (auto& kv : done) delete kv.second;
  }
};

}  // namespace

extern "C" {

void* ofdio_load(const char* path) { return load_npz(path); }

const char* ofdio_error(void* h) {
  return static_cast<NpzFile*>(h)->error.c_str();
}

int ofdio_count(void* h) {
  return static_cast<int>(static_cast<NpzFile*>(h)->entries.size());
}

const char* ofdio_name(void* h, int i) {
  return static_cast<NpzFile*>(h)->entries[i].name.c_str();
}

const char* ofdio_dtype(void* h, int i) {
  return static_cast<NpzFile*>(h)->entries[i].dtype.c_str();
}

int ofdio_ndim(void* h, int i) {
  return static_cast<NpzFile*>(h)->entries[i].ndim;
}

void ofdio_shape(void* h, int i, long long* out) {
  const Entry& e = static_cast<NpzFile*>(h)->entries[i];
  for (int d = 0; d < e.ndim; ++d) out[d] = e.shape[d];
}

int ofdio_fortran(void* h, int i) {
  return static_cast<NpzFile*>(h)->entries[i].fortran ? 1 : 0;
}

long long ofdio_nbytes(void* h, int i) {
  return static_cast<long long>(
      static_cast<NpzFile*>(h)->entries[i].data.size());
}

void ofdio_copy(void* h, int i, void* dst) {
  const Entry& e = static_cast<NpzFile*>(h)->entries[i];
  std::memcpy(dst, e.data.data(), e.data.size());
}

void ofdio_free(void* h) { delete static_cast<NpzFile*>(h); }

void* ofdio_pool_new(int threads) { return new Pool(threads > 0 ? threads : 1); }

long long ofdio_pool_submit(void* pool, const char* path) {
  return static_cast<Pool*>(pool)->submit(path);
}

void* ofdio_pool_take(void* pool, long long ticket) {
  return static_cast<Pool*>(pool)->take(ticket);
}

void ofdio_pool_free(void* pool) { delete static_cast<Pool*>(pool); }

}  // extern "C"
