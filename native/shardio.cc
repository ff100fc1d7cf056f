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

// ---------------------------------------------------------------------------
// Encoder: blob-deduplicated npz writer (multithreaded deflate / stored).
//
// The synthesis engine writes 61 npz files per image whose schema repeats
// each parent image/flow ~12x (matching the reference's per-(group,augment)
// layout, `preprocess.py:453-476`). A "blob" is one npy entry (header +
// payload) compressed/CRC'd ONCE and referenced by many files, so the
// host-side cost is proportional to UNIQUE bytes. Array payloads are
// borrowed (caller keeps them alive until drain/wait returns). High-entropy
// f16/int16 tensors barely deflate (ratio ~0.7-0.9) — callers pass
// method=0 (stored) for those and method=8 (deflate) for uint8 images.
// ---------------------------------------------------------------------------

namespace {

std::string npy_header(const std::string& dtype, int ndim,
                       const long long* shape) {
  std::string d = "{'descr': '" + dtype + "', 'fortran_order': False, "
                  "'shape': (";
  for (int i = 0; i < ndim; ++i) {
    d += std::to_string(shape[i]);
    d += (ndim == 1 || i + 1 < ndim) ? ", " : "";
  }
  if (ndim == 0) d += "";
  d += "), }";
  // pad with spaces so that 10 + len(dict) + 1 is a multiple of 64
  size_t total = 10 + d.size() + 1;
  size_t pad = (64 - total % 64) % 64;
  d.append(pad, ' ');
  d += '\n';
  std::string h;
  h.reserve(10 + d.size());
  h += "\x93NUMPY";
  h += '\x01';
  h += '\x00';
  uint16_t hlen = static_cast<uint16_t>(d.size());
  h += static_cast<char>(hlen & 0xff);
  h += static_cast<char>(hlen >> 8);
  h += d;
  return h;
}

struct Blob {
  std::string header;        // npy magic+header bytes
  const char* src = nullptr; // borrowed payload (caller-owned until drain)
  size_t src_len = 0;
  int method = 8;            // 0 stored, 8 deflate
  int level = 1;
  std::vector<char> comp;    // deflate stream (method 8 only)
  uint32_t crc = 0;
  enum State { QUEUED, RUNNING, DONE } state = QUEUED;
  std::string error;

  size_t usize() const { return header.size() + src_len; }
  size_t csize() const {
    return method == 8 ? comp.size() : usize();
  }
};

struct FileJob {
  std::string path;
  std::vector<std::string> names;
  std::vector<long long> blobs;
  long long ticket = 0;
};

struct Encoder {
  std::vector<std::thread> workers;
  std::map<long long, Blob> blobs;
  std::deque<long long> blob_q;
  std::deque<FileJob> file_q;
  std::map<long long, std::string> file_done;  // ticket -> error ("" = ok)
  std::mutex mu;
  std::condition_variable cv_work, cv_blob, cv_file;
  bool stop = false;
  int running_blobs = 0;   // claimed-but-unfinished blob jobs (drain safety)
  long long next_blob = 1, next_ticket = 1;
  std::string last_error;

  explicit Encoder(int threads) {
    for (int i = 0; i < threads; ++i)
      workers.emplace_back([this] { run(); });
  }

  // Compress/CRC one blob. Called with the blob claimed (state RUNNING)
  // and the lock NOT held.
  static void process_blob(Blob* b) {
    uLong crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, reinterpret_cast<const Bytef*>(b->header.data()),
                static_cast<uInt>(b->header.size()));
    if (b->src_len)
      crc = crc32(crc, reinterpret_cast<const Bytef*>(b->src),
                  static_cast<uInt>(b->src_len));
    b->crc = static_cast<uint32_t>(crc);
    if (b->method != 8) return;
    z_stream s;
    std::memset(&s, 0, sizeof(s));
    if (deflateInit2(&s, b->level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK) {
      b->error = "deflateInit2 failed";
      return;
    }
    b->comp.resize(deflateBound(&s, static_cast<uLong>(b->usize())));
    s.next_out = reinterpret_cast<Bytef*>(b->comp.data());
    s.avail_out = static_cast<uInt>(b->comp.size());
    s.next_in = reinterpret_cast<Bytef*>(
        const_cast<char*>(b->header.data()));
    s.avail_in = static_cast<uInt>(b->header.size());
    if (deflate(&s, Z_NO_FLUSH) != Z_OK) b->error = "deflate header failed";
    s.next_in = reinterpret_cast<Bytef*>(const_cast<char*>(b->src));
    s.avail_in = static_cast<uInt>(b->src_len);
    if (b->error.empty() && deflate(&s, Z_FINISH) != Z_STREAM_END)
      b->error = "deflate body failed";
    b->comp.resize(s.total_out);
    deflateEnd(&s);
  }

  // Claim-or-wait for every blob a file needs (work-stealing: an unstarted
  // blob is compressed inline by the file's worker, so two workers blocked
  // on each other's queued blobs cannot deadlock).
  bool ensure_blobs(const FileJob& job, std::string* err) {
    for (long long id : job.blobs) {
      std::unique_lock<std::mutex> lk(mu);
      auto it = blobs.find(id);
      if (it == blobs.end()) { *err = "unknown blob id"; return false; }
      Blob* b = &it->second;
      if (b->state == Blob::QUEUED) {
        b->state = Blob::RUNNING;
        ++running_blobs;
        lk.unlock();
        process_blob(b);
        lk.lock();
        b->state = Blob::DONE;
        --running_blobs;
        cv_blob.notify_all();
        cv_file.notify_all();
      } else if (b->state == Blob::RUNNING) {
        cv_blob.wait(lk, [&] { return b->state == Blob::DONE; });
      }
      if (!b->error.empty()) { *err = b->error; return false; }
    }
    return true;
  }

  std::string write_file(const FileJob& job) {
    std::string err;
    if (!ensure_blobs(job, &err)) return job.path + ": " + err;
    std::ofstream out(job.path, std::ios::binary | std::ios::trunc);
    if (!out) return "cannot open " + job.path;

    auto w16 = [&](uint16_t v) {
      char b[2] = {static_cast<char>(v & 0xff), static_cast<char>(v >> 8)};
      out.write(b, 2);
    };
    auto w32 = [&](uint32_t v) {
      char b[4] = {static_cast<char>(v & 0xff),
                   static_cast<char>((v >> 8) & 0xff),
                   static_cast<char>((v >> 16) & 0xff),
                   static_cast<char>((v >> 24) & 0xff)};
      out.write(b, 4);
    };

    std::vector<size_t> offsets(job.names.size());
    for (size_t i = 0; i < job.names.size(); ++i) {
      const Blob& b = blobs[job.blobs[i]];
      std::string ename = job.names[i] + ".npy";
      offsets[i] = static_cast<size_t>(out.tellp());
      w32(0x04034b50);
      w16(20); w16(0); w16(static_cast<uint16_t>(b.method));
      w16(0); w16(0);                       // dos time/date
      w32(b.crc);
      w32(static_cast<uint32_t>(b.csize()));
      w32(static_cast<uint32_t>(b.usize()));
      w16(static_cast<uint16_t>(ename.size())); w16(0);
      out.write(ename.data(), ename.size());
      if (b.method == 8) {
        out.write(b.comp.data(), b.comp.size());
      } else {
        out.write(b.header.data(), b.header.size());
        if (b.src_len) out.write(b.src, b.src_len);
      }
    }
    size_t cd_off = static_cast<size_t>(out.tellp());
    for (size_t i = 0; i < job.names.size(); ++i) {
      const Blob& b = blobs[job.blobs[i]];
      std::string ename = job.names[i] + ".npy";
      w32(0x02014b50);
      w16(20); w16(20); w16(0); w16(static_cast<uint16_t>(b.method));
      w16(0); w16(0);
      w32(b.crc);
      w32(static_cast<uint32_t>(b.csize()));
      w32(static_cast<uint32_t>(b.usize()));
      w16(static_cast<uint16_t>(ename.size())); w16(0); w16(0);
      w16(0); w16(0); w32(0);
      w32(static_cast<uint32_t>(offsets[i]));
      out.write(ename.data(), ename.size());
    }
    size_t cd_len = static_cast<size_t>(out.tellp()) - cd_off;
    w32(0x06054b50);
    w16(0); w16(0);
    w16(static_cast<uint16_t>(job.names.size()));
    w16(static_cast<uint16_t>(job.names.size()));
    w32(static_cast<uint32_t>(cd_len));
    w32(static_cast<uint32_t>(cd_off));
    w16(0);
    out.close();
    return out ? "" : "write failed for " + job.path;
  }

  void run() {
    for (;;) {
      long long blob_id = -1;
      FileJob job;
      bool have_file = false;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] {
          return stop || !blob_q.empty() || !file_q.empty();
        });
        if (stop && blob_q.empty() && file_q.empty()) return;
        if (!blob_q.empty()) {          // blobs first: files consume them
          blob_id = blob_q.front();
          blob_q.pop_front();
          Blob& b = blobs[blob_id];
          if (b.state != Blob::QUEUED) continue;  // stolen by a file job
          b.state = Blob::RUNNING;
          ++running_blobs;
        } else {
          job = std::move(file_q.front());
          file_q.pop_front();
          have_file = true;
        }
      }
      if (blob_id >= 0) {
        Blob* b;
        {
          std::lock_guard<std::mutex> lk(mu);
          b = &blobs[blob_id];
        }
        process_blob(b);
        {
          std::lock_guard<std::mutex> lk(mu);
          b->state = Blob::DONE;
          --running_blobs;
        }
        cv_blob.notify_all();
        cv_file.notify_all();
      } else if (have_file) {
        std::string err = write_file(job);
        {
          std::lock_guard<std::mutex> lk(mu);
          file_done[job.ticket] = err;
          if (!err.empty()) last_error = err;
        }
        cv_file.notify_all();
      }
    }
  }

  long long add_blob(const void* data, long long nbytes, const char* dtype,
                     int ndim, const long long* shape, int method,
                     int level) {
    long long id;
    {
      std::lock_guard<std::mutex> lk(mu);
      id = next_blob++;
      Blob& b = blobs[id];
      b.header = npy_header(dtype, ndim, shape);
      b.src = static_cast<const char*>(data);
      b.src_len = static_cast<size_t>(nbytes);
      b.method = method;
      b.level = level;
      blob_q.push_back(id);
    }
    cv_work.notify_one();
    return id;
  }

  long long add_file(const char* path, int n, const char** names,
                     const long long* blob_ids) {
    FileJob job;
    job.path = path;
    for (int i = 0; i < n; ++i) {
      job.names.emplace_back(names[i]);
      job.blobs.push_back(blob_ids[i]);
    }
    long long t;
    {
      std::lock_guard<std::mutex> lk(mu);
      t = next_ticket++;
      job.ticket = t;
      file_q.push_back(std::move(job));
    }
    cv_work.notify_one();
    return t;
  }

  // Wait until every submitted file is written and no blob job is still
  // running; returns the number of failed files and releases all blob
  // state (the caller may free its borrowed arrays afterwards).
  long long drain() {
    std::unique_lock<std::mutex> lk(mu);
    cv_file.wait(lk, [this] {
      return blob_q.empty() && file_q.empty() && running_blobs == 0 &&
             file_done.size() == static_cast<size_t>(next_ticket - 1);
    });
    long long fails = 0;
    for (auto& kv : file_done)
      if (!kv.second.empty()) ++fails;
    file_done.clear();
    next_ticket = 1;
    blobs.clear();
    next_blob = 1;
    return fails;
  }

  ~Encoder() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_work.notify_all();
    for (auto& w : workers) w.join();
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

void* ofdio_enc_new(int threads) {
  return new Encoder(threads > 0 ? threads : 1);
}

long long ofdio_enc_blob(void* enc, const void* data, long long nbytes,
                         const char* dtype, int ndim, const long long* shape,
                         int method, int level) {
  return static_cast<Encoder*>(enc)->add_blob(data, nbytes, dtype, ndim,
                                              shape, method, level);
}

long long ofdio_enc_file(void* enc, const char* path, int n,
                         const char** names, const long long* blob_ids) {
  return static_cast<Encoder*>(enc)->add_file(path, n, names, blob_ids);
}

long long ofdio_enc_drain(void* enc) {
  return static_cast<Encoder*>(enc)->drain();
}

const char* ofdio_enc_last_error(void* enc) {
  return static_cast<Encoder*>(enc)->last_error.c_str();
}

void ofdio_enc_free(void* enc) { delete static_cast<Encoder*>(enc); }

void* ofdio_pool_new(int threads) { return new Pool(threads > 0 ? threads : 1); }

long long ofdio_pool_submit(void* pool, const char* path) {
  return static_cast<Pool*>(pool)->submit(path);
}

void* ofdio_pool_take(void* pool, long long ticket) {
  return static_cast<Pool*>(pool)->take(ticket);
}

void ofdio_pool_free(void* pool) { delete static_cast<Pool*>(pool); }

}  // extern "C"
