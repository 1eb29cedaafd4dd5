// Native parallel binary file loader.
//
// TPU-native equivalent of the reference's WholeMemory file IO
// (ref cpp/src/wholememory/file_io.cpp:91-872: plain / multithreaded /
// O_DIRECT filelist load into rank-local partitions).  Reads a byte
// range of a logically-concatenated file list into a caller buffer with
// N reader threads; optional O_DIRECT with aligned staging (the
// reference uses 16MiB-aligned blocks, :402).

#include <fcntl.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Span {
  const char* path;
  int64_t file_off;   // byte offset within this file
  int64_t buf_off;    // byte offset within the output buffer
  int64_t len;
};

bool read_span(const Span& s, char* out, bool use_direct) {
  int flags = O_RDONLY;
#ifdef O_DIRECT
  if (use_direct) flags |= O_DIRECT;
#endif
  int fd = open(s.path, flags);
  if (fd < 0 && use_direct) fd = open(s.path, O_RDONLY);  // fallback
  if (fd < 0) return false;
  int64_t done = 0;
  if (use_direct) {
    // aligned staging copy (ref file_io.cpp O_DIRECT path)
    constexpr int64_t kAlign = 4096;
    constexpr int64_t kBlock = 16 << 20;
    char* stage = static_cast<char*>(aligned_alloc(kAlign, kBlock));
    if (!stage) { close(fd); return false; }
    int64_t start = (s.file_off / kAlign) * kAlign;
    int64_t skew = s.file_off - start;
    int64_t remaining = s.len;
    int64_t pos = start;
    while (remaining > 0) {
      ssize_t r = pread(fd, stage, kBlock, pos);
      if (r <= 0) break;
      int64_t usable = std::min<int64_t>(r - skew, remaining);
      if (usable > 0) {
        std::memcpy(out + s.buf_off + done, stage + skew, usable);
        done += usable;
        remaining -= usable;
      }
      pos += r;
      skew = 0;
    }
    free(stage);
  } else {
    while (done < s.len) {
      ssize_t r = pread(fd, out + s.buf_off + done, s.len - done,
                        s.file_off + done);
      if (r <= 0) break;
      done += r;
    }
  }
  close(fd);
  return done == s.len;
}

}  // namespace

extern "C" {

// Read bytes [range_off, range_off+range_len) of the logical
// concatenation of `num_files` files (sizes in file_sizes) into out.
// Returns 0 on success.
int load_filelist_range(const char** paths, const int64_t* file_sizes,
                        int32_t num_files, int64_t range_off,
                        int64_t range_len, char* out, int32_t num_threads,
                        int32_t use_direct) {
  std::vector<Span> spans;
  int64_t file_start = 0;
  for (int32_t f = 0; f < num_files; ++f) {
    const int64_t file_end = file_start + file_sizes[f];
    const int64_t a = std::max(range_off, file_start);
    const int64_t b = std::min(range_off + range_len, file_end);
    if (a < b) {
      spans.push_back(Span{paths[f], a - file_start, a - range_off, b - a});
    }
    file_start = file_end;
  }
  // Split large spans for parallelism.
  constexpr int64_t kSplit = 64 << 20;
  std::vector<Span> work;
  for (const auto& s : spans) {
    for (int64_t off = 0; off < s.len; off += kSplit) {
      work.push_back(Span{s.path, s.file_off + off, s.buf_off + off,
                          std::min(kSplit, s.len - off)});
    }
  }
  if (num_threads <= 0) num_threads = 8;
  std::vector<std::thread> ts;
  std::vector<int> ok(work.size(), 1);
  std::atomic<size_t> next{0};
  for (int t = 0; t < num_threads; ++t) {
    ts.emplace_back([&] {
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= work.size()) break;
        ok[i] = read_span(work[i], out, use_direct != 0);
      }
    });
  }
  for (auto& th : ts) th.join();
  for (int o : ok)
    if (!o) return 1;
  return 0;
}

}  // extern "C"
