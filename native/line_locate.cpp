// Newline-offset indexer for huge TSV/text files.
//
// TPU-native counterpart of the reference's mmap line indexer
// (ofasys/io/reader/line_locate.cpp role): scans a file in large windows
// and emits a binary index of line-start offsets that the Python data
// plane mmaps for O(1) random record access. Invoked as a subprocess by
// ofasys_tpu/io/reader/file_reader.py (numpy fallback exists).
//
// Usage: line_locate <input-file> <output-index>
// Output format: little-endian uint64 array
//   [n_lines, start_0, start_1, ..., start_{n-1}, file_size]
//
// Build: make -C native   (g++ -O3, no dependencies)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

constexpr size_t kWindow = 1ull << 30;  // 1 GiB mmap windows

int fail(const char* msg) {
  std::perror(msg);
  return 1;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: %s <input> <output.idx>\n", argv[0]);
    return 2;
  }
  int fd = ::open(argv[1], O_RDONLY);
  if (fd < 0) return fail("open input");
  struct stat st;
  if (fstat(fd, &st) != 0) return fail("fstat");
  const uint64_t size = static_cast<uint64_t>(st.st_size);

  std::vector<uint64_t> starts;
  starts.reserve(1 << 20);
  bool at_line_start = true;
  for (uint64_t base = 0; base < size; base += kWindow) {
    const size_t len = static_cast<size_t>(std::min<uint64_t>(kWindow, size - base));
    void* map = ::mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, static_cast<off_t>(base));
    if (map == MAP_FAILED) return fail("mmap");
    const char* p = static_cast<const char*>(map);
    const char* end = p + len;
    const char* cur = p;
    while (cur < end) {
      if (at_line_start) {
        starts.push_back(base + static_cast<uint64_t>(cur - p));
        at_line_start = false;
      }
      const char* nl = static_cast<const char*>(std::memchr(cur, '\n', static_cast<size_t>(end - cur)));
      if (nl == nullptr) break;
      cur = nl + 1;
      at_line_start = true;
    }
    ::munmap(map, len);
  }
  ::close(fd);

  std::FILE* out = std::fopen(argv[2], "wb");
  if (out == nullptr) return fail("open output");
  const uint64_t n = starts.size();
  std::fwrite(&n, sizeof(n), 1, out);
  if (n) std::fwrite(starts.data(), sizeof(uint64_t), starts.size(), out);
  std::fwrite(&size, sizeof(size), 1, out);
  std::fclose(out);
  return 0;
}
