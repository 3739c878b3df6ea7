// Sanitizer harness for the native layer (coco_parse.cc + loader.cc).
//
// SURVEY.md §5 records the reference as "race detection / sanitizers:
// none (no native code)". This rebuild DOES ship native code and
// threads, so it carries the coverage the reference could skip: this
// main is compiled together with both native translation units under
// ASan+UBSan (memory/UB over a hostile corpus) and TSan (the threaded
// JPEG batch decode) by tests/test_sanitizers.py.
//
//   sanitize_bin coco <file...>          parse each file, copy out, free
//   sanitize_bin jpeg <size> <file...>   threaded batch decode
//
// Exit 0 means: no crashes, no sanitizer reports (sanitizers abort with
// a nonzero code on findings). Parse/decode FAILURES are fine — the
// corpus is mostly malformed on purpose.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
void* ld_coco_parse(const char* buf, long n);
void ld_coco_free(void* h);
long ld_coco_n_images(void* h);
long ld_coco_n_anns(void* h);
long ld_coco_names_bytes(void* h);
long ld_coco_categories_bytes(void* h);
void ld_coco_fill(void* h, int64_t* img_id, int32_t* img_w, int32_t* img_h,
                  int64_t* name_off, char* names, int64_t* ann_id,
                  int64_t* ann_img, int32_t* ann_cat, int8_t* ann_crowd,
                  double* ann_bbox, double* ann_area, char* categories);
int ld_decode_resize_batch(const uint8_t** bufs, const long* lens, int n,
                           int out_size, float* images, float* orig,
                           int n_threads);
}

static std::string read_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
  std::string out;
  char buf[1 << 16];
  size_t n;
  while ((n = fread(buf, 1, sizeof(buf), f)) > 0) out.append(buf, n);
  fclose(f);
  return out;
}

static int run_coco(int argc, char** argv) {
  int parsed = 0;
  for (int i = 0; i < argc; ++i) {
    std::string raw = read_file(argv[i]);
    // mimic CPython bytes: NUL-terminated buffer (the parser's number
    // scanner relies on it)
    raw.push_back('\0');
    void* h = ld_coco_parse(raw.data(), (long)raw.size() - 1);
    if (!h) continue;
    ++parsed;
    long n = ld_coco_n_images(h), m = ld_coco_n_anns(h);
    long nb = ld_coco_names_bytes(h), cb = ld_coco_categories_bytes(h);
    std::vector<int64_t> img_id(n), name_off(n + 1), ann_id(m), ann_img(m);
    std::vector<int32_t> img_w(n), img_h(n), ann_cat(m);
    std::vector<int8_t> ann_crowd(m);
    std::vector<double> ann_bbox(4 * m), ann_area(m);
    std::vector<char> names(nb ? nb : 1), cats(cb ? cb : 1);
    ld_coco_fill(h, img_id.data(), img_w.data(), img_h.data(),
                 name_off.data(), names.data(), ann_id.data(),
                 ann_img.data(), ann_cat.data(), ann_crowd.data(),
                 ann_bbox.data(), ann_area.data(), cats.data());
    ld_coco_free(h);
  }
  printf("coco: %d/%d parsed\n", parsed, argc);
  return 0;
}

static int run_jpeg(int argc, char** argv) {
  int size = atoi(argv[0]);
  int n = argc - 1;
  std::vector<std::string> blobs;
  std::vector<const uint8_t*> ptrs;
  std::vector<long> lens;
  for (int i = 0; i < n; ++i) {
    blobs.push_back(read_file(argv[1 + i]));
    ptrs.push_back((const uint8_t*)blobs.back().data());
    lens.push_back((long)blobs.back().size());
  }
  std::vector<float> images((size_t)n * 3 * size * size);
  std::vector<float> orig((size_t)n * 2);
  int fails = ld_decode_resize_batch(ptrs.data(), lens.data(), n, size,
                                     images.data(), orig.data(), 4);
  printf("jpeg: %d/%d failed\n", fails, n);
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 3) { fprintf(stderr, "usage: coco|jpeg ...\n"); return 2; }
  if (strcmp(argv[1], "coco") == 0) return run_coco(argc - 2, argv + 2);
  if (strcmp(argv[1], "jpeg") == 0) return run_jpeg(argc - 2, argv + 2);
  fprintf(stderr, "unknown mode %s\n", argv[1]);
  return 2;
}
