// Native prefetching file-decode pipeline for the data layer.
//
// The reference hides file IO + PNG/JPEG decode latency behind
// torch.utils.data.DataLoader worker *processes* (dataset_utils/datasets.py
// num_workers plumbing).  The TPU-native equivalent is this library: a C++
// thread pool that reads and decodes samples ahead of the consumer into a
// bounded in-order queue.  Because the hot work (inflate, IDCT, huffman)
// runs outside the GIL, plain Python threads driving this library get real
// decode parallelism without worker processes or tensor IPC.
//
// Decoders (by file extension):
//   .png          libpng: 8-bit gray/RGB -> u8, 16-bit -> u16, channels in
//                 FILE order (R,G,B) — for KITTI flow PNGs that is
//                 (u, v, valid) directly (dataset_utils/data_utils.py:
//                 259-264 reads BGR and reverses; file order == reversed
//                 BGR).  Palette/alpha/tRNS/sub-8-bit PNGs are declined
//                 (return false) so the caller's PIL fallback handles them
//                 — np.array(Image.open(...)) keeps the palette index map
//                 and the alpha channel, and the fast path must be
//                 bit-exact with that reference convention
//                 (data_utils.py:22-23), not silently different.
//   .jpg/.jpeg    libjpeg: u8 RGB.
//   .flo          Middlebury: magic 202021.25, int32 w,h, f32 (h,w,2)
//                 (little-endian payload; the decoder assumes an LE host,
//                 like every other x86/ARM consumer of the format).
//   .ppm/.pgm     binary netpbm (P5/P6 maxval<=255): u8.
//
// Every decoder validates header dimensions against a hard size cap
// before allocating, and the worker threads catch exceptions — a corrupt
// or adversarial file must surface as a per-file decode failure (the
// Python side falls back to PIL or raises), never kill the process.
//
// API is C, bound via ctypes (no pybind11 in this environment).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Decoded {
  std::vector<uint8_t> bytes;  // raw storage
  int64_t h = 0, w = 0, c = 0;
  int dtype = -1;  // 0=u8, 1=f32, 2=u16; -1 = decode error
};

// Hard cap on any decoded image: 1 GiB of pixel data / 2^20 per side.
// Header dimensions are untrusted input; allocating from them unchecked
// lets one corrupt file OOM (or bad_alloc-terminate) the process.
bool dims_ok(int64_t w, int64_t h, int64_t c, int64_t itemsize) {
  const int64_t side_cap = int64_t(1) << 20;
  const int64_t byte_cap = int64_t(1) << 30;
  if (w <= 0 || h <= 0 || c <= 0 || w > side_cap || h > side_cap) return false;
  return w * h <= byte_cap / (c * itemsize);
}

bool ends_with(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; ++i) {
    char a = s[s.size() - n + i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != suf[i]) return false;
  }
  return true;
}

// ---------------------------------------------------------------- PNG
bool decode_png(const char* path, Decoded* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int depth = png_get_bit_depth(png, info);
  int ctype = png_get_color_type(png, info);

  // Decline anything np.array(Image.open(...)) would NOT render as a
  // plain gray/RGB u8/u16 array (palette index maps, alpha channels,
  // sub-8-bit gray): the caller falls back to PIL, keeping the fast path
  // bit-exact with the reference's read convention (data_utils.py:22-23).
  if (ctype == PNG_COLOR_TYPE_PALETTE || depth < 8 ||
      (ctype & PNG_COLOR_MASK_ALPHA) ||
      png_get_valid(png, info, PNG_INFO_tRNS) ||
      !dims_ok(w, h, 4, depth == 16 ? 2 : 1)) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
#if !defined(__BYTE_ORDER__) || (__BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__)
  if (depth == 16) png_set_swap(png);  // network order -> host LE u16
#endif
  png_read_update_info(png, info);

  depth = png_get_bit_depth(png, info);
  int channels = png_get_channels(png, info);
  size_t stride = png_get_rowbytes(png, info);

  out->h = h;
  out->w = w;
  out->c = channels;
  out->dtype = depth == 16 ? 2 : 0;
  out->bytes.resize(stride * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out->bytes.data() + y * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// --------------------------------------------------------------- JPEG
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const char* path, Decoded* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = cinfo.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (!dims_ok(cinfo.output_width, cinfo.output_height,
               cinfo.output_components, 1)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = cinfo.output_components;
  out->dtype = 0;
  size_t stride = out->w * out->c;
  out->bytes.resize(stride * out->h);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->bytes.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

// ---------------------------------------------------------------- .flo
bool decode_flo(const char* path, Decoded* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  float magic = 0.f;
  int32_t w = 0, h = 0;
  bool ok = fread(&magic, 4, 1, fp) == 1 && magic == 202021.25f &&
            fread(&w, 4, 1, fp) == 1 && fread(&h, 4, 1, fp) == 1 &&
            dims_ok(w, h, 2, 4);
  if (ok) {
    out->h = h;
    out->w = w;
    out->c = 2;
    out->dtype = 1;
    out->bytes.resize(sizeof(float) * 2 * w * h);
    ok = fread(out->bytes.data(), sizeof(float), size_t(2) * w * h, fp) ==
         size_t(2) * w * h;
  }
  fclose(fp);
  return ok;
}

// --------------------------------------------------------------- netpbm
bool decode_pnm(const char* path, Decoded* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  char m0 = fgetc(fp), m1 = fgetc(fp);
  int c = (m0 == 'P' && m1 == '6') ? 3 : (m0 == 'P' && m1 == '5') ? 1 : 0;
  long w = 0, h = 0, maxv = 0;
  long* fields[3] = {&w, &h, &maxv};
  int fi = 0;
  // netpbm header: whitespace-separated fields, '#' comments to EOL
  while (c && fi < 3) {
    int ch = fgetc(fp);
    if (ch == EOF) break;
    if (ch == '#') {
      while (ch != '\n' && ch != EOF) ch = fgetc(fp);
    } else if (ch >= '0' && ch <= '9') {
      long v = ch - '0';
      while ((ch = fgetc(fp)) >= '0' && ch <= '9') v = v * 10 + (ch - '0');
      // the digit run's terminator may itself be a '#': push it back so
      // the outer loop sees the comment (else digits INSIDE the comment
      // would be parsed as the next header field).  A WHITESPACE
      // terminator stays consumed — netpbm ends the header with exactly
      // one whitespace byte, so pushing it back would shift the payload.
      if (ch == '#') ungetc(ch, fp);
      *fields[fi++] = v;
    }
  }
  bool ok = c && fi == 3 && dims_ok(w, h, c, 1) && maxv > 0 && maxv < 256;
  if (ok) {
    out->h = h;
    out->w = w;
    out->c = c;
    out->dtype = 0;
    out->bytes.resize(size_t(w) * h * c);
    ok = fread(out->bytes.data(), 1, out->bytes.size(), fp) ==
         out->bytes.size();
  }
  fclose(fp);
  return ok;
}

bool decode_any(const std::string& path, Decoded* out) {
  if (ends_with(path, ".png")) return decode_png(path.c_str(), out);
  if (ends_with(path, ".jpg") || ends_with(path, ".jpeg"))
    return decode_jpeg(path.c_str(), out);
  if (ends_with(path, ".flo")) return decode_flo(path.c_str(), out);
  if (ends_with(path, ".ppm") || ends_with(path, ".pgm"))
    return decode_pnm(path.c_str(), out);
  return false;
}

// Exception-safe wrapper: decoders set shape fields before the payload
// read can still fail, so a false return (or a throw) must reset *out to
// the error state — otherwise a truncated file would be yielded as a
// valid array with a zero tail.
bool decode_safe(const std::string& path, Decoded* out) {
  bool ok = false;
  try {
    ok = decode_any(path, out);
  } catch (...) {
    ok = false;
  }
  if (!ok) *out = Decoded();
  return ok;
}

// ------------------------------------------------------------ prefetcher
struct Loader {
  std::vector<std::string> paths;
  int files_per_sample = 1;
  int64_t n_samples = 0;

  std::mutex mu;
  std::condition_variable cv_ready;   // consumer waits for head
  std::condition_variable cv_space;   // workers wait for queue space
  std::map<int64_t, std::vector<Decoded>> done;  // finished, not yet consumed
  std::atomic<int64_t> next_job{0};
  int64_t head = 0;          // next sample index the consumer will take
  int queue_cap = 8;         // max finished-but-unconsumed samples
  bool stopping = false;
  std::vector<std::thread> workers;
  std::vector<Decoded> current;  // the sample handed to the consumer
  bool have_current = false;

  void work() {
    for (;;) {
      int64_t job = next_job.fetch_add(1);
      if (job >= n_samples) return;
      std::vector<Decoded> sample(files_per_sample);
      for (int f = 0; f < files_per_sample; ++f)
        decode_safe(paths[job * files_per_sample + f], &sample[f]);
      std::unique_lock<std::mutex> lk(mu);
      // bound memory: don't run more than queue_cap samples ahead of head
      cv_space.wait(lk, [&] {
        return stopping || job < head + queue_cap;
      });
      if (stopping) return;
      done.emplace(job, std::move(sample));
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* ufr_loader_create(const char* const* paths, int64_t n_paths,
                        int files_per_sample, int n_threads, int queue_cap) {
  if (files_per_sample <= 0 || n_paths % files_per_sample != 0) return nullptr;
  Loader* L = new Loader();
  L->paths.assign(paths, paths + n_paths);
  L->files_per_sample = files_per_sample;
  L->n_samples = n_paths / files_per_sample;
  L->queue_cap = queue_cap > 0 ? queue_cap : 8;
  if (n_threads < 1) n_threads = 1;
  if (n_threads > 64) n_threads = 64;
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back([L] { L->work(); });
  return L;
}

// Blocks until the next in-order sample is decoded and makes it current.
// Returns its index, or -1 after the last sample.
int64_t ufr_loader_wait(void* h) {
  Loader* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  if (L->head >= L->n_samples) return -1;
  L->cv_ready.wait(lk, [&] { return L->done.count(L->head) > 0; });
  L->current = std::move(L->done[L->head]);
  L->done.erase(L->head);
  L->have_current = true;
  return L->head;
}

// Shape/dtype of file fi of the current sample. dtype -1 = decode failed.
int ufr_loader_file_info(void* h, int fi, int64_t* hh, int64_t* ww,
                         int64_t* cc, int* dtype) {
  Loader* L = static_cast<Loader*>(h);
  if (!L->have_current || fi < 0 || fi >= L->files_per_sample) return 1;
  const Decoded& d = L->current[fi];
  *hh = d.h;
  *ww = d.w;
  *cc = d.c;
  *dtype = d.dtype;
  return 0;
}

void ufr_loader_file_copy(void* h, int fi, void* dst) {
  Loader* L = static_cast<Loader*>(h);
  if (!L->have_current || fi < 0 || fi >= L->files_per_sample) return;
  const Decoded& d = L->current[fi];
  memcpy(dst, d.bytes.data(), d.bytes.size());
}

// Pop the current sample and let workers run one sample further ahead.
void ufr_loader_release(void* h) {
  Loader* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  if (!L->have_current) return;
  L->current.clear();
  L->have_current = false;
  L->head += 1;
  L->cv_space.notify_all();
}

void ufr_loader_destroy(void* h) {
  Loader* L = static_cast<Loader*>(h);
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->stopping = true;
    L->next_job.store(L->n_samples);
    L->cv_space.notify_all();
  }
  for (auto& t : L->workers) t.join();
  delete L;
}

// One-shot synchronous decode (fast path for read_image/read_flow_png).
// On success returns 0 and sets *data to a malloc'd buffer the caller must
// free with ufr_free.
int ufr_decode_file(const char* path, void** data, int64_t* hh, int64_t* ww,
                    int64_t* cc, int* dtype) {
  Decoded d;
  if (!decode_safe(path, &d) || d.dtype < 0) return 1;
  void* buf = malloc(d.bytes.size());
  if (!buf) return 1;
  memcpy(buf, d.bytes.data(), d.bytes.size());
  *data = buf;
  *hh = d.h;
  *ww = d.w;
  *cc = d.c;
  *dtype = d.dtype;
  return 0;
}

void ufr_free(void* p) { free(p); }

int ufr_loader_version() { return 1; }

}  // extern "C"
