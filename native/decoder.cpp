// mapfree_native: multithreaded JPEG decode + bilinear resize + normalise.
//
// The host-side throughput path of the data pipeline (SURVEY.md §7 hard part
// 6: the 2k pairs/s target needs ~4k image decodes/s sustained). The
// reference leans on OpenCV's C++ imread from Python one image at a time
// (reference lib/datasets/utils.py:7-17); this module decodes a whole batch
// of JPEGs across a std::thread pool with the GIL released, emitting the
// final NHWC float32 [0,1] tensor the device program consumes — one Python
// call per batch, zero intermediate copies.
//
// Build: python native/build.py
// Python API:
//   decode_resize_batch(paths: list[bytes|str], width: int, height: int,
//                       num_threads: int = 0) -> np.ndarray [N, H, W, 3] f32

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <type_traits>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file to interleaved 3-channel pixels. Returns false on any
// failure. `ycbcr` selects the colour space: false -> RGB8; true -> the
// decoder's native YCbCr (skips libjpeg's per-pixel colour transform; a
// grayscale source is expanded to (g, 128, 128), which IS its exact YCbCr).
// When the target dims (dw, dh) correspond EXACTLY to a libjpeg M/8 scale of
// the source, the IDCT is run at that reduced scale (e.g. 540x720 -> 270x360
// decodes at 4/8 scale, ~4x less IDCT work) — the downstream resize then hits
// its identity fast path. Inexact ratios decode at full resolution so the
// bilinear resize stays cv2-compatible.
bool decode_jpeg(const std::string& path, std::vector<unsigned char>& rgb,
                 int& width, int& height, int dw, int dh,
                 std::vector<unsigned char>& filebuf, bool ycbcr = false) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  const long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (fsize <= 0) {
    fclose(f);
    return false;
  }
  filebuf.resize(static_cast<size_t>(fsize));
  const size_t got = fread(filebuf.data(), 1, filebuf.size(), f);
  fclose(f);
  if (got != filebuf.size()) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, filebuf.data(), filebuf.size());
  jpeg_read_header(&cinfo, TRUE);
  const bool gray_src = cinfo.jpeg_color_space == JCS_GRAYSCALE;
  cinfo.out_color_space =
      ycbcr ? (gray_src ? JCS_GRAYSCALE : JCS_YCbCr) : JCS_RGB;

  if (dw > 0 && dh > 0) {
    const long W = cinfo.image_width, H = cinfo.image_height;
    for (int num = 1; num <= 8; ++num) {
      const long ow = (W * num + 7) / 8, oh = (H * num + 7) / 8;
      if (ow == dw && oh == dh) {
        cinfo.scale_num = num;
        cinfo.scale_denom = 8;
        break;
      }
      if (ow >= dw && oh >= dh) break;  // smaller scales only shrink further
    }
  }

  jpeg_start_decompress(&cinfo);

  width = static_cast<int>(cinfo.output_width);
  height = static_cast<int>(cinfo.output_height);
  const int comps = cinfo.output_components;  // 3, or 1 for grayscale+ycbcr
  const int stride = width * comps;
  rgb.resize(static_cast<size_t>(width) * height * 3);

  std::vector<unsigned char*> rows(cinfo.rec_outbuf_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    const JDIMENSION base = cinfo.output_scanline;
    const int avail =
        std::min<int>(cinfo.rec_outbuf_height, cinfo.output_height - base);
    for (int r = 0; r < avail; ++r) {
      rows[r] = rgb.data() + static_cast<size_t>(base + r) * stride;
    }
    jpeg_read_scanlines(&cinfo, rows.data(), avail);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  if (comps == 1) {
    // expand packed grayscale to its exact YCbCr (g, 128, 128), back-to-front
    // so reads (at i) always trail writes (at >= 3i >= i)
    for (long i = static_cast<long>(width) * height - 1; i >= 0; --i) {
      const unsigned char g = rgb[i];
      rgb[3 * i + 0] = g;
      rgb[3 * i + 1] = 128;
      rgb[3 * i + 2] = 128;
    }
  }
  return true;
}

// Bilinear resize RGB8 -> float32 [0,1] or uint8 NHWC slice
// (OpenCV-compatible half-pixel center convention, matching cv2.resize
// INTER_LINEAR). Column offsets/weights are precomputed once per image; the
// two source rows are first horizontally resampled into float scanlines,
// then blended vertically — O(dw) coefficient work per row instead of per
// pixel.
template <typename T>
void resize_normalize(const unsigned char* src, int sw, int sh, T* dst,
                      int dw, int dh) {
  constexpr bool kFloatOut = std::is_same<T, float>::value;
  if (sw == dw && sh == dh) {
    // identity resize (the MapFree val case: images stored at target res)
    const size_t n = static_cast<size_t>(dw) * dh * 3;
    if (kFloatOut) {
      const float inv = 1.0f / 255.0f;
      for (size_t i = 0; i < n; ++i) dst[i] = static_cast<T>(src[i] * inv);
    } else {
      std::memcpy(dst, src, n);
    }
    return;
  }
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;

  std::vector<int> x0s(dw);
  std::vector<float> wxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    if (fx < 0) fx = 0;
    int x0 = static_cast<int>(fx);
    if (x0 > sw - 2) x0 = sw - 2;
    x0s[x] = x0 * 3;
    wxs[x] = fx - x0;
  }

  std::vector<float> row_top(static_cast<size_t>(dw) * 3);
  std::vector<float> row_bot(static_cast<size_t>(dw) * 3);
  int cached_y0 = -2;
  const float inv255 = 1.0f / 255.0f;

  auto hresample = [&](const unsigned char* s, float* out) {
    for (int x = 0; x < dw; ++x) {
      const unsigned char* p0 = s + x0s[x];
      const float wx = wxs[x];
      const float iwx = 1.0f - wx;
      out[x * 3 + 0] = p0[0] * iwx + p0[3] * wx;
      out[x * 3 + 1] = p0[1] * iwx + p0[4] * wx;
      out[x * 3 + 2] = p0[2] * iwx + p0[5] * wx;
    }
  };

  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > sh - 2) y0 = sh - 2;
    const float wy = fy - y0;
    const float iwy = 1.0f - wy;

    if (y0 == cached_y0 + 1) {
      row_top.swap(row_bot);
      hresample(src + static_cast<size_t>(y0 + 1) * sw * 3, row_bot.data());
    } else if (y0 != cached_y0) {
      hresample(src + static_cast<size_t>(y0) * sw * 3, row_top.data());
      hresample(src + static_cast<size_t>(y0 + 1) * sw * 3, row_bot.data());
    }
    cached_y0 = y0;

    T* out = dst + static_cast<size_t>(y) * dw * 3;
    const int n3 = dw * 3;
    if (kFloatOut) {
      for (int i = 0; i < n3; ++i) {
        out[i] = static_cast<T>((row_top[i] * iwy + row_bot[i] * wy) * inv255);
      }
    } else {
      for (int i = 0; i < n3; ++i) {
        out[i] =
            static_cast<T>(row_top[i] * iwy + row_bot[i] * wy + 0.5f);
      }
    }
  }
}

// Pack interleaved YCbCr8 [dh, dw, 3] into planar YUV420 [dh*3/2, dw]:
// rows 0..dh hold the full-res Y plane; the bottom dh/2 rows hold the
// 2x2-box-averaged chroma side by side (U in columns 0..dw/2, V in the
// rest). dw and dh must be even. The packed layout ships HALF the bytes of
// interleaved 3-channel uint8 — on a remote-tunnel or PCIe link the
// host->device transfer is the submission sweep's dominant stage, and the
// device unpack (two small interpolation matmuls + a 3x3 colour matrix,
// ops/image.py) is noise next to the encoder.
void pack_yuv420(const unsigned char* ycc, int dw, int dh,
                 unsigned char* dst) {
  for (long i = 0; i < static_cast<long>(dw) * dh; ++i) dst[i] = ycc[3 * i];
  unsigned char* uv = dst + static_cast<size_t>(dw) * dh;
  const int hw = dw / 2;
  for (int y = 0; y < dh / 2; ++y) {
    const unsigned char* r0 = ycc + static_cast<size_t>(2 * y) * dw * 3;
    const unsigned char* r1 = r0 + static_cast<size_t>(dw) * 3;
    unsigned char* urow = uv + static_cast<size_t>(y) * dw;
    for (int x = 0; x < hw; ++x) {
      const int o = 6 * x;
      urow[x] = static_cast<unsigned char>(
          (r0[o + 1] + r0[o + 4] + r1[o + 1] + r1[o + 4] + 2) >> 2);
      urow[hw + x] = static_cast<unsigned char>(
          (r0[o + 2] + r0[o + 5] + r1[o + 2] + r1[o + 5] + 2) >> 2);
    }
  }
}

// Raw-plane JPEG decode straight into the packed YUV420 layout.
//
// For 4:2:0 (or grayscale) sources whose target dims equal an exact M/8
// libjpeg scale, jpeg_read_raw_data() yields the scaled Y/Cb/Cr planes
// with NO chroma upsampling, NO color conversion, and no repack — the
// three per-pixel passes the interleaved path pays before pack_yuv420
// re-downsamples the chroma it just upsampled. Measured ~25-35% off the
// per-image decode cost at the flagship half-scale settings (the e2e
// sweep's host floor on this 1-core machine). Returns false (untouched
// dst) whenever the source/scale does not fit; caller falls back.
bool decode_jpeg_raw_yuv420(const std::string& path, unsigned char* dst,
                            int dw, int dh,
                            std::vector<unsigned char>& filebuf,
                            std::vector<unsigned char>& scratch) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  const long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (fsize <= 0) {
    fclose(f);
    return false;
  }
  filebuf.resize(static_cast<size_t>(fsize));
  const size_t got = fread(filebuf.data(), 1, filebuf.size(), f);
  fclose(f);
  if (got != filebuf.size()) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, filebuf.data(), filebuf.size());
  jpeg_read_header(&cinfo, TRUE);

  const bool gray_src = cinfo.jpeg_color_space == JCS_GRAYSCALE;
  bool is420 = false;
  if (!gray_src) {
    if (cinfo.num_components != 3 ||
        cinfo.jpeg_color_space != JCS_YCbCr) {
      jpeg_destroy_decompress(&cinfo);
      return false;
    }
    is420 = cinfo.comp_info[0].h_samp_factor == 2 &&
            cinfo.comp_info[0].v_samp_factor == 2 &&
            cinfo.comp_info[1].h_samp_factor == 1 &&
            cinfo.comp_info[1].v_samp_factor == 1 &&
            cinfo.comp_info[2].h_samp_factor == 1 &&
            cinfo.comp_info[2].v_samp_factor == 1;
    if (!is420) {
      jpeg_destroy_decompress(&cinfo);
      return false;
    }
  }

  // exact M/8 scale match (same search as decode_jpeg)
  bool matched = false;
  const long W = cinfo.image_width, H = cinfo.image_height;
  for (int num = 1; num <= 8; ++num) {
    const long ow = (W * num + 7) / 8, oh = (H * num + 7) / 8;
    if (ow == dw && oh == dh) {
      cinfo.scale_num = num;
      cinfo.scale_denom = 8;
      matched = true;
      break;
    }
    if (ow >= dw && oh >= dh) break;
  }
  if (!matched) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }

  cinfo.raw_data_out = TRUE;
  cinfo.do_fancy_upsampling = FALSE;
  // raw output bypasses colour conversion; libjpeg errors out unless the
  // requested out space IS the source space
  cinfo.out_color_space = cinfo.jpeg_color_space;
  jpeg_calc_output_dimensions(&cinfo);
  jpeg_start_decompress(&cinfo);

  if (static_cast<int>(cinfo.output_width) != dw ||
      static_cast<int>(cinfo.output_height) != dh ||
      (!gray_src &&
       (static_cast<int>(cinfo.comp_info[1].downsampled_width) != dw / 2 ||
        static_cast<int>(cinfo.comp_info[1].downsampled_height) != dh / 2))) {
    jpeg_destroy_decompress(&cinfo);  // odd dims / unexpected scaling
    return false;
  }

  // per-call line count: one iMCU row of luma lines
  const int v_samp = gray_src ? 1 : 2;
  const int blk = cinfo.comp_info[0].DCT_scaled_size;
  const int lines_per_call = v_samp * blk;

  // scratch rows padded to the block grid (libjpeg writes full blocks)
  const int y_stride =
      static_cast<int>(cinfo.comp_info[0].width_in_blocks) * blk;
  const int c_blk = gray_src ? 0 : cinfo.comp_info[1].DCT_scaled_size;
  const int c_stride =
      gray_src ? 0
               : static_cast<int>(cinfo.comp_info[1].width_in_blocks) * c_blk;
  const int c_lines = gray_src ? 0 : blk;  // chroma rows per call (v=1)
  scratch.resize(static_cast<size_t>(y_stride) * lines_per_call +
                 2 * static_cast<size_t>(c_stride) * (c_lines ? c_lines : 1));

  std::vector<JSAMPROW> yrows(lines_per_call), urows(std::max(c_lines, 1)),
      vrows(std::max(c_lines, 1));
  unsigned char* ybuf = scratch.data();
  unsigned char* ubuf = ybuf + static_cast<size_t>(y_stride) * lines_per_call;
  unsigned char* vbuf = ubuf + static_cast<size_t>(c_stride) * (c_lines ? c_lines : 1);
  for (int r = 0; r < lines_per_call; ++r)
    yrows[r] = ybuf + static_cast<size_t>(r) * y_stride;
  for (int r = 0; r < (c_lines ? c_lines : 1); ++r) {
    urows[r] = ubuf + static_cast<size_t>(r) * c_stride;
    vrows[r] = vbuf + static_cast<size_t>(r) * c_stride;
  }
  JSAMPARRAY planes[3] = {yrows.data(), urows.data(), vrows.data()};

  unsigned char* ydst = dst;                                   // [dh, dw]
  unsigned char* uvdst = dst + static_cast<size_t>(dw) * dh;   // [dh/2, dw]
  const int hw = dw / 2;

  while (cinfo.output_scanline < cinfo.output_height) {
    const int base = static_cast<int>(cinfo.output_scanline);
    const JDIMENSION read = jpeg_read_raw_data(&cinfo, planes, lines_per_call);
    if (read == 0) {
      jpeg_destroy_decompress(&cinfo);
      return false;
    }
    const int valid = std::min<int>(static_cast<int>(read), dh - base);
    for (int r = 0; r < valid; ++r)
      std::memcpy(ydst + static_cast<size_t>(base + r) * dw, yrows[r], dw);
    if (!gray_src) {
      const int cbase = base / 2;
      const int cvalid = std::min(c_lines, dh / 2 - cbase);
      for (int r = 0; r < cvalid; ++r) {
        unsigned char* out = uvdst + static_cast<size_t>(cbase + r) * dw;
        std::memcpy(out, urows[r], hw);
        std::memcpy(out + hw, vrows[r], hw);
      }
    }
  }
  if (gray_src) {
    std::memset(uvdst, 128, static_cast<size_t>(dh / 2) * dw);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

}  // namespace

static PyObject* decode_resize_batch(PyObject* /*self*/, PyObject* args,
                                     PyObject* kwargs) {
  PyObject* paths_obj;
  int width, height;
  int num_threads = 0;
  int uint8_out = 0;
  int yuv420 = 0;
  static const char* kwlist[] = {"paths", "width", "height", "num_threads",
                                 "uint8", "yuv420", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "Oii|ipp",
                                   const_cast<char**>(kwlist), &paths_obj,
                                   &width, &height, &num_threads,
                                   &uint8_out, &yuv420)) {
    return nullptr;
  }
  if (yuv420 && (width % 2 != 0 || height % 2 != 0)) {
    PyErr_SetString(PyExc_ValueError,
                    "yuv420 output requires even width and height");
    return nullptr;
  }

  PyObject* seq = PySequence_Fast(paths_obj, "paths must be a sequence");
  if (!seq) return nullptr;
  const Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);

  std::vector<std::string> paths;
  paths.reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
    if (PyUnicode_Check(item)) {
      paths.emplace_back(PyUnicode_AsUTF8(item));
    } else if (PyBytes_Check(item)) {
      paths.emplace_back(PyBytes_AsString(item));
    } else {
      Py_DECREF(seq);
      PyErr_SetString(PyExc_TypeError, "paths must be str or bytes");
      return nullptr;
    }
  }
  Py_DECREF(seq);

  PyArrayObject* arr;
  size_t img_elems;
  if (yuv420) {
    npy_intp dims[3] = {n, height + height / 2, width};
    arr = reinterpret_cast<PyArrayObject*>(
        PyArray_SimpleNew(3, dims, NPY_UINT8));
    img_elems = static_cast<size_t>(height + height / 2) * width;
  } else {
    npy_intp dims[4] = {n, height, width, 3};
    arr = reinterpret_cast<PyArrayObject*>(
        PyArray_SimpleNew(4, dims, uint8_out ? NPY_UINT8 : NPY_FLOAT32));
    img_elems = static_cast<size_t>(height) * width * 3;
  }
  if (!arr) return nullptr;
  void* data = PyArray_DATA(arr);
  const size_t elem_size = (uint8_out || yuv420) ? 1 : sizeof(float);

  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  if (num_threads > n && n > 0) num_threads = static_cast<int>(n);

  std::atomic<long> next(0);
  std::atomic<long> failures(0);

  Py_BEGIN_ALLOW_THREADS
  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    std::vector<unsigned char> filebuf;
    std::vector<unsigned char> scratch;  // resized YCbCr for the yuv420 pack
    while (true) {
      const long i = next.fetch_add(1);
      if (i >= n) break;
      if (yuv420 &&
          decode_jpeg_raw_yuv420(
              paths[i], static_cast<unsigned char*>(data) + img_elems * i,
              width, height, filebuf, scratch)) {
        continue;  // raw-plane fast path wrote the packed output directly
      }
      int sw = 0, sh = 0;
      if (decode_jpeg(paths[i], rgb, sw, sh, width, height, filebuf,
                      yuv420 != 0) &&
          sw >= 2 && sh >= 2) {
        if (yuv420) {
          const unsigned char* ycc = rgb.data();
          if (sw != width || sh != height) {
            scratch.resize(static_cast<size_t>(width) * height * 3);
            resize_normalize(rgb.data(), sw, sh, scratch.data(), width,
                             height);
            ycc = scratch.data();
          }
          pack_yuv420(ycc, width, height,
                      static_cast<unsigned char*>(data) + img_elems * i);
        } else if (uint8_out) {
          resize_normalize(rgb.data(), sw, sh,
                           static_cast<unsigned char*>(data) + img_elems * i,
                           width, height);
        } else {
          resize_normalize(rgb.data(), sw, sh,
                           static_cast<float*>(data) + img_elems * i, width,
                           height);
        }
      } else {
        char* out = static_cast<char*>(data) + img_elems * elem_size * i;
        std::memset(out, 0, img_elems * elem_size);
        if (yuv420) {  // black = (Y 0, chroma 128), not (0, 0, 0)
          std::memset(out + static_cast<size_t>(height) * width, 128,
                      static_cast<size_t>(height / 2) * width);
        }
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  Py_END_ALLOW_THREADS

  if (failures.load() > 0) {
    if (PyErr_WarnFormat(PyExc_RuntimeWarning, 1,
                         "%ld of %ld images failed to decode (zero-filled)",
                         failures.load(), static_cast<long>(n)) < 0) {
      Py_DECREF(arr);
      return nullptr;
    }
  }
  return reinterpret_cast<PyObject*>(arr);
}

static PyMethodDef Methods[] = {
    {"decode_resize_batch", reinterpret_cast<PyCFunction>(decode_resize_batch),
     METH_VARARGS | METH_KEYWORDS,
     "Decode a batch of JPEG paths to a float32 NHWC array in [0, 1]."},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "mapfree_native",
    "Native batch JPEG decode/resize for the mapfree_tpu data pipeline.", -1,
    Methods,
};

PyMODINIT_FUNC PyInit_mapfree_native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
