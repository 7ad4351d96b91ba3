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

// Decode one JPEG file to RGB8. Returns false on any failure.
// When the target dims (dw, dh) correspond EXACTLY to a libjpeg M/8 scale of
// the source, the IDCT is run at that reduced scale (e.g. 540x720 -> 270x360
// decodes at 4/8 scale, ~4x less IDCT work) — the downstream resize then hits
// its identity fast path. Inexact ratios decode at full resolution so the
// bilinear resize stays cv2-compatible.
bool decode_jpeg(const std::string& path, std::vector<unsigned char>& rgb,
                 int& width, int& height, int dw, int dh,
                 std::vector<unsigned char>& filebuf) {
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
  cinfo.out_color_space = JCS_RGB;

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
  const int stride = width * 3;
  rgb.resize(static_cast<size_t>(stride) * height);

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

}  // namespace

static PyObject* decode_resize_batch(PyObject* /*self*/, PyObject* args,
                                     PyObject* kwargs) {
  PyObject* paths_obj;
  int width, height;
  int num_threads = 0;
  int uint8_out = 0;
  static const char* kwlist[] = {"paths", "width", "height", "num_threads",
                                 "uint8", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "Oii|ip",
                                   const_cast<char**>(kwlist), &paths_obj,
                                   &width, &height, &num_threads,
                                   &uint8_out)) {
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

  npy_intp dims[4] = {n, height, width, 3};
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(4, dims, uint8_out ? NPY_UINT8 : NPY_FLOAT32));
  if (!arr) return nullptr;
  void* data = PyArray_DATA(arr);
  const size_t img_elems = static_cast<size_t>(height) * width * 3;
  const size_t elem_size = uint8_out ? 1 : sizeof(float);

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
    while (true) {
      const long i = next.fetch_add(1);
      if (i >= n) break;
      int sw = 0, sh = 0;
      if (decode_jpeg(paths[i], rgb, sw, sh, width, height, filebuf) &&
          sw >= 2 && sh >= 2) {
        if (uint8_out) {
          resize_normalize(rgb.data(), sw, sh,
                           static_cast<unsigned char*>(data) + img_elems * i,
                           width, height);
        } else {
          resize_normalize(rgb.data(), sw, sh,
                           static_cast<float*>(data) + img_elems * i, width,
                           height);
        }
      } else {
        std::memset(static_cast<char*>(data) + img_elems * elem_size * i, 0,
                    img_elems * elem_size);
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
