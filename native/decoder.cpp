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

#include <atomic>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
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
bool decode_jpeg(const std::string& path, std::vector<unsigned char>& rgb,
                 int& width, int& height) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  width = static_cast<int>(cinfo.output_width);
  height = static_cast<int>(cinfo.output_height);
  const int stride = width * 3;
  rgb.resize(static_cast<size_t>(stride) * height);

  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize RGB8 -> float32 [0,1] NHWC slice (OpenCV-compatible
// half-pixel center convention, matching cv2.resize INTER_LINEAR).
// Column offsets/weights are precomputed once per image; the two source rows
// are first horizontally resampled into float scanlines, then blended
// vertically — O(dw) coefficient work per row instead of per pixel.
void resize_normalize(const unsigned char* src, int sw, int sh, float* dst,
                      int dw, int dh) {
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

    float* out = dst + static_cast<size_t>(y) * dw * 3;
    const int n3 = dw * 3;
    for (int i = 0; i < n3; ++i) {
      out[i] = (row_top[i] * iwy + row_bot[i] * wy) * inv255;
    }
  }
}

}  // namespace

static PyObject* decode_resize_batch(PyObject* /*self*/, PyObject* args,
                                     PyObject* kwargs) {
  PyObject* paths_obj;
  int width, height;
  int num_threads = 0;
  static const char* kwlist[] = {"paths", "width", "height", "num_threads",
                                 nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "Oii|i",
                                   const_cast<char**>(kwlist), &paths_obj,
                                   &width, &height, &num_threads)) {
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
  PyArrayObject* arr =
      reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(4, dims, NPY_FLOAT32));
  if (!arr) return nullptr;
  float* data = static_cast<float*>(PyArray_DATA(arr));
  const size_t img_elems = static_cast<size_t>(height) * width * 3;

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
    while (true) {
      const long i = next.fetch_add(1);
      if (i >= n) break;
      int sw = 0, sh = 0;
      if (decode_jpeg(paths[i], rgb, sw, sh) && sw >= 2 && sh >= 2) {
        resize_normalize(rgb.data(), sw, sh, data + img_elems * i, width,
                         height);
      } else {
        std::memset(data + img_elems * i, 0, img_elems * sizeof(float));
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
