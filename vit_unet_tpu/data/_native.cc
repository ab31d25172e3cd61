// Native data-path accelerators for vit_unet_tpu.data.tfrecord.
//
// The TFRecord wire format (as written by the reference's converter,
// Convert_tfrecords.ipynb cells 0-3, and consumed at ViT_UNet_TF_TPU.ipynb
// cell 16) frames each record as
//     uint64 length | masked_crc32c(length) | payload | masked_crc32c(payload)
// (little-endian, CRC32-Castagnoli).  Scanning + CRC verification is the
// host-side hot loop of the input pipeline; this module implements it in C++
// (slicing-by-8 CRC32C, single-pass shard scans) behind the pure-Python
// fallback in tfrecord.py.  Built as a plain CPython extension (no pybind11):
//     python setup.py build_ext --inplace
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CRC32-Castagnoli, slicing-by-8.
// ---------------------------------------------------------------------------

uint32_t g_tables[8][256];
bool g_tables_ready = false;

void init_tables() {
  if (g_tables_ready) return;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int k = 0; k < 8; ++k)
      crc = (crc >> 1) ^ (0x82F63B78u & (0u - (crc & 1u)));
    g_tables[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i)
    for (int t = 1; t < 8; ++t)
      g_tables[t][i] =
          (g_tables[t - 1][i] >> 8) ^ g_tables[0][g_tables[t - 1][i] & 0xFF];
  g_tables_ready = true;
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
  // Process 8 bytes at a time.
  while (n >= 8) {
    uint64_t chunk;
    std::memcpy(&chunk, data, 8);
    chunk ^= crc;  // little-endian host assumed (x86/arm64)
    crc = g_tables[7][chunk & 0xFF] ^ g_tables[6][(chunk >> 8) & 0xFF] ^
          g_tables[5][(chunk >> 16) & 0xFF] ^ g_tables[4][(chunk >> 24) & 0xFF] ^
          g_tables[3][(chunk >> 32) & 0xFF] ^ g_tables[2][(chunk >> 40) & 0xFF] ^
          g_tables[1][(chunk >> 48) & 0xFF] ^ g_tables[0][(chunk >> 56) & 0xFF];
    data += 8;
    n -= 8;
  }
  while (n--) crc = (crc >> 8) ^ g_tables[0][(crc ^ *data++) & 0xFF];
  return crc ^ 0xFFFFFFFFu;
}

inline uint32_t masked(uint32_t crc) {
  return (((crc >> 15) | (crc << 17)) + 0xA282EAD8u);
}

// ---------------------------------------------------------------------------
// Python bindings
// ---------------------------------------------------------------------------

PyObject* py_crc32c(PyObject*, PyObject* arg) {
  Py_buffer view;
  if (PyObject_GetBuffer(arg, &view, PyBUF_SIMPLE) < 0) return nullptr;
  uint32_t crc;
  Py_BEGIN_ALLOW_THREADS
  crc = crc32c(static_cast<const uint8_t*>(view.buf),
               static_cast<size_t>(view.len));
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return PyLong_FromUnsignedLong(crc);
}

PyObject* py_masked_crc(PyObject*, PyObject* arg) {
  Py_buffer view;
  if (PyObject_GetBuffer(arg, &view, PyBUF_SIMPLE) < 0) return nullptr;
  uint32_t crc;
  Py_BEGIN_ALLOW_THREADS
  crc = masked(crc32c(static_cast<const uint8_t*>(view.buf),
                      static_cast<size_t>(view.len)));
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return PyLong_FromUnsignedLong(crc);
}

// scan_records(buffer, verify_crc=True) -> list[(offset, length)]
// Offsets point at each record's payload inside the buffer.
PyObject* py_scan_records(PyObject*, PyObject* args, PyObject* kwargs) {
  static const char* kwlist[] = {"data", "verify_crc", nullptr};
  PyObject* data_obj;
  int verify = 1;
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "O|p",
                                   const_cast<char**>(kwlist), &data_obj,
                                   &verify))
    return nullptr;
  Py_buffer view;
  if (PyObject_GetBuffer(data_obj, &view, PyBUF_SIMPLE) < 0) return nullptr;
  const uint8_t* buf = static_cast<const uint8_t*>(view.buf);
  const size_t n = static_cast<size_t>(view.len);

  std::vector<std::pair<uint64_t, uint64_t>> spans;
  Py_ssize_t bad_offset = -1;
  const char* bad_kind = nullptr;
  Py_BEGIN_ALLOW_THREADS
  size_t pos = 0;
  while (pos + 16 <= n) {
    uint64_t length;
    std::memcpy(&length, buf + pos, 8);
    // overflow-safe bound: `pos + 16 + length > n` can wrap for a corrupt
    // length near 2^64 and pass, reading wild memory
    if (length > n - pos - 16) {
      bad_offset = static_cast<Py_ssize_t>(pos);
      bad_kind = "truncated record";
      break;
    }
    if (verify) {
      uint32_t hcrc, pcrc;
      std::memcpy(&hcrc, buf + pos + 8, 4);
      std::memcpy(&pcrc, buf + pos + 12 + length, 4);
      if (masked(crc32c(buf + pos, 8)) != hcrc) {
        bad_offset = static_cast<Py_ssize_t>(pos);
        bad_kind = "corrupt record header";
        break;
      }
      if (masked(crc32c(buf + pos + 12, length)) != pcrc) {
        bad_offset = static_cast<Py_ssize_t>(pos);
        bad_kind = "corrupt record payload";
        break;
      }
    }
    spans.emplace_back(pos + 12, length);
    pos += 16 + length;
  }
  if (bad_kind == nullptr && pos != n) {
    bad_offset = static_cast<Py_ssize_t>(pos);
    bad_kind = "trailing garbage";
  }
  Py_END_ALLOW_THREADS

  if (bad_kind != nullptr) {
    PyBuffer_Release(&view);
    PyErr_Format(PyExc_IOError, "%s at offset %zd", bad_kind, bad_offset);
    return nullptr;
  }
  PyObject* out = PyList_New(static_cast<Py_ssize_t>(spans.size()));
  if (!out) {
    PyBuffer_Release(&view);
    return nullptr;
  }
  for (size_t i = 0; i < spans.size(); ++i) {
    PyObject* tup = Py_BuildValue("(KK)",
                                  (unsigned long long)spans[i].first,
                                  (unsigned long long)spans[i].second);
    if (!tup) {
      Py_DECREF(out);
      PyBuffer_Release(&view);
      return nullptr;
    }
    PyList_SET_ITEM(out, static_cast<Py_ssize_t>(i), tup);
  }
  PyBuffer_Release(&view);
  return out;
}

// read_records(data, verify_crc=True) -> list[bytes]
PyObject* py_read_records(PyObject* self, PyObject* args, PyObject* kwargs) {
  PyObject* spans = py_scan_records(self, args, kwargs);
  if (!spans) return nullptr;
  PyObject* data_obj = PyTuple_GET_ITEM(args, 0);
  Py_buffer view;
  if (PyObject_GetBuffer(data_obj, &view, PyBUF_SIMPLE) < 0) {
    Py_DECREF(spans);
    return nullptr;
  }
  const char* buf = static_cast<const char*>(view.buf);
  Py_ssize_t count = PyList_GET_SIZE(spans);
  PyObject* out = PyList_New(count);
  if (!out) {
    Py_DECREF(spans);
    PyBuffer_Release(&view);
    return nullptr;
  }
  for (Py_ssize_t i = 0; i < count; ++i) {
    PyObject* tup = PyList_GET_ITEM(spans, i);
    unsigned long long off = PyLong_AsUnsignedLongLong(PyTuple_GET_ITEM(tup, 0));
    unsigned long long len = PyLong_AsUnsignedLongLong(PyTuple_GET_ITEM(tup, 1));
    PyObject* b = PyBytes_FromStringAndSize(buf + off,
                                            static_cast<Py_ssize_t>(len));
    if (!b) {
      Py_DECREF(out);
      Py_DECREF(spans);
      PyBuffer_Release(&view);
      return nullptr;
    }
    PyList_SET_ITEM(out, i, b);
  }
  Py_DECREF(spans);
  PyBuffer_Release(&view);
  return out;
}

PyMethodDef kMethods[] = {
    {"crc32c", py_crc32c, METH_O,
     "crc32c(data) -> int: CRC32-Castagnoli of a bytes-like object."},
    {"masked_crc", py_masked_crc, METH_O,
     "masked_crc(data) -> int: TFRecord-masked CRC32C."},
    {"scan_records", (PyCFunction)py_scan_records,
     METH_VARARGS | METH_KEYWORDS,
     "scan_records(data, verify_crc=True) -> [(payload_offset, length)]"},
    {"read_records", (PyCFunction)py_read_records,
     METH_VARARGS | METH_KEYWORDS,
     "read_records(data, verify_crc=True) -> [payload bytes]"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_native",
    "C++ fast paths for the TFRecord codec (CRC32C, record scanning).",
    -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
  init_tables();
  return PyModule_Create(&kModule);
}
