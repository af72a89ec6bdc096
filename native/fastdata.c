/* fastdata — native data-plane for audio2photoreal_tpu.
 *
 * Replaces the role of torch's C++ DataLoader workers in the reference
 * (data_loaders/get_data.py:35-43, num_workers=8): windowed, zero-copy-ish
 * batch assembly from the on-disk dataset contract:
 *   - 16-bit PCM wav windows (seek + read only the requested frames)
 *   - float32 .npy row windows (header parsed once, direct fseek)
 *   - z-normalization fused into the copy loop
 *
 * Exposed as a CPython extension (no pybind11 in the image):
 *   fastdata.read_wav_window(path, start_frame, n_frames) -> bytes (float32 interleaved), channels
 *   fastdata.read_npy_rows(path, start_row, n_rows) -> bytes (float32), n_cols
 *   fastdata.normalize_into(dst_bytes, src_bytes, mean_bytes, inv_std) -- fused (x-mean)*inv_std
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* ---------------- wav ---------------- */

typedef struct {
    uint16_t channels;
    uint32_t sample_rate;
    uint16_t bits;
    long data_offset;
    uint32_t data_bytes;
} WavInfo;

static int parse_wav_header(FILE *f, WavInfo *info) {
    uint8_t hdr[12];
    if (fread(hdr, 1, 12, f) != 12) return -1;
    if (memcmp(hdr, "RIFF", 4) || memcmp(hdr + 8, "WAVE", 4)) return -1;
    for (;;) {
        uint8_t chunk[8];
        if (fread(chunk, 1, 8, f) != 8) return -1;
        uint32_t size;
        memcpy(&size, chunk + 4, 4);
        if (!memcmp(chunk, "fmt ", 4)) {
            uint8_t fmt[16];
            if (size < 16 || fread(fmt, 1, 16, f) != 16) return -1;
            memcpy(&info->channels, fmt + 2, 2);
            memcpy(&info->sample_rate, fmt + 4, 4);
            memcpy(&info->bits, fmt + 14, 2);
            if (size > 16) fseek(f, size - 16, SEEK_CUR);
        } else if (!memcmp(chunk, "data", 4)) {
            info->data_offset = ftell(f);
            info->data_bytes = size;
            return 0;
        } else {
            fseek(f, size, SEEK_CUR);
        }
    }
}

static PyObject *read_wav_window(PyObject *self, PyObject *args) {
    const char *path;
    Py_ssize_t start, n;
    if (!PyArg_ParseTuple(args, "snn", &path, &start, &n)) return NULL;
    FILE *f = fopen(path, "rb");
    if (!f) return PyErr_Format(PyExc_IOError, "cannot open %s", path);
    WavInfo info;
    if (parse_wav_header(f, &info) || info.bits != 16) {
        fclose(f);
        return PyErr_Format(PyExc_ValueError, "unsupported wav %s", path);
    }
    int ch = info.channels;
    long total = info.data_bytes / (2 * ch);
    if (start < 0 || start + n > total) {
        fclose(f);
        return PyErr_Format(PyExc_ValueError, "window [%zd,%zd) out of %ld frames",
                            start, start + n, total);
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)(n * ch * 4));
    if (!out) { fclose(f); return NULL; }
    float *dst = (float *)PyBytes_AS_STRING(out);
    int16_t *tmp = (int16_t *)malloc((size_t)n * ch * 2);
    if (!tmp) { fclose(f); Py_DECREF(out); return PyErr_NoMemory(); }

    Py_BEGIN_ALLOW_THREADS
    fseek(f, info.data_offset + (long)start * 2 * ch, SEEK_SET);
    size_t got = fread(tmp, 2, (size_t)n * ch, f);
    for (size_t i = 0; i < got; i++) dst[i] = (float)tmp[i] / 32768.0f;
    for (size_t i = got; i < (size_t)(n * ch); i++) dst[i] = 0.0f;
    Py_END_ALLOW_THREADS

    free(tmp);
    fclose(f);
    return Py_BuildValue("(Ni)", out, ch);
}

/* ---------------- npy ---------------- */

static int parse_npy_header(FILE *f, long *rows, long *cols, long *data_offset) {
    uint8_t magic[10];
    if (fread(magic, 1, 10, f) != 10) return -1;
    if (memcmp(magic, "\x93NUMPY", 6)) return -1;
    int major = magic[6];
    uint32_t hlen;
    if (major == 1) {
        hlen = magic[8] | (magic[9] << 8);
    } else {
        uint8_t ext[2];
        if (fread(ext, 1, 2, f) != 2) return -1;
        hlen = magic[8] | (magic[9] << 8) | (ext[0] << 16) | (ext[1] << 24);
        /* v2 header length is 4 bytes: re-read properly */
        fseek(f, 8, SEEK_SET);
        uint8_t l4[4];
        if (fread(l4, 1, 4, f) != 4) return -1;
        hlen = l4[0] | (l4[1] << 8) | (l4[2] << 16) | (l4[3] << 24);
    }
    char *hdr = (char *)malloc(hlen + 1);
    if (!hdr) return -1;
    if (fread(hdr, 1, hlen, f) != hlen) { free(hdr); return -1; }
    hdr[hlen] = 0;
    if (!strstr(hdr, "'descr': '<f4'") && !strstr(hdr, "\"descr\": \"<f4\"")) {
        free(hdr);
        return -2; /* only float32 C-order supported */
    }
    if (strstr(hdr, "'fortran_order': True")) { free(hdr); return -2; }
    char *shp = strstr(hdr, "'shape': (");
    if (!shp) { free(hdr); return -1; }
    shp += 10;
    *rows = strtol(shp, &shp, 10);
    while (*shp == ',' || *shp == ' ') shp++;
    *cols = (*shp == ')') ? 1 : strtol(shp, NULL, 10);
    free(hdr);
    *data_offset = ftell(f);
    return 0;
}

static PyObject *read_npy_rows(PyObject *self, PyObject *args) {
    const char *path;
    Py_ssize_t start, n;
    if (!PyArg_ParseTuple(args, "snn", &path, &start, &n)) return NULL;
    FILE *f = fopen(path, "rb");
    if (!f) return PyErr_Format(PyExc_IOError, "cannot open %s", path);
    long rows, cols, off;
    int rc = parse_npy_header(f, &rows, &cols, &off);
    if (rc) {
        fclose(f);
        return PyErr_Format(PyExc_ValueError, "bad/unsupported npy %s (rc=%d)", path, rc);
    }
    if (start < 0 || start + n > rows) {
        fclose(f);
        return PyErr_Format(PyExc_ValueError, "rows [%zd,%zd) out of %ld", start, start + n, rows);
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)(n * cols * 4));
    if (!out) { fclose(f); return NULL; }
    char *dst = PyBytes_AS_STRING(out);
    Py_BEGIN_ALLOW_THREADS
    fseek(f, off + (long)start * cols * 4, SEEK_SET);
    size_t got = fread(dst, 4, (size_t)(n * cols), f);
    if (got < (size_t)(n * cols))
        memset(dst + got * 4, 0, ((size_t)(n * cols) - got) * 4);
    Py_END_ALLOW_THREADS
    fclose(f);
    return Py_BuildValue("(Nl)", out, cols);
}

/* fused (x - mean) * inv_std over float32 buffers; mean broadcast over rows */
static PyObject *normalize_rows(PyObject *self, PyObject *args) {
    /* normalize_rows(x, mean, inv_std, wrap_col=-1): fused z-norm; when
     * wrap_col >= 0, negative values in that column first get +2*pi — the
     * capture-1/2 root-angle wrap (reference get_data.py:74-77), applied
     * natively so those persons stay on the C fast path. */
    Py_buffer x, mean;
    double inv_std;
    Py_ssize_t wrap_col = -1;
    if (!PyArg_ParseTuple(args, "y*y*d|n", &x, &mean, &inv_std, &wrap_col)) return NULL;
    Py_ssize_t n = x.len / 4;
    Py_ssize_t c = mean.len / 4;
    if (c == 0 || n % c || wrap_col >= c) {
        PyBuffer_Release(&x); PyBuffer_Release(&mean);
        return PyErr_Format(PyExc_ValueError, "length mismatch");
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL, x.len);
    if (!out) { PyBuffer_Release(&x); PyBuffer_Release(&mean); return NULL; }
    float *dst = (float *)PyBytes_AS_STRING(out);
    const float *src = (const float *)x.buf;
    const float *mu = (const float *)mean.buf;
    float is = (float)inv_std;
    const float two_pi = 6.283185307179586f;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < n; i++) {
        float v = src[i];
        if (wrap_col >= 0 && i % c == wrap_col && v < 0.0f) v += two_pi;
        dst[i] = (v - mu[i % c]) * is;
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&x);
    PyBuffer_Release(&mean);
    return out;
}

static PyMethodDef Methods[] = {
    {"read_wav_window", read_wav_window, METH_VARARGS,
     "read_wav_window(path, start_frame, n_frames) -> (float32 bytes, channels)"},
    {"read_npy_rows", read_npy_rows, METH_VARARGS,
     "read_npy_rows(path, start_row, n_rows) -> (float32 bytes, n_cols)"},
    {"normalize_rows", normalize_rows, METH_VARARGS,
     "normalize_rows(x_bytes, mean_bytes, inv_std, wrap_col=-1) -> float32 bytes"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastdata", "native windowed dataset reader", -1, Methods,
};

PyMODINIT_FUNC PyInit_fastdata(void) { return PyModule_Create(&moduledef); }
