/* fastio: native text serialization for the gple_tpu output writers.
 *
 * The reference streams every frame of every output file through C++
 * iostreams (gaussian_process_liouville_equation/output.cpp); the phase-space
 * grids alone are ~40,000 values per element per frame.  This CPython
 * extension provides the equivalent native formatting path:
 *
 *   format_row(buffer_of_f64) -> str      "v0 v1 v2 ..." with %.17g
 *   parse_doubles(str) -> bytes(f64[])    whitespace-separated text -> raw f64
 *
 * Built with `make -C native` (setup-free, plain CPython C API so no pybind11
 * dependency); gple_tpu.io.writers falls back to Python formatting when the
 * extension is absent.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static PyObject *format_row(PyObject *self, PyObject *args) {
    PyObject *obj;
    if (!PyArg_ParseTuple(args, "O", &obj)) return NULL;
    Py_buffer view;
    if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO | PyBUF_FORMAT) < 0)
        return NULL;
    if (view.itemsize != sizeof(double) ||
        (view.format && strcmp(view.format, "d") != 0)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError, "expected a contiguous float64 buffer");
        return NULL;
    }
    Py_ssize_t n = view.len / (Py_ssize_t)sizeof(double);
    const double *data = (const double *)view.buf;
    /* %.17g is at most ~25 chars; add separator */
    size_t cap = (size_t)n * 26 + 1;
    char *out = (char *)malloc(cap);
    if (!out) {
        PyBuffer_Release(&view);
        return PyErr_NoMemory();
    }
    char *p = out;
    for (Py_ssize_t i = 0; i < n; i++) {
        if (i) *p++ = ' ';
        p += snprintf(p, 26, "%.17g", data[i]);
    }
    *p = '\0';
    PyBuffer_Release(&view);
    PyObject *res = PyUnicode_FromStringAndSize(out, p - out);
    free(out);
    return res;
}

static PyObject *parse_doubles(PyObject *self, PyObject *args) {
    const char *text;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "s#", &text, &len)) return NULL;
    size_t cap = 1024;
    double *vals = (double *)malloc(cap * sizeof(double));
    if (!vals) return PyErr_NoMemory();
    size_t n = 0;
    const char *p = text;
    char *end;
    while (p < text + len) {
        double v = strtod(p, &end);
        if (end == p) { p++; continue; }
        if (n == cap) {
            cap *= 2;
            double *nv = (double *)realloc(vals, cap * sizeof(double));
            if (!nv) { free(vals); return PyErr_NoMemory(); }
            vals = nv;
        }
        vals[n++] = v;
        p = end;
    }
    PyObject *res = PyBytes_FromStringAndSize((const char *)vals,
                                              (Py_ssize_t)(n * sizeof(double)));
    free(vals);
    return res;
}

static PyMethodDef methods[] = {
    {"format_row", format_row, METH_VARARGS,
     "format_row(float64_buffer) -> space-separated %.17g string"},
    {"parse_doubles", parse_doubles, METH_VARARGS,
     "parse_doubles(text) -> raw little-endian float64 bytes"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastio",
    "native text serialization for gple_tpu", -1, methods,
};

PyMODINIT_FUNC PyInit_fastio(void) { return PyModule_Create(&moduledef); }
