/* Fast reference-compatible .dat codec.
 *
 * The reference emits every observable as tab-separated "%lg" ASCII
 * (README.md:103-142 of tlangin/MDQTPlasmaSims) and reads checkpoints back
 * with fscanf.  Python-side "%g" formatting of multi-million-row tables
 * (e.g. 1500 x 4001 KDE snapshots of the MC-tagging recorder) is the
 * bottleneck of the output path; this extension provides:
 *
 *   format_rows(arr_f64_2d) -> str      rows of "%g" joined by tabs
 *   parse_floats(str) -> ndarray[f64]   whitespace-separated floats
 *
 * Both match C printf("%lg")/fscanf("%lg") semantics exactly.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static PyObject *format_rows(PyObject *self, PyObject *args) {
    PyObject *obj;
    if (!PyArg_ParseTuple(args, "O", &obj)) return NULL;

    Py_buffer view;
    if (PyObject_GetBuffer(obj, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) < 0)
        return NULL;
    if (!view.format || strcmp(view.format, "d") != 0 || view.ndim > 2) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError,
                        "format_rows expects a C-contiguous float64 array "
                        "of rank <= 2");
        return NULL;
    }
    Py_ssize_t nrow, ncol;
    if (view.ndim == 2) { nrow = view.shape[0]; ncol = view.shape[1]; }
    else if (view.ndim == 1) { nrow = view.shape[0]; ncol = 1; }
    else { nrow = 1; ncol = 1; }

    const double *data = (const double *)view.buf;
    /* %g yields at most ~13 chars + separator */
    size_t cap = (size_t)nrow * (size_t)ncol * 16 + (size_t)nrow + 64;
    char *buf = (char *)malloc(cap);
    if (!buf) { PyBuffer_Release(&view); return PyErr_NoMemory(); }

    size_t pos = 0;
    for (Py_ssize_t i = 0; i < nrow; i++) {
        for (Py_ssize_t j = 0; j < ncol; j++) {
            if (cap - pos < 32) {
                cap *= 2;
                char *nb = (char *)realloc(buf, cap);
                if (!nb) { free(buf); PyBuffer_Release(&view);
                           return PyErr_NoMemory(); }
                buf = nb;
            }
            pos += (size_t)snprintf(buf + pos, cap - pos, "%g",
                                    data[i * ncol + j]);
            buf[pos++] = (j + 1 < ncol) ? '\t' : '\n';
        }
        if (ncol == 0) buf[pos++] = '\n';
    }
    PyBuffer_Release(&view);
    PyObject *out = PyUnicode_FromStringAndSize(buf, (Py_ssize_t)pos);
    free(buf);
    return out;
}

static PyObject *parse_floats(PyObject *self, PyObject *args) {
    const char *s;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "s#", &s, &len)) return NULL;

    size_t cap = 4096, n = 0;
    double *vals = (double *)malloc(cap * sizeof(double));
    if (!vals) return PyErr_NoMemory();

    const char *p = s, *end = s + len;
    while (p < end) {
        char *next;
        double v = strtod(p, &next);
        if (next == p) { p++; continue; }   /* skip non-numeric bytes */
        if (n == cap) {
            cap *= 2;
            double *nv = (double *)realloc(vals, cap * sizeof(double));
            if (!nv) { free(vals); return PyErr_NoMemory(); }
            vals = nv;
        }
        vals[n++] = v;
        p = next;
    }

    PyObject *ba = PyByteArray_FromStringAndSize((const char *)vals,
                                                 (Py_ssize_t)(n * sizeof(double)));
    free(vals);
    return ba;   /* caller wraps with np.frombuffer */
}

static PyMethodDef methods[] = {
    {"format_rows", format_rows, METH_VARARGS,
     "Tab-separated %g rows with trailing newlines."},
    {"parse_floats", parse_floats, METH_VARARGS,
     "Parse whitespace-separated floats; returns raw f64 bytes."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_datio_native", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__datio_native(void) {
    return PyModule_Create(&moduledef);
}
