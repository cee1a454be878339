/* Native host-side I/O for the VVC MIP TPU engine.
 *
 * The reference engine's host is C++; its two heavy host loops are the
 * frame-CSV ingest (per-token std::stoi over W*H*F samples, main.cpp:364-384
 * in the reference) and the decisions-log export (13.2M fprintf rows per
 * 1080p frame, main_aux_functions.h:735-798).  This module provides both as
 * a CPython extension using only the buffer protocol (no numpy headers).
 *
 * Build: python setup.py build_ext --inplace   (or `make native`).
 * The Python wrappers in vvc_mip_gpu_tpu/io fall back to pandas when this
 * module is not built.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

/* ------------------------------------------------------------------ */
/* read_samples_csv(path, width, rows) -> bytes (rows*width uint16 LE) */
/* ------------------------------------------------------------------ */
static PyObject *
read_samples_csv(PyObject *self, PyObject *args)
{
    const char *path;
    Py_ssize_t width, rows;
    if (!PyArg_ParseTuple(args, "snn", &path, &width, &rows))
        return NULL;

    FILE *f = fopen(path, "rb");
    if (!f)
        return PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);

    Py_ssize_t total = width * rows;
    PyObject *out = PyBytes_FromStringAndSize(NULL, total * 2);
    if (!out) {
        fclose(f);
        return NULL;
    }
    uint16_t *dst = (uint16_t *)PyBytes_AS_STRING(out);

    size_t cap = 1 << 20;
    char *buf = malloc(cap);
    if (!buf) {
        fclose(f);
        Py_DECREF(out);
        return PyErr_NoMemory();
    }
    Py_ssize_t n = 0;
    uint32_t cur = 0;
    int have_digit = 0;
    size_t got;
    while ((got = fread(buf, 1, cap, f)) > 0 && n < total) {
        for (size_t i = 0; i < got; i++) {
            char c = buf[i];
            if (c >= '0' && c <= '9') {
                cur = cur * 10 + (uint32_t)(c - '0');
                have_digit = 1;
            } else if (have_digit) {
                if (n < total)
                    dst[n++] = (uint16_t)cur;
                cur = 0;
                have_digit = 0;
            }
        }
    }
    if (have_digit && n < total)
        dst[n++] = (uint16_t)cur;
    free(buf);
    fclose(f);
    if (n != total) {
        Py_DECREF(out);
        return PyErr_Format(PyExc_ValueError,
                            "%s: expected %zd samples, got %zd",
                            path, total, n);
    }
    return out;
}

/* ------------------------------------------------------------------ */
/* Fast unsigned/signed 64-bit to decimal                              */
/* ------------------------------------------------------------------ */
static inline char *
write_i64(char *p, int64_t v)
{
    char tmp[24];
    int neg = v < 0;
    uint64_t u = neg ? (uint64_t)(-v) : (uint64_t)v;
    int i = 0;
    do {
        tmp[i++] = (char)('0' + (u % 10));
        u /= 10;
    } while (u);
    if (neg)
        *p++ = '-';
    while (i)
        *p++ = tmp[--i];
    return p;
}

/* ------------------------------------------------------------------ *
 * write_decisions_csv(path, header, prefixes, x_in, y_in,             *
 *                     sad, satd, msh, n_ctu, ctu_cols, ctu_size)      *
 *                                                                     *
 * prefixes: bytes, n_slab newline-separated strings covering the      *
 *   "cuSizeName,W,H,CU" and ",Mode" invariant parts split by a '\t':  *
 *   "<name>,<W>,<H>,<cu>\t<mode>".  x_in/y_in: int32 buffers [n_slab] *
 *   (CU position inside the CTU).  sad/satd/msh: int64 buffers        *
 *   [n_ctu*n_slab].  Row: CTU,prefix0,X,Y,mode,SAD,SATD,minSadHad.    *
 * ------------------------------------------------------------------ */
static PyObject *
write_decisions_csv(PyObject *self, PyObject *args)
{
    const char *path;
    const char *header;
    Py_buffer prefixes, x_in, y_in, sad, satd, msh;
    Py_ssize_t n_ctu, ctu_cols, ctu_size;
    if (!PyArg_ParseTuple(args, "ssy*y*y*y*y*y*nnn", &path, &header,
                          &prefixes, &x_in, &y_in, &sad, &satd, &msh,
                          &n_ctu, &ctu_cols, &ctu_size))
        return NULL;

    Py_ssize_t n_slab = x_in.len / (Py_ssize_t)sizeof(int32_t);
    const int32_t *xs = (const int32_t *)x_in.buf;
    const int32_t *ys = (const int32_t *)y_in.buf;
    const int64_t *psad = (const int64_t *)sad.buf;
    const int64_t *psatd = (const int64_t *)satd.buf;
    const int64_t *pmsh = (const int64_t *)msh.buf;

    /* Split the prefix table once. */
    const char **pref = malloc(sizeof(char *) * (size_t)n_slab);
    int *pref_len = malloc(sizeof(int) * (size_t)n_slab);
    PyObject *res = NULL;
    FILE *f = NULL;
    char *rowbuf = NULL;
    if (!pref || !pref_len) {
        PyErr_NoMemory();
        goto done;
    }
    {
        const char *p = (const char *)prefixes.buf;
        const char *end = p + prefixes.len;
        for (Py_ssize_t i = 0; i < n_slab; i++) {
            const char *nl = memchr(p, '\n', (size_t)(end - p));
            if (!nl) {
                PyErr_SetString(PyExc_ValueError, "bad prefix table");
                goto done;
            }
            pref[i] = p;
            pref_len[i] = (int)(nl - p);
            p = nl + 1;
        }
    }

    f = fopen(path, "wb");
    if (!f) {
        PyErr_Format(PyExc_OSError, "cannot open %s for writing", path);
        goto done;
    }
    size_t bufcap = 1 << 22;
    rowbuf = malloc(bufcap);
    if (!rowbuf) {
        PyErr_NoMemory();
        goto done;
    }
    setvbuf(f, NULL, _IOFBF, 1 << 20);
    fputs(header, f);

    char *w = rowbuf;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t ctu = 0; ctu < n_ctu; ctu++) {
        int32_t ctu_x = (int32_t)((ctu % ctu_cols) * ctu_size);
        int32_t ctu_y = (int32_t)((ctu / ctu_cols) * ctu_size);
        const int64_t *s0 = psad + ctu * n_slab;
        const int64_t *s1 = psatd + ctu * n_slab;
        const int64_t *s2 = pmsh + ctu * n_slab;
        for (Py_ssize_t i = 0; i < n_slab; i++) {
            if ((size_t)(w - rowbuf) > bufcap - 256) {
                fwrite(rowbuf, 1, (size_t)(w - rowbuf), f);
                w = rowbuf;
            }
            w = write_i64(w, (int64_t)ctu);
            *w++ = ',';
            /* prefix is "<name>,<W>,<H>,<cu>\t<mode>" */
            const char *tab = memchr(pref[i], '\t', (size_t)pref_len[i]);
            size_t head = (size_t)(tab - pref[i]);
            memcpy(w, pref[i], head);
            w += head;
            *w++ = ',';
            w = write_i64(w, ctu_x + xs[i]);
            *w++ = ',';
            w = write_i64(w, ctu_y + ys[i]);
            *w++ = ',';
            size_t tail = (size_t)pref_len[i] - head - 1;
            memcpy(w, tab + 1, tail);
            w += tail;
            *w++ = ',';
            w = write_i64(w, s0[i]);
            *w++ = ',';
            w = write_i64(w, s1[i]);
            *w++ = ',';
            w = write_i64(w, s2[i]);
            *w++ = '\n';
        }
    }
    if (w != rowbuf)
        fwrite(rowbuf, 1, (size_t)(w - rowbuf), f);
    Py_END_ALLOW_THREADS

    res = Py_None;
    Py_INCREF(Py_None);
done:
    if (rowbuf)
        free(rowbuf);
    if (f)
        fclose(f);
    free(pref);
    free(pref_len);
    PyBuffer_Release(&prefixes);
    PyBuffer_Release(&x_in);
    PyBuffer_Release(&y_in);
    PyBuffer_Release(&sad);
    PyBuffer_Release(&satd);
    PyBuffer_Release(&msh);
    return res;
}

/* ------------------------------------------------------------------ *
 * write_samples_csv(path, samples, width)                             *
 *                                                                     *
 * samples: uint16 buffer (rows*width); one pixel row per line of      *
 * comma-separated decimals — the reference frame-CSV format (the      *
 * filtered-frame export path, reference main.cpp:789-817 writeCsv).   *
 * ------------------------------------------------------------------ */
static PyObject *
write_samples_csv(PyObject *self, PyObject *args)
{
    const char *path;
    Py_buffer samples;
    Py_ssize_t width;
    if (!PyArg_ParseTuple(args, "sy*n", &path, &samples, &width))
        return NULL;

    Py_ssize_t total = samples.len / (Py_ssize_t)sizeof(uint16_t);
    const uint16_t *src = (const uint16_t *)samples.buf;
    PyObject *res = NULL;
    FILE *f = fopen(path, "wb");
    char *rowbuf = NULL;
    if (!f) {
        PyErr_Format(PyExc_OSError, "cannot open %s for writing", path);
        goto done;
    }
    if (width <= 0 || total % width) {
        PyErr_SetString(PyExc_ValueError, "sample count % width != 0");
        goto done;
    }
    size_t bufcap = 1 << 22;
    rowbuf = malloc(bufcap);
    if (!rowbuf) {
        PyErr_NoMemory();
        goto done;
    }
    setvbuf(f, NULL, _IOFBF, 1 << 20);
    char *w = rowbuf;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < total; i++) {
        if ((size_t)(w - rowbuf) > bufcap - 16) {
            fwrite(rowbuf, 1, (size_t)(w - rowbuf), f);
            w = rowbuf;
        }
        w = write_i64(w, (int64_t)src[i]);
        *w++ = ((i + 1) % width) ? ',' : '\n';
    }
    if (w != rowbuf)
        fwrite(rowbuf, 1, (size_t)(w - rowbuf), f);
    Py_END_ALLOW_THREADS
    res = Py_None;
    Py_INCREF(Py_None);
done:
    if (rowbuf)
        free(rowbuf);
    if (f)
        fclose(f);
    PyBuffer_Release(&samples);
    return res;
}

static PyMethodDef methods[] = {
    {"read_samples_csv", read_samples_csv, METH_VARARGS,
     "Parse a reference-format CSV of luma samples into uint16 bytes."},
    {"write_decisions_csv", write_decisions_csv, METH_VARARGS,
     "Write the decisions log in the reference CSV schema."},
    {"write_samples_csv", write_samples_csv, METH_VARARGS,
     "Write frames in the reference sample-CSV format."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_native_ext",
    "Native I/O for the VVC MIP TPU engine", -1, methods,
};

PyMODINIT_FUNC
PyInit__native_ext(void)
{
    return PyModule_Create(&module);
}
