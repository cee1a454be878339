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
/* Fast unsigned/signed 64-bit to decimal (two-digit LUT)              */
/* ------------------------------------------------------------------ */
static const char DIGITS2[201] =
    "0001020304050607080910111213141516171819"
    "2021222324252627282930313233343536373839"
    "4041424344454647484950515253545556575859"
    "6061626364656667686970717273747576777879"
    "8081828384858687888990919293949596979899";

static inline char *
write_i64(char *p, int64_t v)
{
    char tmp[24];
    int neg = v < 0;
    uint64_t u = neg ? (uint64_t)(-v) : (uint64_t)v;
    char *t = tmp + 24;
    while (u >= 100) {
        unsigned r = (unsigned)(u % 100);
        u /= 100;
        t -= 2;
        memcpy(t, DIGITS2 + r * 2, 2);
    }
    if (u >= 10) {
        t -= 2;
        memcpy(t, DIGITS2 + (unsigned)u * 2, 2);
    } else {
        *--t = (char)('0' + (unsigned)u);
    }
    if (neg)
        *p++ = '-';
    memcpy(p, t, (size_t)(tmp + 24 - t));
    return p + (tmp + 24 - t);
}

/* ------------------------------------------------------------------ *
 * write_decisions_csv(path, header, prefixes, x_in, y_in,             *
 *                     sad, satd, msh, n_ctu, ctu_cols, ctu_size,      *
 *                     [zero_costs=0], [poc=-1])                       *
 *                                                                     *
 * prefixes: bytes, n_slab newline-separated strings covering the      *
 *   "cuSizeName,W,H,CU" and ",Mode" invariant parts split by a '\t':  *
 *   "<name>,<W>,<H>,<cu>\t<mode>".  x_in/y_in: int32 buffers [n_slab] *
 *   (CU position inside the CTU).  sad/satd/msh: int64 buffers        *
 *   [n_ctu*n_slab].  Row: [POC,]CTU,prefix0,X,Y,mode,SAD,SATD,msh.    *
 *                                                                     *
 * zero_costs != 0: SAD/SATD are emitted as literal "0,0" without      *
 *   reading the sad/satd buffers (the reference's                     *
 *   MAX_PERFORMANCE_DIST never-read-back columns).  poc >= 0 adds     *
 *   the leading POC column (multi-frame decisions logs).              *
 *                                                                     *
 * Hot-loop design (13.2M rows/frame at 1080p): everything that is     *
 * constant per column or per CTU row of the CTU grid is formatted     *
 * ONCE per frame — "<X>," strings per (grid column, slab row) and     *
 * "<Y>," strings per (grid row, slab row) live in string pools, the   *
 * "[POC,]<CTU>," run is formatted per CTU — so the per-row work is    *
 * five memcpys plus one (max-performance) or three itoas.             *
 * ------------------------------------------------------------------ */
static PyObject *
write_decisions_csv(PyObject *self, PyObject *args)
{
    const char *path;
    const char *header;
    Py_buffer prefixes, x_in, y_in, sad, satd, msh;
    Py_ssize_t n_ctu, ctu_cols, ctu_size;
    int zero_costs = 0;
    Py_ssize_t poc = -1;
    if (!PyArg_ParseTuple(args, "ssy*y*y*y*y*y*nnn|in", &path, &header,
                          &prefixes, &x_in, &y_in, &sad, &satd, &msh,
                          &n_ctu, &ctu_cols, &ctu_size, &zero_costs, &poc))
        return NULL;

    Py_ssize_t n_slab = x_in.len / (Py_ssize_t)sizeof(int32_t);
    Py_ssize_t grid_rows = ctu_cols > 0 ? (n_ctu + ctu_cols - 1) / ctu_cols
                                        : 0;
    const int32_t *xs = (const int32_t *)x_in.buf;
    const int32_t *ys = (const int32_t *)y_in.buf;
    const int64_t *psad = (const int64_t *)sad.buf;
    const int64_t *psatd = (const int64_t *)satd.buf;
    const int64_t *pmsh = (const int64_t *)msh.buf;

    /* Per-slab-row prefix head/tail (split once, no per-row memchr). */
    const char **hptr = malloc(sizeof(char *) * (size_t)n_slab);
    const char **tptr = malloc(sizeof(char *) * (size_t)n_slab);
    int *hlen = malloc(sizeof(int) * (size_t)n_slab);
    int *tlen = malloc(sizeof(int) * (size_t)n_slab);
    /* "<X>," / "<Y>," string pools: one entry per (grid col|row, slab
     * row), max 12 bytes each. */
    char *xpool = malloc((size_t)(ctu_cols * n_slab) * 12);
    char *ypool = malloc((size_t)(grid_rows > 0 ? grid_rows : 1)
                         * (size_t)n_slab * 12);
    uint8_t *xlen = malloc((size_t)(ctu_cols * n_slab));
    uint8_t *ylen = malloc((size_t)(grid_rows > 0 ? grid_rows : 1)
                           * (size_t)n_slab);
    PyObject *res = NULL;
    FILE *f = NULL;
    char *rowbuf = NULL;
    if (!hptr || !tptr || !hlen || !tlen || !xpool || !ypool || !xlen
        || !ylen) {
        PyErr_NoMemory();
        goto done;
    }
    {
        const char *p = (const char *)prefixes.buf;
        const char *end = p + prefixes.len;
        for (Py_ssize_t i = 0; i < n_slab; i++) {
            const char *nl = memchr(p, '\n', (size_t)(end - p));
            const char *tab = nl ? memchr(p, '\t', (size_t)(nl - p)) : NULL;
            if (!nl || !tab) {
                PyErr_SetString(PyExc_ValueError, "bad prefix table");
                goto done;
            }
            hptr[i] = p;
            hlen[i] = (int)(tab - p);
            tptr[i] = tab + 1;
            tlen[i] = (int)(nl - tab - 1);
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
    for (Py_ssize_t c = 0; c < ctu_cols; c++) {
        char *wp = xpool + (size_t)(c * n_slab) * 12;
        for (Py_ssize_t i = 0; i < n_slab; i++, wp += 12) {
            char *e = write_i64(wp, (int64_t)(c * ctu_size + xs[i]));
            *e++ = ',';
            xlen[c * n_slab + i] = (uint8_t)(e - wp);
        }
    }
    for (Py_ssize_t r = 0; r < grid_rows; r++) {
        char *wp = ypool + (size_t)(r * n_slab) * 12;
        for (Py_ssize_t i = 0; i < n_slab; i++, wp += 12) {
            char *e = write_i64(wp, (int64_t)(r * ctu_size + ys[i]));
            *e++ = ',';
            ylen[r * n_slab + i] = (uint8_t)(e - wp);
        }
    }
    for (Py_ssize_t ctu = 0; ctu < n_ctu; ctu++) {
        Py_ssize_t gc = ctu % ctu_cols, gr = ctu / ctu_cols;
        const char *xp = xpool + (size_t)(gc * n_slab) * 12;
        const uint8_t *xl = xlen + gc * n_slab;
        const char *yp = ypool + (size_t)(gr * n_slab) * 12;
        const uint8_t *yl = ylen + gr * n_slab;
        char lead[32];          /* "[POC,]<CTU>," */
        char *le = lead;
        if (poc >= 0) {
            le = write_i64(le, (int64_t)poc);
            *le++ = ',';
        }
        le = write_i64(le, (int64_t)ctu);
        *le++ = ',';
        size_t lead_n = (size_t)(le - lead);
        const int64_t *s0 = psad + ctu * n_slab;
        const int64_t *s1 = psatd + ctu * n_slab;
        const int64_t *s2 = pmsh + ctu * n_slab;
        for (Py_ssize_t i = 0; i < n_slab; i++) {
            if ((size_t)(w - rowbuf) > bufcap - 256) {
                fwrite(rowbuf, 1, (size_t)(w - rowbuf), f);
                w = rowbuf;
            }
            memcpy(w, lead, lead_n);
            w += lead_n;
            memcpy(w, hptr[i], (size_t)hlen[i]);
            w += hlen[i];
            *w++ = ',';
            memcpy(w, xp + (size_t)i * 12, xl[i]);
            w += xl[i];
            memcpy(w, yp + (size_t)i * 12, yl[i]);
            w += yl[i];
            memcpy(w, tptr[i], (size_t)tlen[i]);
            w += tlen[i];
            *w++ = ',';
            if (zero_costs) {
                memcpy(w, "0,0,", 4);
                w += 4;
            } else {
                w = write_i64(w, s0[i]);
                *w++ = ',';
                w = write_i64(w, s1[i]);
                *w++ = ',';
            }
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
    free(hptr);
    free(tptr);
    free(hlen);
    free(tlen);
    free(xpool);
    free(ypool);
    free(xlen);
    free(ylen);
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
