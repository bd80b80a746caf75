/* openmm-tpu native helpers (CPython extension).
 *
 * The runtime-adjacent hot spots that the reference implements natively
 * (app/internal/compiled.pyx: residue-to-template graph matching; its C++
 * file parsers): a backtracking subgraph-isomorphism matcher over residue
 * graphs, and a whitespace-separated numeric parser for large parameter
 * tables (prmtop/crd/gro). Pure-Python fallbacks live in the callers.
 *
 * Build: cc -O2 -shared -fPIC (driven by openmm_tpu/_native/__init__.py).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdlib.h>
#include <string.h>

/* ------------------------------------------------------------------ */
/* match_residue(res, template) -> tuple(mapping) | None               */
/*                                                                      */
/* res:      (elements, externals, neighbors)                           */
/* template: (elements, externals, neighbors)                           */
/*   elements:  tuple of int   (hashed element id; -1 for None)         */
/*   externals: tuple of int   (number of external bonds per atom)      */
/*   neighbors: tuple of tuple of int (adjacency lists)                 */
/*                                                                      */
/* Returns a tuple m where m[i] = template index matched to residue     */
/* atom i, or None if no isomorphism exists. Matching requires equal    */
/* element, equal external-bond count, equal degree, and bond-structure */
/* consistency — the same contract as the reference's                   */
/* matchResidueToTemplate.                                              */
/* ------------------------------------------------------------------ */

#define MAX_ATOMS 4096
#define MAX_DEGREE 32

typedef struct {
    int n;
    long elem[MAX_ATOMS];
    long ext[MAX_ATOMS];
    int deg[MAX_ATOMS];
    int nbr[MAX_ATOMS][MAX_DEGREE];
} Graph;

static int
load_graph(PyObject *spec, Graph *g)
{
    PyObject *elements, *externals, *neighbors;
    Py_ssize_t n, i, j, d;

    if (!PyArg_ParseTuple(spec, "OOO", &elements, &externals, &neighbors))
        return 0;
    n = PySequence_Size(elements);
    if (n < 0 || n > MAX_ATOMS) {
        PyErr_SetString(PyExc_ValueError, "graph too large");
        return 0;
    }
    g->n = (int)n;
    for (i = 0; i < n; i++) {
        PyObject *e = PySequence_GetItem(elements, i);
        PyObject *x = PySequence_GetItem(externals, i);
        PyObject *nb = PySequence_GetItem(neighbors, i);
        if (!e || !x || !nb) {
            Py_XDECREF(e); Py_XDECREF(x); Py_XDECREF(nb);
            return 0;
        }
        g->elem[i] = PyLong_AsLong(e);
        g->ext[i] = PyLong_AsLong(x);
        if ((g->elem[i] == -1 || g->ext[i] == -1) && PyErr_Occurred()) {
            Py_DECREF(e); Py_DECREF(x); Py_DECREF(nb);
            return 0;
        }
        d = PySequence_Size(nb);
        if (d > MAX_DEGREE) {
            Py_DECREF(e); Py_DECREF(x); Py_DECREF(nb);
            PyErr_SetString(PyExc_ValueError, "degree too large");
            return 0;
        }
        g->deg[i] = (int)d;
        for (j = 0; j < d; j++) {
            PyObject *v = PySequence_GetItem(nb, j);
            long nv;
            if (!v) { Py_DECREF(e); Py_DECREF(x); Py_DECREF(nb); return 0; }
            nv = PyLong_AsLong(v);
            Py_DECREF(v);
            /* reject out-of-range neighbor indices: backtrack() reads
             * r2t[nv] on the raw value, so a crafted adjacency list would
             * otherwise be an out-of-bounds stack read */
            if (nv < 0 || nv >= n) {
                Py_DECREF(e); Py_DECREF(x); Py_DECREF(nb);
                if (!PyErr_Occurred())
                    PyErr_SetString(PyExc_ValueError,
                                    "neighbor index out of range");
                return 0;
            }
            g->nbr[i][j] = (int)nv;
        }
        Py_DECREF(e); Py_DECREF(x); Py_DECREF(nb);
    }
    return !PyErr_Occurred();
}

/* order residue atoms most-constrained-first: rare (element, degree)
 * classes first so dead branches die early */
static void
match_order(const Graph *r, int *order)
{
    int counts[MAX_ATOMS];
    int i, j;
    for (i = 0; i < r->n; i++) {
        counts[i] = 0;
        for (j = 0; j < r->n; j++)
            if (r->elem[j] == r->elem[i] && r->deg[j] == r->deg[i])
                counts[i]++;
        order[i] = i;
    }
    /* insertion sort by (count, -degree) */
    for (i = 1; i < r->n; i++) {
        int key = order[i];
        int ck = counts[key], dk = r->deg[key];
        j = i - 1;
        while (j >= 0 && (counts[order[j]] > ck ||
                          (counts[order[j]] == ck && r->deg[order[j]] < dk))) {
            order[j + 1] = order[j];
            j--;
        }
        order[j + 1] = key;
    }
}

static int
backtrack(const Graph *r, const Graph *t, const int *order, int pos,
          int *r2t, int *t2r)
{
    int ri, ci, k, ok;
    if (pos == r->n)
        return 1;
    ri = order[pos];
    for (ci = 0; ci < t->n; ci++) {
        if (t2r[ci] >= 0)
            continue;
        if (t->elem[ci] != r->elem[ri] || t->deg[ci] != r->deg[ri]
            || t->ext[ci] != r->ext[ri])
            continue;
        /* every already-mapped residue neighbor of ri must be a template
         * neighbor of ci, and vice versa (degrees equal => count check) */
        ok = 1;
        for (k = 0; k < r->deg[ri] && ok; k++) {
            int rn = r->nbr[ri][k];
            int tn = r2t[rn];
            if (tn >= 0) {
                int m, found = 0;
                for (m = 0; m < t->deg[ci]; m++)
                    if (t->nbr[ci][m] == tn) { found = 1; break; }
                ok = found;
            }
        }
        if (!ok)
            continue;
        r2t[ri] = ci;
        t2r[ci] = ri;
        if (backtrack(r, t, order, pos + 1, r2t, t2r))
            return 1;
        r2t[ri] = -1;
        t2r[ci] = -1;
    }
    return 0;
}

static PyObject *
py_match_residue(PyObject *self, PyObject *args)
{
    PyObject *res_spec, *tpl_spec, *out;
    static Graph r, t;   /* large; single-threaded use from the GIL side */
    int order[MAX_ATOMS], r2t[MAX_ATOMS], t2r[MAX_ATOMS];
    int i;

    (void)self;
    if (!PyArg_ParseTuple(args, "OO", &res_spec, &tpl_spec))
        return NULL;
    if (!load_graph(res_spec, &r) || !load_graph(tpl_spec, &t))
        return NULL;
    if (r.n != t.n)
        Py_RETURN_NONE;
    for (i = 0; i < r.n; i++) {
        r2t[i] = -1;
        t2r[i] = -1;
    }
    match_order(&r, order);
    if (!backtrack(&r, &t, order, 0, r2t, t2r))
        Py_RETURN_NONE;
    out = PyTuple_New(r.n);
    if (!out)
        return NULL;
    for (i = 0; i < r.n; i++)
        PyTuple_SET_ITEM(out, i, PyLong_FromLong(r2t[i]));
    return out;
}

/* ------------------------------------------------------------------ */
/* parse_doubles(bytes) -> bytes (packed little-endian float64 array)   */
/* The caller wraps the result with numpy.frombuffer — no numpy C-API   */
/* dependency here.                                                     */
/* ------------------------------------------------------------------ */
static PyObject *
py_parse_doubles(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    PyObject *out;
    const char *p, *end;
    double *vals;
    Py_ssize_t cap, count;

    (void)self;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    p = (const char *)buf.buf;
    end = p + buf.len;
    cap = buf.len / 2 + 16;   /* every number takes >= 2 bytes incl. sep */
    vals = (double *)malloc((size_t)cap * sizeof(double));
    if (!vals) {
        PyBuffer_Release(&buf);
        return PyErr_NoMemory();
    }
    count = 0;
    while (p < end) {
        char *q;
        double v;
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n'
                           || *p == '\r'))
            p++;
        if (p >= end)
            break;
        v = strtod(p, &q);
        if (q == p)   /* unparsable token */
            break;
        vals[count++] = v;
        p = q;
    }
    out = PyBytes_FromStringAndSize((const char *)vals,
                                    count * (Py_ssize_t)sizeof(double));
    free(vals);
    PyBuffer_Release(&buf);
    return out;
}

static PyMethodDef methods[] = {
    {"match_residue", py_match_residue, METH_VARARGS,
     "match_residue(res_graph, template_graph) -> mapping tuple or None"},
    {"parse_doubles", py_parse_doubles, METH_VARARGS,
     "parse_doubles(bytes) -> packed float64 bytes"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_omm_tpu_native", NULL, -1, methods,
    NULL, NULL, NULL, NULL
};

PyMODINIT_FUNC
PyInit__omm_tpu_native(void)
{
    return PyModule_Create(&moduledef);
}
