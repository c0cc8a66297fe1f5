/* Euler-split edge coloring for d-regular bipartite multigraphs.
 *
 * Used by the Pallas SpMV permutation router
 * (pytensor_tpu/link/pallas/route.py): an arbitrary element permutation
 * of a (K, 128) grid factors into lane-gather / sublane / lane-gather
 * stages whose routing tables come from proper edge colorings.  This is
 * the TPU-native counterpart of the reference's C sparse kernels
 * (/root/reference/pytensor/sparse/rewriting.py C code,
 * sparse/basic.py:1340 StructuredDot): the hot work runs on the MXU/VPU,
 * and the host-side combinatorics run here in C (pure Python takes tens
 * of seconds at ~2M edges; this runs in ~0.1 s).
 *
 * Algorithm: degree d = 2^k.  Orient each Eulerian circuit of the
 * (left+right) multigraph; edges leaving their left endpoint form one
 * d/2-regular half, the rest the other.  Recurse k times; the color of
 * an edge is the k-bit path of halves it took.  Colors are proper: at
 * d == 1 each class is a perfect matching.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* Orient one Euler level.  Edges are (u[i] in [0,L), v[i] in [0,R)).
 * All degrees even.  bit[i] gets 0 if edge i is traversed from its
 * left endpoint, 1 otherwise.  Scratch arrays are caller-provided.
 * Returns 0 on success.  O(E).
 */
static int orient_level(int64_t E, const int32_t *u, const int32_t *v,
                        int64_t L, int64_t R, uint8_t *bit,
                        int64_t *head, int64_t *nxt, int32_t *inc_edge,
                        uint8_t *used)
{
    int64_t N = L + R;
    int64_t n, i;
    /* incidence lists: each edge appears once for each endpoint.
     * incidence id 2*i   = edge i at its left endpoint u[i]
     * incidence id 2*i+1 = edge i at its right endpoint L+v[i]     */
    for (n = 0; n < N; n++) head[n] = -1;
    for (i = 0; i < E; i++) {
        int64_t a = u[i];
        int64_t b = L + (int64_t)v[i];
        nxt[2 * i] = head[a];
        head[a] = 2 * i;
        inc_edge[2 * i] = (int32_t)i;
        nxt[2 * i + 1] = head[b];
        head[b] = 2 * i + 1;
        inc_edge[2 * i + 1] = (int32_t)i;
        used[i] = 0;
    }
    /* walk closed trails; every node has even degree so a trail started
     * anywhere gets stuck only back at its start. */
    for (n = 0; n < N; n++) {
        while (head[n] != -1) {
            int64_t cur = n;
            for (;;) {
                int64_t incid = head[cur];
                int32_t e = -1;
                while (incid != -1) {
                    e = inc_edge[incid];
                    if (!used[e]) break;
                    incid = nxt[incid];
                    e = -1;
                }
                head[cur] = incid; /* drop consumed prefix */
                if (incid == -1) break; /* trail closed at cur == n */
                used[e] = 1;
                if (cur == u[e]) {   /* traversed left -> right */
                    bit[e] = 0;
                    cur = L + (int64_t)v[e];
                } else {             /* right -> left */
                    bit[e] = 1;
                    cur = u[e];
                }
            }
        }
    }
    return 0;
}

/* Color E edges of a d-regular bipartite multigraph with d colors
 * (d a power of two).  color_out[i] in [0, d). */
static int euler_color(int64_t E, const int32_t *u, const int32_t *v,
                       int64_t L, int64_t R, int32_t d, int32_t *color_out)
{
    int64_t N = L + R;
    int32_t levels = 0, dd = d;
    while (dd > 1) { dd >>= 1; levels++; }
    if ((1 << levels) != d) return -1;

    /* scratch */
    int64_t *head = malloc((size_t)N * sizeof(int64_t));
    int64_t *nxt = malloc((size_t)(2 * E) * sizeof(int64_t));
    int32_t *inc_edge = malloc((size_t)(2 * E) * sizeof(int32_t));
    uint8_t *used = malloc((size_t)E);
    uint8_t *bit = malloc((size_t)E);
    int32_t *us = malloc((size_t)E * sizeof(int32_t));
    int32_t *vs = malloc((size_t)E * sizeof(int32_t));
    int64_t *idx = malloc((size_t)E * sizeof(int64_t));
    int64_t *idx2 = malloc((size_t)E * sizeof(int64_t));
    int rc = -2;
    if (!head || !nxt || !inc_edge || !used || !bit || !us || !vs
        || !idx || !idx2)
        goto done;

    /* iterative bucket refinement: process groups of edges that share a
     * color prefix; each level splits every group in two. */
    {
        int64_t i;
        for (i = 0; i < E; i++) { idx[i] = i; color_out[i] = 0; }
    }
    for (int32_t lev = 0; lev < levels; lev++) {
        int64_t ngroups = (int64_t)1 << lev;
        int64_t g, pos = 0, w0 = 0;
        /* edges sorted by color_out prefix: counting sort into idx2 */
        {
            /* counts per group */
            int64_t *cnt = calloc((size_t)ngroups + 1, sizeof(int64_t));
            int64_t i;
            if (!cnt) goto done;
            for (i = 0; i < E; i++) cnt[color_out[i] + 1]++;
            for (g = 0; g < ngroups; g++) cnt[g + 1] += cnt[g];
            for (i = 0; i < E; i++) idx2[cnt[color_out[i]]++] = i;
            free(cnt);
        }
        pos = 0;
        for (g = 0; g < ngroups; g++) {
            /* collect this group's edges */
            int64_t cnt = 0, i;
            while (pos + cnt < E && color_out[idx2[pos + cnt]] == g) cnt++;
            for (i = 0; i < cnt; i++) {
                int64_t e = idx2[pos + i];
                us[i] = u[e];
                vs[i] = v[e];
            }
            if (cnt > 0) {
                if (orient_level(cnt, us, vs, L, R, bit, head, nxt,
                                 inc_edge, used) != 0)
                    goto done;
                for (i = 0; i < cnt; i++) {
                    int64_t e = idx2[pos + i];
                    color_out[e] = (int32_t)(2 * g + bit[i]);
                }
            }
            pos += cnt;
        }
        (void)w0;
    }
    rc = 0;
done:
    free(head); free(nxt); free(inc_edge); free(used); free(bit);
    free(us); free(vs); free(idx); free(idx2);
    return rc;
}

static PyObject *py_euler_color(PyObject *self, PyObject *args)
{
    Py_buffer ub, vb, cb;
    long L, R, d;
    if (!PyArg_ParseTuple(args, "y*y*llly*", &ub, &vb, &L, &R, &d, &cb))
        return NULL;
    int64_t E = (int64_t)(ub.len / sizeof(int32_t));
    int rc;
    Py_BEGIN_ALLOW_THREADS
    rc = euler_color(E, (const int32_t *)ub.buf, (const int32_t *)vb.buf,
                     (int64_t)L, (int64_t)R, (int32_t)d,
                     (int32_t *)cb.buf);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&ub);
    PyBuffer_Release(&vb);
    PyBuffer_Release(&cb);
    if (rc != 0) {
        PyErr_Format(PyExc_RuntimeError, "euler_color failed rc=%d", rc);
        return NULL;
    }
    Py_RETURN_NONE;
}

static PyMethodDef Methods[] = {
    {"euler_color", py_euler_color, METH_VARARGS,
     "euler_color(u_bytes, v_bytes, L, R, d, color_out_bytes)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_pytensor_tpu_routecolor", NULL, -1, Methods,
};

PyMODINIT_FUNC PyInit__pytensor_tpu_routecolor(void)
{
    return PyModule_Create(&moduledef);
}
