/* hostvm: C thunk-loop VM for the numpy oracle.
 *
 * Role parallels the reference's lazylinker_c.c (the CVM): iterate the
 * topologically-ordered thunks of a compiled FunctionGraph, free dead
 * intermediate storage as soon as its last consumer ran, and surface
 * the failing node index on error.  Original implementation against the
 * CPython API; no reference code reused.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

/* run_loop(thunks, free_lists) -> None
 *
 * thunks:     tuple of zero-arg callables, topological order.
 * free_lists: tuple (same length) of tuples of storage cells
 *             (one-element lists) whose value dies after that thunk;
 *             each cell's [0] is set to None after the thunk runs.
 *
 * On error, raises with a __hostvm_node_index__ attribute set on the
 * exception value so the caller can attribute it to an Apply node.
 */
static PyObject *
run_loop(PyObject *self, PyObject *args)
{
    PyObject *thunks, *free_lists;
    if (!PyArg_ParseTuple(args, "OO", &thunks, &free_lists))
        return NULL;
    if (!PyTuple_Check(thunks) || !PyTuple_Check(free_lists)) {
        PyErr_SetString(PyExc_TypeError, "run_loop expects two tuples");
        return NULL;
    }
    Py_ssize_t n = PyTuple_GET_SIZE(thunks);
    if (PyTuple_GET_SIZE(free_lists) != n) {
        PyErr_SetString(PyExc_ValueError, "free_lists length mismatch");
        return NULL;
    }
    PyObject *none = Py_None;
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *thunk = PyTuple_GET_ITEM(thunks, i);
        PyObject *res = PyObject_CallNoArgs(thunk);
        if (res == NULL) {
            /* annotate the in-flight exception with the node index */
            PyObject *ptype, *pvalue, *ptraceback;
            PyErr_Fetch(&ptype, &pvalue, &ptraceback);
            PyErr_NormalizeException(&ptype, &pvalue, &ptraceback);
            if (pvalue != NULL) {
                PyObject *idx = PyLong_FromSsize_t(i);
                if (idx != NULL) {
                    PyObject_SetAttrString(pvalue, "__hostvm_node_index__", idx);
                    Py_DECREF(idx);
                }
            }
            PyErr_Restore(ptype, pvalue, ptraceback);
            return NULL;
        }
        Py_DECREF(res);
        /* clear dead cells */
        PyObject *cells = PyTuple_GET_ITEM(free_lists, i);
        Py_ssize_t m = PyTuple_GET_SIZE(cells);
        for (Py_ssize_t j = 0; j < m; ++j) {
            PyObject *cell = PyTuple_GET_ITEM(cells, j);
            if (PyList_Check(cell) && PyList_GET_SIZE(cell) == 1) {
                Py_INCREF(none);
                PyObject *old = PyList_GET_ITEM(cell, 0);
                PyList_SET_ITEM(cell, 0, none);
                Py_XDECREF(old);
            }
        }
    }
    Py_RETURN_NONE;
}

/* helpers shared with run_lazy */
static void annotate_node_index(Py_ssize_t i)
{
    PyObject *ptype, *pvalue, *ptraceback;
    PyErr_Fetch(&ptype, &pvalue, &ptraceback);
    PyErr_NormalizeException(&ptype, &pvalue, &ptraceback);
    if (pvalue != NULL) {
        PyObject *idx = PyLong_FromSsize_t(i);
        if (idx != NULL) {
            PyObject_SetAttrString(pvalue, "__hostvm_node_index__", idx);
            Py_DECREF(idx);
        }
    }
    PyErr_Restore(ptype, pvalue, ptraceback);
}

static void clear_cells(PyObject *cells)
{
    Py_ssize_t m = PyTuple_GET_SIZE(cells);
    for (Py_ssize_t j = 0; j < m; ++j) {
        PyObject *cell = PyTuple_GET_ITEM(cells, j);
        if (PyList_Check(cell) && PyList_GET_SIZE(cell) == 1) {
            Py_INCREF(Py_None);
            PyObject *old = PyList_GET_ITEM(cell, 0);
            PyList_SET_ITEM(cell, 0, Py_None);
            Py_XDECREF(old);
        }
    }
}

/* run_lazy(thunks, deps, targets, choosers, free_lists) -> n_executed
 *
 * Demand-driven evaluation (the lazylinker_c.c lazy_rec_eval role,
 * reference link/c/c_code/lazylinker_c.c:541, reimplemented iteratively
 * against the CPython API; no reference code reused):
 *
 * thunks:     tuple of zero-arg callables (topological numbering).
 * deps:       per node, tuple of producer node indices that must run
 *             before this node's thunk.  For LAZY nodes (IfElse) this
 *             holds only the condition's producers.
 * targets:    node indices required for the requested outputs.
 * choosers:   per node, None or a zero-arg callable invoked once the
 *             condition deps ran; it returns a tuple of EXTRA node
 *             indices to require (the taken branch) before the thunk.
 * free_lists: as run_loop; applied after each executed thunk.
 *
 * Only nodes reachable from targets execute — an IfElse evaluates one
 * branch, matching the reference CVM's thunk-level laziness.
 */
static PyObject *
run_lazy(PyObject *self, PyObject *args)
{
    PyObject *thunks, *deps, *targets, *choosers, *free_lists;
    if (!PyArg_ParseTuple(args, "OOOOO", &thunks, &deps, &targets,
                          &choosers, &free_lists))
        return NULL;
    Py_ssize_t n = PyTuple_GET_SIZE(thunks);
    char *state = PyMem_Calloc((size_t)n, 1); /* 0 new, 1 expanded,
                                                 2 chosen, 3 done */
    PyObject **extra = PyMem_Calloc((size_t)n, sizeof(PyObject *));
    Py_ssize_t *stack = PyMem_Malloc((size_t)(4 * n + 16) * sizeof(Py_ssize_t));
    Py_ssize_t sp = 0, cap = 4 * n + 16, executed = 0;
    PyObject *ret = NULL;
    if (!state || !extra || !stack) {
        PyErr_NoMemory();
        goto done;
    }
#define PUSH(v) do { \
        if (sp >= cap) { \
            cap *= 2; \
            Py_ssize_t *ns_ = PyMem_Realloc(stack, (size_t)cap * sizeof(Py_ssize_t)); \
            if (ns_ == NULL) { PyErr_NoMemory(); goto done; } \
            stack = ns_; \
        } \
        stack[sp++] = (v); \
    } while (0)

    for (Py_ssize_t t = 0; t < PyTuple_GET_SIZE(targets); ++t)
        PUSH(PyLong_AsSsize_t(PyTuple_GET_ITEM(targets, t)));

    while (sp > 0) {
        Py_ssize_t i = stack[sp - 1];
        if (i < 0 || i >= n) {
            PyErr_SetString(PyExc_ValueError, "bad node index");
            goto done;
        }
        if (state[i] == 3) { --sp; continue; }
        if (state[i] == 0) {
            state[i] = 1;
            PyObject *di = PyTuple_GET_ITEM(deps, i);
            for (Py_ssize_t k = PyTuple_GET_SIZE(di) - 1; k >= 0; --k) {
                Py_ssize_t d = PyLong_AsSsize_t(PyTuple_GET_ITEM(di, k));
                if (d >= 0 && d < n && state[d] != 3) PUSH(d);
            }
            continue; /* revisit once deps are done */
        }
        if (state[i] == 1) {
            PyObject *ch = PyTuple_GET_ITEM(choosers, i);
            state[i] = 2;
            if (ch != Py_None) {
                PyObject *ex = PyObject_CallNoArgs(ch);
                if (ex == NULL) { annotate_node_index(i); goto done; }
                if (!PyTuple_Check(ex)) {
                    Py_DECREF(ex);
                    PyErr_SetString(PyExc_TypeError,
                                    "chooser must return a tuple");
                    goto done;
                }
                extra[i] = ex;
                for (Py_ssize_t k = PyTuple_GET_SIZE(ex) - 1; k >= 0; --k) {
                    Py_ssize_t d = PyLong_AsSsize_t(PyTuple_GET_ITEM(ex, k));
                    if (d >= 0 && d < n && state[d] != 3) PUSH(d);
                }
                continue;
            }
        }
        /* state 2: everything needed has run — execute */
        PyObject *res = PyObject_CallNoArgs(PyTuple_GET_ITEM(thunks, i));
        if (res == NULL) { annotate_node_index(i); goto done; }
        Py_DECREF(res);
        clear_cells(PyTuple_GET_ITEM(free_lists, i));
        state[i] = 3;
        ++executed;
        --sp;
    }
    ret = PyLong_FromSsize_t(executed);
done:
#undef PUSH
    if (extra) {
        for (Py_ssize_t i = 0; i < n; ++i) Py_XDECREF(extra[i]);
        PyMem_Free(extra);
    }
    PyMem_Free(state);
    PyMem_Free(stack);
    return ret;
}

static PyMethodDef hostvm_methods[] = {
    {"run_loop", run_loop, METH_VARARGS,
     "Run a tuple of thunks in order, clearing dead storage cells."},
    {"run_lazy", run_lazy, METH_VARARGS,
     "Demand-driven thunk evaluation (lazy IfElse branches)."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef hostvm_module = {
    PyModuleDef_HEAD_INIT, "_pytensor_tpu_hostvm",
    "C thunk-loop VM for the pytensor_tpu oracle runtime.",
    -1, hostvm_methods,
};

PyMODINIT_FUNC
PyInit__pytensor_tpu_hostvm(void)
{
    return PyModule_Create(&hostvm_module);
}
