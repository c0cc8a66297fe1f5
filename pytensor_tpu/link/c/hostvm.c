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

static PyMethodDef hostvm_methods[] = {
    {"run_loop", run_loop, METH_VARARGS,
     "Run a tuple of thunks in order, clearing dead storage cells."},
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
