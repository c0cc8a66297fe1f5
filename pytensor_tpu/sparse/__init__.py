from pytensor_tpu.sparse.basic import *  # noqa: F401,F403
from pytensor_tpu.sparse.basic import (  # noqa: F401
    add,
    as_sparse_variable,
    csc_from_dense,
    csr_from_dense,
    dense_from_sparse,
    dot,
    mul,
    sampling_dot,
    sp_sum,
    structured_dot,
    transpose,
)
from pytensor_tpu.sparse.type import (  # noqa: F401
    SparseTensorType,
    csc_matrix,
    csr_matrix,
    matrix,
)
