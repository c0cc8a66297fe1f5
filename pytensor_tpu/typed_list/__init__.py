from pytensor_tpu.typed_list.basic import (
    TypedListType,
    append,
    count,
    extend,
    getitem,
    insert,
    length,
    make_list,
    remove,
    reverse,
)
from pytensor_tpu.typed_list.basic import GetItem  # noqa: F401,E402
from pytensor_tpu.typed_list.basic import index_ as index  # noqa: F401,E402
