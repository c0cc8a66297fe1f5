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
