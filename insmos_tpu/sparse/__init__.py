from .tensor import SparseTensor  # noqa: F401
from .coords import linearize_coords, lookup_keys, make_offsets  # noqa: F401
from .voxelize import unique_voxels, voxelize_points, devoxelize  # noqa: F401
from .convs import (  # noqa: F401
    gather_matmul,
    inverse_conv,
    neighbor_table,
    strided_conv_sites,
    subm_gather_conv,
)
from .bev import to_dense_bev  # noqa: F401
