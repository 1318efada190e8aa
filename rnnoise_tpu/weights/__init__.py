from .blob import (WeightArray, parse_weights, write_weights,  # noqa: F401
                   densify_sparse_int8, densify_sparse_float,
                   unshuffle_dense_int8)
from .loader import (load_model_bytes, load_model_file,  # noqa: F401
                     model_params_from_arrays)
