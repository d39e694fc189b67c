from .sampling import (  # noqa: F401
    sample_uniform,
    sample_random,
    sample_boundary,
    sample_boundary2D_separate,
)
from .diff import (  # noqa: F401
    gradient,
    divergence,
    laplace,
    jacobian,
    hessian,
)
from .svd import singular_values  # noqa: F401
from .knn import knn, knn_gather  # noqa: F401
from .linalg import (  # noqa: F401
    PaddedSparse,
    cg_batch,
    cg_solve,
    cgls,
    cgls_sparse,
)
