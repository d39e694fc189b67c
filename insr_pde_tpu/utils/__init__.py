from .ckpt import save_pytree, load_pytree  # noqa: F401
from .logging import MetricsWriter  # noqa: F401
