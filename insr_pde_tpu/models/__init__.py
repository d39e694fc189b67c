from .networks import MLP, get_network  # noqa: F401
from .solver import Solver, FitResult  # noqa: F401
from .base import BaseModel  # noqa: F401
from .advection import Advection1DModel  # noqa: F401
from .fluid import Fluid2DModel  # noqa: F401
from .elasticity import ElasticityModel  # noqa: F401
from .vortex import VortexConfig, VortexModel  # noqa: F401
from .rbf_advection import RBFAdvectionConfig, RBFAdvectionModel  # noqa: F401
from .encodings import Frequency, MultiResHashGrid  # noqa: F401
