from . import gnn, solvers  # noqa: F401
from .solvers import SolveResult, bicgstab, cg, cg_step, jacobi  # noqa: F401
from .solvers import pagerank, power_iteration  # noqa: F401
