from . import reference, semiring  # noqa: F401
from .reference import golden, spmm, spmv, spmv_numpy  # noqa: F401
from .semiring import (MAX_PLUS, MAX_TIMES, MIN_PLUS, OR_AND,  # noqa: F401
                       PLUS_TIMES, Semiring)
