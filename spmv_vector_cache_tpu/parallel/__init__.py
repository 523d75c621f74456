from . import spmv_sharded  # noqa: F401
from .spmv_sharded import (ShardedPlan, build_sharded_plan,  # noqa: F401
                           make_mesh, spmm_sharded, spmv_sharded)
