"""spmv_vector_cache_tpu — a TPU-native sparse linear-algebra library.

Built from scratch with the capabilities of the FPGA SpMV accelerator
``maltanar/spmv-vector-cache`` (see SURVEY.md), re-designed for TPU:

* :mod:`.formats` — CSR/CSC/COO/BSR/ELL pytree containers, conversions, the
  reference's binary wire format, and the structure analyses (maxAlive,
  maxColSpan, row-start marking) that drive strategy selection;
* :mod:`.ops` — semiring-parameterized SpMV/SpMM/SpGEMM/triangular kernels:
  jnp reference executors plus Pallas TPU kernels with explicit VMEM
  result-vector placement strategies (the BufferAll/BufferNone/BufferSel/
  vector-cache design space);
* :mod:`.parallel` — multi-chip scaling via shard_map row partitioning with
  halo/all-gather exchange of the dense vector;
* :mod:`.models` — solvers built on the kernels (CG, Jacobi, power
  iteration/PageRank, GCN);
* :mod:`.utils` — stat registry, roofline observatory, platform policy;
* :mod:`.native` + :mod:`.native_lib` — C++ host-side reference runtime
  (golden kernel, analyses, format IO) mirroring the reference's software/
  layer, exposed via ctypes.
"""

from . import formats, models, ops, parallel, utils  # noqa: F401
from .formats.containers import BSR, COO, CSC, CSR, ELL  # noqa: F401
from .formats.plan import auto_plan  # noqa: F401
from .ops import semiring  # noqa: F401
from .ops.operator import SparseOperator  # noqa: F401
from .ops.reference import golden, spmm, spmv, spmv_numpy  # noqa: F401
from .ops.spmv_pallas import spmv_plan  # noqa: F401

__version__ = "0.1.0"
