"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of exercising the full design in a
simulated environment (Chisel C++ emulator + 64 MB memory model,
``chisel/Main.scala:73-83``): Pallas kernels run in interpret mode on CPU
(see ``spmv_vector_cache_tpu.utils.platform``), and sharding tests get 8
virtual devices.  Set SPMV_TPU_TESTS_ON_TPU=1 to run on real hardware.
"""

import os

if os.environ.get("SPMV_TPU_TESTS_ON_TPU") != "1":
    # force-override: the session environment pins JAX to a remote TPU
    # tunnel (sitecustomize registers the 'axon' plugin and imports jax
    # before conftest runs), which would funnel every unit test through
    # slow remote compiles — so set both the env var (for subprocesses)
    # and the live jax config (for this already-imported process)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("SPMV_TPU_TESTS_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_MATRICES = "/root/reference/matrices"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_MATRICES)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def random_csr(rng, rows, cols, density=0.05, dtype=np.float32):
    """Random CSR with sorted indices for property tests."""
    from scipy import sparse

    a = sparse.random(rows, cols, density=density, format="csr",
                      random_state=np.random.RandomState(int(rng.integers(1 << 30))),
                      dtype=np.float64).astype(dtype)
    a.sort_indices()
    from spmv_vector_cache_tpu.formats.convert import from_scipy
    return from_scipy(a)
