"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

The session environment pins jax_platforms to "axon,cpu" (a TPU plugin), and
the env-var route (JAX_PLATFORMS) is overridden -- so force the platform via
config.update, which must happen before the backend initialises.  Multi-chip
sharding is validated on the virtual 8-device CPU mesh; real-TPU
benchmarking happens in bench.py.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: medium scaling-study tests (deselect with -m 'not slow')")
