"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

The session environment pins jax_platforms to "axon,cpu" (a TPU plugin), and
the env-var route (JAX_PLATFORMS) is overridden -- so force the platform via
config.update, which must happen before the backend initialises.  Multi-chip
sharding is validated on the virtual 8-device CPU mesh; real-TPU
benchmarking happens in bench.py.
"""

import os

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# Persistent XLA compile cache: the full suite is compile-dominated
# (hundreds of device-setup programs); repeat runs skip XLA entirely.
# Keyed separately from bench.py's caches (different backend config).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PFLARE_TEST_JAX_CACHE", "/tmp/pflare_jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: medium scaling-study tests (deselect with -m 'not slow')")
    config.addinivalue_line(
        "markers",
        "smoke: fast correctness tier (<5 min), run with -m smoke; the "
        "analogue of the reference's `make check` "
        "(reference: tests/Makefile:1316-1348)")
    config.addinivalue_line(
        "markers",
        "device: the device-path tier (~5 min): the top device_setup/"
        "device_resetup oracles + the 120^2 device scaling study, run "
        "with -m device so the 1,600+1,600 LoC device modules are "
        "verifiably green every round without the full nightly tier")


# The smoke tier: whole fast modules plus one representative end-to-end
# oracle per subsystem (AIR hierarchy, inverse zoo, PCPFLAREINV protocol,
# sharding, device setup, FEM pipeline).  Everything else runs in the full
# (nightly) tier.
_SMOKE_MODULES = {
    "test_native", "test_parse_output", "test_sparse", "test_cf",
}
_SMOKE_TESTS = {
    # AIR hierarchy end-to-end (the `make check` cases)
    "test_check_adv_diff_25", "test_check_matrandom",
    "test_stream_airg_default", "test_reuse_same_pattern",
    # inverse zoo
    "test_power_equals_arnoldi_low_order", "test_stream_newton_mf",
    "test_sai_isai_solve",
    # PCPFLAREINV protocol
    "test_pcpflareinv_basic", "test_pcpflareinv_coeff_roundtrip",
    # sharding
    "test_sharded_spmv_matches", "test_distributed_tsqr",
    # device first setup
    "test_spgemm_drop_lump_matches_native", "test_solve_quality_matches_host",
    # FEM pipeline
    "test_fv_upwind_row_sums",
}


# Compile-heavy device-path tests demoted to the slow (nightly) tier so
# `pytest -m "not slow"` stays verifiable on a 1-core box with a COLD
# XLA cache (each of these builds tens of per-shape programs).  One
# representative end-to-end oracle per subsystem stays in the default
# tier (the _DEVICE_KEEP set below + the smoke tests).
_DEVICE_HEAVY_MODULES = {"test_device_setup", "test_device_resetup"}
_DEVICE_KEEP = {
    # device first setup: solve-quality + CF parity oracles
    "test_solve_quality_matches_host", "test_device_vs_host_coarsening_stats",
    "test_spgemm_drop_lump_matches_native", "test_matvec", "test_extract",
    "test_tiny_matrix_single_level",
    # device re-setup: value parity + install protocol
    "test_device_resetup_matches_host_values",
    "test_device_resetup_validation",
    "test_device_resetup_rejects_wrong_pattern",
}


# The device tier (-m device): the top ~20 device-path oracles at their
# reduced grids plus the 120^2 scaling study -- every primitive family
# (SpGEMM/drop/lump, extraction, fixed-sparsity poly + Newton, LAIR Z,
# PMIS variants, CR, truncation, DIA split, sharded setup, one-program
# re-setup) has a green representative each round.
_DEVICE_TIER = {
    # device first setup
    "test_matvec", "test_spgemm_plain", "test_spgemm_drop_lump_matches_native",
    "test_extract", "test_poly_matches_host", "test_newton_matches_host",
    "test_transpose_pattern", "test_solve_quality_matches_host",
    "test_assembled_arnoldi_levels", "test_device_vs_host_coarsening_stats",
    "test_pmis_variants", "test_auto_truncation", "test_cr_splitting",
    "test_lair_variants_match_host", "test_lair_z_values_match_host",
    "test_device_setup_scaling_120", "test_dia_split_matches_general",
    "test_sharded_device_setup_parity",
    # one-program device re-setup
    "test_device_resetup_matches_host_values",
    "test_device_resetup_repeated_installs",
    "test_device_resetup_validation",
    "test_device_resetup_rejects_wrong_pattern",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        base = item.name.split("[")[0]
        if mod in _SMOKE_MODULES or base in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
        if base in _DEVICE_TIER:
            item.add_marker(pytest.mark.device)
        if (mod in _DEVICE_HEAVY_MODULES and base not in _DEVICE_KEEP
                and base not in _SMOKE_TESTS):
            item.add_marker(pytest.mark.slow)
