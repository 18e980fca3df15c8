"""PCAIR: the reduction-multigrid preconditioner object.

The user-facing equivalent of the reference's PCAIR PETSc type
(reference: src/PCAIR.c, src/PCAIR_Shell.F90): setup builds/reuses the
hierarchy, apply runs the jitted Kaskade cycle, and every option has a
get/set through the ``AIROptions`` dataclass.  Changing options resets the
preconditioner (reference: src/PCAIR_Interfaces.F90:1821-1882); re-setup
with ``structure='same'`` triggers sparsity reuse
(reference: src/PCAIR_Shell.F90:107-165).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from functools import partial

from ..options import AIROptions
from ..utils.timers import timer
from .hierarchy import Hierarchy, setup_hierarchy
from .smooth import vcycle_full, vcycle_kaskade
from .stats import compute_stats, print_stats


@partial(jax.jit,
         static_argnames=("max_it", "m", "side", "smooth_order", "full"))
def _gmres_jit_program(E, levels, ci, b, x0, rtol, atol, *, max_it, m,
                       side, smooth_order, full):
    """One-program restarted GMRES with the AIR cycle as preconditioner
    (solvers/jitted.py::gmres_stationary).  Operators are pytree
    ARGUMENTS, never closure constants (docs/tpu.md)."""
    from ..solvers.jitted import gmres_stationary

    if not levels:
        precond = ci.apply
    elif full:
        precond = lambda r: vcycle_full(levels, ci, r)
    else:
        precond = lambda r: vcycle_kaskade(levels, ci, r, smooth_order)
    return gmres_stationary(E.matvec, precond, b, x0, rtol, atol,
                            max_it, m, side)


def _cast_inverse_lazy(inv, dtype):
    """Cast an Inverse's float leaves to ``dtype`` WITHOUT forcing its
    lazy device operator: Inverse.tree_flatten touches the ``mat``
    property, so a plain tree_map would materialise (csr->ELL + h2d) the
    coarse operator inside the timed setup -- the 'gpu copy stage' the
    reference itself keeps out of its setup timing (reference:
    tests/adv_diff_fd.c:327-331).  The deferred operator picks the dtype
    up through ``_mat_dtype`` when the solve warmup materialises it."""
    from ..inverse.build import Inverse

    cast = lambda x: (x.astype(dtype)
                      if hasattr(x, "dtype")
                      and jnp.issubdtype(x.dtype, jnp.floating) else x)
    if not isinstance(inv, Inverse):
        return jax.tree_util.tree_map(cast, inv)
    inv._mat_dtype = dtype
    if inv._mat is not None:
        inv._mat = jax.tree_util.tree_map(cast, inv._mat)
    if inv.coefficients is not None:
        inv.coefficients = cast(inv.coefficients)
    if inv.diag is not None:
        inv.diag = cast(inv.diag)
    return inv


class PCAIR:
    """Reduction multigrid with approximate ideal restriction.

    Usage::

        pc = PCAIR(AIROptions(...))
        pc.setup(A)              # scipy CSR (host) matrix
        y = pc.apply(r)          # jitted V-cycle, device vectors
        res = pc.solve(b, ...)   # GMRES with this PC
    """

    def __init__(self, options: AIROptions | None = None, jit: bool = True,
                 dtype=None, **kw):
        opts = options or AIROptions()
        if kw:
            opts = opts.replace(**kw)
        self.options = opts
        self.jit = jit  # jit=False runs the cycle eagerly (cheap for tests)
        self.dtype = dtype  # device dtype for the solve phase (e.g. f32)
        self.hierarchy: Hierarchy | None = None
        self._apply_jit = None
        self._frozen = False  # KSPSetReusePreconditioner analogue
        self._perm = None     # reorder="rcm" row/col permutation
        self._injected_coeffs = None  # PCAIRSetPolyCoeffs payloads

    # ~~~~~~~~~~ option mutation resets the PC ~~~~~~~~~~
    def set_options(self, **kw):
        self.options = self.options.replace(**kw)
        self.reset()

    def reset(self):
        self.hierarchy = None
        self._apply_jit = None
        self._injected_coeffs = None

    def freeze(self, flag: bool = True):
        """KSPSetReusePreconditioner semantics (reference:
        src/PCAIR.c:150-166): skip re-setup entirely while frozen."""
        self._frozen = flag

    def build_device_resetup(self):
        """Fully-jitted numeric re-setup plan (see air/device_resetup.py):
        ``plan = pc.build_device_resetup(); plan.install(pc, A_new)``
        rebuilds the whole device hierarchy from new same-pattern matrix
        values in one XLA program.  Requires setup with
        ``reuse_sparsity=True, reuse_amount>=3``."""
        from .device_resetup import DeviceResetup

        if self.hierarchy is None:
            raise RuntimeError("PCAIR not set up")
        import jax.numpy as _jnp

        return DeviceResetup(self.hierarchy,
                             dtype=self.dtype or _jnp.float64)

    # ~~~~~~~~~~ setup ~~~~~~~~~~
    def setup(self, A, structure: str = "different", near_nullspace=None,
              mesh=None):
        """Build the hierarchy.  structure='same' reuses the CF splitting
        and every stored sparsity pattern when reuse_sparsity is on.

        ``mesh``: distributed-setup slice -- PMISR runs on device over the
        mesh and power-basis coefficients reduce through the distributed
        TSQR (see air/hierarchy.py::setup_hierarchy)."""
        if self._frozen and self.hierarchy is not None:
            return self
        A = sp.csr_matrix(A)
        A = self._apply_reorder(A)
        # Single-precision host setup (the reference's single build,
        # reference: tests/Makefile:34-48): opt-in via
        # PFLARE_HOST_SETUP_F32=1.  Measured on the 512^2 bench config:
        # no wall-clock win (the native setup kernels are index/branch
        # bound, not value-bandwidth bound) and the single-precision drop
        # tolerance set weakens the hierarchy (4 -> 8 iterations), so f64
        # setup + f32 solve stays the default.
        import os as _os

        if (self.dtype is not None and np.dtype(self.dtype) == np.float32
                and A.dtype == np.float64
                and _os.environ.get("PFLARE_HOST_SETUP_F32") == "1"):
            A = A.astype(np.float32)
        with timer("air_setup"):
            previous = None
            if (structure == "same" and self.hierarchy is not None
                    and self.options.reuse_sparsity):
                previous = self.hierarchy
            # Pin setup-phase arrays to the host CPU device: with a remote
            # TPU attached, default-device jnp.asarray would push every
            # intermediate through the tunnel.  Device upload happens
            # lazily at first apply (the warmup phase).
            try:
                cpu = jax.local_devices(backend="cpu")[0]
                ctx = jax.default_device(cpu)
            except Exception:
                import contextlib

                ctx = contextlib.nullcontext()
            with ctx:
                self.hierarchy = setup_hierarchy(
                    A, self.options, previous=previous,
                    near_nullspace=near_nullspace, mesh=mesh,
                    injected_coeffs=self._injected_coeffs,
                )
            self.hierarchy.device_dtype = self.dtype
            if self.dtype is not None:
                self.hierarchy.coarse_inv = _cast_inverse_lazy(
                    self.hierarchy.coarse_inv, self.dtype)
        self._build_apply()
        if self.options.print_stats_timings:
            from ..utils.timers import print_timers

            print_stats(self.hierarchy)
            print_timers()
        return self

    def setup_device(self, A, dtype=None):
        """TPU-first setup: pattern discovery AND numerics on the
        accelerator (air/device_setup.py), the analogue of the reference's
        Kokkos setup path for device-resident matrices (reference:
        docs/gpus.md, src/PETSc_Helperk.kokkos.cxx).  Falls back to the
        host setup when the option set is outside the device envelope."""
        from .device_setup import (device_setup_supported,
                                   device_setup_unsupported_reason,
                                   setup_hierarchy_device)
        from ..sparse.dell import DELL

        if self._frozen and self.hierarchy is not None:
            return self
        if not device_setup_supported(self.options):
            import sys as _sys

            print("# setup_device: option(s) outside the device envelope, "
                  f"using the host setup: "
                  f"{device_setup_unsupported_reason(self.options)}",
                  file=_sys.stderr)
            return self.setup(A)
        if isinstance(A, DELL):
            # already device-resident (the caller did the h2d copy);
            # reordering needs host CSR, so it must be off
            if self.options.reorder != "none":
                raise ValueError(
                    "setup_device(DELL) cannot reorder; pass a scipy "
                    "matrix or set reorder='none'")
            self._perm = None
        else:
            A = self._apply_reorder(sp.csr_matrix(A))
        dtype = dtype or self.dtype or jnp.float32
        with timer("air_setup"):
            self.hierarchy = setup_hierarchy_device(A, self.options,
                                                    dtype=dtype)
        self._build_apply()
        return self

    def _apply_reorder(self, A):
        """Optional bandwidth-reducing reordering before setup
        (options.reorder == "rcm"): reverse Cuthill-McKee bands the
        matrix so its operators reach the slice-based SpMV paths
        (DIA / banded Pallas) instead of the ~50x-slower TPU gather
        (docs/tpu.md).  Vectors permute transparently in apply/solve."""
        if self.options.reorder == "none":
            self._perm = None
            return A
        if self.options.reorder not in ("rcm", "auto"):
            raise ValueError(f"unknown reorder {self.options.reorder!r}")
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        pat = sp.csr_matrix(
            (np.ones(A.nnz), A.indices, A.indptr), shape=A.shape)
        pat = sp.csr_matrix(pat + pat.T)
        perm = np.asarray(reverse_cuthill_mckee(pat, symmetric_mode=True),
                          dtype=np.int64)
        if self.options.reorder == "auto":
            # the partitioner-quality stand-in (reference: ParMETIS
            # repartition, src/C_PETSc_Routines.c:17-175): reorder only
            # when RCM meaningfully shrinks the bandwidth, so banded
            # operators (structured grids, already-RCM inputs) keep their
            # natural order and unstructured gmsh operators become
            # neighbour-only under the 1-D row mesh (HaloELL band check)
            rows = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
            bw_nat = int(np.abs(A.indices - rows).max()) if A.nnz else 0
            iperm_t = np.empty_like(perm)
            iperm_t[perm] = np.arange(len(perm))
            bw_rcm = int(np.abs(iperm_t[A.indices] - iperm_t[rows]).max()
                         ) if A.nnz else 0
            if bw_rcm * 2 > bw_nat:
                self._perm = None
                return A
        self._perm = perm
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(len(perm))
        self._iperm = iperm
        self._perm_dev = jnp.asarray(perm, dtype=jnp.int32)
        self._iperm_dev = jnp.asarray(iperm, dtype=jnp.int32)
        Ap = sp.csr_matrix(A[perm][:, perm])
        Ap.sort_indices()
        return Ap

    def _to_internal(self, v):
        return jnp.take(v, self._perm_dev) if self._perm is not None else v

    def _from_internal(self, v):
        return jnp.take(v, self._iperm_dev) if self._perm is not None else v

    def _top_operator(self):
        """The finest-level operator as a device matvec object."""
        hier = self.hierarchy
        if hasattr(hier, "top_A") and hier.top_A is not None:
            return hier.top_A
        from ..sparse import ELL

        A = hier.levels[0].A if hier.levels else hier.coarse_matrix
        return ELL.from_scipy(A, dtype=self.dtype)

    def _build_apply(self):
        opts = self.options
        hier = self.hierarchy
        if not hier.levels:
            # single level: precondition with the coarse solve directly
            # (reference: src/AIR_MG_Setup.F90:1158-1175)
            fn = lambda levels, ci, r: ci.apply(r)
        elif opts.full_smoothing_up_and_down:
            fn = lambda levels, ci, r: vcycle_full(levels, ci, r)
        else:
            smooth_order = opts.smooth_arg

            def fn(levels, ci, r):
                return vcycle_kaskade(levels, ci, r, smooth_order)

        def _inv_kind(lvl):
            inv = (lvl.get("inv_Aff") if isinstance(lvl, dict)
                   else getattr(lvl, "inv_Aff", None))
            return getattr(inv, "kind", "")

        use_jit = self.jit
        if use_jit and jax.default_backend() == "cpu" and any(
                _inv_kind(lvl).endswith("_mf") for lvl in hier.levels):
            # XLA:CPU loop fusions recompute chained gather-SpMVs per
            # OUTPUT element, so a jitted cycle with matrix-free Horner
            # smoothers at every level costs O(K^depth) -- measured 60 s
            # per apply vs 50 ms eager on the 2,364-row streaming matrix
            # (see utils/fusion.py for the full post-mortem; the
            # fusion-pass-disable flag that fixes it segfaults this
            # jaxlib elsewhere).  Eager per-op execution never forms the
            # pathological fusion, so CPU runs of mf-smoother configs
            # fall back to it; TPU keeps the single jitted program.
            use_jit = False
        self._cycle_jitted = use_jit
        self._apply_jit = jax.jit(fn) if use_jit else fn

    # ~~~~~~~~~~ apply / solve ~~~~~~~~~~
    def apply(self, r):
        if self.hierarchy is None:
            raise RuntimeError("PCAIR not set up")
        r = self._to_internal(jnp.asarray(r))
        y = self._apply_jit(self.hierarchy.device_levels,
                            self.hierarchy.coarse_inv, r)
        return self._from_internal(y)

    def __call__(self, r):
        return self.apply(r)

    def solve(self, b, x0=None, ksp="gmres", rtol=1e-5, atol=1e-50,
              max_it=10000, side="left", restart=30, eager=None):
        """Krylov solve with this PC.  The default ``ksp='gmres'`` runs as
        ONE jitted XLA program (solvers/jitted.py::gmres_stationary) --
        the whole restarted solve issues <= 3 host syncs instead of one
        per iteration (~10 ms each on a remote TPU).  ``eager=True`` (or
        PFLARE_EAGER_KSP=1) forces the step-by-step host driver in
        solvers/krylov.py, the debug path."""
        import os

        from ..solvers import gmres, richardson, fgmres

        if self.hierarchy is None:
            raise RuntimeError("PCAIR not set up")
        E = self._top_operator()
        b = jnp.asarray(b, dtype=self.dtype) if self.dtype else jnp.asarray(b)
        if eager is None:
            eager = os.environ.get("PFLARE_EAGER_KSP") == "1"
        if self._perm is not None:
            # solve in the internal (reordered) space with the INTERNAL
            # preconditioner; permute b in and x out
            res = self._solve_internal(E, b, x0, ksp, rtol, atol, max_it,
                                       side, restart, eager)
            return res
        if ksp == "gmres":
            if not eager and getattr(self, "_cycle_jitted", False):
                return self._solve_gmres_jit(E, b, x0, rtol, atol, max_it,
                                             side, restart)
            return gmres(E, b, x0=x0, M=self.apply, side=side, rtol=rtol,
                         atol=atol, max_it=max_it, restart=restart)
        if ksp == "fgmres":
            return fgmres(E, b, x0=x0, M=self.apply, rtol=rtol, atol=atol,
                          max_it=max_it, restart=restart)
        if ksp == "richardson":
            return richardson(E, b, x0=x0, M=self.apply, rtol=rtol,
                              atol=atol, max_it=max_it)
        raise ValueError(ksp)

    def _solve_gmres_jit(self, E, b, x0, rtol, atol, max_it, side,
                         restart, internal=False):
        """Route the default gmres through the one-program jitted solver
        (<= 3 host syncs; see _gmres_jit_program).  ``b`` (and ``x0``)
        are already in internal order when ``internal``."""
        from ..solvers.krylov import SolveResult

        hier = self.hierarchy
        x0a = (jnp.zeros_like(b) if x0 is None
               else jnp.asarray(x0, dtype=b.dtype))
        m = max(1, min(int(restart), int(max_it)))
        full = self.options.full_smoothing_up_and_down
        x, tot, hist, done = _gmres_jit_program(
            E, hier.device_levels, hier.coarse_inv, b, x0a,
            jnp.asarray(rtol, dtype=b.dtype), jnp.asarray(atol, dtype=b.dtype),
            max_it=int(max_it), m=m, side=side,
            smooth_order=self.options.smooth_arg, full=full)
        tot = int(tot)
        norms = np.asarray(hist)[: tot + 1]
        if internal:
            x = self._from_internal(x)
        return SolveResult(x, tot, bool(done), list(norms))

    def _solve_internal(self, E, b, x0, ksp, rtol, atol, max_it, side,
                        restart, eager=False):
        from ..solvers import gmres, richardson, fgmres

        bi = self._to_internal(b)
        x0i = self._to_internal(jnp.asarray(x0)) if x0 is not None else None
        M = lambda r: self._apply_jit(self.hierarchy.device_levels,
                                      self.hierarchy.coarse_inv, r)
        if ksp == "gmres":
            if not eager and getattr(self, "_cycle_jitted", False):
                return self._solve_gmres_jit(E, bi, x0i, rtol, atol,
                                             max_it, side, restart,
                                             internal=True)
            res = gmres(E, bi, x0=x0i, M=M, side=side, rtol=rtol,
                        atol=atol, max_it=max_it, restart=restart)
        elif ksp == "fgmres":
            res = fgmres(E, bi, x0=x0i, M=M, rtol=rtol, atol=atol,
                         max_it=max_it, restart=restart)
        elif ksp == "richardson":
            res = richardson(E, bi, x0=x0i, M=M, rtol=rtol, atol=atol,
                             max_it=max_it)
        else:
            raise ValueError(ksp)
        res.x = self._from_internal(res.x)
        return res

    def solve_device(self, b, max_it: int = 10, ksp: str = "richardson",
                     x0=None, mesh=None):
        """Fully-jitted device solve: one XLA program, no host round trips
        (the TPU production path; see solvers/jitted.py).

        ``mesh``: a 1-D jax Mesh -- the hierarchy is sharded over its row
        axis with the processor-agglomeration schedule (coarse levels keep
        fewer active shards; see parallel/mesh.py::shard_hierarchy), and
        the Krylov matvec uses the explicit ppermute halo exchange when
        the partition is banded (parallel/halo.py::HaloELL) -- the
        reference's PetscSF MatMult (reference: src/PMISR_Module.F90:
        174-180, src/Repartition.F90).

        Returns (x, residual_norms) as device arrays.  Every operator is
        passed as a pytree ARGUMENT -- closure-captured arrays become
        re-streamed program constants on some backends."""
        from ..solvers.jitted import gmres_right_fixed, richardson_fixed

        if self.hierarchy is None:
            raise RuntimeError("PCAIR not set up")
        b = jnp.asarray(b, dtype=self.dtype) if self.dtype else jnp.asarray(b)
        b = self._to_internal(b)
        n = b.shape[0]
        if mesh is not None:
            E, levels, coarse_inv = self._distributed_state(mesh)
            from ..parallel.mesh import shard_vec

            b = shard_vec(b, mesh)
        else:
            E = self._top_operator()
            levels = self.hierarchy.device_levels
            coarse_inv = self.hierarchy.coarse_inv
        smooth_order = self.options.smooth_arg
        solver = richardson_fixed if ksp == "richardson" else gmres_right_fixed
        if not self.hierarchy.levels:
            precond_of = lambda lv, ci: ci.apply
        else:
            def precond_of(lv, ci):
                return lambda r: vcycle_kaskade(lv, ci, r, smooth_order)

        @jax.jit
        def run(E, levels, ci, b):
            return solver(E.matvec, precond_of(levels, ci), b, max_it, x0=x0)

        x, norms = run(E, levels, coarse_inv, b)
        if x.shape[0] > n:
            x = x[:n]
        return self._from_internal(x), norms

    def _distributed_state(self, mesh):
        """(top operator, sharded levels, coarse inverse) for a mesh --
        built once per mesh and cached.  The top operator takes the banded
        ppermute halo-exchange path when the row partition allows it."""
        key = id(mesh)
        cached = getattr(self, "_dist_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        from ..parallel.halo import HaloELL
        from ..parallel.mesh import shard_ell, shard_hierarchy
        from ..sparse import ELL

        hier = self.hierarchy
        A_host = None
        if hier.levels and hasattr(hier.levels[0], "A"):
            A_host = hier.levels[0].A
        elif not hier.levels and hasattr(hier, "coarse_matrix"):
            A_host = hier.coarse_matrix
        if A_host is not None:
            try:
                E = HaloELL.from_scipy(A_host, mesh, dtype=self.dtype)
            except ValueError:
                E = shard_ell(ELL.from_scipy(A_host, dtype=self.dtype), mesh)
        else:
            # device-built hierarchy: shard the resident DELL operator
            from ..parallel.mesh import row_sharding

            top = hier.top_A
            n_dev = mesh.devices.size
            pad = (-top.data.shape[0]) % n_dev
            data = jnp.pad(top.data, ((0, pad), (0, 0)))
            cols = jnp.pad(top.cols, ((0, pad), (0, 0)),
                           constant_values=2**30)
            from ..sparse.dell import DELL

            sh = row_sharding(mesh)
            E = DELL(jax.device_put(data, sh), jax.device_put(cols, sh),
                     top.n_cols)
        levels, coarse_inv = shard_hierarchy(hier, mesh,
                                             options=self.options)
        self._dist_cache = (key, (E, levels, coarse_inv))
        return E, levels, coarse_inv

    # ~~~~~~~~~~ introspection ~~~~~~~~~~
    @property
    def n_levels(self):
        return self.hierarchy.n_levels if self.hierarchy else 0

    def stats(self):
        return compute_stats(self.hierarchy)

    def view(self, out=print):
        """Pretty-print the configuration (the PCView analogue, reference:
        src/PCAIR.c:3034-3599)."""
        o = self.options
        lines = [
            "PCAIR (reduction multigrid with approximate ideal restriction)",
            f"  levels requested/built: {o.max_levels}/{self.n_levels}",
            f"  CF splitting: {o.cf_splitting_type.name}, strong threshold "
            f"{o.strong_threshold}, luby steps {o.max_luby_steps}, "
            f"ddc its {o.ddc_its} fraction {o.ddc_fraction}",
            f"  Z: {o.z_type.name}"
            + (f", lair distance {o.lair_distance}" if o.z_type.value else "")
            + f", strong R threshold {o.strong_r_threshold}",
            f"  prolongator: "
            f"{'one-point classical' if o.one_point_classical_prolong else 'ideal'}"
            + (", symmetric (R^T)" if o.symmetric else ""),
            f"  A_ff inverse: {o.inverse_type.name}, order {o.poly_order}, "
            f"sparsity order {o.inverse_sparsity_order}, "
            f"{'matrix-free' if o.matrix_free_polys else 'assembled'}"
            + (", diag-scaled" if o.diag_scale_polys else ""),
            f"  smoothing: {o.smooth_order} "
            f"({'full up/down' if o.full_smoothing_up_and_down else 'F/C Kaskade'})",
            f"  coarse solver: {o.coarsest_inverse_type.name}, order "
            f"{o.coarsest_poly_order}, "
            f"{'matrix-free' if o.coarsest_matrix_free_polys else 'assembled'}",
            f"  drop: r_drop {o.r_drop}, a_drop {o.a_drop}, "
            f"lump {o.a_lump}",
            f"  reuse: sparsity {o.reuse_sparsity}, amount {o.reuse_amount}, "
            f"poly coeffs {o.reuse_poly_coeffs}",
        ]
        if self.hierarchy is not None:
            s = compute_stats(self.hierarchy)
            lines.append(
                f"  complexities: grid {s['grid_complexity']:.3f}, operator "
                f"{s['operator_complexity']:.3f}, cycle "
                f"{s['cycle_complexity']:.3f}, storage "
                f"{s['storage_complexity']:.3f}"
            )
        for ln in lines:
            out(ln)
        return "\n".join(lines)

    def get_poly_coefficients(self, level: int):
        """Per-level polynomial coefficient extraction (reference:
        PCAIRGetPolyCoeffs, include/pflare.h:191)."""
        if level == -1 or level == self.n_levels - 1:
            inv = self.hierarchy.coarse_inv
        else:
            inv = self.hierarchy.levels[level].inv_Aff
        return None if inv.coefficients is None else np.asarray(inv.coefficients)

    def set_poly_coefficients(self, level: int, coeffs):
        """Per-level polynomial coefficient injection (reference:
        PCAIRSetPolyCoeffs, include/pflare.h:244; exact-reproduction
        protocol docs/reuse.md:216-390, tests/ex6f_getcoeffs.F90).

        Call BEFORE ``setup``: that level's coefficient iteration is
        skipped and the stored values are used instead, so a rebuild with
        every level injected reproduces the original preconditioner
        exactly.  ``level=-1`` targets the coarse solver (when a
        hierarchy already exists -- the re-setup case -- its coarsest
        index is accepted too and mapped to -1; before the first setup
        the coarsest index is unknown, so use -1).  Power/Arnoldi take a
        1-D array; Newton takes the stacked ``[2, k]`` (real, imag) root
        array -- the same layout ``get_poly_coefficients`` returns."""
        level = int(level)
        if (level >= 0 and self.hierarchy is not None
                and level == self.n_levels - 1):
            level = -1      # the coarse solver, like get_poly_coefficients
        if not hasattr(self, "_injected_coeffs") or self._injected_coeffs is None:
            self._injected_coeffs = {}
        self._injected_coeffs[level] = np.asarray(coeffs)
        return self
