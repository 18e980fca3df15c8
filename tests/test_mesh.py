"""Gmsh import + unstructured upwind advection on the reference meshes.

reference: tests/adv_dg_upwind.c with -dm_plex_filename data/*.msh
(tests/Makefile:326-384): AIRG + Richardson (unpreconditioned norm),
a_lump, rtol 1e-5.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pflare_tpu import AIROptions, PCAIR
from pflare_tpu.problems import read_gmsh, fv_upwind_advection, \
    advection_from_gmsh

DATA = os.environ.get("PFLARE_DATA", "/root/reference/tests/data")


def _mesh(name):
    path = os.path.join(DATA, name + ".msh")
    if not os.path.exists(path):
        pytest.skip("reference meshes not available")
    return path


def test_read_gmsh_square():
    pts, cells = read_gmsh(_mesh("square_unstruc"))
    assert pts.shape == (568, 3)
    assert cells["tri"].shape == (1054, 3)
    assert cells["tri"].min() == 0 and cells["tri"].max() == 567


def test_read_gmsh_3d():
    pts, cells = read_gmsh(_mesh("cube_unstruc"))
    assert cells["tet"].shape[1] == 4
    pts2, cells2 = read_gmsh(_mesh("annulus_twisted"))
    assert cells2["hex"].shape == (512, 8)
    # annulus: radii in [inner, outer], full z range
    r = np.linalg.norm(pts2[:, :2], axis=1)
    assert r.min() > 0.1 and pts2[:, 2].max() > pts2[:, 2].min()


def test_fv_upwind_row_sums():
    """Interior rows of a pure-advection FV operator sum to ~0 (telescoping
    fluxes); boundary outflow/inflow rows are positive."""
    A = advection_from_gmsh(_mesh("square_unstruc"))
    rs = np.asarray(A.sum(axis=1)).ravel()
    assert rs.min() > -1e-12
    assert (np.abs(rs) < 1e-12).sum() > 0.5 * A.shape[0]
    assert (A.diagonal() > 0).all()


@pytest.mark.parametrize("name,kw,cap", [
    ("square_unstruc", {}, 6),        # reference: Makefile:326 (max_it 6)
    ("cube_unstruc", {}, 4),          # reference: Makefile:363 (max_it 4)
])
def test_airg_on_reference_meshes(name, kw, cap):
    A = advection_from_gmsh(_mesh(name), **kw)
    pc = PCAIR(AIROptions(a_lump=True), jit=False)
    pc.setup(A)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    r = pc.solve(b, ksp="richardson", rtol=1e-5, max_it=cap)
    assert r.converged, r.iterations
    x = np.asarray(r.x)
    tr = (np.linalg.norm(A @ x - np.asarray(b))
          / np.linalg.norm(np.asarray(b)))
    assert tr < 1e-4


def test_annulus_axial_flow():
    """Twisted-annulus axial flow (reference: Makefile:359 -u 0 -v 0 -w 1).

    The P0 upwind operator on the uniform twisted hexes is DEGENERATE for
    binned DDC (every F row has the bitwise-same dominance ratio, so the
    boundary bin holds all of them and the whole grid coarsens away --
    the reference's binned DDC, src/DDC_Module.F90:452, would do the same
    on this matrix; its DG test matrix has intra-cell DoF structure and
    doesn't degenerate).  The one-level polynomial fallback still solves
    it; the DG assembly closes the cap-parity gap."""
    A = advection_from_gmsh(_mesh("annulus_twisted"),
                            velocity=(0.0, 0.0, 1.0))
    pc = PCAIR(AIROptions(a_lump=True), jit=False)
    pc.setup(A)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]))
    r = pc.solve(b, ksp="richardson", rtol=1e-5, max_it=12)
    assert r.converged, r.iterations
