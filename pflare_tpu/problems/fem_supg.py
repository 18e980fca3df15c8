"""SUPG-stabilised continuous-Galerkin advection-diffusion FEM.

The second of the reference's unstructured FEM families (reference:
tests/adv_diff_cg_supg.c): steady  -alpha Lap(u) + v . grad(u) = f  with
linear CG elements on triangles/tets and streamline-upwind stabilisation

    tau_K = (h / 2|v|) (coth(Pe) - 1/Pe),   Pe = |v| h / (2 alpha),
    h = V_K^(1/d)

(reference: tests/adv_diff_cg_supg.c:89-119).  For P1 the SUPG residual
term reduces to tau (v.grad u)(v.grad w).  Dirichlet rows are eliminated
the way DMPlex essential BCs are: the assembled operator lives on the
free vertices only.  Boundary sides follow the reference's face-set
convention on the unit square/cube: pure advection constrains the inflow
sides (bottom+left in 2D; bottom+front+left in 3D), diffusive problems
constrain every side.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .gmsh import read_gmsh
from .fem_dg import _TRI_Q, _TET_Q, _tri_shape, _tet_shape, _make_vel


def _tau(dim, h, alpha, v):
    vmag = float(np.linalg.norm(v))
    if vmag < 1e-12:
        return 0.0
    if alpha < 1e-12:
        xi = 1.0
    else:
        pe = vmag * h / (2.0 * alpha)
        if pe < 1e-6:
            xi = pe / 3.0 - pe ** 3 / 45.0
        elif pe > 1e8:
            xi = 1.0
        else:
            xi = 1.0 / np.tanh(pe) - 1.0 / pe
    return (h / (2.0 * vmag)) * xi


def supg_advection_diffusion(points: np.ndarray, cells: np.ndarray,
                             alpha: float = 0.0, velocity=None,
                             unit_velocity: bool = True,
                             curved: bool = False,
                             return_free: bool = False):
    """Assembled SUPG CG operator on the free (non-Dirichlet) vertices.

    Returns the csr matrix (and the free-vertex index array when
    ``return_free``)."""
    points = np.asarray(points, dtype=np.float64)
    if points.shape[1] == 2:
        points = np.hstack([points, np.zeros((len(points), 1))])
    cells = np.asarray(cells, dtype=np.int64)
    nn = cells.shape[1]
    if nn == 3:
        dim, shape, (qp, qw) = 2, _tri_shape, _TRI_Q
    elif nn == 4:
        dim, shape, (qp, qw) = 3, _tet_shape, _TET_Q
    else:
        raise ValueError("SUPG assembly supports P1 triangles/tets")
    vel = _make_vel(dim, velocity, unit_velocity, curved)

    n_pts = len(points)
    lo = points[:, :dim].min(axis=0)
    hi = points[:, :dim].max(axis=0)
    tol = 1e-8 * np.max(hi - lo)
    # Dirichlet sides (reference face-set convention on the unit box):
    # pure advection -> inflow sides only; with diffusion -> all sides
    x, y = points[:, 0], points[:, 1]
    if alpha < 1e-12:
        dir_mask = (np.abs(y - lo[1]) < tol) | (np.abs(x - lo[0]) < tol)
        if dim == 3:
            dir_mask |= np.abs(points[:, 2] - lo[2]) < tol
    else:
        dir_mask = np.zeros(n_pts, dtype=bool)
        for d in range(dim):
            dir_mask |= (np.abs(points[:, d] - lo[d]) < tol)
            dir_mask |= (np.abs(points[:, d] - hi[d]) < tol)

    N, dN = shape(qp)
    rows, cols, vals = [], [], []
    for c in range(len(cells)):
        xc = points[cells[c]][:, :dim]
        J = dN[0].T @ xc                      # affine: constant Jacobian
        detJ = abs(np.linalg.det(J))
        gradN = dN[0] @ np.linalg.inv(J.T)    # [nb, dim]
        vol = detJ * (0.5 if dim == 2 else 1.0 / 6.0)
        h = vol ** (1.0 / dim)
        Ke = np.zeros((nn, nn))
        for q in range(len(qw)):
            x_q = N[q] @ xc
            v = vel(x_q)
            t = _tau(dim, h, alpha, v)
            gv = gradN @ v                    # v . grad(phi)
            w = qw[q] * detJ
            Ke += w * (alpha * (gradN @ gradN.T)
                       + np.outer(N[q], gv)
                       + t * np.outer(gv, gv))
        for i in range(nn):
            for j in range(nn):
                rows.append(cells[c, i])
                cols.append(cells[c, j])
                vals.append(Ke[i, j])

    A = sp.csr_matrix((vals, (rows, cols)), shape=(n_pts, n_pts))
    A.sum_duplicates()
    free = np.nonzero(~dir_mask)[0]
    A = sp.csr_matrix(A[free][:, free])
    A.eliminate_zeros()
    A.sort_indices()
    return (A, free) if return_free else A


def supg_from_gmsh(path: str, alpha: float = 0.0, velocity=None,
                   unit_velocity: bool = True, curved: bool = False
                   ) -> sp.csr_matrix:
    """SUPG CG operator on a Gmsh mesh (the reference's
    adv_diff_cg_supg -dm_plex_filename family)."""
    points, cells = read_gmsh(path)
    name = "tet" if "tet" in cells else "tri"
    if name not in cells:
        raise ValueError("SUPG assembly needs a triangle or tet mesh")
    return supg_advection_diffusion(points, cells[name], alpha=alpha,
                                    velocity=velocity,
                                    unit_velocity=unit_velocity,
                                    curved=curved)
