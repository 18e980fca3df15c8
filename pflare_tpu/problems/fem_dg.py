"""DG(1) upwind advection FEM assembly on unstructured meshes.

The reference's unstructured test family discretises scalar advection with
an upwinded discontinuous-Galerkin space of default degree 1 on meshes
read through DMPlex (reference: tests/adv_dg_upwind.c:1721-1745,
-adv_dg_petscspace_degree default 1).  This is the same discretisation
built directly: each cell owns its nodal P1/Q1 DoFs (broken space), the
volume term is -int_K u (v . grad w), interior and outflow facets carry
the upwind flux, inflow facets are weak Dirichlet (RHS only).

Design notes:
- Nodal bases mean facet traces are the FACET's own nodal functions, so
  the +/- traces at shared quadrature points need no inverse coordinate
  maps -- each side's basis values follow from matching facet vertices to
  cell-local vertices.
- Simplices use affine Jacobians; hexes use the full trilinear
  isoparametric map evaluated per quadrature point (the twisted-annulus
  mesh has genuinely curved cells).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .gmsh import read_gmsh, _TRI, _QUAD, _TET, _HEX

# ~~~~~~~~~~~~~~~ reference elements (nodal, degree 1) ~~~~~~~~~~~~~~~


def _tri_shape(q):
    x, y = q[:, 0], q[:, 1]
    N = np.stack([1 - x - y, x, y], axis=1)
    dN = np.broadcast_to(
        np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]]), (len(q), 3, 2))
    return N, dN


def _tet_shape(q):
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    N = np.stack([1 - x - y - z, x, y, z], axis=1)
    dN = np.broadcast_to(
        np.array([[-1.0, -1.0, -1.0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                 dtype=np.float64), (len(q), 4, 3))
    return N, dN


def _quad_shape(q):
    x, y = q[:, 0], q[:, 1]
    N = np.stack([(1 - x) * (1 - y), x * (1 - y), x * y, (1 - x) * y],
                 axis=1)
    dN = np.stack([
        np.stack([-(1 - y), -(1 - x)], axis=1),
        np.stack([(1 - y), -x], axis=1),
        np.stack([y, x], axis=1),
        np.stack([-y, (1 - x)], axis=1),
    ], axis=1)
    return N, dN


def _hex_shape(q):
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    xm, ym, zm = 1 - x, 1 - y, 1 - z
    corners = [(xm, ym, zm), (x, ym, zm), (x, y, zm), (xm, y, zm),
               (xm, ym, z), (x, ym, z), (x, y, z), (xm, y, z)]
    N = np.stack([a * b * c for a, b, c in corners], axis=1)
    sx = [-1, 1, 1, -1, -1, 1, 1, -1]
    sy = [-1, -1, 1, 1, -1, -1, 1, 1]
    sz = [-1, -1, -1, -1, 1, 1, 1, 1]
    xs = [xm, x, x, xm, xm, x, x, xm]
    ys = [ym, ym, y, y, ym, ym, y, y]
    zs = [zm, zm, zm, zm, z, z, z, z]
    dN = np.stack([
        np.stack([sx[i] * ys[i] * zs[i], sy[i] * xs[i] * zs[i],
                  sz[i] * xs[i] * ys[i]], axis=1)
        for i in range(8)
    ], axis=1)
    return N, dN


def _gauss1d(n=2):
    p = 0.5 + np.array([-1, 1]) * (0.5 / np.sqrt(3.0))
    w = np.array([0.5, 0.5])
    return p, w


# volume quadrature (degree-2 exact on simplices; 2^d Gauss on tensor cells)
_TRI_Q = (np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]]),
          np.full(3, 1 / 6))
_TET_Q_A = (5 - np.sqrt(5.0)) / 20
_TET_Q_B = (5 + 3 * np.sqrt(5.0)) / 20
_TET_Q = (np.array([[_TET_Q_A] * 3,
                    [_TET_Q_B, _TET_Q_A, _TET_Q_A],
                    [_TET_Q_A, _TET_Q_B, _TET_Q_A],
                    [_TET_Q_A, _TET_Q_A, _TET_Q_B]]),
          np.full(4, 1 / 24))
_P1, _W1 = _gauss1d()
_QUAD_Q = (np.array([[a, b] for a in _P1 for b in _P1]),
           np.array([wa * wb for wa in _W1 for wb in _W1]))
_HEX_Q = (np.array([[a, b, c] for a in _P1 for b in _P1 for c in _P1]),
          np.array([wa * wb * wc for wa in _W1 for wb in _W1 for wc in _W1]))

# facet quadrature: segments (2D facets) and tri/quad (3D facets)
_SEG_Q = (_P1.reshape(-1, 1), _W1 * 1.0)
_FTRI_Q = (np.array([[1 / 6, 1 / 6], [2 / 3, 1 / 6], [1 / 6, 2 / 3]]),
           np.full(3, 1 / 6))   # sums to 1/2; |cross(T0,T1)| = 2*Area
_FQUAD_Q = _QUAD_Q

_CELLS = {
    3: dict(shape=_tri_shape, quad=_TRI_Q, facets=_TRI[1], dim=2),
    4: None,    # tet vs quad decided by geometry
    8: dict(shape=_hex_shape, quad=_HEX_Q, facets=_HEX[1], dim=3),
}
_TET_DEF = dict(shape=_tet_shape, quad=_TET_Q, facets=_TET[1], dim=3)
_QUAD_DEF = dict(shape=_quad_shape, quad=_QUAD_Q, facets=_QUAD[1], dim=2)


def _facet_basis(fverts_local_count, q):
    """Nodal shape functions of a facet (segment / tri / quad) at its own
    reference points."""
    if fverts_local_count == 2:
        x = q[:, 0]
        return np.stack([1 - x, x], axis=1)
    if fverts_local_count == 3:
        return _tri_shape(q)[0]
    return _quad_shape(q)[0]


def _make_vel(dim, velocity, unit, curved):
    def vel(x):
        if curved:
            v = (np.array([x[1], 1.0 - x[0], 0.0]) if dim == 2 else
                 np.array([x[2], x[2], 2.0 - x[0] - x[1]]))
        elif velocity is None:
            v = np.ones(3) if dim == 3 else np.array([1.0, 1.0, 0.0])
        elif callable(velocity):
            v = np.asarray(velocity(x), dtype=np.float64)
            if len(v) == 2:
                v = np.array([v[0], v[1], 0.0])
        else:
            v = np.asarray(velocity, dtype=np.float64)
            if len(v) == 2:
                v = np.array([v[0], v[1], 0.0])
        if unit:
            m = np.linalg.norm(v[:dim])
            if m > 1e-300:
                v = v / m
        return v[:dim]
    return vel


def dg1_upwind_advection(points: np.ndarray, cells: np.ndarray,
                         velocity=None, unit_velocity: bool = True,
                         curved: bool = False) -> sp.csr_matrix:
    """Assembled DG(1) upwind advection operator (one nodal DoF block per
    cell; broken space)."""
    points = np.asarray(points, dtype=np.float64)
    if points.shape[1] == 2:
        points = np.hstack([points, np.zeros((len(points), 1))])
    cells = np.asarray(cells, dtype=np.int64)
    nn = cells.shape[1]
    if nn == 3:
        ref = _CELLS[3]
    elif nn == 8:
        ref = _CELLS[8]
    elif nn == 4:
        vol = np.abs(np.einsum(
            "ij,ij->i",
            np.cross(points[cells[:, 1]] - points[cells[:, 0]],
                     points[cells[:, 2]] - points[cells[:, 0]]),
            points[cells[:, 3]] - points[cells[:, 0]]))
        ref = _TET_DEF if np.median(vol) > 1e-14 else _QUAD_DEF
    else:
        raise ValueError(f"unsupported cell arity {nn}")
    dim = ref["dim"]
    shape = ref["shape"]
    qp, qw = ref["quad"]
    facets = ref["facets"]
    vel = _make_vel(dim, velocity, unit_velocity, curved)

    n_cells = len(cells)
    nb = nn
    ndof = n_cells * nb
    rows, cols, vals = [], [], []

    # ~~~~~~~~~~ volume terms ~~~~~~~~~~
    N, dN = shape(qp)                        # [q,nb], [q,nb,dim]
    Xc = points[cells][:, :, :dim]           # [c,nn,dim]
    for c in range(n_cells):
        xc = Xc[c]
        Ke = np.zeros((nb, nb))
        for q in range(len(qw)):
            J = dN[q].T @ xc                 # J[xi, x] = dx/dxi
            detJ = abs(np.linalg.det(J))
            # dN/dx = dN/dxi . dxi/dx = dN @ inv(J^T)
            gradN = dN[q] @ np.linalg.inv(J.T)        # [nb,dim] physical
            x_q = N[q] @ xc
            v = vel(x_q)
            # -u (v . grad w): A[i,j] -= w detJ * N_j * (v . gradN_i)
            Ke -= qw[q] * detJ * np.outer(gradN @ v, N[q])
        i0 = c * nb
        for i in range(nb):
            for j in range(nb):
                if Ke[i, j] != 0.0:
                    rows.append(i0 + i)
                    cols.append(i0 + j)
                    vals.append(Ke[i, j])

    # ~~~~~~~~~~ facet terms ~~~~~~~~~~
    facet_map: dict[tuple, tuple[int, int]] = {}
    interior, boundary = [], []
    for c in range(n_cells):
        for lf, fv in enumerate(facets):
            key = tuple(sorted(int(cells[c, v]) for v in fv))
            other = facet_map.pop(key, None)
            if other is None:
                facet_map[key] = (c, lf)
            else:
                interior.append((other[0], other[1], c, lf))
    boundary = list(facet_map.values())

    def facet_qp(fverts):
        """(basis [q,k], physical points [q,dim], normal*dS [q,dim])"""
        k = len(fverts)
        fq = (_SEG_Q if k == 2 else _FTRI_Q if k == 3 else _FQUAD_Q)
        q, w = fq
        Nf = _facet_basis(k, q)
        xf = points[fverts][:, :dim]
        X = Nf @ xf                       # [q,dim]
        if k == 2:
            e = xf[1] - xf[0]
            nrm = np.array([e[1], -e[0]])
            nds = np.outer(w, nrm)        # |e| folded into nrm
        else:
            # tangents of the parametrisation
            if k == 3:
                dNf = np.broadcast_to(
                    np.array([[-1.0, -1.0], [1, 0], [0, 1]]), (len(q), 3, 2))
            else:
                dNf = _quad_shape(q)[1]
            nds = np.empty((len(q), 3))
            for iq in range(len(q)):
                T = dNf[iq].T @ xf        # [2,3]
                nrm = np.cross(T[0], T[1])
                nds[iq] = w[iq] * nrm     # area scaling in the cross product
        return Nf, X, nds

    def local_of(cell, fverts):
        """cell-local index of each facet vertex."""
        cl = list(cells[cell])
        return [cl.index(v) for v in fverts]

    def add_face(cm, lfm, cp):
        """Upwind flux on the facet owned by cell cm (local facet lfm);
        cp = neighbour cell (or -1 boundary)."""
        fverts = cells[cm, list(facets[lfm])]
        Nf, X, nds = facet_qp(fverts)
        loc_m = local_of(cm, fverts)
        loc_p = local_of(cp, fverts) if cp >= 0 else None
        cent = points[cells[cm]][:, :dim].mean(axis=0)
        i0m = cm * nb
        i0p = cp * nb if cp >= 0 else None
        for iq in range(len(X)):
            nrm = nds[iq]
            # orient outward from cm
            if np.dot(nrm, X[iq] - cent) < 0:
                nrm = -nrm
            bn = float(np.dot(vel(X[iq]), nrm))
            phi = Nf[iq]                  # facet basis at this point
            if bn >= 0 or cp < 0:
                # upwind = minus side (or boundary: outflow contributes,
                # inflow bn<0 is Dirichlet data -> RHS only)
                if cp < 0 and bn < 0:
                    continue
                for a, la in enumerate(loc_m):         # trial u^-
                    for b, lb in enumerate(loc_m):     # test w^-
                        vals.append(bn * phi[a] * phi[b])
                        rows.append(i0m + lb)
                        cols.append(i0m + la)
                    if cp >= 0:
                        for b, lb in enumerate(loc_p):  # test w^+
                            vals.append(-bn * phi[a] * phi[b])
                            rows.append(i0p + lb)
                            cols.append(i0m + la)
            else:
                # upwind = plus side
                for a, la in enumerate(loc_p):         # trial u^+
                    for b, lb in enumerate(loc_m):
                        vals.append(bn * phi[a] * phi[b])
                        rows.append(i0m + lb)
                        cols.append(i0p + la)
                    for b, lb in enumerate(loc_p):
                        vals.append(-bn * phi[a] * phi[b])
                        rows.append(i0p + lb)
                        cols.append(i0p + la)

    for cm, lfm, cp, _lfp in interior:
        add_face(cm, lfm, cp)
    for cm, lfm in boundary:
        add_face(cm, lfm, -1)

    A = sp.csr_matrix((vals, (rows, cols)), shape=(ndof, ndof))
    A.sum_duplicates()
    A.eliminate_zeros()
    A.sort_indices()
    return A


def dg1_advection_from_gmsh(path: str, velocity=None,
                            unit_velocity: bool = True,
                            curved: bool = False) -> sp.csr_matrix:
    """DG(1) upwind advection on a Gmsh mesh -- the discretisation of the
    reference's adv_dg_upwind tests (degree 1 default)."""
    points, cells = read_gmsh(path)
    name = ("hex" if "hex" in cells else "tet" if "tet" in cells
            else "quad" if "quad" in cells else "tri")
    return dg1_upwind_advection(points, cells[name], velocity=velocity,
                                unit_velocity=unit_velocity, curved=curved)
