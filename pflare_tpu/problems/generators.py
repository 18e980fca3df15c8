"""Test-problem matrix generators.

Re-implementations of the reference's driver problems so the solver oracles
carry over (reference: tests/adv_1d.c, tests/adv_diff_fd.c,
tests/matrandom.F90).  All return scipy CSR in float64.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def adv_1d(n: int) -> sp.csr_matrix:
    """1D steady upwind advection (reference: tests/adv_1d.c:79-105).

    Dirichlet on the left boundary; dimensionless first-order upwind
    elsewhere: row i has -1 at i-1 and +1 at i.
    """
    rows, cols, vals = [0], [0], [1.0]
    i = np.arange(1, n)
    rows += list(i) + list(i)
    cols += list(i - 1) + list(i)
    vals += [-1.0] * (n - 1) + [1.0] * (n - 1)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A.sort_indices()
    return A


def _velocity(dim, u_c, v_c, w_c, x, curved, unit):
    if curved:
        if dim == 2:
            vel = np.array([x[1], 1.0 - x[0], 0.0])
        else:
            vel = np.array([x[2], x[2], 2.0 - x[0] - x[1]])
    else:
        vel = np.array([u_c, v_c, w_c])
    if unit:
        mag = np.sqrt((vel[:dim] ** 2).sum())
        if mag > 1e-12:
            vel = vel / mag
    return vel


def adv_diff_2d(
    nx: int,
    ny: int | None = None,
    theta: float | None = None,
    u: float | None = None,
    v: float | None = None,
    alpha: float = 0.0,
    adv_nondim: bool | None = None,
    curved_velocity: bool = False,
    unit_velocity: bool = True,
    L_x: float = 1.0,
    L_y: float = 1.0,
) -> sp.csr_matrix:
    """2D structured advection-diffusion FD, upwinded advection
    (reference: tests/adv_diff_fd.c:366-494).

    Node ordering x-fastest (index = j*nx + i).  Defaults replicate
    ``./adv_diff_fd``: pure advection at theta=pi/4, dimensionless,
    Dirichlet left/bottom, outflow top/right.
    """
    ny = ny or nx
    if adv_nondim is None:
        adv_nondim = alpha == 0.0
    if adv_nondim and alpha != 0.0:
        raise ValueError("non-dimensional advection only applies without diffusion")

    # velocity defaults (reference: tests/adv_diff_fd.c:189-231)
    uc, vc = 1.0, 1.0
    if theta is None and u is None and v is None:
        theta = np.pi / 4.0
    if theta is not None:
        uc, vc = np.cos(theta), np.sin(theta)
    explicit = u is not None or v is not None
    if u is not None:
        uc = u
    if v is not None:
        vc = v
    if explicit:
        unit_velocity = False

    Hx = L_x / (nx - 1)
    Hy = L_y / (ny - 1)
    HxdHy = Hx / Hy
    HydHx = Hy / Hx
    if adv_nondim:
        adv_x_scale, adv_y_scale = 1.0, HydHx
    else:
        adv_x_scale, adv_y_scale = Hx, Hy

    # vectorised over the grid
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny))  # [ny, nx]
    ii = ii.ravel()
    jj = jj.ravel()
    row = jj * nx + ii

    if curved_velocity:
        u_loc = jj * Hy
        v_loc = 1.0 - ii * Hx
    else:
        u_loc = np.full(row.shape, float(uc))
        v_loc = np.full(row.shape, float(vc))
    if unit_velocity:
        mag = np.sqrt(u_loc**2 + v_loc**2)
        safe = mag > 1e-12
        u_loc = np.where(safe, u_loc / np.where(safe, mag, 1.0), u_loc)
        v_loc = np.where(safe, v_loc / np.where(safe, mag, 1.0), v_loc)

    dirichlet = (ii == 0) | (jj == 0)
    outflow = (~dirichlet) & ((ii == nx - 1) | (jj == ny - 1))
    if alpha != 0.0:
        dirichlet = dirichlet | outflow
        outflow = np.zeros_like(dirichlet)
    interior = ~dirichlet & ~outflow

    rows_l, cols_l, vals_l = [], [], []

    def add(mask, dcol, val):
        rows_l.append(row[mask])
        cols_l.append(row[mask] + dcol)
        vals_l.append(np.broadcast_to(val, row[mask].shape))

    add(dirichlet, 0, 1.0)
    adv = interior | outflow
    add(adv, -nx, (-v_loc * adv_x_scale)[adv])
    add(adv, -1, (-u_loc * adv_y_scale)[adv])
    add(adv, 0, (u_loc * adv_y_scale + v_loc * adv_x_scale)[adv])
    if alpha != 0.0:
        add(interior, -nx, -alpha * HxdHy)
        add(interior, -1, -alpha * HydHx)
        add(interior, 0, alpha * 2.0 * (HxdHy + HydHx))
        add(interior, 1, -alpha * HydHx)
        add(interior, nx, -alpha * HxdHy)

    n = nx * ny
    A = sp.csr_matrix(
        (np.concatenate(vals_l), (np.concatenate(rows_l), np.concatenate(cols_l))),
        shape=(n, n),
    )
    A.sum_duplicates()
    # drop exact zeros like MAT_IGNORE_ZERO_ENTRIES
    A.eliminate_zeros()
    A.sort_indices()
    return A


def adv_diff_3d(
    nx: int,
    ny: int | None = None,
    nz: int | None = None,
    alpha: float = 0.0,
    curved_velocity: bool = False,
    unit_velocity: bool = True,
    L=(1.0, 1.0, 1.0),
) -> sp.csr_matrix:
    """3D upwinded advection(-diffusion) FD (reference: tests/adv_diff_fd.c:495-580)."""
    ny = ny or nx
    nz = nz or nx
    adv_nondim = alpha == 0.0
    Hx, Hy, Hz = L[0] / (nx - 1), L[1] / (ny - 1), L[2] / (nz - 1)
    HyHz_Hx, HxHz_Hy, HxHy_Hz = Hy * Hz / Hx, Hx * Hz / Hy, Hx * Hy / Hz
    if adv_nondim:
        adv_yz, adv_xz, adv_xy = HyHz_Hx / Hx, Hz / Hx, Hy / Hx
    else:
        adv_yz, adv_xz, adv_xy = Hy * Hz, Hx * Hz, Hx * Hy

    rows, cols, vals = [], [], []

    def add(r, c, val):
        rows.append(r)
        cols.append(c)
        vals.append(val)

    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                row = (k * ny + j) * nx + i
                vel = _velocity(
                    3, 1.0, 1.0, 1.0, (i * Hx, j * Hy, k * Hz),
                    curved_velocity, unit_velocity,
                )
                u_loc, v_loc, w_loc = vel
                on_bnd = (
                    i == 0 or j == 0 or k == 0
                    or i == nx - 1 or j == ny - 1 or k == nz - 1
                )
                if on_bnd:
                    if i == 0 or j == 0 or k == 0:
                        add(row, row, 1.0)
                    elif alpha == 0.0:
                        add(row, row - nx * ny, -w_loc * adv_xy)
                        add(row, row - nx, -v_loc * adv_xz)
                        add(row, row - 1, -u_loc * adv_yz)
                        add(row, row, u_loc * adv_yz + v_loc * adv_xz + w_loc * adv_xy)
                    else:
                        add(row, row, 1.0)
                else:
                    if alpha != 0.0:
                        add(row, row - nx * ny, -alpha * HxHy_Hz)
                        add(row, row - nx, -alpha * HxHz_Hy)
                        add(row, row - 1, -alpha * HyHz_Hx)
                        add(row, row, alpha * 2.0 * (HyHz_Hx + HxHz_Hy + HxHy_Hz))
                        add(row, row + 1, -alpha * HyHz_Hx)
                        add(row, row + nx, -alpha * HxHz_Hy)
                        add(row, row + nx * ny, -alpha * HxHy_Hz)
                    if u_loc != 0.0 or v_loc != 0.0 or w_loc != 0.0:
                        add(row, row - nx * ny, -w_loc * adv_xy)
                        add(row, row - nx, -v_loc * adv_xz)
                        add(row, row - 1, -u_loc * adv_yz)
                        add(row, row, u_loc * adv_yz + v_loc * adv_xz + w_loc * adv_xy)

    n = nx * ny * nz
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    A.eliminate_zeros()
    A.sort_indices()
    return A


def random_diag_dominant(n: int, density: float = 0.05, seed: int = 7) -> sp.csr_matrix:
    """Random sparse matrix made diagonally dominant by adding the row sums
    onto the diagonal (reference: tests/matrandom.F90:43-46)."""
    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=np.random.RandomState(seed),
                  format="csr")
    A = A + sp.diags(np.abs(A).sum(axis=1).A1 + rng.uniform(1.0, 2.0, n))
    A = sp.csr_matrix(A)
    A.sort_indices()
    return A


def anisotropic_diffusion_2d(nx: int, epsilon: float = 1e-3,
                             theta: float = 0.0) -> sp.csr_matrix:
    """Rotated anisotropic diffusion, 9-point FD stencil.

    Classic hard AMG test (baseline config list in BASELINE.json).
    -div(K grad u) with K = R(theta) diag(1, epsilon) R(theta)^T, Dirichlet
    boundary via eliminated stencil.
    """
    c, s = np.cos(theta), np.sin(theta)
    kxx = c * c + epsilon * s * s
    kyy = s * s + epsilon * c * c
    kxy = (1.0 - epsilon) * c * s
    # 9-point stencil (FD of mixed derivatives)
    st = np.array(
        [
            [-0.5 * kxy, -kyy, 0.5 * kxy],
            [-kxx, 2.0 * (kxx + kyy), -kxx],
            [0.5 * kxy, -kyy, -0.5 * kxy],
        ]
    )
    n = nx * nx
    rows, cols, vals = [], [], []
    for j in range(nx):
        for i in range(nx):
            row = j * nx + i
            for dj in (-1, 0, 1):
                for di in (-1, 0, 1):
                    ii, jj = i + di, j + dj
                    if 0 <= ii < nx and 0 <= jj < nx:
                        v = st[dj + 1, di + 1]
                        if v != 0.0:
                            rows.append(row)
                            cols.append(jj * nx + ii)
                            vals.append(v)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    A.sum_duplicates()
    A.sort_indices()
    return A


def dg_upwind_advection_unstructured(n_side: int = 20, theta: float | None = None,
                                     curved_velocity: bool = False,
                                     seed: int = 11) -> sp.csr_matrix:
    """First-order upwind finite-volume advection on an unstructured
    triangular mesh (the reference's unstructured DG upwind test family,
    reference: tests/adv_dg_upwind.c).

    Cells are Delaunay triangles of a jittered grid on [0,1]^2; each
    interior edge contributes an upwinded flux v.n * |e|, outflow boundary
    edges add to the diagonal, and fully-inflow cells at the boundary pick
    up their inflow flux on the diagonal (weak Dirichlet).  The operator is
    strongly asymmetric with unstructured connectivity -- the lAIR target
    regime.
    """
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(seed)
    xs = np.linspace(0.0, 1.0, n_side)
    X, Y = np.meshgrid(xs, xs)
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    h = 1.0 / (n_side - 1)
    interior = (pts[:, 0] > 0) & (pts[:, 0] < 1) & (pts[:, 1] > 0) & (pts[:, 1] < 1)
    pts[interior] += rng.uniform(-0.3 * h, 0.3 * h, size=(interior.sum(), 2))
    tri = Delaunay(pts)
    simplices = tri.simplices
    n_cells = len(simplices)
    centroids = pts[simplices].mean(axis=1)

    if theta is None:
        theta = np.pi / 4.0

    def vel(p):
        if curved_velocity:
            v = np.array([p[1], 1.0 - p[0]])
        else:
            v = np.array([np.cos(theta), np.sin(theta)])
        nv = np.linalg.norm(v)
        return v / nv if nv > 1e-12 else v

    rows, cols, vals = [], [], []
    diag = np.zeros(n_cells)
    # neighbour array: tri.neighbors[i][k] is the cell across from vertex k
    for i in range(n_cells):
        verts = simplices[i]
        for k in range(3):
            j = tri.neighbors[i][k]
            # edge opposite vertex k
            a, b = pts[verts[(k + 1) % 3]], pts[verts[(k + 2) % 3]]
            edge = b - a
            length = np.linalg.norm(edge)
            nrm = np.array([edge[1], -edge[0]]) / length  # unit normal
            # orient outward from cell i
            mid = 0.5 * (a + b)
            if np.dot(nrm, mid - centroids[i]) < 0:
                nrm = -nrm
            flux = np.dot(vel(mid), nrm) * length
            if j >= 0:
                if flux > 0:  # outflow across this edge
                    diag[i] += flux
                else:         # inflow from neighbour j
                    rows.append(i)
                    cols.append(int(j))
                    vals.append(flux)  # negative
            else:
                # boundary edge
                if flux > 0:
                    diag[i] += flux           # outflow boundary
                else:
                    diag[i] += -flux          # weak inflow Dirichlet
    rows += list(range(n_cells))
    cols += list(range(n_cells))
    vals += list(diag)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n_cells, n_cells))
    A.sum_duplicates()
    A.eliminate_zeros()
    A.sort_indices()
    return A
