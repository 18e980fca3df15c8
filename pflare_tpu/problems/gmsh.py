"""Gmsh mesh import + unstructured upwind advection assembly.

The reference drives its unstructured tests through DMPlex reading Gmsh
files (reference: tests/adv_dg_upwind.c -dm_plex_filename, meshes in
tests/data/*.msh: 2D triangles, 3D tets, 3D hexes on a twisted annulus).
Here the mesh reader is ~100 lines of numpy and the discretisation is the
first-order upwind cell-centred scheme of
problems/generators.py::dg_upwind_advection_unstructured generalised to
2D/3D and arbitrary (tri/quad/tet/hex) cells: one DoF per cell, upwinded
flux v.n |f| on every facet, outflow facets on the diagonal, inflow
boundary facets added as weak Dirichlet.  The resulting operators are the
same strongly-asymmetric unstructured family the reference's DG caps
exercise.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

# element type -> (n_nodes, local facets as vertex index tuples)
_TRI = (3, ((0, 1), (1, 2), (2, 0)))
_QUAD = (4, ((0, 1), (1, 2), (2, 3), (3, 0)))
_TET = (4, ((1, 2, 3), (0, 3, 2), (0, 1, 3), (0, 2, 1)))
_HEX = (8, ((0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4),
            (1, 2, 6, 5), (2, 3, 7, 6), (3, 0, 4, 7)))
_ELEMENTS = {2: ("tri", _TRI), 3: ("quad", _QUAD),
             4: ("tet", _TET), 5: ("hex", _HEX)}


def read_gmsh(path: str):
    """Read a Gmsh 4.1 ASCII mesh.

    Returns (points [n,3] float64, cells: dict name -> [m,k] int vertex
    connectivity, 0-based).  Lower-dimensional elements (points, lines,
    and 2D facets of 3D meshes) are skipped; the highest-dimensional cell
    family present defines the mesh.
    """
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0

    def seek(tag):
        nonlocal i
        while i < len(lines) and lines[i].strip() != tag:
            i += 1
        if i == len(lines):
            raise ValueError(f"gmsh: missing {tag} in {path}")
        i += 1

    seek("$MeshFormat")
    version = lines[i].split()[0]
    if not version.startswith("4"):
        raise ValueError(f"gmsh: only format 4.x supported, got {version}")

    seek("$Nodes")
    n_blocks, n_nodes = (int(x) for x in lines[i].split()[:2])
    i += 1
    coords = np.zeros((n_nodes + 1, 3))       # gmsh tags are 1-based
    tag_of = np.zeros(n_nodes + 1, dtype=np.int64)
    seen = 0
    for _ in range(n_blocks):
        nb = int(lines[i].split()[3])
        i += 1
        tags = [int(lines[i + k]) for k in range(nb)]
        i += nb
        for k in range(nb):
            xyz = [float(x) for x in lines[i + k].split()[:3]]
            coords[tags[k]] = xyz
        i += nb
        for t in tags:
            tag_of[t] = seen
            seen += 1
    points = np.zeros((n_nodes, 3))
    points[tag_of[1:]] = coords[1:]

    seek("$Elements")
    n_blocks, _ = (int(x) for x in lines[i].split()[:2])
    i += 1
    cells: dict[str, list] = {}
    for _ in range(n_blocks):
        _, _, etype, nb = (int(x) for x in lines[i].split()[:4])
        i += 1
        if etype in _ELEMENTS:
            name, (nn, _f) = _ELEMENTS[etype]
            block = np.array(
                [[int(x) for x in lines[i + k].split()[1: 1 + nn]]
                 for k in range(nb)], dtype=np.int64)
            cells.setdefault(name, []).append(block)
        i += nb
    out = {}
    for name, blocks in cells.items():
        conn = np.concatenate(blocks, axis=0)
        out[name] = tag_of[conn]              # to 0-based point indices
    # keep only the top-dimensional family
    if ("tet" in out or "hex" in out) and ("tri" in out or "quad" in out):
        out.pop("tri", None)
        out.pop("quad", None)
    return points, out


def _facet_geometry(pts):
    """(outward-unorientated normal * area, midpoint) of a facet given its
    vertex coordinates [k,3]: segments in 2D (z ignored), triangles, and
    (possibly non-planar) quads split into two triangles."""
    k = len(pts)
    mid = pts.mean(axis=0)
    if k == 2:
        e = pts[1] - pts[0]
        nrm = np.array([e[1], -e[0], 0.0])
        return nrm, mid
    if k == 3:
        nrm = 0.5 * np.cross(pts[1] - pts[0], pts[2] - pts[0])
        return nrm, mid
    n1 = 0.5 * np.cross(pts[1] - pts[0], pts[2] - pts[0])
    n2 = 0.5 * np.cross(pts[2] - pts[0], pts[3] - pts[0])
    return n1 + n2, mid


def fv_upwind_advection(points: np.ndarray, cells: np.ndarray,
                        velocity=None, unit_velocity: bool = True,
                        curved: bool = False) -> sp.csr_matrix:
    """First-order upwind advection operator, one DoF per cell.

    ``velocity``: constant vector, or callable(midpoint)->vector; default
    (1,..,1) normalised like the reference driver
    (reference: tests/adv_dg_upwind.c GetVelocity).  ``curved`` selects the
    reference's curved field ((y, 1-x) in 2D; (z, z, 2-x-y) in 3D).
    """
    points = np.asarray(points, dtype=np.float64)
    if points.shape[1] == 2:
        points = np.hstack([points, np.zeros((len(points), 1))])
    cells = np.asarray(cells, dtype=np.int64)
    nn = cells.shape[1]
    if nn == 3:
        loc = _TRI[1]
        dim = 2
    elif nn == 4:
        # quad (2D) vs tet (3D): tets have volume
        vol = np.abs(np.einsum(
            "ij,ij->i",
            np.cross(points[cells[:, 1]] - points[cells[:, 0]],
                     points[cells[:, 2]] - points[cells[:, 0]]),
            points[cells[:, 3]] - points[cells[:, 0]]))
        if np.median(vol) > 1e-14:
            loc, dim = _TET[1], 3
        else:
            loc, dim = _QUAD[1], 2
    elif nn == 8:
        loc, dim = _HEX[1], 3
    else:
        raise ValueError(f"unsupported cell arity {nn}")

    def vel(mid):
        if curved:
            v = (np.array([mid[1], 1.0 - mid[0], 0.0]) if dim == 2 else
                 np.array([mid[2], mid[2], 2.0 - mid[0] - mid[1]]))
        elif velocity is None:
            v = np.ones(3) if dim == 3 else np.array([1.0, 1.0, 0.0])
        elif callable(velocity):
            v = np.asarray(velocity(mid), dtype=np.float64)
            if len(v) == 2:
                v = np.array([v[0], v[1], 0.0])
        else:
            v = np.asarray(velocity, dtype=np.float64)
            if len(v) == 2:
                v = np.array([v[0], v[1], 0.0])
        if unit_velocity:
            m = np.linalg.norm(v[:dim])
            if m > 1e-300:
                v = v / m
        return v

    n_cells = len(cells)
    centroids = points[cells].mean(axis=1)

    # facet matching: sorted vertex tuple -> (cell, local facet)
    facet_map: dict[tuple, tuple[int, int]] = {}
    pairs = []      # (ci, cj, facet verts of ci's copy)
    boundary = []   # (ci, facet verts)
    for c in range(n_cells):
        for lf, fverts in enumerate(loc):
            key = tuple(sorted(int(cells[c, v]) for v in fverts))
            other = facet_map.pop(key, None)
            if other is None:
                facet_map[key] = (c, lf)
            else:
                pairs.append((other[0], c, cells[other[0],
                                               list(loc[other[1]])]))
    for (c, lf) in facet_map.values():
        boundary.append((c, cells[c, list(loc[lf])]))

    rows, cols, vals = [], [], []
    diag = np.zeros(n_cells)

    def add_flux(ci, cj, fverts):
        nrm, mid = _facet_geometry(points[fverts])
        # orient outward from ci
        if np.dot(nrm, mid - centroids[ci]) < 0:
            nrm = -nrm
        flux = float(np.dot(vel(mid), nrm))
        for a, b, f in ((ci, cj, flux), (cj, ci, -flux)) if cj >= 0 \
                else ((ci, -1, flux),):
            if b >= 0:
                if f > 0:
                    diag[a] += f
                else:
                    rows.append(a)
                    cols.append(b)
                    vals.append(f)
            else:
                diag[a] += abs(f)   # outflow, or weak inflow Dirichlet

    for ci, cj, fverts in pairs:
        add_flux(ci, cj, fverts)
    for ci, fverts in boundary:
        add_flux(ci, -1, fverts)

    rows += list(range(n_cells))
    cols += list(range(n_cells))
    vals += list(diag)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n_cells, n_cells))
    A.sum_duplicates()
    A.eliminate_zeros()
    A.sort_indices()
    return A


def advection_from_gmsh(path: str, velocity=None, unit_velocity: bool = True,
                        curved: bool = False) -> sp.csr_matrix:
    """Upwind advection operator on a Gmsh mesh (the reference's
    `-dm_plex_filename data/*.msh` test family in one call)."""
    points, cells = read_gmsh(path)
    name = ("hex" if "hex" in cells else "tet" if "tet" in cells
            else "quad" if "quad" in cells else "tri")
    return fv_upwind_advection(points, cells[name], velocity=velocity,
                               unit_velocity=unit_velocity, curved=curved)
