from .krylov import gmres, fgmres, richardson, SolveResult, as_operator

__all__ = ["gmres", "fgmres", "richardson", "SolveResult", "as_operator"]
