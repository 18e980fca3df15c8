from .build import Inverse, build_inverse
from .gmres_poly import (
    coefficients_power,
    coefficients_arnoldi,
    horner,
    box_muller,
    arnoldi_host,
)
from .newton import (
    newton_roots,
    modified_leja,
    build_newton_program,
    newton_apply,
    newton_residual_apply,
)
from .sai import sai_z, sai_inverse

__all__ = [
    "Inverse",
    "build_inverse",
    "coefficients_power",
    "coefficients_arnoldi",
    "horner",
    "box_muller",
    "arnoldi_host",
    "newton_roots",
    "modified_leja",
    "build_newton_program",
    "newton_apply",
    "newton_residual_apply",
    "sai_z",
    "sai_inverse",
]
