"""omp_amg_tpu — a TPU-native algebraic multigrid framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of the
OpenMP-C reference ``nicooff/omp_amg`` (see SURVEY.md / BASELINE.json):
sparse storage (CSR/COO/ELL/DIA), strength-of-connection graphs,
deterministic PMIS coarsening, interpolation, Galerkin RAP, V-cycle with
weighted-Jacobi/Chebyshev smoothers, coarse direct solve, and
AMG-preconditioned CG — row-sharded across TPU device meshes.
"""

from .sparse.formats import (  # noqa: F401
    ConstDia, Csr, Dia, Ell, PlaneDia, const_to_dia, plane_to_dia,
    to_const_dia, to_plane_dia,
    coo_to_csr, csr_from_scipy, csr_to_ell, csr_to_scipy,
    dia_from_scipy, dia_to_csr, dia_to_ell, dia_to_scipy, diagonal,
    ell_from_scipy, ell_to_scipy, transpose_ell,
)
from .ops.spmv import spmv, spmv_csr, spmv_dia, spmv_ell, spmv_t_ell  # noqa: F401
from .amg.hierarchy import Hierarchy, amg_setup, hierarchy_stats  # noqa: F401
from .amg.params import AMGParams  # noqa: F401
from .amg.vcycle import vcycle  # noqa: F401
from .solver import AMGSolver  # noqa: F401
from .solvers.cg import amg_pcg, cg, pcg  # noqa: F401
from .solvers.ir import solve_ir  # noqa: F401
from .problems.poisson import (  # noqa: F401
    PROBLEMS, aniso2d_9pt, default_rhs, poisson2d_5pt, poisson3d_7pt,
    poisson3d_27pt, stencil_to_dia,
)

__version__ = "0.2.0"
