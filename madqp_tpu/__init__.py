"""madqp_tpu — a TPU-native LP/QP interior-point framework.

Brand-new implementation of the Mehrotra predictor-corrector interior-point
method with the capabilities of MadIPM.jl (the MadNLP/MadQP reference),
designed TPU-first: masked dense state pytrees, jitted lax.while_loop MPC
iterations, MXU-friendly block factorizations, and pjit/shard_map scale-out.

Double precision is required for the 1e-8 tolerances of the reference
protocol; we enable x64 at import (TPU emulates f64; the mixed-precision
path trades f32 factorization + refinement for speed).
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Keep a host CPU backend available alongside a single accelerator
# platform (JAX_PLATFORMS=axon → "axon,cpu"; the accelerator stays the
# default device).  The host sparse path and the two-phase host endgame
# run their eager elementwise jax ops under jax.default_device(cpu) —
# without a cpu backend those ops ride the accelerator, which through a
# remote-tunnel runtime costs a ~40 ms round trip PER OP (measured: the
# transport m=225 host endgame spent 1.5 s on ~5 iterations of eager
# vector math).  Best-effort: too-late config updates (backends already
# initialized) are ignored.
_plat = _os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat.split(","):
    try:
        _jax.config.update("jax_platforms", _plat + ",cpu")
    except Exception:  # pragma: no cover - backends already initialized
        pass

# Persistent compilation cache (opt-in via MADQP_COMPILE_CACHE=<dir>):
# full MPC solves are large XLA programs whose first TPU compiles run
# minutes, so bench/production runs should set this.  It is NOT enabled by
# default because reloading CPU AOT artifacts compiled with different
# machine features stalls for minutes (observed in this environment).
_cache_dir = _os.environ.get("MADQP_COMPILE_CACHE", "")
if _cache_dir in ("1", "true", "yes", "on"):  # enable with the default dir
    _cache_dir = _os.path.expanduser("~/.cache/madqp_jax")
if _cache_dir and _cache_dir != "0":
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .utils import (  # noqa: E402
    Status,
    ExecutionStats,
    Counters,
    IPMOptions,
    Mehrotra,
    ConservativeStep,
    AdaptiveStep,
    MehrotraAdaptiveStep,
    NoRegularization,
    FixedRegularization,
    AdaptiveRegularization,
    KKTSystem,
    LinearSolverBackend,
    MadLogger,
)
from .models import (  # noqa: E402
    QuadraticProblem,
    StandardQP,
    build_standard_form,
    from_coo,
    dense_dummy_qp,
    simple_lp,
    random_lp,
    random_qp,
    banded_sparse_lp,
    separable_qp,
    ineq_qp,
    grid_lp,
    grid3d_lp,
    netflow_grid_lp,
    scale_qp,
    unscale_stats,
    presolve_qp,
)
from .io import read_mps, write_mps  # noqa: E402
from .diff import qp_layer, qp_layer_general, QPLayerSolution  # noqa: E402
from .solver import (  # noqa: E402
    MPCSolver,
    solve,
    autosolve,
    HostMPCSolver,
    solve_host,
    solve_sparse_lp,
    solve_sparse_qp,
    solve_sparse_condensed,
)

__version__ = "0.1.0"

__all__ = [
    "Status",
    "ExecutionStats",
    "Counters",
    "IPMOptions",
    "Mehrotra",
    "ConservativeStep",
    "AdaptiveStep",
    "MehrotraAdaptiveStep",
    "NoRegularization",
    "FixedRegularization",
    "AdaptiveRegularization",
    "KKTSystem",
    "LinearSolverBackend",
    "MadLogger",
    "QuadraticProblem",
    "StandardQP",
    "build_standard_form",
    "from_coo",
    "dense_dummy_qp",
    "simple_lp",
    "random_lp",
    "random_qp",
    "scale_qp",
    "unscale_stats",
    "presolve_qp",
    "read_mps",
    "write_mps",
    "qp_layer",
    "qp_layer_general",
    "QPLayerSolution",
    "MPCSolver",
    "solve",
    "autosolve",
    "HostMPCSolver",
    "solve_host",
    "solve_sparse_lp",
    "solve_sparse_qp",
    "solve_sparse_condensed",
    "banded_sparse_lp",
    "separable_qp",
    "ineq_qp",
    "grid_lp",
    "grid3d_lp",
    "netflow_grid_lp",
]
