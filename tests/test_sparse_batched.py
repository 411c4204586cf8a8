"""Batched sparse path (parallel/sparse_batched.py): vmapped supernodal
solves over instances sharing one sparsity pattern, with shared symbolic.

Oracle: the single-instance dense solver (reference self-consistency
pattern, test/runtests.jl:95-135).
"""

import numpy as np
import pytest

import jax

import madqp_tpu as mq
from madqp_tpu.parallel import solve_sparse_batched


def _objectives(qps):
    return [mq.solve(q, tol=1e-8, print_level=0).objective for q in qps]


def test_batched_sparse_lp_matches_single():
    qps = [mq.banded_sparse_lp(n=120, m=60, band=4, seed=s) for s in range(4)]
    ref = _objectives(qps)
    res = solve_sparse_batched(qps, tol=1e-8, print_level=0)
    assert all(r.status == mq.Status.SOLVE_SUCCEEDED for r in res)
    for r, o in zip(res, ref):
        assert r.objective == pytest.approx(o, rel=1e-8)


def test_batched_sparse_qp_normal_and_augmented():
    # diagonal H -> normal equations ('auto'); general H -> augmented
    qps = [mq.separable_qp(n=90, m=45, band=4, seed=s) for s in range(3)]
    ref = _objectives(qps)
    res = solve_sparse_batched(qps, tol=1e-8, print_level=0)
    for r, o in zip(res, ref):
        assert r.status == mq.Status.SOLVE_SUCCEEDED
        assert r.objective == pytest.approx(o, rel=1e-8)

    qqs = [mq.random_qp(n=36, m=18, seed=s, ineq=True) for s in range(3)]
    refq = _objectives(qqs)
    resq = solve_sparse_batched(qqs, tol=1e-8, print_level=0,
                                kkt_system="augmented")
    for r, o in zip(resq, refq):
        assert r.status == mq.Status.SOLVE_SUCCEEDED
        assert r.objective == pytest.approx(o, rel=1e-9)


def test_batched_sparse_mesh_and_two_phase():
    from jax.sharding import Mesh

    qps = [mq.banded_sparse_lp(n=100, m=50, band=4, seed=s) for s in range(5)]
    ref = _objectives(qps)
    mesh = Mesh(np.array(jax.devices()), ("batch",))
    res = solve_sparse_batched(qps, tol=1e-8, print_level=0, mesh=mesh)
    for r, o in zip(res, ref):
        assert r.status == mq.Status.SOLVE_SUCCEEDED
        assert r.objective == pytest.approx(o, rel=1e-8)

    res2 = solve_sparse_batched(qps, tol=1e-8, print_level=0,
                                factorization_dtype="float32",
                                max_refine_steps=2)
    for r, o in zip(res2, ref):
        assert r.status == mq.Status.SOLVE_SUCCEEDED
        assert r.objective == pytest.approx(o, rel=1e-6)


def test_batched_sparse_rejects_ragged_patterns():
    qps = [mq.banded_sparse_lp(n=100, m=50, band=4, seed=0),
           mq.banded_sparse_lp(n=80, m=40, band=4, seed=0)]
    with pytest.raises(ValueError, match="sparsity pattern"):
        solve_sparse_batched(qps, print_level=0)


def test_batched_sparse_cache_reuse_across_values():
    """Second same-pattern batch must hit the kernel cache (no rebuild)
    and still solve NEW values correctly — the cached KKT bakes only the
    pattern; values flow in through SparseQPProblem."""
    from madqp_tpu.parallel import sparse_batched as sb

    qps_a = [mq.banded_sparse_lp(n=100, m=50, band=4, seed=s)
             for s in (0, 1)]
    res_a = solve_sparse_batched(qps_a, tol=1e-8, print_level=0)
    n_entries = len(sb._BATCHED_CACHE)
    assert n_entries >= 1

    # same pattern, different seeds → different values/objectives
    qps_b = [mq.banded_sparse_lp(n=100, m=50, band=4, seed=s)
             for s in (7, 8)]
    res_b = solve_sparse_batched(qps_b, tol=1e-8, print_level=0)
    assert len(sb._BATCHED_CACHE) == n_entries   # pure cache hit
    for r, o in zip(res_b, _objectives(qps_b)):
        assert r.status == mq.Status.SOLVE_SUCCEEDED
        assert r.objective == pytest.approx(o, rel=1e-8)
    assert res_b[0].objective != pytest.approx(res_a[0].objective, rel=1e-3)
