"""Two-stage Schur-complement solver tests (BASELINE config #5)."""

import jax
import numpy as np
import pytest

import madqp_tpu as mq
from madqp_tpu import Status
from madqp_tpu.parallel import (
    random_two_stage,
    solve_two_stage,
    two_stage_to_flat_qp,
)


class TestTwoStage:
    @pytest.mark.parametrize("qp", [True, False], ids=["qp", "lp"])
    def test_matches_flat_dense_oracle(self, qp):
        prob, lb, ub = random_two_stage(n0=6, ns=5, ms=3, m0=2, N=8, seed=1, qp=qp)
        stats = solve_two_stage(prob, lb, ub, print_level=40)
        assert stats.status == Status.SOLVE_SUCCEEDED

        flat = two_stage_to_flat_qp(prob, lb, ub)
        ref = mq.solve(flat, print_level=40, scaling=False)
        assert ref.status == Status.SOLVE_SUCCEEDED
        assert stats.objective == pytest.approx(ref.objective, abs=1e-6)
        # identical Newton steps in exact arithmetic -> identical iterations
        assert stats.iter == ref.iter
        np.testing.assert_allclose(stats.solution, ref.solution, atol=1e-5)

    def test_sharded_matches_single_device(self):
        n_dev = len(jax.devices())
        mesh = jax.make_mesh((n_dev,), ("scen",))
        prob, lb, ub = random_two_stage(n0=6, ns=5, ms=3, m0=2, N=2 * n_dev, seed=3)
        single = solve_two_stage(prob, lb, ub, print_level=40)
        sharded = solve_two_stage(prob, lb, ub, mesh=mesh, print_level=40)
        assert sharded.status == Status.SOLVE_SUCCEEDED
        assert sharded.iter == single.iter
        assert sharded.objective == pytest.approx(single.objective, abs=1e-8)
        np.testing.assert_allclose(sharded.solution, single.solution, atol=1e-7)

    def test_mixed_precision_schur(self):
        prob, lb, ub = random_two_stage(n0=6, ns=5, ms=3, m0=2, N=8, seed=5)
        ref = solve_two_stage(prob, lb, ub, print_level=40)
        mp = solve_two_stage(
            prob, lb, ub, print_level=40,
            factorization_dtype="float32", max_refine_steps=1, max_iter=60,
        )
        assert mp.status == Status.SOLVE_SUCCEEDED
        assert mp.objective == pytest.approx(ref.objective, abs=1e-6)

    def test_first_stage_unconstrained(self):
        """m0 = 0 (no pure first-stage constraints) must work."""
        prob, lb, ub = random_two_stage(n0=5, ns=4, ms=3, m0=0, N=4, seed=7)
        stats = solve_two_stage(prob, lb, ub, print_level=40)
        assert stats.status == Status.SOLVE_SUCCEEDED
        flat = two_stage_to_flat_qp(prob, lb, ub)
        ref = mq.solve(flat, print_level=40, scaling=False)
        assert stats.objective == pytest.approx(ref.objective, abs=1e-6)
