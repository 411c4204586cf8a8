"""Pallas blocked-Cholesky kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import madqp_tpu as mq
from madqp_tpu import Status
from madqp_tpu.ops.pallas_chol import pallas_cholesky


def spd(rng, n, dtype=np.float64):
    P = rng.standard_normal((n, n)).astype(dtype)
    return jnp.asarray(P @ P.T + n * np.eye(n, dtype=dtype))


class TestPallasCholesky:
    @pytest.mark.parametrize("n", [128, 256])
    def test_matches_numpy(self, n, rng):
        A = spd(rng, n)
        L = pallas_cholesky(A, interpret=True)
        Lref = np.linalg.cholesky(np.asarray(A))
        np.testing.assert_allclose(np.asarray(L), Lref, rtol=1e-10, atol=1e-10)

    def test_padding_path(self, rng):
        """Non-multiple-of-block sizes pad with an identity tail."""
        A = spd(rng, 200)
        L = pallas_cholesky(A, interpret=True)
        Lref = np.linalg.cholesky(np.asarray(A))
        np.testing.assert_allclose(np.asarray(L), Lref, rtol=1e-10, atol=1e-10)

    def test_float32(self, rng):
        A = spd(rng, 128, np.float32)
        L = pallas_cholesky(A, interpret=True)
        Lref = np.linalg.cholesky(np.asarray(A, dtype=np.float64))
        np.testing.assert_allclose(np.asarray(L), Lref, rtol=1e-4, atol=1e-3)

    def test_solver_with_pallas_backend(self):
        """End-to-end solve with linear_solver='pallas' matches default."""
        qp = mq.dense_dummy_qp(20, 10, seed=1)
        a = mq.solve(qp, print_level=40, linear_solver="pallas")
        b = mq.solve(qp, print_level=40)
        assert a.status == Status.SOLVE_SUCCEEDED
        assert a.iter == b.iter
        assert a.objective == pytest.approx(b.objective, abs=1e-8)
