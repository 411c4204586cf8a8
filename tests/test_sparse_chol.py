"""Supernodal multifrontal sparse Cholesky tests (SPARSE_PLAN S1+S2)."""

import numpy as np
import pytest
import scipy.sparse as sp

from madqp_tpu.native import available
from madqp_tpu.ops.sparse_chol import DeviceSparseCholesky, analyze

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable"
)


def random_spd(n, density, seed=3):
    M = sp.random(n, n, density=density, random_state=seed)
    return (M @ M.T + 10 * sp.eye(n)).tocsc()


def banded_spd(n, bw=4):
    diags = [np.full(n - k, 1.0 / (1 + k)) for k in range(bw)]
    B = sp.diags(diags, list(range(bw)), shape=(n, n))
    S = B + B.T
    return (S + (abs(S).sum(axis=1).A1.max() + 1) * sp.eye(n)).tocsc()


class TestAnalyze:
    def test_supernode_partition_covers_columns(self, rng):
        A = random_spd(80, 0.05)
        symb = analyze(A)
        cols = np.concatenate([sn.cols for sn in symb.supernodes])
        assert sorted(cols.tolist()) == list(range(80))

    def test_tree_is_topologically_ordered(self, rng):
        A = random_spd(80, 0.05)
        symb = analyze(A)
        for s, sn in enumerate(symb.supernodes):
            assert sn.parent == -1 or sn.parent > s
            for c in sn.child_ids:
                assert c < s


class TestNumeric:
    @pytest.mark.parametrize("make,kw", [
        (random_spd, dict(n=60, density=0.08)),
        (random_spd, dict(n=200, density=0.03)),
        (banded_spd, dict(n=300)),
    ], ids=["rand60", "rand200", "banded300"])
    def test_solve_residual(self, make, kw, rng):
        A = make(**kw)
        n = A.shape[0]
        f = DeviceSparseCholesky(A)
        f.factorize(A)
        b = rng.standard_normal(n)
        x = np.asarray(f.solve(b))
        assert np.max(np.abs(A @ x - b)) < 1e-10

    def test_refactorize_same_pattern(self, rng):
        """The IPM use case: one symbolic analysis, new values per iteration."""
        A = random_spd(100, 0.04)
        f = DeviceSparseCholesky(A)
        b = rng.standard_normal(100)
        for scale in [1.0, 3.0, 0.25]:
            A2 = (A * scale).tocsc()
            f.factorize(A2)
            x = np.asarray(f.solve(b))
            assert np.max(np.abs(A2 @ x - b)) < 1e-9

    def test_matches_dense_cholesky_solve(self, rng):
        A = random_spd(90, 0.05)
        f = DeviceSparseCholesky(A)
        f.factorize(A)
        b = rng.standard_normal(90)
        x = np.asarray(f.solve(b))
        np.testing.assert_allclose(
            x, np.linalg.solve(A.toarray(), b), rtol=1e-9, atol=1e-10
        )


def test_chain_schedule_banded():
    """Path-shaped etrees must collapse into lax.scan chains (compile cost
    O(1) in chain length), with exact results.  (Level scheduler — the
    greedy default covers the same pattern with _BucketScan, below.)"""
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from madqp_tpu.ops import sparse_chol as SC

    rng = np.random.default_rng(0)
    m, half = 2000, 3
    offs = list(range(-half, half + 1))
    d = [np.full(m - abs(k), 1.0 if k else 4.0 * half) for k in offs]
    A = sp.diags(d, offsets=offs, format="csc")
    bs = SC.analyze_batched(A, order="rcm", schedule_mode="level")
    n_chain = sum(1 for it in bs.schedule if isinstance(it, SC._Chain))
    assert n_chain >= 1
    assert len(bs.schedule) <= 4  # chain + root, not O(m/128) levels
    symb = SC.analyze(A, order="rcm")
    panels = SC.factorize_batched(bs, jnp.asarray(symb.permute_values(A)))
    assert bool(SC.factor_ok_batched(panels))
    b = rng.standard_normal(m)
    x = np.asarray(SC.solve_batched(bs, panels, jnp.asarray(b)))
    assert np.abs(A @ x - b).max() < 1e-8


def test_chain_schedule_ldl_quasidefinite():
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from madqp_tpu.ops import sparse_chol as SC

    rng = np.random.default_rng(1)
    n, m = 800, 400
    rows, cols, vals = [], [], []
    for i in range(m):
        for k in range(3):
            j = min(2 * i + k, n - 1)
            rows.append(i)
            cols.append(j)
            vals.append(rng.uniform(0.5, 2.0))
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
    A.sum_duplicates()
    W = sp.diags(rng.uniform(0.5, 2.0, n))
    K = sp.bmat([[W, A.T], [A, -1e-4 * sp.eye(m)]], format="csc")
    K.sum_duplicates()
    bs = SC.analyze_batched(K, order="amd", schedule_mode="level")
    assert any(isinstance(it, SC._Chain) for it in bs.schedule)
    f = SC.factorize_batched_ldl(bs, jnp.asarray(bs.permute_values(K)))
    es = SC.bucket_signs(bs, np.concatenate([np.ones(n), -np.ones(m)]))
    assert bool(SC.factor_ok_batched_ldl(f, es))
    b = rng.standard_normal(n + m)
    x = np.asarray(SC.solve_batched_ldl(bs, f, jnp.asarray(b)))
    assert np.abs(K @ x - b).max() < 1e-6


class TestGreedyScanSchedule:
    """The default (greedy) scheduler: coarse shape classes + availability
    rounds + consecutive same-shape rounds collapsed into _BucketScan —
    XLA stage count must stay ~O(#shape runs), with exact numerics and
    level-mode agreement."""

    def test_banded_collapses_to_few_stages(self):
        import jax.numpy as jnp
        from madqp_tpu.ops import sparse_chol as SC

        A = banded_spd(20000, bw=5)
        bs = SC.analyze_batched(A, order="auto")
        assert len(bs.schedule) <= 4
        panels = SC.factorize_batched(bs, jnp.asarray(bs.permute_values(A)))
        assert bool(SC.factor_ok_batched(panels))
        rng_ = np.random.default_rng(0)
        b = rng_.standard_normal(A.shape[0])
        x = np.asarray(SC.solve_batched(bs, panels, jnp.asarray(b)))
        assert np.abs(A @ x - b).max() < 1e-8

    def test_matches_level_mode(self):
        import jax.numpy as jnp
        from madqp_tpu.ops import sparse_chol as SC

        A = random_spd(400, 0.02, seed=7)
        rng_ = np.random.default_rng(3)
        b = rng_.standard_normal(400)
        xs = {}
        for mode in ("greedy", "level"):
            bs = SC.analyze_batched(A, order="amd", schedule_mode=mode)
            panels = SC.factorize_batched(
                bs, jnp.asarray(bs.permute_values(A)))
            assert bool(SC.factor_ok_batched(panels))
            xs[mode] = np.asarray(
                SC.solve_batched(bs, panels, jnp.asarray(b)))
        np.testing.assert_allclose(xs["greedy"], xs["level"],
                                   rtol=1e-12, atol=1e-12)

    def test_ldl_scan_inverse_and_floor(self):
        import jax.numpy as jnp
        from madqp_tpu.ops import sparse_chol as SC

        rng_ = np.random.default_rng(1)
        n, m = 1200, 600
        rows = np.repeat(np.arange(m), 2)
        cols = np.concatenate([np.arange(m) * 2 % n,
                               (np.arange(m) * 2 + 1) % n])
        cols = cols.reshape(2, m).T.reshape(-1)
        vals = rng_.uniform(0.5, 2.0, rows.size)
        A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsc()
        W = sp.diags(rng_.uniform(0.5, 2.0, n))
        K = sp.bmat([[W, A.T], [A, -1e-4 * sp.eye(m)]], format="csc")
        bs = SC.analyze_batched(K, order="amd")
        assert any(isinstance(it, SC._BucketScan) for it in bs.schedule) \
            or len(bs.schedule) <= 6
        signs = SC.bucket_signs(bs, np.concatenate([np.ones(n),
                                                    -np.ones(m)]))
        f = SC.factorize_batched_ldl(
            bs, jnp.asarray(bs.permute_values(K)), signs=signs,
            pivot_floor=1e-10, inverse=True)
        assert bool(SC.factor_ok_batched_ldl(f, signs))
        b = rng_.standard_normal(n + m)
        x = np.asarray(SC.solve_batched_ldl(bs, f, jnp.asarray(b),
                                            inverse=True))
        assert np.abs(K @ x - b).max() < 1e-6


def test_nd_order_valid_permutation_and_solve():
    """Nested dissection produces a valid permutation, a bushy (chain-free,
    few-stage) schedule on banded patterns, and exact factorization."""
    import jax.numpy as jnp
    from madqp_tpu.native import nd_order
    from madqp_tpu.ops import sparse_chol as SC

    A = banded_spd(3000, bw=4)
    p = nd_order(A)
    assert np.array_equal(np.sort(p), np.arange(A.shape[0]))

    bs = SC.analyze_batched(A, order="nd")
    n_chain = sum(1 for it in bs.schedule if isinstance(it, SC._Chain))
    assert n_chain == 0  # separators -> balanced tree, no long paths
    assert len(bs.schedule) <= 12  # ~log2(n/supernode) levels

    panels = SC.factorize_batched(bs, jnp.asarray(bs.permute_values(A)))
    assert bool(SC.factor_ok_batched(panels))
    rng_ = np.random.default_rng(1)
    b = rng_.standard_normal(A.shape[0])
    x = np.asarray(SC.solve_batched(bs, panels, jnp.asarray(b)))
    assert np.abs(A @ x - b).max() < 1e-8


def test_nd_order_disconnected_graph():
    from madqp_tpu.native import nd_order

    blocks = [banded_spd(150, bw=3), banded_spd(97, bw=2), sp.eye(5).tocsc()]
    A = sp.block_diag(blocks, format="csc")
    p = nd_order(A)
    assert np.array_equal(np.sort(p), np.arange(A.shape[0]))


class TestMeshOrderingSelection:
    """order='auto' validation on realistic mesh families (generators
    grid_lp / grid3d_lp / netflow_grid_lp): ND must beat AMD under the
    device cost model on 2D/3D mesh normal matrices, and auto must always
    take the cheaper schedule."""

    @staticmethod
    def _normal(qp):
        A = sp.csr_matrix(qp.A)
        return ((A @ A.T).tocsc() + sp.identity(A.shape[0], format="csc"))

    def _families(self):
        import madqp_tpu as mq

        return [mq.grid_lp(30), mq.grid3d_lp(10), mq.netflow_grid_lp(30)]

    def test_auto_matches_min_cost(self):
        from madqp_tpu.ops import sparse_chol as SC

        for qp in self._families():
            M = self._normal(qp)
            costs = {o: SC.schedule_cost(SC.analyze_batched(M, order=o))
                     for o in ("amd", "nd")}
            auto = SC.schedule_cost(SC.analyze_batched(M, order="auto"))
            assert auto == min(costs.values()), (qp.name, costs, auto)

    def test_nd_beats_amd_on_meshes(self):
        # Under the LEVEL scheduler ND's shallow bushy tree always wins on
        # meshes.  (The greedy scan scheduler makes AMD competitive —
        # sequential stage count no longer scales with tree depth — so
        # there 'auto' legitimately picks either; see
        # test_auto_matches_min_cost.)
        from madqp_tpu.ops import sparse_chol as SC

        for qp in self._families():
            M = self._normal(qp)
            c_amd = SC.schedule_cost(
                SC.analyze_batched(M, order="amd", schedule_mode="level"))
            c_nd = SC.schedule_cost(
                SC.analyze_batched(M, order="nd", schedule_mode="level"))
            assert c_nd < c_amd, (qp.name, c_amd, c_nd)

    def test_nd_factorization_exact_on_netflow(self):
        import jax.numpy as jnp
        import madqp_tpu as mq
        from madqp_tpu.ops import sparse_chol as SC

        M = self._normal(mq.netflow_grid_lp(20))
        bs = SC.analyze_batched(M, order="nd")
        panels = SC.factorize_batched(bs, jnp.asarray(bs.permute_values(M)))
        assert bool(SC.factor_ok_batched(panels))
        rng_ = np.random.default_rng(2)
        b = rng_.standard_normal(M.shape[0])
        x = np.asarray(SC.solve_batched(bs, panels, jnp.asarray(b)))
        assert np.abs(M @ x - b).max() < 1e-8
