"""Right-looking blocked Cholesky experiments vs the rank-k-update wall.

Round-3 roofline (exp_gemm_roofline.py, BENCH_r03): square f32 GEMMs run
63-68 TF/s on the v5e but rank-256 updates only ~10 TF/s, and the dense
factorizations sit at 0.3-1% MFU (XLA cholesky n=8192: 1.08 s / 340
GF/s).  Judge item #8 asks for a right-looking attempt whose trailing
update keeps the loop-carried panel in VMEM, targeting >5% MFU at
n=8192 (>= 1.64 TF/s on the ~33 TF/s f32 6-pass ceiling) or a
keep/reject note proving the ceiling is architectural.

Three candidates, identical math (no-pivot SPD Cholesky):

1. `rl_chol_unrolled` — right-looking with SHRINKING static shapes: a
   Python-unrolled loop over K = n/panel stages, each doing an XLA
   cholesky+trsm on the (panel, panel) diagonal block and ONE dense
   rank-panel GEMM on the true (r, r) trailing block (no masked
   full-width waste, no fori_loop dynamic slicing).  Tests whether the
   wall is panel_ldl's 6x masked update + dynamic-slice traffic or the
   rank-k GEMM rate itself.
2. `rl_chol_pallas_update` — same loop but the trailing update
   C -= B @ B.T runs in a Pallas kernel that tiles C over a 2-D grid
   and holds the (TILE, panel) strips of B in VMEM, accumulating in f32
   on the MXU.  Tests whether Pallas beats XLA's rank-k scheduling
   (arithmetic intensity at k=256 is ~64 flops/byte, so ~50 TF/s is
   HBM-feasible; XLA measures ~10).
3. baseline `lax.linalg.cholesky`.

Run (real TPU, quiet chip):  python benchmarks/exp_pallas_rl_chol.py
Emits one JSON line per (method, n) with seconds / GF/s / MFU and
writes benchmarks/results/pallas_rl_chol.json.

ROUND-5 VERDICT (results/pallas_rl_chol.json + dense_refresh.json): the
question this experiment was built for is CLOSED — the "rank-k wall" was
an emulated-f64 measurement artifact (the np.sqrt promotion bug) plus a
stale toolchain.  On the current stack XLA's native f32 cholesky runs
~25 TF/s at n=4096 under this experiment's block_until_ready timing and
~12 ms at n=8192 under the stricter amortized device_get protocol
(exp_dense_refresh.py) — 24-46% MFU out of the box — while both custom
right-looking candidates here land ~1 TF/s.  Keep: nothing; the native
kernel wins and ops/blocked_dense routes f32 to it.  NOTE
block_until_ready does NOT synchronize through the axon tunnel, so this
file's absolute timings are optimistic; trust exp_dense_refresh.py.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

F32_PEAK = 32.7e12  # same 6-pass-f32 ceiling used by utils/roofline.py


def spd(n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
    M = A @ A.T + np.eye(n, dtype=np.float32) * 2.0
    return jnp.asarray(M, dtype)


# ---------------------------------------------------------------- 1: XLA

@functools.partial(jax.jit, static_argnames=("panel",))
def rl_chol_unrolled(F, panel: int = 512):
    """Right-looking blocked Cholesky, Python-unrolled with shrinking
    static shapes; all O(n^3) work is true-size dense GEMMs."""
    n = F.shape[-1]
    assert n % panel == 0
    K = n // panel
    dtype = F.dtype
    cols = []          # per-stage (r_i, panel) column blocks of L
    W = F
    for k in range(K):
        D = W[:panel, :panel]
        B = W[panel:, :panel]
        L11 = jax.lax.linalg.cholesky(D)
        # L21 = B @ inv(L11)^T  (explicit triangular inverse: one trsm of
        # size (panel, panel) then a GEMM — the trsm stays tiny)
        i11 = jax.lax.linalg.triangular_solve(
            L11, jnp.eye(panel, dtype=dtype), left_side=True, lower=True)
        L21 = B @ i11.T
        cols.append((L11, L21))
        if k < K - 1:
            C = W[panel:, panel:]
            W = C - L21 @ L21.T
    # assemble lower-triangular L
    L = jnp.zeros((n, n), dtype)
    for k, (L11, L21) in enumerate(cols):
        c = k * panel
        L = jax.lax.dynamic_update_slice(L, L11, (c, c))
        if L21.shape[0]:
            L = jax.lax.dynamic_update_slice(L, L21, (c + panel, c))
    return L


# ------------------------------------------------------------- 2: Pallas

def _syrk_update_kernel(b_i_ref, b_j_ref, c_ref, out_ref):
    """out = c - b_i @ b_j.T for one (TILE_I, TILE_J) tile of C, with the
    (TILE, panel) strips of B resident in VMEM."""
    out_ref[:] = c_ref[:] - jnp.dot(
        b_i_ref[:], b_j_ref[:].T, preferred_element_type=jnp.float32)


def pallas_syrk_update(C, B, tile: int = 512):
    """C - B @ B.T via a Pallas 2-D tiling (full square update; the
    symmetric half-saving is left to a follow-up — XLA's rank-k GEMM
    does the full square too, so the comparison is like-for-like)."""
    from jax.experimental import pallas as pl

    r, k = B.shape
    assert C.shape == (r, r) and r % tile == 0
    grid = (r // tile, r // tile)
    return pl.pallas_call(
        _syrk_update_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, k), lambda i, j: (j, 0)),
            pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((r, r), C.dtype),
    )(B, B, C)


@functools.partial(jax.jit, static_argnames=("panel", "tile"))
def rl_chol_pallas_update(F, panel: int = 512, tile: int = 512):
    n = F.shape[-1]
    assert n % panel == 0
    K = n // panel
    dtype = F.dtype
    cols = []
    W = F
    for k in range(K):
        D = W[:panel, :panel]
        B = W[panel:, :panel]
        L11 = jax.lax.linalg.cholesky(D)
        i11 = jax.lax.linalg.triangular_solve(
            L11, jnp.eye(panel, dtype=dtype), left_side=True, lower=True)
        L21 = B @ i11.T
        cols.append((L11, L21))
        if k < K - 1:
            C = W[panel:, panel:]
            r = C.shape[0]
            if r % tile == 0:
                W = pallas_syrk_update(C, L21, tile=tile)
            else:
                W = C - L21 @ L21.T
    L = jnp.zeros((n, n), dtype)
    for k, (L11, L21) in enumerate(cols):
        c = k * panel
        L = jax.lax.dynamic_update_slice(L, L11, (c, c))
        if L21.shape[0]:
            L = jax.lax.dynamic_update_slice(L, L21, (c + panel, c))
    return L


# ------------------------------------------------------------ harness

def bench(fn, M, label, n, reps=3):
    t0 = time.time()
    L = jax.block_until_ready(fn(M))
    compile_s = time.time() - t0
    walls = []
    for i in range(1, reps + 1):
        # Value-perturbed per rep: identical repeated requests can be
        # served from caches in the device tunnel (same guard as
        # bench.py / measure_sparse_ls) — 1e-6 is representable in f32.
        Mi = M * (1.0 + 1e-6 * i)
        t0 = time.time()
        jax.block_until_ready(fn(Mi))
        walls.append(time.time() - t0)
    sec = min(walls)
    flops = n ** 3 / 3
    gfs = flops / sec / 1e9
    rec = {"method": label, "n": n, "seconds": round(sec, 6),
           "compile_plus_first_s": round(compile_s, 2),
           "gflops": round(gfs, 2), "mfu": round(gfs * 1e9 / F32_PEAK, 4)}
    # correctness vs reconstruction
    err = float(jnp.max(jnp.abs(L @ L.T - M)) / jnp.max(jnp.abs(M)))
    rec["recon_rel_err"] = float(f"{err:.3e}")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    sizes = [int(s) for s in (sys.argv[1:] or ["4096", "8192"])]
    out = []
    for n in sizes:
        M = spd(n)
        out.append(bench(lambda x: jax.lax.linalg.cholesky(x), M,
                         "xla_cholesky", n))
        out.append(bench(lambda x: rl_chol_unrolled(x, panel=512), M,
                         "rl_unrolled_p512", n))
        try:
            out.append(bench(
                lambda x: rl_chol_pallas_update(x, panel=512, tile=512), M,
                "rl_pallas_p512_t512", n))
        except Exception as e:
            print(json.dumps({"method": "rl_pallas_p512_t512", "n": n,
                              "error": repr(e)[:300]}), flush=True)
    path = os.path.join(os.path.dirname(__file__), "results",
                        "pallas_rl_chol.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
