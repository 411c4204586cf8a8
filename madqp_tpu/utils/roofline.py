"""Roofline / MFU accounting for the hot kernels (VERDICT round-1 #3).

The BASELINE north star is "per-iteration factorization+solve at
HBM-bandwidth speed-of-light per chip"; this module supplies the chip
peaks, flop/byte models for the factorization kernels, and a measured ->
fraction-of-peak report used by bench.py and the experiment scripts.

Peaks are per-chip dataplane numbers from public spec sheets; they bound
the achievable rate, they are not measured on this host.  f32 matmuls on
the TPU MXU run as multi-pass bf16 ("highest" precision, 6 passes) so the
realistic f32 ceiling is peak_bf16/6; f64 is software-emulated (~20x under
f32 in our measurements, no published peak).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ChipPeaks:
    name: str
    bf16_tflops: float       # MXU peak, dense matmul
    f32_tflops: float        # effective ceiling for "highest" precision
    hbm_gbps: float          # HBM bandwidth


_PEAKS = {
    # TPU v5e ("v5 lite"): 197 TFLOP/s bf16, 819 GB/s HBM (public spec).
    "v5 lite": ChipPeaks("TPU v5e", 197.0, 197.0 / 6.0, 819.0),
    # TPU v5p: 459 TFLOP/s bf16, 2765 GB/s.
    "v5p": ChipPeaks("TPU v5p", 459.0, 459.0 / 6.0, 2765.0),
    # TPU v4: 275 TFLOP/s bf16, 1228 GB/s.
    "v4": ChipPeaks("TPU v4", 275.0, 275.0 / 6.0, 1228.0),
}


def chip_peaks(device=None) -> ChipPeaks:
    """Best-effort peaks for the given (default: first) jax device."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", str(device)).lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return ChipPeaks(f"unknown({kind})", float("nan"), float("nan"),
                     float("nan"))


def dense_ldl_flops(n: int) -> float:
    """n^3/3 multiply-adds * 2 flops for an n x n LDL/Cholesky."""
    return 2.0 * n ** 3 / 3.0


def dense_ldl_bytes(n: int, dtype_bytes: int) -> float:
    """HBM traffic lower bound: read + write the n^2 triangle once each."""
    return 2.0 * n * n * dtype_bytes


def schedule_flops(bs) -> float:
    """Padded factorization flops of a supernodal schedule (the flops the
    chip EXECUTES, including padding) — matches ops/sparse_chol.
    schedule_cost's flop term."""
    total = 0.0
    for it in bs.schedule:
        w, u = it.w_pad, it.u_pad
        fronts = it.count * getattr(it, "steps", 1)
        total += 2.0 * fronts * (w ** 3 / 3.0 + w * w * u + w * u * u)
    return total


def schedule_bytes(bs, dtype_bytes: int) -> float:
    """HBM traffic lower bound of a supernodal schedule: each bucketed
    front reads+writes its (w+u) x w panel and reads+writes its u x u
    extend-add update block once."""
    total = 0.0
    for it in bs.schedule:
        w, u = it.w_pad, it.u_pad
        fronts = it.count * getattr(it, "steps", 1)
        total += fronts * dtype_bytes * (2.0 * (w + u) * w + 2.0 * u * u)
    return total


def roofline_report(flops: float, bytes_moved: float, seconds: float,
                    dtype: str = "float32", device=None) -> dict:
    """Achieved GFLOP/s + GB/s and their fractions of the chip peaks."""
    peaks = chip_peaks(device)
    peak_tf = peaks.f32_tflops if dtype != "bfloat16" else peaks.bf16_tflops
    gflops = flops / seconds / 1e9
    gbps = bytes_moved / seconds / 1e9
    return {
        "chip": peaks.name,
        "seconds": round(seconds, 6),
        "gflops": round(gflops, 2),
        "mfu": round(gflops / (peak_tf * 1e3), 4)
        if peak_tf == peak_tf else None,
        "gbps": round(gbps, 2),
        "hbm_frac": round(gbps / peaks.hbm_gbps, 4)
        if peaks.hbm_gbps == peaks.hbm_gbps else None,
    }
