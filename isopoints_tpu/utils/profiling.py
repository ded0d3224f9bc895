"""Roofline accounting for the hot kernels.

BASELINE.json asks for "speed-of-light roofline accounting per
kernel": given a measured wall time, report achieved FLOP/s and
bytes/s against the chip's peak so regressions show up as utilization
drops, not just absolute slowdowns.

Peaks default to TPU v5e (the tunneled bench chip): 197 TFLOP/s bf16 /
~98 TFLOP/s f32 MXU, 819 GB/s HBM.
"""

from dataclasses import dataclass
from typing import Dict, Optional

# TPU v5e single-chip peaks (f32 = half the bf16 MXU rate)
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = PEAK_BF16_FLOPS / 2
PEAK_HBM_BYTES = 819e9


@dataclass(frozen=True)
class KernelRoofline:
    name: str
    flops: float            # total floating-point ops
    hbm_bytes: float        # bytes moved to/from HBM
    seconds: float          # measured wall time

    @property
    def achieved_flops(self) -> float:
        return self.flops / max(self.seconds, 1e-12)

    @property
    def achieved_bw(self) -> float:
        return self.hbm_bytes / max(self.seconds, 1e-12)

    def utilization(self, peak_flops: float = PEAK_F32_FLOPS,
                    peak_bw: float = PEAK_HBM_BYTES) -> Dict[str, float]:
        """Fractions of peak + the bound ('compute'|'memory')."""
        t_compute = self.flops / peak_flops
        t_memory = self.hbm_bytes / peak_bw
        sol = max(t_compute, t_memory)   # speed-of-light time
        return {
            "mxu_util": self.achieved_flops / peak_flops,
            "hbm_util": self.achieved_bw / peak_bw,
            "sol_seconds": sol,
            "sol_fraction": sol / max(self.seconds, 1e-12),
            "bound": "compute" if t_compute >= t_memory else "memory",
        }

    def report(self) -> str:
        u = self.utilization()
        return (f"{self.name}: {self.seconds*1e3:.2f} ms | "
                f"{self.achieved_flops/1e12:.2f} TFLOP/s "
                f"({u['mxu_util']*100:.1f}% MXU) | "
                f"{self.achieved_bw/1e9:.1f} GB/s "
                f"({u['hbm_util']*100:.1f}% HBM) | "
                f"{u['sol_fraction']*100:.1f}% of speed-of-light "
                f"({u['bound']}-bound)")


def mlp_eval_roofline(name: str, n_points: int, layer_dims, seconds: float,
                      with_grad: bool = False,
                      fused: bool = True) -> KernelRoofline:
    """Roofline for an MLP forward (+ fwd-mode input grad) over n points.

    Args:
      layer_dims: e.g. [3, 256, 256, 256, 1].
      fused: weights resident in VMEM (bytes = activations in/out only);
        otherwise every layer round-trips activations through HBM.
    """
    flops = 0.0
    for d_in, d_out in zip(layer_dims[:-1], layer_dims[1:]):
        flops += 2.0 * n_points * d_in * d_out
        if with_grad:
            flops += 2.0 * n_points * 3 * d_in * d_out  # 3 tangent columns
    w_bytes = 4.0 * sum(a * b + b for a, b in zip(layer_dims[:-1],
                                                  layer_dims[1:]))
    io_bytes = 4.0 * n_points * (layer_dims[0] + layer_dims[-1]
                                 + (3 if with_grad else 0))
    if fused:
        hbm = io_bytes + w_bytes
    else:
        act_bytes = 4.0 * n_points * sum(layer_dims[1:-1]) * 2  # rw per layer
        hbm = io_bytes + w_bytes + act_bytes
    return KernelRoofline(name=name, flops=flops, hbm_bytes=hbm,
                          seconds=seconds)
