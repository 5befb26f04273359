"""Binned engine variant with the Pallas/Mosaic force kernel on the hot path.

Analog of the reference's CUDA backend (part3/gpu.cu): same step structure as
:class:`ppsim_tpu.engines.binned.BinnedEngine`, but the 3x3 stencil force
phase — 75% of the step time in the reference's nvprof profile (part3
write-up §6) — runs as a hand-written TPU kernel
(:mod:`ppsim_tpu.ops.pallas_force`) that keeps the neighbor rows in VMEM.
Falls back to the XLA gather path on platforms without Mosaic support
(e.g. the CPU test mesh) unless interpret mode is forced.
"""

from __future__ import annotations

import jax

from ppsim_tpu.engines.base import register_engine
from ppsim_tpu.engines.binned import BinnedEngine

__all__ = ["PallasEngine"]


def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@register_engine
class PallasEngine(BinnedEngine):
    name = "pallas"

    def __init__(self, config, interpret: bool | None = None):
        super().__init__(config)
        self.interpret = (not _tpu_available()) if interpret is None else interpret

    def accel_of(self, pos_sorted, row, col, grid):
        from ppsim_tpu.ops import pallas_force

        cfg = self.config
        return pallas_force.stencil_accel_pallas(
            pos_sorted,
            row,
            col,
            grid.slot_pos,
            self.geom,
            cfg.cutoff,
            cfg.min_r,
            cfg.mass,
            interpret=self.interpret,
        )
