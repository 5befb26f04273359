"""Interchangeable simulation engines behind one protocol.

This reproduces the reference's L1 portability seam — the same driver links
against any backend implementing ``init_simulation`` / ``simulate_one_step``
(part1/common.h:24-25; CMake target wiring part1/CMakeLists.txt:30-33).
Here the seam is :class:`ppsim_tpu.engines.base.Engine`; backends:

- ``oracle``  — O(N^2) all-pairs ground truth (reference: part1/reference.cpp)
- ``binned``  — single-chip sort-rebinned grid engine, whole run in one
  jitted ``lax.scan`` (reference: part1/serial.cpp + part1/vecmp.cpp +
  part3/gpu.cu, unified)
- ``pallas``  — binned engine with the Pallas/Mosaic force kernel on the hot
  path (reference: part3/gpu.cu CUDA kernels)
- ``sharded`` — multi-chip shard_map strip decomposition with ppermute halo
  exchange and particle migration (reference: part2/mpi.cpp)
"""

from ppsim_tpu.engines.base import Engine, RunResult, get_engine, register_engine

# Import for registration side effects.
from ppsim_tpu.engines import oracle as _oracle  # noqa: F401
from ppsim_tpu.engines import binned as _binned  # noqa: F401
from ppsim_tpu.engines import sharded as _sharded  # noqa: F401
from ppsim_tpu.engines import pallas_engine as _pallas  # noqa: F401

__all__ = ["Engine", "RunResult", "get_engine", "register_engine"]
