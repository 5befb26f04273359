"""Trajectory correctness checker (absmin / absavg interparticle distances).

The reference repo has no in-tree checker — correctness was gated by the
CS267 course's external tool, which compares the minimum and average
interparticle-distance statistics of a saved trajectory against bands derived
from the O(N^2) ground truth (the repo supports it only through the ``-o``
save path and the fixed ``-s 42`` seed in every job script,
part1/job-serial:9-16). The rebuild carries the checker in-repo.

Definition used here (documented, since the course tool's exact source isn't
in the reference): for each saved frame, collect all *interacting* pair
distances (pairs closer than ``cutoff``). ``absmin`` is the global minimum
over frames; ``absavg`` is the mean. A correct simulation keeps repulsive
pairs pushed toward the cutoff edge: absmin stays above ``0.4 * cutoff`` and
absavg above ``0.8 * cutoff``; an engine with broken forces / binning shows
overlapping particles and fails the bands. Thresholds match the well-known
CS267 hw2 bands.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ppsim_tpu.config import SimConfig

__all__ = ["CheckResult", "frame_distance_stats", "check_frames", "check_trajectory"]

ABSMIN_BAND = 0.4
ABSAVG_BAND = 0.8


class CheckResult(NamedTuple):
    absmin: float  # min interacting-pair distance across all frames
    absavg: float  # mean interacting-pair distance across all frames
    passed: bool
    cutoff: float
    oob: int = 0  # positions outside the box (explosion/corruption signature)

    def __str__(self) -> str:
        status = "PASS" if self.passed else "FAIL"
        extra = f", oob={self.oob}" if self.oob else ""
        return (
            f"{status}: absmin={self.absmin:.6g} ({self.absmin / self.cutoff:.2f} cutoff, "
            f"band >{ABSMIN_BAND}), absavg={self.absavg:.6g} "
            f"({self.absavg / self.cutoff:.2f} cutoff, band >{ABSAVG_BAND}){extra}"
        )


def frame_distance_stats(pos: np.ndarray, cutoff: float, cell_block: int = 4096,
                         use_native: bool = True):
    """(min, sum, count) of pair distances below cutoff in one frame.

    Small frames use the brute-force O(N^2) formulation (the trust anchor,
    like part1/reference.cpp); large frames switch to the native C++
    cell-list pass (ppsim_native.cpp: the analog of the reference's all-
    native tooling — it gates 20M-particle 3D frames in seconds where the
    numpy pass needs hours on the one-core host), falling back to an
    independent numpy cell-list pass when the library can't build. None of
    the large-frame paths shares engine machinery.
    """
    pos = np.asarray(pos, dtype=np.float64)
    n, dim = pos.shape
    if n > 20_000:
        if use_native:
            from ppsim_tpu.native import native_frame_stats

            stats = native_frame_stats(pos, cutoff)
            if stats is not None:
                return stats
        # Independent vectorized cell-list passes (still no engine machinery):
        # dense padded tables in 2D; sorted-cell searchsorted walk in 3D
        # (3D cutoff-cells are ~25x sparser, dense tables would waste memory).
        if dim == 2:
            return _cell_list_stats(pos, cutoff)
        return _cell_list_stats3(pos, cutoff)
    dmin = np.inf
    dsum = 0.0
    dcount = 0
    for start in range(0, n, cell_block):
        block = pos[start : start + cell_block]
        d = block[:, None, :] - pos[None, :, :]
        d2 = (d * d).sum(axis=-1)
        # mask self-pairs
        ii = np.arange(start, start + block.shape[0])
        d2[np.arange(block.shape[0]), ii] = np.inf
        hit = d2 < cutoff * cutoff
        if hit.any():
            d = np.sqrt(d2[hit])
            dmin = min(dmin, float(d.min()))
            dsum += float(d.sum())
            dcount += int(d.size)
    return dmin, dsum, dcount


def _cell_list_stats(pos: np.ndarray, cutoff: float):
    """Cell-list interacting-pair stats: O(N) memory, vectorized numpy.

    Sorts particles into cutoff-sized cells and, for each of the 9 stencil
    offsets, matches equal-capacity padded cell slabs — a host-side echo of
    the cell idea (serial.cpp:102-117) written independently of the engines.
    """
    n = pos.shape[0]
    side = max(pos.max(), 1e-9)
    ncell = max(1, int(np.ceil(side / cutoff)))
    cx = np.clip((pos[:, 0] / cutoff).astype(np.int64), 0, ncell - 1)
    cy = np.clip((pos[:, 1] / cutoff).astype(np.int64), 0, ncell - 1)
    cid = cx * ncell + cy
    order = np.argsort(cid, kind="stable")
    sorted_cid = cid[order]
    spos = pos[order]
    # per-cell slices
    starts = np.searchsorted(sorted_cid, np.arange(ncell * ncell))
    ends = np.searchsorted(sorted_cid, np.arange(ncell * ncell), side="right")
    counts = ends - starts
    cap = int(counts.max())
    # padded (cells, cap) index table
    slot = np.arange(n) - starts[sorted_cid]
    table = np.full((ncell * ncell, cap), -1, dtype=np.int64)
    table[sorted_cid, slot] = np.arange(n)
    valid = table >= 0
    px = np.where(valid, spos[table.clip(0), 0], 1e9)
    py = np.where(valid, spos[table.clip(0), 1], 1e9)
    grid_valid = valid.reshape(ncell, ncell, cap)

    dmin = np.inf
    dsum = 0.0
    dcount = 0
    grid_px = px.reshape(ncell, ncell, cap)
    grid_py = py.reshape(ncell, ncell, cap)
    # Row-band chunking bounds the (cells, cap, cap) pair temporaries to tens
    # of MB — full-grid temporaries at millions of cells thrash the allocator.
    band = max(1, int(4e6 // max(1, ncell * cap * cap)))
    for r0 in range(0, ncell, band):
        r1 = min(ncell, r0 + band)
        cx = grid_px[r0:r1]
        cy = grid_py[r0:r1]
        for dx_ in (-1, 0, 1):
            sr0, sr1 = r0 + dx_, r1 + dx_
            nrows = r1 - r0
            nx = np.full((nrows, ncell, cap), 1e9)
            ny = np.full((nrows, ncell, cap), 1e9)
            vs0, vs1 = max(sr0, 0), min(sr1, ncell)
            if vs0 < vs1:
                nx[vs0 - sr0 : vs1 - sr0] = grid_px[vs0:vs1]
                ny[vs0 - sr0 : vs1 - sr0] = grid_py[vs0:vs1]
            for dy_ in (-1, 0, 1):
                mx = np.full_like(nx, 1e9)
                my = np.full_like(ny, 1e9)
                ys = slice(max(0, -dy_), ncell - max(0, dy_))
                yd = slice(max(0, dy_), ncell - max(0, -dy_))
                mx[:, yd] = nx[:, ys]
                my[:, yd] = ny[:, ys]
                ddx = mx[:, :, None, :] - cx[:, :, :, None]
                ddy = my[:, :, None, :] - cy[:, :, :, None]
                d2 = ddx * ddx + ddy * ddy
                # d2 == 0 is either a self-pair, padding-vs-padding, or two
                # EXACTLY coincident particles (the signature of a duplication
                # / scatter bug). Exact duplicates share a cell, so they only
                # occur in the same-cell pairing: count valid off-slot-
                # diagonal zeros there and report them as distance-0 pairs,
                # exactly as the brute-force path (which masks only the true
                # self-diagonal) would.
                if dx_ == 0 and dy_ == 0:
                    vv = grid_valid[r0:r1]
                    pair_valid = vv[:, :, None, :] & vv[:, :, :, None]
                    dup = (d2 == 0.0) & pair_valid & ~np.eye(cap, dtype=bool)
                    ndup = int(dup.sum())
                    if ndup:
                        dmin = 0.0
                        dcount += ndup  # each contributes distance 0 to dsum
                hit = (d2 < cutoff * cutoff) & (d2 > 0.0)
                if hit.any():
                    d = np.sqrt(d2[hit])
                    dmin = min(dmin, float(d.min()))
                    dsum += float(d.sum())
                    dcount += int(d.size)
    return dmin, dsum, dcount


def _cell_list_stats3(pos: np.ndarray, cutoff: float):
    """3D interacting-pair stats: sorted cell ids + searchsorted neighbor
    walk, O(N) memory (no dense tables — at the 3D stretch density the mean
    cutoff-cell occupancy is ~0.14, so padded tables would be ~25x waste).

    Counts each unordered pair ONCE (same-cell triangular + the 13
    lexicographically-positive neighbor offsets). absmin/absavg are identical
    to the double-counting brute-force path (doubling scales dsum and dcount
    together). Exactly-coincident particles (duplication-bug signature) show
    up as d2 == 0 same-cell pairs and drive absmin to 0 naturally.
    """
    n = pos.shape[0]
    side = max(pos.max(), 1e-9)
    ncell = max(1, int(np.ceil(side / cutoff)))
    c = np.clip((pos / cutoff).astype(np.int64), 0, ncell - 1)
    cid = (c[:, 1] * ncell + c[:, 0]) * ncell + c[:, 2]
    order = np.argsort(cid, kind="stable")
    spos = pos[order]
    scid = cid[order]
    cy, cx, cz = c[order, 1], c[order, 0], c[order, 2]

    dmin = np.inf
    dsum = 0.0
    dcount = 0
    self_idx = np.arange(n)
    # 13 lexicographically-positive offsets + the same-cell triangle (dz=0
    # row below handles same-cell via j-ranks after self).
    OFFSETS = [(0, 0, 0)] + [
        (dy, dx, dz)
        for dy in (0, 1) for dx in (-1, 0, 1) for dz in (-1, 0, 1)
        if (dy, dx, dz) > (0, 0, 0)
    ]
    for dy, dx, dz in OFFSETS:
        same = (dy, dx, dz) == (0, 0, 0)
        valid = np.ones(n, dtype=bool)
        if dy:
            valid &= cy + dy < ncell
        if dx:
            valid &= (cx + dx >= 0) & (cx + dx < ncell)
        if dz:
            valid &= (cz + dz >= 0) & (cz + dz < ncell)
        target = scid + (dy * ncell + dx) * ncell + dz
        s = np.searchsorted(scid, target, side="left")
        e = np.searchsorted(scid, target, side="right")
        if same:
            # triangle: partners strictly after me within my own cell
            s = self_idx + 1
        count = np.maximum(e - s, 0)
        count = np.where(valid, count, 0)
        cap = int(count.max()) if n else 0
        for j in range(cap):
            m = j < count
            if not m.any():
                break
            idx = s[m] + j
            d = spos[idx] - spos[m]
            d2 = (d * d).sum(axis=-1)
            hit = d2 < cutoff * cutoff
            if hit.any():
                dh = np.sqrt(d2[hit])
                dmin = min(dmin, float(dh.min()))
                dsum += float(dh.sum())
                dcount += int(dh.size)
    return dmin, dsum, dcount


def check_frames(frames: np.ndarray, config: SimConfig) -> CheckResult:
    cutoff = config.cutoff
    absmin = np.inf
    total = 0.0
    count = 0
    oob = 0
    # Wall reflection keeps every position in [0, size]; anything outside is
    # corruption (an exploded run also empties the interacting-pair set, which
    # would otherwise sail through the lower bands with absmin = inf).
    lo, hi = -1e-9, config.size + 1e-9
    for frame in frames:
        f = np.asarray(frame)
        oob += int(((f < lo) | (f > hi)).sum())
        m, s, c = frame_distance_stats(frame, cutoff)
        absmin = min(absmin, m)
        total += s
        count += c
    absavg = total / count if count else np.inf
    passed = absmin > ABSMIN_BAND * cutoff and absavg > ABSAVG_BAND * cutoff
    # A dense run (mean interacting neighbors ~ pi*cutoff^2*density_n >= 1 at
    # the reference density for n >= ~650) with zero interacting pairs means
    # the dynamics blew apart, not that everything is "far enough".
    if count == 0 and config.num_parts >= 1000:
        passed = False
    if oob:
        passed = False
    return CheckResult(float(absmin), float(absavg), bool(passed), cutoff, oob)


def check_trajectory(path: str, config: SimConfig) -> CheckResult:
    from ppsim_tpu.io import read_trajectory

    frames, size = read_trajectory(path)
    if abs(size - config.size) > 1e-3 * max(1.0, config.size):
        raise ValueError(f"trajectory box size {size} != config size {config.size}")
    return check_frames(frames, config)
