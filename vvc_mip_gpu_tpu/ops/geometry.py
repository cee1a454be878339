"""Static geometry plans: precomputed gather indices for the TPU engine.

The reference engine resolves CU geometry per work-item at kernel runtime
from constant tables (reference: intra.cl:81-90, 214-226).  On TPU all
geometry is static: for a given frame size we precompute, per size group,
the global CU coordinate lattices and the row/column gather index vectors,
so every boundary/original-sample fetch in the engine is a pair of
`jnp.take` ops with compile-time-constant indices followed by reshapes.

Because every group's CUs form a cartesian lattice (see constants.py), a
group's samples factor as (row indices) x (column indices); gathering a
whole frame's worth of CUs is two structured takes instead of a per-CU
gather — the TPU-native answer to the reference's strided per-work-item
reads (the reference author's own TODO at intra.cl:229-231 wishes for
exactly this).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from vvc_mip_gpu_tpu.constants import (
    CTU_SIZE,
    GROUPS,
    ShapeClass,
    num_ctus,
    shape_classes,
)


def _progression(idx: np.ndarray) -> tuple[int, int] | None:
    """(start, step) if idx is a uniform arithmetic progression, else None."""
    if len(idx) < 2:
        return (int(idx[0]), 1)
    d = np.diff(idx)
    if (d == d[0]).all():
        return (int(idx[0]), int(d[0]))
    return None


@dataclasses.dataclass(frozen=True)
class GroupPlan:
    """Gather plan for one size group at a fixed frame size.

    CU axis convention: the engine's dense layout is
    [ctu_row, cu_row, ctu_col, cu_col] flattened as
    (row-CU major x col-CU minor); `to_ctu_layout` permutes a gathered
    tensor into the reference's [nCTU, cuIdxInCtu] ordering.

    CU origin coordinates are *unclipped*: the engine gathers from a frame
    padded by edge replication (see `padded_extent`), so out-of-frame CUs
    read deterministic replicated samples and are flagged by `valid`.
    Nearly every group's origin lattice is a uniform arithmetic progression
    along each axis (`y_prog`/`x_prog`), so gathers lower to strided slices
    + reshapes; the two interleaved-lattice 8x8 groups fall back to takes.
    """

    group_index: int
    width: int  # CU width
    height: int  # CU height
    frame_w: int
    frame_h: int
    # Global CU origin coordinates along each lattice axis:
    ys: np.ndarray  # [n_rows_total] CU y origins
    xs: np.ndarray  # [n_cols_total] CU x origins
    y_prog: tuple[int, int] | None  # (start, step) if ys is uniform
    x_prog: tuple[int, int] | None
    ctu_rows: int
    ctu_cols: int
    cu_rows: int  # CU rows per CTU
    cu_cols: int

    @property
    def n_rows(self) -> int:
        return len(self.ys)

    @property
    def n_cols(self) -> int:
        return len(self.xs)

    @property
    def valid(self) -> np.ndarray:
        """[n_rows, n_cols] bool — CU fully inside the frame."""
        return ((self.ys + self.height <= self.frame_h)[:, None]
                & ((self.xs + self.width <= self.frame_w)[None, :]))

    def to_ctu_layout(self, arr: np.ndarray) -> np.ndarray:
        """Reorder leading [n_rows, n_cols] axes to [nCTU, cusPerCtu]."""
        tail = arr.shape[2:]
        a = arr.reshape(self.ctu_rows, self.cu_rows, self.ctu_cols,
                        self.cu_cols, *tail)
        a = np.moveaxis(a, 2, 1)
        return a.reshape(self.ctu_rows * self.ctu_cols,
                         self.cu_rows * self.cu_cols, *tail)

    def lattice_costs_to_ctu(self, costs):
        """Reorder SoA cost block [2M, n_rows*n_cols] (lattice order) into
        the reference layout [nCTU, cusPerCtu*2M] (cu-major, mode-minor)."""
        import jax.numpy as jnp

        two_m = costs.shape[0]
        a = costs.reshape(two_m, self.ctu_rows, self.cu_rows,
                          self.ctu_cols, self.cu_cols)
        a = jnp.transpose(a, (1, 3, 2, 4, 0))
        return a.reshape(self.ctu_rows * self.ctu_cols,
                         self.cu_rows * self.cu_cols * two_m)

    def lattice_costs_to_ctu_mode_minor(self, costs_t):
        """Reorder MODE-MINOR cost block [n_rows*n_cols, 2M] (lattice
        order; the distortion kernel's emit="msh_t" layout) into the same
        reference layout [nCTU, cusPerCtu*2M].  Unlike the [2M, n] form
        this never moves the mode axis to minor — the permutation only
        swaps mid axes, which XLA copies in whole (cu_cols*2M)-element
        runs instead of lane-crossing gathers."""
        import jax.numpy as jnp

        two_m = costs_t.shape[-1]
        a = costs_t.reshape(self.ctu_rows, self.cu_rows, self.ctu_cols,
                            self.cu_cols * two_m)
        a = jnp.transpose(a, (0, 2, 1, 3))
        return a.reshape(self.ctu_rows * self.ctu_cols,
                         self.cu_rows * self.cu_cols * two_m)

    # The same permutation for jnp arrays (used inside jit).
    def to_ctu_layout_jnp(self, arr):
        import jax.numpy as jnp

        tail = arr.shape[2:]
        a = arr.reshape(self.ctu_rows, self.cu_rows, self.ctu_cols,
                        self.cu_cols, *tail)
        a = jnp.moveaxis(a, 2, 1)
        return a.reshape(self.ctu_rows * self.ctu_cols,
                         self.cu_rows * self.cu_cols, *tail)


@dataclasses.dataclass(frozen=True)
class ClassPlan:
    """All groups of one shape class at a fixed frame size."""

    shape: ShapeClass
    groups: tuple[GroupPlan, ...]
    n_ctus: int


def _group_plan(group_index: int, frame_w: int, frame_h: int) -> GroupPlan:
    g = GROUPS[group_index]
    ctu_cols, ctu_rows, _ = num_ctus(frame_w, frame_h)
    ys = (np.arange(ctu_rows)[:, None] * CTU_SIZE
          + np.asarray(g.ys, np.int64)[None, :]).ravel()
    xs = (np.arange(ctu_cols)[:, None] * CTU_SIZE
          + np.asarray(g.xs, np.int64)[None, :]).ravel()
    return GroupPlan(
        group_index=group_index,
        width=g.width,
        height=g.height,
        frame_w=frame_w,
        frame_h=frame_h,
        ys=ys,
        xs=xs,
        y_prog=_progression(ys),
        x_prog=_progression(xs),
        ctu_rows=ctu_rows,
        ctu_cols=ctu_cols,
        cu_rows=g.cu_rows,
        cu_cols=g.cu_columns,
    )


def _axis_extent(prog, idx, n: int, win: int) -> int:
    """Rows/cols the padded frame must provide for this gather."""
    if prog is not None:
        o, s = prog
        # the block-slice trick reads [o, o + n*max(s, win))
        return o + n * max(s, win) if n > 1 else o + win
    return int(idx[-1]) + win


@functools.cache
def padded_extent(frame_w: int, frame_h: int) -> tuple[int, int]:
    """(Hp, Wp): frame extent, edge-replication padded, covering every
    group's slice-based gather (out-of-frame CUs read replicated samples
    and are masked invalid)."""
    hp, wp = frame_h, frame_w
    for i in range(len(GROUPS)):
        p = _group_plan(i, frame_w, frame_h)
        hp = max(hp, _axis_extent(p.y_prog, p.ys, p.n_rows, p.height))
        wp = max(wp, _axis_extent(p.x_prog, p.xs, p.n_cols, p.width))
    return hp, wp


@functools.cache
def class_plans(frame_w: int, frame_h: int) -> tuple[ClassPlan, ...]:
    _, _, n = num_ctus(frame_w, frame_h)
    return tuple(
        ClassPlan(
            shape=cl,
            groups=tuple(_group_plan(i, frame_w, frame_h)
                         for i in cl.group_indices),
            n_ctus=n,
        )
        for cl in shape_classes()
    )
