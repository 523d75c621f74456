"""In-block lane un-permutation: the chunk plan's entire y fixup.

The chunk layout (``formats/chunk.py``) sorts rows by length within
*aligned* windows of 1024, so a row's reduced value lands within the
same (8, 128) block of the per-block slice sums as its home position.
Undoing that is a static permutation with one-block reach: per output
block, 8 in-lane gathers merged by 7 selects — a few microseconds for
any matrix, where the round-4 row_map scatter paid 2.8 ms
(probes/probe_powerlaw.py).  This is the final piece of doing the
reference's scattered ``y[row] +=`` (the hazard hardware of
``chisel/frontend/InterleavedReduce.scala:51-57``) purely by layout.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = Any


def _kernel(y_ref, idx_ref, out_ref):
    ix = idx_ref[...].astype(jnp.int32)          # (8, 128) in [0, 1024)
    sub = jax.lax.shift_right_logical(ix, 7)     # source sublane
    lane = jnp.bitwise_and(ix, 127)
    v = y_ref[...]
    out = None
    for c in range(8):
        g = jnp.take_along_axis(
            jnp.broadcast_to(v[c:c + 1, :], lane.shape), lane, axis=1)
        out = g if out is None else jnp.where(sub == c, g, out)
    out_ref[...] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_unpermute(y2d: Array, idx: Array, interpret: bool = False) -> Array:
    """``out[b*128+l] = y2d flat[b*1024-aligned window][idx[b, l]]``.

    ``y2d``: (S, 128) with S a multiple of 8; ``idx``: (S, 128) int16
    whose entry for output position p = s*128 + l is the source offset
    within p's aligned 1024-window (sublane*128 + lane).  Returns the
    un-permuted (S, 128) array.
    """
    S, R = y2d.shape
    if R != 128 or S % 8:
        raise ValueError(f"y2d must be (8k, 128), got {y2d.shape}")
    return pl.pallas_call(
        _kernel,
        grid=(S // 8,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((S, R), y2d.dtype),
        interpret=interpret,
    )(y2d, idx)
