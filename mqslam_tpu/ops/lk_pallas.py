"""Pallas TPU kernel for the Lucas-Kanade per-track Newton iteration.

The role of the reference's compiled native kernels (reference:
Work/python_libs/triangulation_c — "speed-of-light" versions of the hot
loops) for the front-end's hottest op. The XLA formulation (ops/lk.py)
expresses bilinear window sampling as banded interpolation matmuls because
per-track dynamic windows would otherwise be giant gathers; inside a Pallas
kernel the patches live in VMEM, so a window sample is a dynamic row slice
+ row lerp (Mosaic supports sublane-axis dynamic slicing; the lane axis
does not, so column interpolation is one small banded matmul built from an
in-register iota) — the whole Newton loop runs in-core with zero HBM
traffic after the patch loads.

Grid: one program per track. Each program receives the track's template and
search patches ([P, P] VMEM blocks), the template window offset, and the
initial search offset; it computes windowed gradients, the 2x2 normal
matrix, then iterates d <- d + G^-1 b with per-track convergence exit.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lk_iterate_pallas"]


def _lerp_window(patch_ref, ay, ax, win):
    """Bilinear win x win window at fractional (ay, ax) from a [P, P] ref.

    Mosaic supports dynamic slicing along the sublane (row) axis but not the
    lane (column) axis, so rows are sliced + lerped directly and the column
    interpolation applies as one banded-matrix matmul built in-register.
    """
    P = patch_ref.shape[-1]
    iy = jnp.floor(ay).astype(jnp.int32)
    fy = ay - iy.astype(ay.dtype)
    rows0 = patch_ref[0, pl.ds(iy, win), :]        # [win, P]
    rows1 = patch_ref[0, pl.ds(iy + 1, win), :]
    rows = (1.0 - fy) * rows0 + fy * rows1
    # column interpolation: W[j, k] = tri(ax + k - j), [P, win]
    j = jax.lax.broadcasted_iota(jnp.int32, (P, win), 0).astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (P, win), 1).astype(jnp.float32)
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(ax + k - j))
    return jnp.dot(rows, Wx, preferred_element_type=jnp.float32)


def _kernel(aJ_ref, a0_ref, pJ_ref, pI_ref, out_ref, eig_ref, err_ref,
            *, win, iters, eps, patch):
    ayJ = aJ_ref[0, 0, 0]
    axJ = aJ_ref[0, 0, 1]

    # template window + gradients (central differences sampled at +-1)
    Jw = _lerp_window(pJ_ref, ayJ, axJ, win)
    dx = 0.5 * (_lerp_window(pJ_ref, ayJ, axJ + 1.0, win)
                - _lerp_window(pJ_ref, ayJ, axJ - 1.0, win))
    dy = 0.5 * (_lerp_window(pJ_ref, ayJ + 1.0, axJ, win)
                - _lerp_window(pJ_ref, ayJ - 1.0, axJ, win))
    g00 = jnp.sum(dx * dx)
    g01 = jnp.sum(dx * dy)
    g11 = jnp.sum(dy * dy)
    det = g00 * g11 - g01 * g01
    det_safe = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    tr = 0.5 * (g00 + g11)
    min_eig = tr - jnp.sqrt(jnp.maximum(0.25 * (g00 - g11) ** 2
                                        + g01 * g01, 0.0))
    eig_ref[0, 0, 0] = min_eig / (win * win)

    lo = jnp.float32(0.0)
    hi = jnp.float32(patch - 2 - win)

    def cond(carry):
        _, _, done, it = carry
        return (it < iters) & (done == 0)

    def body(carry):
        ay, ax, done, it = carry
        Iw = _lerp_window(pI_ref, ay, ax, win)
        diff = Jw - Iw
        b0 = jnp.sum(diff * dx)
        b1 = jnp.sum(diff * dy)
        sx = (g11 * b0 - g01 * b1) / det_safe
        sy = (g00 * b1 - g01 * b0) / det_safe
        ax2 = jnp.clip(ax + sx, lo, hi)
        ay2 = jnp.clip(ay + sy, lo, hi)
        done2 = jnp.where(sx * sx + sy * sy < eps * eps, jnp.int32(1),
                          done)
        return ay2, ax2, done2, it + 1

    ay0 = a0_ref[0, 0, 0]
    ax0 = a0_ref[0, 0, 1]
    # per-track convergence EXIT (not just masking): most tracks converge
    # in 2-4 iterations, and inside the kernel each saved iteration saves
    # a real window sample — unlike the batched XLA form, where one slow
    # track keeps the whole batch iterating
    ay, ax, _, _ = jax.lax.while_loop(
        cond, body, (ay0, ax0, jnp.int32(0), jnp.int32(0)))
    out_ref[0, 0, 0] = ay
    out_ref[0, 0, 1] = ax
    # final window error (mean |diff|) for the OF-error gate
    Iw = _lerp_window(pI_ref, ay, ax, win)
    err_ref[0, 0, 0] = jnp.mean(jnp.abs(Jw - Iw))


@functools.partial(jax.jit,
                   static_argnames=("win", "iters", "eps", "interpret"))
def lk_iterate_pallas(patchesJ, patchesI, aJ, a0, win: int = 21,
                      iters: int = 30, eps: float = 0.01,
                      interpret: bool = False):
    """Run the LK Newton loop for T tracks.

    patchesJ/patchesI: [T, P, P] template/search patches;
    aJ: [T, 2] (ay, ax) template window offset in patch coords;
    a0: [T, 2] initial search window offset.
    Returns (a_final [T, 2], min_eig [T], err [T]).
    """
    T, PJ, _ = patchesJ.shape
    PI = patchesI.shape[-1]
    kernel = functools.partial(_kernel, win=win, iters=iters, eps=eps,
                               patch=PI)
    grid = (T,)
    out_shape = (
        jax.ShapeDtypeStruct((T, 1, 2), jnp.float32),
        jax.ShapeDtypeStruct((T, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((T, 1, 1), jnp.float32),
    )
    a_out, eig, err = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, PJ, PJ), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PI, PI), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(aJ.astype(jnp.float32).reshape(T, 1, 2),
      a0.astype(jnp.float32).reshape(T, 1, 2),
      patchesJ.astype(jnp.float32), patchesI.astype(jnp.float32))
    return a_out[:, 0], eig[:, 0, 0], err[:, 0, 0]
