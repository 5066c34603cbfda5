"""ORB-style oriented binary descriptors (FAST + intensity-centroid
orientation + steered BRIEF), batched for TPU.

The reference associates features by optical flow (slam2.py) / radiusMatch
on raw patches (slam.py); descriptor-based association is required for the
appearance tasks the reference has no kernel for — loop-closure candidate
retrieval and cross-agent co-visibility (map merge), see
mqslam_tpu.slamgraph. This is the "ORB-style feature detection + descriptor
matching" component of the engine.

Not byte-compatible with cv2.ORB (whose bit-pattern is a learned lookup
table); the pair pattern here is a fixed seeded Gaussian pattern bounded to
the rotation-safe radius, which preserves ORB's invariances (in-plane
rotation via steering, monotonic-illumination via pairwise comparisons).

TPU shape: one dynamic-slice patch per keypoint, orientation moments as
masked reductions, and ALL 512 rotated sample points per keypoint evaluated
with one banded-interpolation einsum pair (no gathers) — the same
window-as-matmul trick as ops/lk.py. Bits pack to uint8 for
ops/matching.pairwise_hamming (XOR + popcount on the VPU).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as onp

from mqslam_tpu.ops import fast as fast_mod
from mqslam_tpu.ops.lk import _extract_patches

__all__ = ["orb_pattern", "orientation", "brief_describe", "orb_features",
           "PATCH_RADIUS", "N_BITS"]

PATCH_RADIUS = 15          # ORB half-patch: orientation + pattern bound
N_BITS = 256               # descriptor length (32 bytes)
_P = 2 * PATCH_RADIUS + 3  # patch side: +1 margin each side + interp tap


def orb_pattern(n_bits: int = N_BITS, seed: int = 8):
    """[n_bits, 4] static float32 pattern (xa, ya, xb, yb), Gaussian pairs
    clipped into the radius-(PATCH_RADIUS-2) disc so any in-plane rotation
    stays inside the patch (cv2's table is learned; ours is seeded)."""
    rng = onp.random.RandomState(seed)
    sigma_a = PATCH_RADIUS / 2.5
    sigma_b = PATCH_RADIUS / 5.0
    out = onp.zeros((n_bits, 4), onp.float32)
    rmax = PATCH_RADIUS - 2.0
    n = 0
    while n < n_bits:
        a = rng.normal(0.0, sigma_a, 2)
        b = a + rng.normal(0.0, sigma_b, 2)
        if onp.linalg.norm(a) <= rmax and onp.linalg.norm(b) <= rmax:
            out[n] = [a[0], a[1], b[0], b[1]]
            n += 1
    return out


_PATTERN = orb_pattern()


def _patches(img, uv):
    """[K, _P, _P] patches centered on rounded uv; returns (patch, frac)
    where frac is the sub-pixel offset of the true center in the patch."""
    c = jnp.floor(uv)
    corner = jnp.stack([c[:, 1].astype(jnp.int32) - PATCH_RADIUS - 1,
                        c[:, 0].astype(jnp.int32) - PATCH_RADIUS - 1],
                       axis=1)
    patch, cy, cx = _extract_patches(img, corner, _P)
    frac = uv - jnp.stack([cx.astype(uv.dtype) + PATCH_RADIUS + 1,
                           cy.astype(uv.dtype) + PATCH_RADIUS + 1], axis=1)
    return patch, frac


# circular mask + coordinate grids for the intensity centroid (static)
_gy, _gx = onp.mgrid[-PATCH_RADIUS - 1:PATCH_RADIUS + 2,
                     -PATCH_RADIUS - 1:PATCH_RADIUS + 2]
_CIRC = jnp.asarray(
    ((_gx ** 2 + _gy ** 2) <= PATCH_RADIUS ** 2).astype(onp.float32))
_GX = jnp.asarray(_gx.astype(onp.float32)) * _CIRC
_GY = jnp.asarray(_gy.astype(onp.float32)) * _CIRC


def orientation(patch):
    """Intensity-centroid angle per patch [K]: atan2(m01, m10) over the
    radius-15 disc (Rosin moments, as in ORB)."""
    m10 = jnp.sum(patch * _GX, axis=(-2, -1))
    m01 = jnp.sum(patch * _GY, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def _sample_rotated(patch, frac, theta, pattern):
    """Bilinear values of the 2*n_bits rotated pattern points.

    patch [K, _P, _P], frac [K, 2], theta [K] -> [K, n_bits, 2] (a, b).
    One einsum pair over banded interpolation weights (see ops/lk.py).
    """
    K = patch.shape[0]
    n = pattern.shape[0]
    pts = pattern.reshape(n * 2, 2)  # [(a0..a255, b interleaved-by-reshape)]
    # rotate: [K, 2n, 2]
    ca, sa = jnp.cos(theta), jnp.sin(theta)
    x = pts[None, :, 0] * ca[:, None] - pts[None, :, 1] * sa[:, None]
    y = pts[None, :, 0] * sa[:, None] + pts[None, :, 1] * ca[:, None]
    # patch coordinates of each sample (center + sub-pixel offset)
    cx = x + PATCH_RADIUS + 1 + frac[:, None, 0]
    cy = y + PATCH_RADIUS + 1 + frac[:, None, 1]
    Wy = _interp_weights_pointwise(cy)   # [K, 2n, _P]
    Wx = _interp_weights_pointwise(cx)
    tmp = jnp.einsum("ksp,kpq->ksq", Wy, patch,
                     precision=jax.lax.Precision.HIGHEST)
    vals = jnp.sum(tmp * Wx, axis=-1)    # [K, 2n]
    return vals.reshape(K, n, 2)


def _interp_weights_pointwise(pos):
    """[..., S] fractional positions -> [..., S, _P] hat-function rows."""
    j = jnp.arange(_P, dtype=pos.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - j))


_BYTE_W = jnp.asarray(1 << onp.arange(8, dtype=onp.int32))


@partial(jax.jit, static_argnames=())
def brief_describe(img, uv, valid=None):
    """Steered-BRIEF descriptors at keypoints.

    img [H, W] f32, uv [K, 2] pixel coords. Returns (desc [K, 32] uint8,
    theta [K], ok [K] bool — False where the patch would leave the image).
    """
    if valid is None:
        valid = jnp.ones(uv.shape[0], bool)
    H, W = img.shape
    b = PATCH_RADIUS + 2
    ok = valid & (uv[:, 0] >= b) & (uv[:, 0] < W - b) & \
        (uv[:, 1] >= b) & (uv[:, 1] < H - b)
    patch, frac = _patches(img, uv)
    theta = orientation(patch)
    vals = _sample_rotated(patch, frac, theta, jnp.asarray(_PATTERN))
    bits = (vals[..., 0] < vals[..., 1])          # [K, 256]
    bytes_ = jnp.sum(bits.reshape(-1, 32, 8) * _BYTE_W, axis=-1)
    return bytes_.astype(jnp.uint8), theta, ok


@partial(jax.jit, static_argnames=("max_corners",))
def orb_features(img, max_corners: int = 512, threshold: float = 20.0):
    """FAST-9/16 detection + steered-BRIEF description in one call.

    Returns (uv [max_corners, 2], desc [max_corners, 32] uint8,
    score, theta, valid)."""
    uv, score, v = fast_mod.fast_detect(img, threshold, max_corners)
    desc, theta, ok = brief_describe(img, uv, v)
    return uv, desc, score, theta, v & ok
