"""Synthetic textured-plane sequence renderer for front-end testing.

Provides a fully-known test world (texture on the z = plane_z plane, known
camera trajectory, closed-form init correspondences) — the role of the
reference's SVO synthetic dataset + its plane back-projection initializer
(reference: Work/SLAM/datasets/SVO/svo_initialization.py:62-85).
"""

import numpy as np

__all__ = ["make_texture", "render_plane_sequence", "backproject_to_plane"]


def make_texture(rng, size=1024, blur_passes=2):
    """Smooth random texture with dense gradient structure (float 0..255)."""
    tex = rng.rand(size // 4, size // 4) * 255.0
    tex = np.kron(tex, np.ones((4, 4)))
    k = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    k = np.outer(k, k)
    k /= k.sum()
    for _ in range(blur_passes):
        padded = np.pad(tex, 2, mode="wrap")
        out = np.zeros_like(tex)
        for i in range(5):
            for j in range(5):
                out += k[i, j] * padded[i:i + tex.shape[0],
                                        j:j + tex.shape[1]]
        tex = out
    return tex


def _bilinear_wrap(tex, x, y):
    h, w = tex.shape
    # float mod can return exactly w (huge inputs from rays grazing the
    # plane, tiny negatives) — re-fold and clamp before indexing
    x = np.mod(np.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0), w)
    y = np.mod(np.nan_to_num(y, nan=0.0, posinf=0.0, neginf=0.0), h)
    x = np.where(x >= w, x - w, x)
    y = np.where(y >= h, y - h, y)
    x0 = np.minimum(np.floor(x).astype(int), w - 1)
    y0 = np.minimum(np.floor(y).astype(int), h - 1)
    x1 = (x0 + 1) % w
    y1 = (y0 + 1) % h
    fx = x - x0
    fy = y - y0
    return ((1 - fy) * ((1 - fx) * tex[y0, x0] + fx * tex[y0, x1])
            + fy * ((1 - fx) * tex[y1, x0] + fx * tex[y1, x1]))


def render_plane_sequence(P_list, texture, size=(320, 240), f=280.0,
                          plane_z=4.0, tex_scale=64.0):
    """Render grayscale frames of the textured z=plane_z plane.

    P_list: [n, 4, 4] world-to-cam extrinsics. Returns imgs [n, H, W] f32.
    """
    W, H = size
    cx, cy = W / 2.0, H / 2.0
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    xn = (us - cx) / f
    yn = (vs - cy) / f
    d_cam = np.stack([xn, yn, np.ones_like(xn)], axis=-1)  # [H, W, 3]
    imgs = []
    for P in P_list:
        R = P[:3, :3]
        t = P[:3, 3]
        c = -R.T @ t                      # camera center in world
        d_world = d_cam @ R               # R^T applied to each ray
        s = (plane_z - c[2]) / d_world[..., 2]
        wx = c[0] + s * d_world[..., 0]
        wy = c[1] + s * d_world[..., 1]
        imgs.append(_bilinear_wrap(texture, wx * tex_scale,
                                   wy * tex_scale).astype(np.float32))
    return np.stack(imgs)


def backproject_to_plane(uv, P, f, c, plane_z=4.0):
    """Closed-form 3D points of pixels known to lie on z = plane_z
    (svo_initialization.py:62-85 semantics for a fronto-known plane)."""
    uv = np.asarray(uv, dtype=np.float64)
    xn = (uv[:, 0] - c[0]) / f
    yn = (uv[:, 1] - c[1]) / f
    d_cam = np.stack([xn, yn, np.ones_like(xn)], axis=1)
    R = P[:3, :3]
    t = P[:3, 3]
    center = -R.T @ t
    d_world = d_cam @ R
    s = (plane_z - center[2]) / d_world[:, 2]
    return center[None, :] + s[:, None] * d_world
