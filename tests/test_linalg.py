"""Batched tiny linear algebra (ops/linalg.py) vs NumPy references.

These primitives carry the hot paths (DLT null spaces, Schur blocks, GN
pose solves); until now they were covered only transitively through the
ops that use them."""

import numpy as np
import jax.numpy as jnp
import pytest

from mqslam_tpu.ops import linalg


def _spd(rng, b, n, cond=1e3):
    A = rng.randn(b, n, n)
    U, _ = np.linalg.qr(A)
    w = np.logspace(0, np.log10(cond), n)
    return np.einsum("bij,j,bkj->bik", U, w, U)


class TestSolves:
    def test_solve3x3_sym(self, rng):
        N = jnp.asarray(_spd(rng, 64, 3), jnp.float32)
        rhs = jnp.asarray(rng.randn(64, 3), jnp.float32)
        x = np.asarray(linalg.solve3x3_sym(N, rhs))
        x_ref = np.linalg.solve(np.asarray(N, np.float64),
                                np.asarray(rhs, np.float64)[..., None])
        np.testing.assert_allclose(x, x_ref[..., 0], rtol=2e-3, atol=1e-4)

    def test_solve6x6_spd(self, rng):
        N = jnp.asarray(_spd(rng, 32, 6), jnp.float32)
        rhs = jnp.asarray(rng.randn(32, 6), jnp.float32)
        x = np.asarray(linalg.solve6x6_spd(N, rhs))
        x_ref = np.linalg.solve(np.asarray(N, np.float64),
                                np.asarray(rhs, np.float64)[..., None])
        np.testing.assert_allclose(x, x_ref[..., 0], rtol=5e-3, atol=1e-3)

    def test_inv3x3(self, rng):
        M = jnp.asarray(rng.randn(64, 3, 3) + 3 * np.eye(3), jnp.float32)
        inv = np.asarray(linalg.inv3x3(M))
        np.testing.assert_allclose(
            inv, np.linalg.inv(np.asarray(M, np.float64)), rtol=1e-3,
            atol=1e-4)


class TestEigh:
    @pytest.mark.parametrize("n", [3, 6, 9, 12])
    def test_eigh_jacobi_matches_numpy(self, rng, n):
        S = jnp.asarray(_spd(rng, 16, n, cond=1e4), jnp.float32)
        w, V = linalg.eigh_jacobi(S)
        w_ref = np.linalg.eigvalsh(np.asarray(S, np.float64))
        np.testing.assert_allclose(np.asarray(w), w_ref,
                                   rtol=1e-3, atol=1e-2)
        # eigenvector residual ||S v - w v||
        Sv = np.einsum("bij,bjk->bik", np.asarray(S), np.asarray(V))
        wV = np.asarray(V) * np.asarray(w)[:, None, :]
        resid = np.abs(Sv - wV).max() / np.abs(np.asarray(w)).max()
        assert resid < 1e-3, resid

    def test_svdvals3x3(self, rng):
        M = jnp.asarray(rng.randn(32, 3, 3), jnp.float32)
        sv = np.asarray(linalg.svdvals3x3(M))
        sv_ref = np.linalg.svd(np.asarray(M, np.float64),
                               compute_uv=False)
        np.testing.assert_allclose(sv, sv_ref, rtol=1e-3, atol=1e-4)


class TestCholeskyAndInverseIteration:
    @pytest.mark.parametrize("n", [3, 6, 9, 12])
    def test_cholesky_small(self, rng, n):
        S = jnp.asarray(_spd(rng, 16, n), jnp.float32)
        L = np.asarray(linalg.cholesky_small(S))
        L_ref = np.linalg.cholesky(np.asarray(S, np.float64))
        np.testing.assert_allclose(L, L_ref, rtol=2e-3, atol=1e-3)
        # strictly lower-triangular output
        assert (np.triu(L, 1) == 0).all()

    @pytest.mark.parametrize("n", [6, 12])
    def test_cho_solve_small(self, rng, n):
        S = jnp.asarray(_spd(rng, 16, n), jnp.float32)
        b = jnp.asarray(rng.randn(16, n), jnp.float32)
        L = linalg.cholesky_small(S)
        x = np.asarray(linalg.cho_solve_small(L, b))
        x_ref = np.linalg.solve(np.asarray(S, np.float64),
                                np.asarray(b, np.float64)[..., None])
        np.testing.assert_allclose(x, x_ref[..., 0], rtol=5e-3, atol=1e-3)

    @pytest.mark.parametrize("n", [9, 12])
    def test_smallest_eigvec_singular(self, rng, n):
        """The DLT/RANSAC case: exactly singular gram — the returned
        vector must span the null space."""
        B = rng.randn(8, n - 1, n)  # rank n-1
        S = jnp.asarray(np.einsum("bij,bik->bjk", B, B), jnp.float32)
        v = np.asarray(linalg.smallest_eigvec_spd(S, iters=3))
        Sv = np.einsum("bij,bj->bi", np.asarray(S, np.float64), v)
        rel = np.linalg.norm(Sv, axis=1) / np.linalg.norm(
            np.asarray(S), axis=(1, 2))
        assert rel.max() < 1e-5, rel.max()
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0,
                                   rtol=1e-5)

    def test_smallest_eigvec_overdetermined(self, rng):
        """Well-separated smallest eigenvalue (noisy LS case): must align
        with numpy's eigenvector."""
        n = 12
        A = rng.randn(8, n, n)
        U, _ = np.linalg.qr(A)
        w = np.concatenate([[1e-3], np.linspace(1.0, 10.0, n - 1)])
        S = np.einsum("bij,j,bkj->bik", U, w, U)
        v = np.asarray(linalg.smallest_eigvec_spd(
            jnp.asarray(S, jnp.float32), iters=3))
        v_ref = U[:, :, 0]
        align = np.abs(np.sum(v * v_ref, axis=1))
        assert align.min() > 0.9999, align.min()
