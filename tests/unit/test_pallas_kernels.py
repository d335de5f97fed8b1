"""Pallas kernels vs einsum references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from pgdrome_tpu.ops.pallas_kernels import gram_stack, rank1_reconstruct


class TestGramStack:
    def test_matches_einsum(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(4, 96, 96))
        F = rng.normal(size=96)
        w_ref = np.einsum("tij,i,j->t", A, F, F)
        w = np.asarray(gram_stack(jnp.asarray(A), jnp.asarray(F), block_rows=32))
        np.testing.assert_allclose(w, w_ref, rtol=1e-12)

    def test_uneven_blocks(self):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(2, 70, 70))
        F = rng.normal(size=70)
        w_ref = np.einsum("tij,i,j->t", A, F, F)
        w = np.asarray(gram_stack(jnp.asarray(A), jnp.asarray(F), block_rows=70))
        np.testing.assert_allclose(w, w_ref, rtol=1e-12)


class TestRank1Reconstruct:
    def test_matches_matmul(self):
        rng = np.random.default_rng(2)
        fac = rng.normal(size=(50, 12))
        m0 = rng.normal(size=(12, 130))
        out = np.asarray(
            rank1_reconstruct(jnp.asarray(fac), jnp.asarray(m0), block_b=16, block_n=64)
        )
        np.testing.assert_allclose(out, fac @ m0, rtol=1e-12)

    def test_single_block(self):
        rng = np.random.default_rng(3)
        fac = rng.normal(size=(8, 5))
        m0 = rng.normal(size=(5, 32))
        out = np.asarray(rank1_reconstruct(jnp.asarray(fac), jnp.asarray(m0)))
        np.testing.assert_allclose(out, fac @ m0, rtol=1e-12)
