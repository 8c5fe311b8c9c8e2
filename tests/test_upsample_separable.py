"""The separable-matmul upsampling fast path must be numerically identical
to the transposed-conv formulation it replaces (FCN heads)."""

import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_tpu.nn import bilinear_upsample_weights, fixed_conv2d_transpose
from segmentation_tpu.nn.upsampling import upsample_matrix, upsample_separable


@pytest.mark.parametrize("factor", [2, 3, 8])
@pytest.mark.parametrize("c", [1, 3])
def test_separable_matches_valid_deconv(factor, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 7, 9, c)).astype(np.float32))
    w = jnp.asarray(bilinear_upsample_weights(factor, c))
    ref = fixed_conv2d_transpose(x, w, factor, "VALID")
    fast = upsample_separable(x, factor)
    assert fast.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("factor", [2, 8, 16, 32])
def test_separable_matches_same_deconv(factor):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 2)).astype(np.float32))
    w = jnp.asarray(bilinear_upsample_weights(factor, 2))
    ref = fixed_conv2d_transpose(x, w, factor, "SAME")
    fast = upsample_separable(x, factor, crop_to=(6 * factor, 6 * factor))
    assert fast.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-4)


def test_upsample_matrix_rows_normalized_interior():
    m = upsample_matrix(4, 8)
    # interior output rows: contributions sum to 1 (partition of unity)
    sums = m.sum(axis=1)
    interior = sums[4:-4]
    np.testing.assert_allclose(interior, 1.0, atol=1e-6)
