"""Test utilities: the same oracle tolerances the reference holds itself to.

rtol=1e-5 / atol=2e-5 mirror /root/reference/layers/utils.py:13-14; simple
layers use 1e-6 (mlp_test.py:13-14).
"""

from __future__ import annotations

import jax
import numpy as np

RTOL = 1e-5
ATOL = 2e-5


def assert_allclose(actual, desired, rtol=RTOL, atol=ATOL, err_msg=""):
    np.testing.assert_allclose(np.asarray(actual), np.asarray(desired),
                               rtol=rtol, atol=atol, err_msg=err_msg)


def assert_trees_allclose(actual, desired, rtol=RTOL, atol=ATOL):
    fa, ta = jax.tree_util.tree_flatten(actual)
    fd, td = jax.tree_util.tree_flatten(desired)
    assert ta == td, f"tree structure mismatch: {ta} vs {td}"
    for a, d in zip(fa, fd):
        assert_allclose(a, d, rtol=rtol, atol=atol)


def rand(*shape, dtype=np.float32, rng=None):
    """Standard-normal test data (reference layers/utils.py:17-18)."""
    rng = rng or np.random
    return rng.standard_normal(shape).astype(dtype)
