"""Exactness of the space-to-depth conv packing transform.

scripts/microbench_conv_pack.py measures whether packing the pitch axis
into MXU lanes wins on the chip; this pins the transform itself — the
packed (3, kw, r*ci, r*co) zero-stuffed kernel on the block-reshaped
input must reproduce the plain (kh, kw) circular conv exactly (up to
matmul reassociation) for every r, including r == kh//2 + 1 edge halos
and non-square channel counts.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

jnp = pytest.importorskip("jax.numpy")

import microbench_conv_pack as M  # noqa: E402


@pytest.mark.parametrize("r", [4, 8, 16])
@pytest.mark.parametrize("ci,co", [(3, 5), (8, 8), (1, 4)])
def test_pack_kernel_exact(r, ci, co):
    rng = np.random.default_rng(r * 100 + ci)
    xs = jnp.asarray(rng.standard_normal((2, 32, 40, ci)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((M.K, M.K, ci, co)) * 0.1,
                     jnp.float32)
    ref = np.asarray(M.baseline(xs, ws))
    wp = jnp.asarray(M.pack_kernel(np.asarray(ws), r))
    got = np.asarray(M.packed(xs, wp, r))
    err = np.abs(ref - got).max() / np.abs(ref).max()
    assert err < 1e-5, (r, ci, co, err)
