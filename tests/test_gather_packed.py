"""gather_rows_packed must equal the naive row gather (it is a traffic
optimization only: [N, C] viewed as [N/G, G*C] groups + one-hot pick).
"""

import jax.numpy as jnp
import numpy as np

from read_tpu.models.texture import gather_rows_packed


def test_matches_naive_gather():
    rng = np.random.default_rng(0)
    for n, c in ((1003, 8), (64, 3), (130, 16)):
        t = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, size=(4, 37)).astype(
            np.int32))
        a = np.asarray(gather_rows_packed(t, idx))
        b = np.asarray(t)[np.asarray(idx)]
        np.testing.assert_array_equal(a, b)


def test_gradient_is_scatter_add():
    import jax
    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, size=(25,)).astype(np.int32))

    def loss_p(t):
        return jnp.sum(jnp.sin(gather_rows_packed(t, idx)))

    def loss_n(t):
        return jnp.sum(jnp.sin(t[idx]))

    gp = jax.grad(loss_p)(t)
    gn = jax.grad(loss_n)(t)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gn),
                               atol=1e-6)
