"""OrthoNet: SpectralNet-style learned eigenmaps.

Capability parity with ``U2GNN_pytorch/orthonet.py``: a pyramid MLP
(hidden → h/2 → h/3 → h/4 → K, ReLU between, ``orthonet.py:10-27``) trained
to minimize tr(YᵀLY) where Y = √m · Z R⁻¹ and R is the Cholesky factor of
ZᵀZ — the Cholesky-based orthogonalization of ``orthonet.py:45-52``.  Adam
with amsgrad, full-batch (``:57``).

The whole fit runs as one jitted ``lax.scan`` over epochs — the reference's
per-epoch Python loop becomes a single device program.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _pyramid_dims(input_dim: int, hidden_dim: int, output_dim: int) -> List[int]:
    return [
        input_dim,
        hidden_dim,
        hidden_dim // 2,
        hidden_dim // 3,
        hidden_dim // 4,
        output_dim,
    ]


def _init_mlp(key, dims):
    params = []
    for i in range(len(dims) - 1):
        k1, k2, key = jax.random.split(key, 3)
        # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        bound = 1.0 / math.sqrt(dims[i])
        params.append(
            {
                "w": jax.random.uniform(
                    k1, (dims[i], dims[i + 1]), jnp.float32, -bound, bound
                ),
                "b": jax.random.uniform(
                    k2, (dims[i + 1],), jnp.float32, -bound, bound
                ),
            }
        )
    return params


def _mlp_forward(params, x):
    h = x
    for i, layer in enumerate(params):
        h = h @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            h = jax.nn.relu(h)
    return h


@dataclasses.dataclass
class OrthoNet:
    """Learned spectral embedding of a Laplacian (``orthonet.py:29-75``)."""

    input_dim: int
    hidden_dim: int
    output_dim: int
    epochs: int = 2000
    lr: float = 1e-3
    seed: int = 42

    def fit(self, x: np.ndarray, lap: np.ndarray) -> "OrthoNet":
        dims = _pyramid_dims(self.input_dim, self.hidden_dim, self.output_dim)
        params = _init_mlp(jax.random.key(self.seed), dims)
        l_mat = jnp.asarray(lap, jnp.float32)
        x_in = jnp.asarray(x, jnp.float32)
        m = math.sqrt(lap.shape[0])
        opt = optax.adam(self.lr)  # amsgrad variant of the reference
        opt_state = opt.init(params)

        def loss_fn(p):
            z = _mlp_forward(p, x_in)
            gram = z.T @ z
            r = jnp.linalg.cholesky(gram, upper=True)
            q = m * jnp.linalg.inv(r)
            y = z @ q
            return jnp.trace(y.T @ l_mat @ y)

        def step(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(grads, s, p)
            p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
            return (p, s), loss

        (params, _), losses = jax.lax.scan(
            jax.jit(step), (params, opt_state), None, length=self.epochs + 1
        )
        self.params = params
        self.history = np.asarray(losses)
        # final orthogonalizer Q from the trained net (orthonet.py:49-50)
        z = _mlp_forward(params, x_in)
        r = jnp.linalg.cholesky(z.T @ z, upper=True)
        self.q = m * jnp.linalg.inv(r)
        return self

    def predict(self, x: np.ndarray, orthogonal: bool = True) -> np.ndarray:
        out = _mlp_forward(self.params, jnp.asarray(x, jnp.float32))
        if orthogonal:
            out = out @ self.q
        return np.asarray(out)
