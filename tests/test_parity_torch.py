"""Activation parity vs a pinned PyTorch reference.

The BASELINE target demands per-layer ``allclose`` against the PyTorch
reference under the compat flag.  The reference model is
``nn.TransformerEncoder(nn.TransformerEncoderLayer(d, nhead=1, ff, dropout),
T)`` fed ``[N, K+1, d]`` — which torch (batch_first=False) reads as
(seq=N, batch=K+1, emb=d), the SURVEY §3.1 axis quirk.  We copy torch weights
into our pytrees and compare both the intended neighborhood axis and the
quirk-compat node axis, deterministically (dropout off).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_transformer_tpu.ops.attention import (  # noqa: E402
    multihead_attention,
    neighborhood_encoder,
    transformer_encoder,
)
from graph_transformer_tpu.utils.torch_compat import (  # noqa: E402
    encoder_params_from_torch_encoder,
    mha_params_from_torch,
)


def _torch_encoder(d_model=16, ff=32, T=2, nhead=1, seed=0):
    torch.manual_seed(seed)
    layer = torch.nn.TransformerEncoderLayer(
        d_model=d_model, nhead=nhead, dim_feedforward=ff, dropout=0.5
    )
    enc = torch.nn.TransformerEncoder(layer, T)
    enc.eval()
    return enc


def test_encoder_layer_parity():
    d, ff, T = 16, 32, 2
    enc = _torch_encoder(d, ff, T)
    params = encoder_params_from_torch_encoder(enc)

    x = np.random.RandomState(0).randn(6, 5, d).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(x)).numpy()  # torch: (S=6, B=5, E)
    # our encoder treats dim0 as batch and dim1 as sequence; torch treats
    # dim0 as sequence and dim1 as batch — transpose to match
    got = np.asarray(
        transformer_encoder(params, jnp.asarray(x.transpose(1, 0, 2)), rng=None)
    ).transpose(1, 0, 2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_multihead_attention_parity():
    d = 16
    torch.manual_seed(1)
    mha = torch.nn.MultiheadAttention(d, num_heads=1)
    mha.eval()
    params = mha_params_from_torch(mha)
    x = np.random.RandomState(1).randn(4, 3, d).astype(np.float32)
    with torch.no_grad():
        want, _ = mha(*[torch.from_numpy(x)] * 3)  # (S=4, B=3, E)
    got = np.asarray(
        multihead_attention(params, jnp.asarray(x.transpose(1, 0, 2)))
    ).transpose(1, 0, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=2e-5)


def test_axis_quirk_compat():
    """axis='node' must reproduce torch fed [N, K+1, d] directly
    (``pytorch_U2GNN_Sup.py:32-37``: encode then keep slot 0)."""
    d, ff, T, N, K1 = 8, 16, 2, 10, 5
    enc = _torch_encoder(d, ff, T, seed=2)
    params = encoder_params_from_torch_encoder(enc)
    x = np.random.RandomState(2).randn(N, K1, d).astype(np.float32)
    with torch.no_grad():
        full = enc(torch.from_numpy(x)).numpy()
    want = full[:, 0, :]  # torch.split(dim=1)[0] squeezed
    got = np.asarray(
        neighborhood_encoder(params, jnp.asarray(x), rng=None, axis="node")
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_neighborhood_axis_matches_intended_semantics():
    """axis='neighborhood' == torch with batch_first=True (seq = K+1)."""
    d, ff, T, N, K1 = 8, 16, 1, 10, 5
    enc = _torch_encoder(d, ff, T, seed=3)
    params = encoder_params_from_torch_encoder(enc)
    x = np.random.RandomState(3).randn(N, K1, d).astype(np.float32)
    with torch.no_grad():
        # transpose so torch sees (seq=K+1, batch=N, emb)
        full = enc(torch.from_numpy(x.transpose(1, 0, 2))).numpy()
    want = full[0]  # self slot
    got = np.asarray(
        neighborhood_encoder(params, jnp.asarray(x), rng=None, axis="neighborhood")
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sup_model_forward_parity_deterministic(mutag):
    """Full supervised forward vs an independent torch re-implementation of
    the documented reference semantics (``pytorch_U2GNN_Sup.py:30-46``),
    dropout off, shared weights, node-axis compat mode."""
    from graph_transformer_tpu.config import ModelConfig
    from graph_transformer_tpu.data.batching import BatchBuilder
    from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup, U2GNNSupParams

    d = mutag.feature_dim
    ff, T, k, C = 16, 2, 2, mutag.num_classes
    bb = BatchBuilder(mutag, batch_size=4, num_neighbors=4, seed=0)
    batch = bb.build([0, 1, 2, 3])
    n_real = int(np.asarray(batch.node_mask).sum())

    encs = [_torch_encoder(d, ff, T, seed=10 + i) for i in range(k)]
    torch.manual_seed(99)
    heads = [torch.nn.Linear(d, C) for _ in range(k)]

    cfg = ModelConfig(
        num_timesteps=T, num_hidden_layers=k, ff_hidden_size=ff,
        attention_axis="node",
    )
    model = U2GNNSup(d, C, cfg)
    params = U2GNNSupParams(
        encoders=tuple(encoder_params_from_torch_encoder(e) for e in encs),
        head_w=jnp.asarray(
            np.stack([h.weight.detach().numpy().T for h in heads])
        ),
        head_b=jnp.asarray(np.stack([h.bias.detach().numpy() for h in heads])),
    )
    got = np.asarray(model.apply(params, batch, rng=None))

    # torch reference semantics on the unpadded batch
    x = torch.from_numpy(np.asarray(batch.x)[:n_real])
    neigh = torch.from_numpy(np.asarray(batch.neigh)[:n_real].astype(np.int64))
    gid = np.asarray(batch.graph_id)[:n_real]
    pool = np.zeros((4, n_real), np.float32)
    pool[gid, np.arange(n_real)] = 1.0
    pool_t = torch.from_numpy(pool)
    with torch.no_grad():
        input_tr = torch.nn.functional.embedding(neigh, x)
        scores = torch.zeros(4, C)
        for i in range(k):
            out = encs[i](input_tr)[:, 0, :]  # split(dim=1)[0] — node axis
            input_tr = torch.nn.functional.embedding(neigh, out)
            graph_emb = pool_t @ out
            scores = scores + heads[i](graph_emb)
    np.testing.assert_allclose(got, scores.numpy(), rtol=5e-4, atol=5e-4)
