"""Import torch-convention weights into our parameter pytrees.

For the activation-parity harness (BASELINE.md: per-layer ``allclose`` vs the
PyTorch reference under a compat flag).  Torch linear layers store weights as
``[out, in]`` acting by ``x @ W.T``; our convention is ``[in, out]`` acting by
``x @ W`` — so every matrix transposes on the way in.  Torch's
``nn.MultiheadAttention`` packs q,k,v as ``in_proj_weight [3D, D]``; our
``w_in`` is ``[D, 3D]``.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from graph_transformer_tpu.ops.attention import MHAParams, TransformerEncoderParams


def _t(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).T)


def encoder_params_from_torch_layers(layers: Sequence[dict]) -> TransformerEncoderParams:
    """Build encoder params from per-layer dicts of torch tensors/arrays.

    Each dict must carry the state of one ``nn.TransformerEncoderLayer``:
    ``in_proj_weight [3D,D]``, ``in_proj_bias [3D]``, ``out_proj.weight``,
    ``out_proj.bias``, ``linear1.weight [F,D]``, ``linear1.bias``,
    ``linear2.weight [D,F]``, ``linear2.bias``, ``norm1.weight/bias``,
    ``norm2.weight/bias``.
    """
    def stack(key, transpose=False):
        vals = [np.asarray(l[key]) for l in layers]
        if transpose:
            vals = [_t(v) for v in vals]
        return jnp.asarray(np.stack(vals))

    return TransformerEncoderParams(
        w_in=stack("in_proj_weight", transpose=True),
        b_in=stack("in_proj_bias"),
        w_out=stack("out_proj.weight", transpose=True),
        b_out=stack("out_proj.bias"),
        w_ff1=stack("linear1.weight", transpose=True),
        b_ff1=stack("linear1.bias"),
        w_ff2=stack("linear2.weight", transpose=True),
        b_ff2=stack("linear2.bias"),
        ln1_scale=stack("norm1.weight"),
        ln1_bias=stack("norm1.bias"),
        ln2_scale=stack("norm2.weight"),
        ln2_bias=stack("norm2.bias"),
    )


def encoder_params_from_torch_encoder(encoder) -> TransformerEncoderParams:
    """From a live ``torch.nn.TransformerEncoder`` module."""
    layers = []
    for layer in encoder.layers:
        sd = {k: v.detach().cpu().numpy() for k, v in layer.state_dict().items()}
        layers.append(
            {
                "in_proj_weight": sd["self_attn.in_proj_weight"],
                "in_proj_bias": sd["self_attn.in_proj_bias"],
                "out_proj.weight": sd["self_attn.out_proj.weight"],
                "out_proj.bias": sd["self_attn.out_proj.bias"],
                "linear1.weight": sd["linear1.weight"],
                "linear1.bias": sd["linear1.bias"],
                "linear2.weight": sd["linear2.weight"],
                "linear2.bias": sd["linear2.bias"],
                "norm1.weight": sd["norm1.weight"],
                "norm1.bias": sd["norm1.bias"],
                "norm2.weight": sd["norm2.weight"],
                "norm2.bias": sd["norm2.bias"],
            }
        )
    return encoder_params_from_torch_layers(layers)


def mha_params_from_torch(mha) -> MHAParams:
    """From a live ``torch.nn.MultiheadAttention`` module."""
    sd = {k: v.detach().cpu().numpy() for k, v in mha.state_dict().items()}
    return MHAParams(
        w_in=jnp.asarray(_t(sd["in_proj_weight"])),
        b_in=jnp.asarray(sd["in_proj_bias"]),
        w_out=jnp.asarray(_t(sd["out_proj.weight"])),
        b_out=jnp.asarray(sd["out_proj.bias"]),
    )
