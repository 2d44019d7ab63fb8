"""Folded-lane encoder (ops/pallas_folded): selector invariants on the
host, interpret-mode fwd/grad parity vs the f32 reference at rate 0 (the
rate>0 PRNG paths are chip-gated like the other kernels and validated by
scripts/bench_folded.py + the CV parity gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_transformer_tpu.ops.pallas_folded import (
    fold_rows,
    folded_selectors,
    folded_u2gnn_encoder,
    folded_u2gnn_encoder_grad,
    unfold_rows,
)
from graph_transformer_tpu.ops.pallas_u2gnn import (
    fused_u2gnn_encoder_reference,
)

S, D, F, T = 5, 4, 32, 2


def mk(n=24, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n * S, D)), jnp.bfloat16)
    params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
        for s in [(T, D, 3 * D), (T, 3 * D), (T, D, D), (T, D), (T, D),
                  (T, D), (T, D, F), (T, F), (T, F, D), (T, D), (T, D),
                  (T, D)]
    )
    w = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    return x, params, w


def test_selectors_express_attention_exactly():
    """The expand-multiply-reduce path must equal einsum attention: for
    random q, k the folded scores match q·k per (group, i, j)."""
    e_q, e_k, r_s, a_e, r_c, b_sum, m_mean = folded_selectors(S, D)
    rng = np.random.default_rng(1)
    g = 7
    q = rng.standard_normal((g, S, D)).astype(np.float32)
    k = rng.standard_normal((g, S, D)).astype(np.float32)
    qf = q.reshape(g, S * D)
    kf = k.reshape(g, S * D)
    s_folded = ((qf @ e_q) * (kf @ e_k)) @ r_s
    s_ref = np.einsum("gid,gjd->gij", q, k).reshape(g, S * S)
    np.testing.assert_allclose(s_folded, s_ref, rtol=1e-5, atol=1e-5)
    # ctx path: (attn expand ⊙ v expand) @ r_c == attn @ v
    attn = rng.standard_normal((g, S * S)).astype(np.float32)
    v = rng.standard_normal((g, S, D)).astype(np.float32)
    ctx_folded = ((attn @ a_e) * (v.reshape(g, S * D) @ e_k)) @ r_c
    ctx_ref = np.einsum(
        "gij,gjd->gid", attn.reshape(g, S, S), v).reshape(g, S * D)
    np.testing.assert_allclose(ctx_folded, ctx_ref, rtol=1e-5, atol=1e-5)
    # block-sum and block-mean act within 9-blocks only
    e = rng.standard_normal((g, S * S)).astype(np.float32)
    bs = e @ b_sum
    for i in range(S):
        blk = e[:, i * S:(i + 1) * S].sum(axis=1, keepdims=True)
        np.testing.assert_allclose(
            bs[:, i * S:(i + 1) * S], np.tile(blk, (1, S)), rtol=1e-5)


def test_fold_unfold_roundtrip():
    x = jnp.arange(24 * S * D, dtype=jnp.float32).reshape(24 * S, D)
    np.testing.assert_array_equal(
        np.asarray(unfold_rows(fold_rows(x, S), S)), np.asarray(x))


def test_folded_fwd_matches_reference():
    x, params, _ = mk()
    n = x.shape[0] // S
    ref = fused_u2gnn_encoder_reference(x.reshape(n, S, D), params, T)
    got = folded_u2gnn_encoder(x, params, None, S, T, 0.0, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_folded_grad_matches_reference():
    x, params, w = mk()
    n = x.shape[0] // S
    gr = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder_reference(x.reshape(n, S, D), p, T) * w)
    )(params)
    gf = jax.grad(lambda p: jnp.sum(
        folded_u2gnn_encoder_grad(x, p, None, S, T, 0.0, 8, True) * w)
    )(params)
    # relu-boundary units flip under bf16 (the kernel's compute dtype):
    # a handful of elements carry O(0.2) deltas while the gradient as a
    # whole matches — check near-unit cosine + a bounded outlier count
    na = nb = dot = 0.0
    outliers = total = 0
    for a, b in zip(gr, gf):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        dot += float(a @ b)
        na += float(a @ a)
        nb += float(b @ b)
        outliers += int((np.abs(a - b) > 0.1).sum())
        total += a.size
    assert dot / np.sqrt(na * nb) > 0.999
    assert outliers <= max(2, total // 50)


def test_folded_grad_dx_matches_reference():
    x, params, w = mk()
    n = x.shape[0] // S
    gxr = jax.grad(lambda xx: jnp.sum(
        fused_u2gnn_encoder_reference(
            xx.reshape(n, S, D).astype(jnp.float32), params, T) * w)
    )(x.astype(jnp.float32))
    gxf = jax.grad(lambda xx: jnp.sum(
        folded_u2gnn_encoder_grad(xx, params, None, S, T, 0.0, 8, True)
        * w))(x)
    np.testing.assert_allclose(np.asarray(gxf, np.float32),
                               np.asarray(gxr, np.float32),
                               rtol=0.15, atol=0.15)


def test_unsup_fused_folded_loss_runs_on_tpu():
    """The unsup trainer's fused sampled path (round 5): loss finite and
    the embedding table trains; TPU-gated (the sampler needs the on-core
    PRNG)."""
    from graph_transformer_tpu.ops.pallas_ffn import on_tpu

    if not on_tpu():
        pytest.skip("sampler needs the TPU PRNG")
    from graph_transformer_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from graph_transformer_tpu.data.tu import load_tu_dataset
    from graph_transformer_tpu.train.unsup_trainer import UnsupTrainer

    ds = load_tu_dataset("MUTAG")
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=4, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1,
                          ff_hidden_size=64, sampled_num=32,
                          use_pallas=True, use_pallas_whole_encoder=True,
                          use_fused_sampler=True, use_folded=True,
                          compute_dtype="bfloat16"),
        train=TrainConfig(num_epochs=1),
    )
    tr = UnsupTrainer(ds, cfg)
    assert tr._tag_table is not None
    loss = tr.train_epoch()
    assert np.isfinite(loss)
