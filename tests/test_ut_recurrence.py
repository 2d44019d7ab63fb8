"""Universal-Transformer recurrence variants (ops/ut_recurrence.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_transformer_tpu.ops.attention import (
    init_encoder_params,
    transformer_encoder,
)
from graph_transformer_tpu.ops.ut_recurrence import (
    ACTParams,
    act_encoder,
    gru_step,
    highway_step,
    init_recurrence_params,
)

B, S, D, F, T = 3, 5, 8, 16, 3


def _enc():
    return init_encoder_params(jax.random.key(0), 1, D, F)


def _x():
    return jax.random.normal(jax.random.key(1), (B, S, D))


def test_init_dispatch():
    assert init_recurrence_params(jax.random.key(0), "basic", D) is None
    assert init_recurrence_params(jax.random.key(0), "skip", D) is None
    hw = init_recurrence_params(jax.random.key(0), "highway", D)
    assert hw.w_state.shape == (D, D)
    gru = init_recurrence_params(jax.random.key(0), "gru", D)
    assert gru.w_z.shape == (2 * D, D)
    lstm = init_recurrence_params(jax.random.key(0), "lstm", D)
    assert lstm.w_i.shape == (2 * D, D)
    assert float(lstm.b_f[0]) == 1.0  # forget-bias init
    dwa = init_recurrence_params(jax.random.key(0), "dwa", D)
    assert dwa.w_q.shape == (D, D)
    act = init_recurrence_params(jax.random.key(0), "act", D)
    assert act.w_halt.shape == (D,)
    with pytest.raises(ValueError):
        init_recurrence_params(jax.random.key(0), "nope", D)


def test_highway_gate_blends():
    p = init_recurrence_params(jax.random.key(0), "highway", D)
    state, out = _x(), _x() + 1.0
    h = highway_step(p, state, out)
    assert h.shape == state.shape
    lo = jnp.minimum(state, out) - 1e-4
    hi = jnp.maximum(state, out) + 1e-4
    assert bool(jnp.all((h >= lo) & (h <= hi)))  # convex blend


def test_gru_step_shapes_and_grad():
    p = init_recurrence_params(jax.random.key(0), "gru", D)
    state, out = _x(), _x() * 0.5

    def f(pp):
        return jnp.sum(gru_step(pp, state, out) ** 2)

    g = jax.grad(f)(p)
    assert g.w_z.shape == p.w_z.shape
    assert np.isfinite(float(f(p)))


@pytest.mark.parametrize("kind", ["basic", "skip", "highway", "gru", "lstm", "dwa", "act"])
def test_encoder_all_recurrences(kind):
    enc = _enc()
    rec = init_recurrence_params(jax.random.key(2), kind, D)
    out = transformer_encoder(
        enc, _x(), num_heads=1, dropout_rate=0.0, rng=None,
        num_timesteps=T, recurrence=kind, rec_params=rec)
    assert out.shape == (B, S, D)
    assert np.all(np.isfinite(np.asarray(out)))

    # gradients flow to encoder AND recurrence params
    def loss(e, r):
        return jnp.sum(transformer_encoder(
            e, _x(), dropout_rate=0.0, rng=None, num_timesteps=T,
            recurrence=kind, rec_params=r) ** 2)

    ge, gr = jax.grad(loss, argnums=(0, 1))(enc, rec)
    assert float(jnp.abs(ge.w_in).sum()) > 0
    if rec is not None:
        leaves = jax.tree_util.tree_leaves(gr)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_act_halts_immediately_with_large_bias():
    x = _x()
    p = ACTParams(w_halt=jnp.zeros((D,)), b_halt=jnp.asarray(20.0))
    calls = []

    def layer_fn(state, t):
        calls.append(t)
        return state + 1.0

    out, ponder = act_encoder(layer_fn, x, p, max_steps=4)
    # halting prob sigma(20) ~ 1 -> everything halts at the first step
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) + 1.0, rtol=1e-5)
    assert float(ponder) == pytest.approx(2.0, abs=1e-3)  # N=1 + remainder 1


def test_act_uses_all_steps_with_large_negative_bias():
    x = _x()
    p = ACTParams(w_halt=jnp.zeros((D,)), b_halt=jnp.asarray(-20.0))
    out, ponder = act_encoder(lambda s, t: s + 1.0, x, p, max_steps=4)
    # never halts voluntarily: remainder forces the last step's state
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) + 4.0, rtol=1e-5)
    assert float(ponder) == pytest.approx(5.0, abs=1e-2)  # 4 updates + rem 1


def test_sup_model_with_gru_recurrence(mutag):
    from graph_transformer_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from graph_transformer_tpu.train.sup_trainer import SupTrainer

    cfg = ExperimentConfig(
        data=DataConfig(dataset="MUTAG", batch_size=8, num_neighbors=4),
        model=ModelConfig(num_timesteps=2, num_hidden_layers=1,
                          ff_hidden_size=16, recurrence="gru"),
        train=TrainConfig(num_epochs=1),
    )
    t = SupTrainer(mutag, cfg)
    # weight tying is implied by the non-basic recurrence
    assert t.params.encoders[0].w_in.shape[0] == 1
    loss = t.train_epoch()
    assert np.isfinite(loss)


def test_act_ponder_trains_in_sup_trainer():
    """The ACT ponder cost is part of the training loss (t2t act_loss,
    universal_transformer_modified.py:343): grads reach the halting unit
    and training still converges."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from graph_transformer_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from graph_transformer_tpu.data.tu import load_tu_dataset
    from graph_transformer_tpu.ops.losses import (
        label_smoothing, soft_cross_entropy,
    )
    from graph_transformer_tpu.train.sup_trainer import SupTrainer

    ds = load_tu_dataset("MUTAG")
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, num_neighbors=4),
        model=ModelConfig(num_timesteps=3, num_hidden_layers=1,
                          ff_hidden_size=32, recurrence="act",
                          act_loss_weight=0.01),
        train=TrainConfig(num_epochs=1),
    )
    tr = SupTrainer(ds, cfg, train_idx=np.arange(32), test_idx=np.arange(8))
    batch = tr.builder.sample()

    # grads flow to the ACT halting unit
    def loss(p):
        scores, ponder = tr.model.apply(p, batch, rng=jax.random.key(0),
                                        return_ponder=True)
        targets = label_smoothing(batch.labels, ds.num_classes, 0.1)
        return soft_cross_entropy(scores, targets) + 0.01 * ponder

    g = jax.grad(loss)(tr.params)
    assert float(jnp.abs(g.rec[0].w_halt).max()) > 0.0

    # ponder is within (0, T]
    _, ponder = tr.model.apply(tr.params, batch, rng=None, return_ponder=True)
    assert 0.0 < float(ponder) <= 3.0 + 1e-6

    # one epoch trains (loss finite, decreasing trend not required in 1 ep)
    l0 = tr.train_epoch()
    assert np.isfinite(l0)
