"""On-device batch assembly parity + whole-CV-in-one-dispatch smoke."""

import numpy as np
import pytest

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.batching import BatchBuilder
from graph_transformer_tpu.data.device_batcher import DeviceDataset, assemble_batch
from graph_transformer_tpu.train.cv_ondevice import run_cv_on_device


def test_assemble_batch_matches_host_builder(mutag, rng):
    builder = BatchBuilder(mutag, batch_size=4, num_neighbors=4, backend="numpy")
    dd = DeviceDataset.from_dataset(mutag)
    for _ in range(5):
        gids = rng.choice(mutag.num_graphs, size=4, replace=False)
        host = builder.build(gids)
        dev = assemble_batch(dd, np.asarray(gids, np.int32), builder.n_pad)
        np.testing.assert_allclose(np.asarray(dev.x), host.x)
        np.testing.assert_array_equal(np.asarray(dev.graph_id), host.graph_id)
        np.testing.assert_array_equal(np.asarray(dev.node_gidx), host.node_gidx)
        np.testing.assert_array_equal(np.asarray(dev.node_mask), host.node_mask)
        np.testing.assert_array_equal(np.asarray(dev.labels), host.labels)


def test_full_cv_one_dispatch(mutag):
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1, ff_hidden_size=32),
        train=TrainConfig(num_epochs=4, learning_rate=5e-4),
    )
    from graph_transformer_tpu.data.splits import stratified_kfold_indices

    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:2]
    best, mean, std, eloss, eacc = run_cv_on_device(
        mutag, cfg, folds=folds, return_history=True
    )
    assert best.shape == (2,)
    assert eloss.shape == (4, 2) and eacc.shape == (4, 2)
    assert np.all(np.isfinite(eloss))
    assert np.all((best >= 0) & (best <= 1))
    # training works: loss drops over the 4 epochs in every fold
    assert np.all(eloss[-1] < eloss[0])
    # best-accuracy carry is the running max of the eval trajectory
    assert np.allclose(best, eacc.max(axis=0))


def test_full_cv_sharded_folds_matches_unsharded(mutag):
    """The one-dispatch CV with the fold axis over a 2-device mesh must
    reproduce the single-device run (identical program, identical RNG)."""
    import jax

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1, ff_hidden_size=32),
        train=TrainConfig(num_epochs=3, learning_rate=5e-4),
    )
    from graph_transformer_tpu.data.splits import stratified_kfold_indices

    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:2]
    base, base_mean, _ = run_cv_on_device(mutag, cfg, folds=folds)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
    accs, mean, _ = run_cv_on_device(mutag, cfg, folds=folds, mesh=mesh)
    assert np.allclose(accs, base, atol=1e-6)
    assert mean == pytest.approx(base_mean, abs=1e-6)


def test_chunked_dispatch_matches_single_dispatch(mutag):
    """Chunking the epoch scan (carry kept on device between dispatches)
    must reproduce the single-dispatch run exactly: same per-epoch losses,
    accuracies, and best accuracies."""
    from graph_transformer_tpu.data.splits import stratified_kfold_indices

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1,
                          ff_hidden_size=32),
        train=TrainConfig(num_epochs=4, learning_rate=5e-4),
    )
    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:2]
    one = run_cv_on_device(
        mutag, cfg, folds=folds, return_history=True, epochs_per_dispatch=4
    )
    chunked = run_cv_on_device(
        mutag, cfg, folds=folds, return_history=True, epochs_per_dispatch=2
    )
    np.testing.assert_allclose(chunked[0], one[0])  # best accs
    np.testing.assert_allclose(chunked[3], one[3], rtol=1e-6)  # losses
    np.testing.assert_allclose(chunked[4], one[4])  # accuracies


def test_use_pallas_fold_vmaps(mutag):
    """use_pallas now fold-vmaps: the kernels' dropout seed is a regular
    (1,1) input, not scalar-prefetch, so vmap folds the fold axis into the
    kernel grid (round-2 guard d55a3fa removed).  Off-TPU this exercises the
    interpret-mode kernel under vmap on the deterministic (eval) path; the
    training path falls back to XLA off-TPU (dropout needs the TPU PRNG)."""
    from graph_transformer_tpu.data.splits import stratified_kfold_indices
    from graph_transformer_tpu.train.tenfold_vmap import TenfoldVmapRunner

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1,
                          ff_hidden_size=32, use_pallas=True),
        train=TrainConfig(num_epochs=1),
    )
    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:2]
    runner = TenfoldVmapRunner(mutag, cfg, folds=folds)
    best, _, _ = runner.run()
    assert best.shape == (2,)
    assert np.all(best >= 0.0) and np.all(best <= 1.0)


def test_checkpoint_resume_bitexact(mutag, tmp_path):
    """Chunk-boundary checkpointing: a run resumed from the chunk-1
    snapshot reproduces the uninterrupted run bit-for-bit (RNG keys derive
    from absolute epoch indices, so resume is invisible to training)."""
    from graph_transformer_tpu.data.splits import stratified_kfold_indices

    pytest.importorskip("orbax.checkpoint")
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1,
                          ff_hidden_size=32),
        train=TrainConfig(num_epochs=4, learning_rate=5e-4),
    )
    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:2]

    # uninterrupted reference (2 chunks, no checkpointing)
    ref = run_cv_on_device(mutag, cfg, folds=folds, return_history=True,
                           epochs_per_dispatch=2)

    # run 1 with checkpointing: saves the carry after chunk 0
    ckpt = str(tmp_path / "cv_ckpt")
    first = run_cv_on_device(mutag, cfg, folds=folds, return_history=True,
                             epochs_per_dispatch=2, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(first[0], ref[0])

    # run 2 resumes from the chunk-0 snapshot ("killed" after chunk 0) and
    # must reproduce the uninterrupted histories exactly
    resumed = run_cv_on_device(mutag, cfg, folds=folds, return_history=True,
                               epochs_per_dispatch=2, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(resumed[0], ref[0])  # best accs
    np.testing.assert_array_equal(resumed[3], ref[3])  # epoch losses
    np.testing.assert_array_equal(resumed[4], ref[4])  # epoch accs
