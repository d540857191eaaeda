"""End-to-end training harness tests on the 8-device CPU mesh:
debug-slice training drives the loss down, grad accumulation is exact,
checkpoints round-trip with their config, early stopping fires."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.data import loaders, synthetic
from audio_key_estimation_tpu.data.dataset import KeyDataset
from audio_key_estimation_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from audio_key_estimation_tpu.train import checkpoints as ckpt_lib
from audio_key_estimation_tpu.train.optim import make_optimizer
from audio_key_estimation_tpu.train.trainer import (Trainer, create_train_state,
                                                    evaluate, make_eval_step,
                                                    make_train_step)

import pytest

# compile-heavy module: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

CFG = Config(octaves=4, num_layers=2, conv_layers=1, n_filters=2,
             kernel_size=3, head_layers=1, batch_size=8, acc_grad=2,
             epochs=2, frames=5, bucket_sizes=(32,), early_stop_patience=2)


def _tiny_dataset(tmp_path, n=16, genre=False):
    keys = ["C major", "A minor", "G major", "D major"]
    songs = [(f"s{i}", 220.0 * 2 ** (i / 12), keys[i % 4], "techno")
             for i in range(n)]
    root = synthetic.make_giantsteps_corpus(str(tmp_path / "gs"), songs)
    ds = KeyDataset(genre=genre, cfg=CFG, blacklist_path="", use_cache=False)
    ds.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
    return ds


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_grad_accumulation_of_identical_microbatches(rng, tmp_path):
    """Accumulating the SAME microbatch twice must produce the identical
    parameter update as one step on it (averaged grads are the grad).
    Note grad-accum with fresh data is NOT bit-equal to a larger batch
    because BatchNorm normalizes per microbatch — exactly as in Lightning's
    accumulate_grad_batches."""
    cfg = CFG.replace(acc_grad=1, batch_size=4)
    optimizer = make_optimizer(cfg, 1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    mb = {
        "mel": rng.normal(size=(4, cfg.pitches, 32, 1)).astype(np.float32),
        "seq_length": np.full(4, 32, np.int32),
        "key_labels": np.eye(12, dtype=np.float32)[rng.integers(0, 12, 4)],
        "tonic_labels": np.eye(12, dtype=np.float32)[rng.integers(0, 12, 4)],
        "genre": np.zeros((4, 11), np.float32),
    }
    step1 = make_train_step(model, cfg, optimizer)
    s_one, _ = step1(state, {k: v[None] for k, v in mb.items()})

    _, state2 = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    step2 = make_train_step(model, cfg.replace(acc_grad=2), optimizer)
    s_two, _ = step2(state2, {k: np.stack([v, v]) for k, v in mb.items()})

    for x, y in zip(jax.tree_util.tree_leaves(s_one.params),
                    jax.tree_util.tree_leaves(s_two.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6)


def test_training_reduces_loss(tmp_path):
    ds = _tiny_dataset(tmp_path)
    trainer = Trainer(CFG.replace(epochs=4, no_ckpt=True), ds, ds,
                      use_mesh=True)
    state, history = trainer.fit(seed=0)
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    assert "val_mirex" in history[0]


def test_sharded_step_matches_single_device(tmp_path, rng):
    """DP over the 8-device CPU mesh == single-device math."""
    cfg = CFG.replace(acc_grad=1, batch_size=8)
    optimizer = make_optimizer(cfg, 1)
    model, state0 = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    step = make_train_step(model, cfg, optimizer)
    mel = rng.normal(size=(1, 8, cfg.pitches, 32, 1)).astype(np.float32)
    batch = {
        "mel": mel,
        "seq_length": np.full((1, 8), 32, np.int32),
        "key_labels": np.eye(12, dtype=np.float32)[rng.integers(0, 12, 8)][None],
        "tonic_labels": np.eye(12, dtype=np.float32)[rng.integers(0, 12, 8)][None],
        "genre": np.zeros((1, 8, 11), np.float32),
    }
    s_plain, m_plain = step(state0, batch)

    mesh = make_mesh()
    _, state1 = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    state1 = replicate(state1, mesh)
    sharded = shard_batch(batch, mesh, batch_dim=1)
    s_mesh, m_mesh = step(state1, sharded)
    # loss (pre-optimizer) must agree tightly; params only loosely — Adam's
    # first-step update is ~lr*sign(g), so cross-device reduction-order noise
    # on near-zero grads legitimately flips some updates by 2*lr.
    np.testing.assert_allclose(float(m_plain["loss"]), float(m_mesh["loss"]),
                               rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(s_plain.params),
                    jax.tree_util.tree_leaves(s_mesh.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2.1 * cfg.lr)


def test_checkpoint_roundtrip_with_config(tmp_path):
    cfg = CFG
    optimizer = make_optimizer(cfg, 1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(1), optimizer)
    run_dir = str(tmp_path / "version_0")
    os.makedirs(run_dir)
    ckpt_lib.save(run_dir, state, cfg)
    tree, cfg2 = ckpt_lib.load(run_dir)
    assert cfg2 == cfg
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(tree["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_masks_padded_samples(tmp_path):
    ds = _tiny_dataset(tmp_path, n=5)  # batch 8 -> 3 repeat-padded
    cfg = CFG
    optimizer = make_optimizer(cfg, 1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    eval_step = make_eval_step(model, cfg)
    out = evaluate(eval_step, state, ds, cfg.batch_size)
    assert out["num_samples"] == 5
    assert 0.0 <= out["mirex"] <= 1.0


def test_evaluate_mesh_inflight_and_repeat_pad(tmp_path):
    """The MAX_INFLIGHT sliding sync (trainer.py evaluate) combined with BOTH
    an 8-device mesh and a repeat-padded final batch: 35 songs at batch 8 is
    5 batches (> MAX_INFLIGHT=4, so the oldest-in-flight scalar fetch fires)
    with 5 padded rows in the last batch. The mesh run must agree with the
    single-device run on every aggregate."""
    ds = _tiny_dataset(tmp_path, n=35)
    cfg = CFG
    optimizer = make_optimizer(cfg, 1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), optimizer)
    eval_step = make_eval_step(model, cfg)
    plain = evaluate(eval_step, state, ds, cfg.batch_size)

    mesh = make_mesh()
    state_r = replicate(state, mesh)
    sharded = evaluate(eval_step, state_r, ds, cfg.batch_size, mesh=mesh)
    assert sharded["num_samples"] == plain["num_samples"] == 35
    for k in plain:
        np.testing.assert_allclose(plain[k], sharded[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


def test_multi_scale_training(tmp_path):
    """Two-resolution ensemble end to end: dataset produces mel2, the multi
    model trains one epoch (PitchClassNet_Multi capability,
    models.py:1118-1189, with the documented intended-behavior fixes)."""
    cfg = CFG.replace(multi_scale=True, epochs=1, no_ckpt=True,
                      batch_size=4, acc_grad=1)
    keys = ["C major", "A minor"]
    songs = [(f"ms{i}", 220.0 * 2 ** (i / 12), keys[i % 2], "techno")
             for i in range(4)]
    root = synthetic.make_giantsteps_corpus(str(tmp_path / "gs_ms"), songs)
    ds = KeyDataset(genre=False, cfg=cfg, blacklist_path="", use_cache=False)
    ds.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
    assert "mel2" in ds[0]
    assert ds[0]["mel2"].shape[0] == cfg.octaves * 12
    b = next(ds.batches(2))
    assert b["mel2"].shape[1] == cfg.octaves * 12
    trainer = Trainer(cfg, ds, ds, use_mesh=True)
    state, history = trainer.fit(seed=0)
    assert np.isfinite(history[0]["train_loss"])


def test_local_mode_training(tmp_path):
    """Per-window (local) key estimation trains end to end with frame-level
    masked loss (models.py:861-876 semantics)."""
    cfg = CFG.replace(local=True, loc_window_size=2, frames=5, epochs=1,
                      no_ckpt=True, batch_size=2, acc_grad=1,
                      bucket_sizes=(64,))
    root = synthetic.make_winterreise_corpus(
        str(tmp_path / "w"),
        [("P1", "S1", 440, "D:min"), ("P1", "S2", 330, "A:maj"),
         ("P2", "S1", 550, "C:maj"), ("P2", "S2", 660, "G:maj")],
        local_segments={
            "P1_S1": [(0.0, 5.0, "D:min"), (5.0, 10.0, "A:maj")],
            "P1_S2": [(0.0, 10.0, "A:maj")],
            "P2_S1": [(0.0, 10.0, "C:maj")],
            "P2_S2": [(0.0, 5.0, "G:maj"), (5.0, 10.0, "D:maj")]},
        seconds=10.5)
    ds = KeyDataset(genre=False, cfg=cfg, blacklist_path="", use_cache=False)
    ds.import_data(loaders.SchubertWinterreiseLoader(str(tmp_path / "w"),
                                                     local=True),
                   progress=False)
    trainer = Trainer(cfg, ds, ds, use_mesh=True)
    state, history = trainer.fit(seed=0)
    assert np.isfinite(history[0]["train_loss"])
    assert "val_mirex" in history[0]


def test_remat_flag_trains(tmp_path):
    ds = _tiny_dataset(tmp_path, n=8)
    cfg = CFG.replace(remat=True, epochs=1, no_ckpt=True, batch_size=4,
                      acc_grad=2)
    trainer = Trainer(cfg, ds, ds, use_mesh=False)
    state, history = trainer.fit(seed=0)
    assert np.isfinite(history[0]["train_loss"])


def test_resume_training(tmp_path):
    """Mid-training resume: interrupt after 2 epochs, resume to 4; the
    resumed run continues from epoch 2 (full state incl. optimizer)."""
    ds = _tiny_dataset(tmp_path, n=16)
    log_dir = str(tmp_path / "run")
    cfg = CFG.replace(epochs=2, early_stop_patience=100)
    t1 = Trainer(cfg, ds, ds, log_dir=log_dir)
    t1.fit(seed=0)
    assert os.path.exists(os.path.join(log_dir, "last_state.msgpack"))
    cfg4 = cfg.replace(epochs=4)
    t2 = Trainer(cfg4, ds, ds, log_dir=log_dir)
    state, history = t2.fit(seed=0, resume=True)
    assert [h["epoch"] for h in history] == [2, 3]


def test_local_mode_genre_training_and_accuracy(tmp_path):
    """Local mode with a genre head: per-frame genre CE enters the loss and
    eval reports a masked per-frame genre accuracy (intended behavior of
    reference models.py:874-875, 905-910)."""
    cfg = CFG.replace(local=True, loc_window_size=2, frames=5, epochs=1,
                      genre=True, no_ckpt=True, batch_size=2, acc_grad=1,
                      bucket_sizes=(64,))
    root = synthetic.make_winterreise_corpus(
        str(tmp_path / "w"),
        [("P1", "S1", 440, "D:min"), ("P1", "S2", 330, "A:maj")],
        local_segments={
            "P1_S1": [(0.0, 5.0, "D:min"), (5.0, 10.0, "A:maj")],
            "P1_S2": [(0.0, 10.0, "A:maj")]},
        seconds=10.5)
    ds = KeyDataset(genre=True, cfg=cfg, blacklist_path="", use_cache=False)
    ds.import_data(loaders.SchubertWinterreiseLoader(str(tmp_path / "w"),
                                                     local=True),
                   progress=False)
    trainer = Trainer(cfg, ds, ds, use_mesh=False)
    state, history = trainer.fit(seed=0)
    assert np.isfinite(history[0]["train_loss"])
    assert "val_accuracy_genre" in history[0]
    assert 0.0 <= history[0]["val_accuracy_genre"] <= 1.0


def test_dropout_flag_trains_dense_blocks(tmp_path):
    """Config.drop wires F.dropout into the dense layers (models.py:516-517);
    training with drop>0 runs (dropout rng threaded through the scan) and
    eval is deterministic."""
    ds = _tiny_dataset(tmp_path, n=8)
    cfg = CFG.replace(denseblock=True, drop=0.5, epochs=1, no_ckpt=True,
                      batch_size=4, acc_grad=2)
    trainer = Trainer(cfg, ds, ds, use_mesh=False)
    state, history = trainer.fit(seed=0)
    assert np.isfinite(history[0]["train_loss"])
    # eval path ignores dropout: two evaluations agree exactly
    ev = make_eval_step(trainer.model, cfg)
    b = next(ds.batches(4))
    b.pop("valid")
    l1, _ = ev(state, b)
    l2, _ = ev(state, b)
    assert float(l1) == float(l2)


def test_window_size_mode_end_to_end(tmp_path):
    """frames=0 (window_size) mode end-to-end: the per-file hop rule
    (hop = len // window_size + 1, KeyDataset.py:485-499) takes a
    different, non-batchable preprocessing path (dataset.py groups by
    (sr, len)); features must come out truncated to exactly window_size
    frames and train + eval must run finite on them."""
    ws = 24
    cfg = CFG.replace(frames=0, window_size=ws, bucket_sizes=(ws,),
                      epochs=1, acc_grad=1, batch_size=4, no_ckpt=True)
    keys = ["C major", "A minor", "G major", "D major"]
    root = str(tmp_path / "gs")
    # two generations with different durations -> per-file hops differ
    synthetic.make_giantsteps_corpus(
        root, [(f"a{i}", 220.0 * 2 ** (i / 12), keys[i % 4], "techno")
               for i in range(4)], seconds=2.0)
    synthetic.make_giantsteps_corpus(
        root, [(f"b{i}", 260.0 * 2 ** (i / 12), keys[i % 4], "techno")
               for i in range(4)], seconds=3.1)
    ds = KeyDataset(genre=False, cfg=cfg, blacklist_path="", use_cache=False)
    ds.import_data(loaders.GiantStepsKeyLoader(root), progress=False)
    assert len(ds) == 8
    for item in ds.items:
        assert item["mel"].shape[1] <= ws  # truncated to window_size
    assert ds.seq_length_max <= ws
    trainer = Trainer(cfg, ds, ds, use_mesh=False)
    state, history = trainer.fit(seed=0)
    assert np.isfinite(history[0]["train_loss"])
    assert np.isfinite(history[0]["val_loss"])
    assert 0.0 <= history[0]["val_mirex"] <= 1.0


def test_optimizer_matches_torch_adam_exponential_lr(rng):
    """make_optimizer == torch.optim.Adam(weight_decay) + ExponentialLR.

    Pins the three drift-prone semantics (train/optim.py vs
    models.py:1017-1027): L2 applied INTO the gradient before the moment
    updates (torch Adam's weight_decay, not decoupled AdamW), Adam bias
    correction, and the per-EPOCH staircase schedule alignment (epoch e
    trains at lr*gamma^e; the scheduler steps at epoch end).
    """
    import torch
    import optax

    lr, gamma, reg = 3e-4, 0.5, 1e-2
    steps_per_epoch, n_epochs = 3, 3
    shapes = [(4, 3), (7,), (2, 2, 2)]
    params0 = [rng.normal(size=s) for s in shapes]
    grads = [[rng.normal(size=s) for s in shapes]
             for _ in range(steps_per_epoch * n_epochs)]

    # torch side
    tparams = [torch.tensor(p, dtype=torch.float64, requires_grad=True)
               for p in params0]
    topt = torch.optim.Adam(tparams, lr=lr, betas=(0.9, 0.999),
                            weight_decay=reg)
    tsched = torch.optim.lr_scheduler.ExponentialLR(topt, gamma=gamma)
    it = iter(grads)
    for _ in range(n_epochs):
        for _ in range(steps_per_epoch):
            g = next(it)
            for p, gi in zip(tparams, g):
                p.grad = torch.tensor(gi, dtype=torch.float64)
            topt.step()
        tsched.step()

    # jax side
    cfg = Config(lr=lr, gamma=gamma, reg=reg)
    opt = make_optimizer(cfg, steps_per_epoch)
    jparams = [jnp.asarray(p) for p in params0]
    state = opt.init(jparams)
    for g in grads:
        updates, state = opt.update([jnp.asarray(x) for x in g], state,
                                    jparams)
        jparams = optax.apply_updates(jparams, updates)

    # 1e-9: optax and torch compute the algebraically identical update with
    # different association (bias-correction folded into the step size vs
    # applied to m/v), leaving ~1e-11 fp noise; semantic drift (decay
    # ordering, schedule off-by-one) shows at >= 1e-5.
    for tp, jp in zip(tparams, jparams):
        np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                                   rtol=1e-9, atol=1e-9)
