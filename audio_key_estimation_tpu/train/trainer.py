"""Training/eval harness: jitted steps, grad accumulation, DP mesh, early
stopping and best-on-val-MIREX checkpointing.

Replaces the reference's PyTorch-Lightning wiring (models.py:819-1027,
train_model.py:110-124) with a functional JAX loop:

 * `train_step` — value_and_grad over a lax.scan of `acc_grad` microbatches
   (the reference's Trainer(accumulate_grad_batches=8)), Adam update,
   BatchNorm running-stat carry; jitted once, batch sharded over the mesh's
   'data' axis so XLA all-reduces grads over ICI.
 * `eval_step` — eval-mode forward + loss + per-sample MIREX categories.
 * `Trainer.fit` — epoch loop, per-epoch validation, EarlyStopping
   (val_loss, patience, min mode — train_model.py:110), manual best-model
   save on improved val MIREX (models.py:991-993).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import Config
from ..models import PitchClassNet, PitchClassNetMulti
from ..parallel.mesh import fit_data_mesh, replicate, shard_batch
from . import checkpoints as ckpt_lib
from .loss import compute_loss
from .metrics import mirex_categories
from .optim import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(cfg: Config, rng_key, optimizer,
                       time_frames: int = 64):
    dtype = jnp.dtype(cfg.dtype)
    if cfg.multi_scale:
        model = PitchClassNetMulti(cfg, dtype=dtype)
        mel1 = jnp.zeros((1, cfg.octaves * 36, time_frames, 1), dtype)
        mel2 = jnp.zeros((1, cfg.octaves * 12, time_frames, 1), dtype)
        variables = model.init(rng_key, mel1, mel2, None, False)
    else:
        model = PitchClassNet(cfg, dtype=dtype)
        mel = jnp.zeros((1, cfg.pitches, time_frames, 1), dtype)
        variables = model.init(rng_key, mel, None, False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]))
    return model, state


def _forward(model, cfg, params, batch_stats, batch, train, dropout_rng=None):
    # seq_length masks the temporal pooling in EVERY mode. The reference
    # passes None in window_size mode (frames==0, models.py:843 guard) but
    # there its batches carry no padding (all items cropped to exactly
    # window_size frames, KeyDataset.py:258-264); our bucketed batches DO
    # pad, so an unmasked mean would dilute by the pad and make a song's
    # score depend on its batch's bucket.
    seq = batch.get("seq_length")
    variables = {"params": params, "batch_stats": batch_stats}
    args = ((batch["mel"], batch["mel2"], seq) if cfg.multi_scale
            else (batch["mel"], seq))
    if train:
        rngs = ({"dropout": dropout_rng}
                if (dropout_rng is not None and cfg.drop > 0) else None)
        outputs, mutated = model.apply(variables, *args, True,
                                       mutable=["batch_stats"], rngs=rngs)
        return outputs, mutated["batch_stats"]
    return model.apply(variables, *args, False), batch_stats


def make_train_step(model, cfg: Config, optimizer, seed: int | None = None):
    """Returns jitted train_step(state, batch) -> (state, metrics).

    batch arrays are stacked (acc_grad, micro_bs, ...). `seed` feeds the
    per-step dropout rng (defaults to cfg.seed); Trainer passes its fit
    seed so seed sweeps decorrelate dropout masks too.
    """
    rng_seed = cfg.seed if seed is None else seed

    def loss_fn(params, batch_stats, micro, dropout_rng):
        outputs, new_bs = _forward(model, cfg, params, batch_stats, micro,
                                   True, dropout_rng)
        loss, aux = compute_loss(cfg, outputs, micro)
        return loss, (aux, new_bs)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        base_rng = jax.random.fold_in(jax.random.PRNGKey(rng_seed),
                                      state.step)

        def micro_step(carry, xs):
            micro, idx = xs
            grads_acc, bs = carry
            rng = jax.random.fold_in(base_rng, idx)
            (loss, (aux, new_bs)), grads = grad_fn(state.params, bs, micro,
                                                   rng)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return (grads_acc, new_bs), loss

        acc_steps = jax.tree_util.tree_leaves(batch)[0].shape[0]
        (grads, new_bs), losses = jax.lax.scan(
            micro_step, (zeros, state.batch_stats),
            (batch, jnp.arange(acc_steps)))
        acc = losses.shape[0]
        grads = jax.tree_util.tree_map(lambda g: g / acc, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=opt_state)
        return new_state, {"loss": jnp.mean(losses)}

    return train_step


def make_eval_step(model, cfg: Config):
    """Returns jitted eval_step(state, batch) -> per-sample metric arrays."""

    @jax.jit
    def eval_step(state: TrainState, batch):
        outputs, _ = _forward(model, cfg, state.params, state.batch_stats,
                              batch, False)
        # `valid` masks repeat-padded duplicate rows out of the loss;
        # train=False keeps straddle down-weighting out of val_loss (the
        # early-stopping monitor scores every valid window)
        loss, aux = compute_loss(cfg, outputs, batch,
                                 sample_weights=batch.get("valid"),
                                 train=False)
        if cfg.genre:
            key_out, tonic_out, genre_out = outputs
        else:
            key_out, tonic_out = outputs
            genre_out = None
        if cfg.local:
            # per-frame categories averaged over each sample's valid windows
            valid = jnp.maximum(
                batch["seq_length"] - cfg.loc_window_size * cfg.frames + 1, 0)
            t = key_out.shape[1]
            mask = jnp.arange(t)[None, :] < valid[:, None]
            cats = mirex_categories(batch["key_labels"], key_out,
                                    batch["tonic_labels"], tonic_out,
                                    batch["key_signature_id"])
            denom = jnp.maximum(valid, 1)
            cats = {k: jnp.sum(jnp.where(mask, v, 0), axis=1) / denom
                    for k, v in cats.items()}
            tonic_ok = (jnp.argmax(tonic_out, -1)
                        == jnp.argmax(batch["tonic_labels"], -1))
            acc_tonic = jnp.sum(jnp.where(mask, tonic_ok, 0), axis=1) / denom
        else:
            cats = mirex_categories(batch["key_labels"], key_out,
                                    batch["tonic_labels"], tonic_out,
                                    batch["key_signature_id"])
            acc_tonic = (jnp.argmax(tonic_out, -1)
                         == jnp.argmax(batch["tonic_labels"], -1)
                         ).astype(jnp.float32)
        per_sample = dict(cats)
        per_sample["accuracy_tonic"] = acc_tonic
        if genre_out is not None:
            gmask = jnp.sum(batch["genre"], axis=1) == 1
            if cfg.local:
                # per-frame genre accuracy over valid windows (intended
                # behavior of reference models.py:905-910, whose own local
                # path argmaxes a transposed genre_out per sample); the genre
                # head's longer time axis is cut to the key head's T windows
                ok = (jnp.argmax(genre_out[:, :t], -1)
                      == jnp.argmax(batch["genre"], -1)[:, None])  # (N, T)
                acc_genre = jnp.sum(jnp.where(mask, ok, 0), axis=1) / denom
            else:
                ok = (jnp.argmax(genre_out, -1)
                      == jnp.argmax(batch["genre"], -1))
                acc_genre = ok.astype(jnp.float32)
            per_sample["accuracy_genre"] = acc_genre.astype(jnp.float32)
            per_sample["genre_labeled"] = gmask.astype(jnp.float32)
        return loss, per_sample

    return eval_step


def evaluate(eval_step, state, dataset, batch_size: int,
             mesh=None) -> Dict[str, float]:
    """Masked aggregation over a dataset (repeat-padded batches excluded).

    Device results stay on device while batches are dispatched (no
    per-batch host sync); the masked reduction happens once at the end.
    A sliding sync bounds the in-flight window to MAX_INFLIGHT batches so
    a large validation set cannot queue its entire input stream in device
    memory at once (executions serialize behind the transfers, so without
    the bound HBM use grows with the dataset, not the batch).
    """
    MAX_INFLIGHT = 4
    pending = []  # (valid_mask, loss_dev, per_sample_dev)
    for batch in dataset.batches(batch_size):
        valid = np.asarray(batch["valid"])
        batch["valid"] = valid.astype(np.float32)  # device-side loss mask
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        loss, per_sample = eval_step(state, batch)
        pending.append((valid, loss, per_sample))
        if len(pending) >= MAX_INFLIGHT:
            # block on the oldest in-flight loss only: keeps the pipeline
            # MAX_INFLIGHT deep without serializing every step. A scalar
            # fetch, not block_until_ready — the relay backend returns
            # from block_until_ready before remote execution finishes.
            float(pending[-MAX_INFLIGHT][1])
    sums: Dict[str, float] = {}
    loss_sum = loss_weight = 0.0
    n_samples = 0
    genre_hits = genre_cnt = 0.0
    for valid, loss, per_sample in jax.device_get(pending):
        v = np.asarray(valid)
        # batch losses are means over that batch's VALID rows (compute_loss
        # sample_weights); weight by valid count so every real sample
        # counts once in the dataset-level loss
        loss_sum += float(loss) * v.sum()
        loss_weight += v.sum()
        n_samples += v.sum()
        ps = {k: np.asarray(x) for k, x in per_sample.items()}
        for k in ("mirex", "correct", "fifths", "relative", "parallel",
                  "other", "accuracy", "accuracy_tonic"):
            if k in ps:
                sums[k] = sums.get(k, 0.0) + float(ps[k][v].sum())
        if "genre_labeled" in ps:
            genre_hits += float((ps["accuracy_genre"] * ps["genre_labeled"])[v].sum())
            genre_cnt += float(ps["genre_labeled"][v].sum())
    out = {k: s / max(n_samples, 1) for k, s in sums.items()}
    out["loss"] = (loss_sum / loss_weight) if loss_weight else float("nan")
    out["accuracy_genre"] = genre_hits / genre_cnt if genre_cnt else 0.0
    out["num_samples"] = int(n_samples)
    return out


# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Trainer:
    """Epoch loop with early stopping + checkpointing (train_model.py:110-124)."""
    cfg: Config
    train_data: Any
    val_data: Any
    log_dir: Optional[str] = None
    use_mesh: bool = True

    def fit(self, seed: int = 0, metrics_writer=None, resume: bool = False,
            eval_at_start: bool = False):
        cfg = self.cfg
        micro_bs = cfg.batch_size
        step_items = micro_bs * cfg.acc_grad
        steps_per_epoch = max(len(self.train_data) // step_items, 1)
        optimizer = make_optimizer(cfg, steps_per_epoch)
        model, state = create_train_state(cfg, jax.random.PRNGKey(seed),
                                          optimizer)
        mesh = (fit_data_mesh(micro_bs, cfg.mesh_shape, cfg.mesh_axes)
                if self.use_mesh else None)
        if mesh is not None:
            state = replicate(state, mesh)
        train_step = make_train_step(model, cfg, optimizer, seed=seed)
        eval_step = make_eval_step(model, cfg)
        self.model, self.eval_step, self.mesh = model, eval_step, mesh

        best_mirex = -1.0
        best_val_loss = float("inf")
        patience_left = cfg.early_stop_patience
        history = []
        start_epoch = 0
        if resume and self.log_dir and os.path.exists(
                os.path.join(self.log_dir, "last_state.msgpack")):
            state, last_epoch, extra = ckpt_lib.load_train_state(
                self.log_dir, jax.device_get(state))
            if mesh is not None:
                state = replicate(state, mesh)
            start_epoch = last_epoch + 1
            best_mirex = extra.get("best_mirex", -1.0)
            best_val_loss = extra.get("best_val_loss", float("inf"))
            print(f"resumed from epoch {last_epoch}", flush=True)
        from ..data.pipeline import prefetch

        if eval_at_start and start_epoch == 0:
            # untrained-model validation (epoch -1): the chance floor the
            # learning curves are judged against
            val = evaluate(eval_step, state, self.val_data, micro_bs, mesh)
            row = {"epoch": -1, "train_loss": float("nan"),
                   "epoch_seconds": 0.0,
                   **{f"val_{k}": v for k, v in val.items()}}
            history.append(row)
            if metrics_writer is not None:
                metrics_writer(row)
            print(f"epoch -1 (untrained): val_loss={val['loss']:.4f} "
                  f"val_mirex={val.get('mirex', 0):.4f}", flush=True)

        def device_batches(epoch):
            """Reshape + H2D shard on the producer thread so host-side batch
            prep overlaps device compute."""
            for batch in self.train_data.batches(step_items, shuffle=True,
                                                 seed=seed + epoch,
                                                 drop_last=True):
                batch.pop("valid", None)
                batch = {k: np.reshape(v, (cfg.acc_grad, micro_bs)
                                       + v.shape[1:])
                         for k, v in batch.items()}
                if mesh is not None:
                    batch = shard_batch(batch, mesh, batch_dim=1)
                yield batch

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            train_losses = []
            for batch in prefetch(device_batches(epoch)):
                state, m = train_step(state, batch)
                # keep the loss ON DEVICE: a float() here would block the
                # host on every step (the serialize-the-device anti-pattern
                # SURVEY.md flags in the reference's per-batch MIREX loop);
                # fetched once per epoch below
                train_losses.append(m["loss"])
            train_losses = [float(x) for x in jax.device_get(train_losses)]
            val = evaluate(eval_step, state, self.val_data, micro_bs, mesh)
            row = {"epoch": epoch,
                   "train_loss": float(np.mean(train_losses)) if train_losses
                   else float("nan"),
                   "epoch_seconds": time.time() - t0,
                   **{f"val_{k}": v for k, v in val.items()}}
            history.append(row)
            if metrics_writer is not None:
                metrics_writer(row)
            print(f"epoch {epoch}: train_loss={row['train_loss']:.4f} "
                  f"val_loss={val['loss']:.4f} val_mirex={val.get('mirex', 0):.4f}",
                  flush=True)

            if val.get("mirex", 0) > best_mirex and not cfg.no_ckpt:
                best_mirex = val["mirex"]
                if self.log_dir:
                    ckpt_lib.save(self.log_dir, state, cfg, name="best_model")
            if self.log_dir and not cfg.no_ckpt:
                ckpt_lib.save_train_state(
                    self.log_dir, state, cfg, epoch,
                    extra={"best_mirex": float(best_mirex),
                           "best_val_loss": float(min(best_val_loss,
                                                      val["loss"]))})
            if val["loss"] < best_val_loss:
                best_val_loss = val["loss"]
                patience_left = cfg.early_stop_patience
            else:
                patience_left -= 1
                if patience_left <= 0:
                    print(f"early stop at epoch {epoch}", flush=True)
                    break
        return state, history
