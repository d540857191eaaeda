"""Multi-task loss (reference models.py:854-896).

loss = key_weight * BCE(key_sigmoid, key_multihot)
     + tonic_weight * CE(tonic_logits, tonic_idx)
     [+ genre_weight * CE(genre_logits[mask], genre_idx[mask]) if any labeled]
     [+ (1 - mean cosine(key_sigmoid, key_multihot)) if use_cos]

All terms are computed vectorized and jit-safe. Local (per-window) mode
averages per-sample masked frame losses (models.py:861-876); the genre mask
drops samples with missing labels (rows that don't sum to 1, models.py:839).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..config import Config


def _bce(pred_sigmoid, target, eps=1e-7):
    p = jnp.clip(pred_sigmoid, eps, 1 - eps)
    return -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))


def _cross_entropy(logits, labels_idx):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels_idx)


def _wmean(x, w):
    """Mean of per-sample values x (N,), weighted by optional 0/1 w (N,)."""
    if w is None:
        return jnp.mean(x)
    w = w.astype(x.dtype)
    return jnp.sum(w * x) / jnp.maximum(jnp.sum(w), 1)


def _masked_sum(frames, wmask):
    """sum(wmask * frames) over the window axis, with masked (weight-0)
    positions contributing exactly 0 even when frames is inf/NaN there —
    padded windows see zero-padded inputs, and 0 * inf = NaN would
    otherwise poison the whole batch."""
    return jnp.where(wmask > 0, wmask * frames, 0.0).sum(-1)


def compute_loss(cfg: Config, outputs, batch, sample_weights=None,
                 train=True):
    """Returns (loss, aux) for one batch.

    outputs: (key, tonic[, genre]) from the model.
    batch: dict with key_labels, tonic_labels, (genre,) and in local mode
    seq_length (true frame counts).

    sample_weights: optional (N,) 0/1 weights. The eval path passes the
    batch's `valid` mask so repeat-padded duplicate rows (dataset.batches
    pads the tail batch by repeating its last sample) do not bias the
    reported loss — without it a 9-sample set at batch_size 8 counts its
    last sample 8x in val_loss, the early-stopping signal. None (the
    train path, where every row is real) keeps plain means.

    train: straddle down-weighting (cfg.straddle_weight, local mode) is a
    TRAINING-loss treatment only; eval passes train=False so val_loss — the
    early-stopping monitor — scores every valid window and stays comparable
    between masked and unmasked runs.
    """
    if cfg.genre:
        key_out, tonic_out, genre_out = outputs
    else:
        key_out, tonic_out = outputs
        genre_out = None

    key_labels = batch["key_labels"].astype(key_out.dtype)
    tonic_labels = batch["tonic_labels"]
    aux = {}

    if cfg.local:
        # per-frame losses masked to each sample's valid window count
        # (models.py:864-876): valid = seq_len - (loc_window*frames) + 1
        valid = (batch["seq_length"] - cfg.loc_window_size * cfg.frames + 1)
        valid = jnp.maximum(valid, 0)
        t = key_out.shape[1]
        wmask = (jnp.arange(t)[None, :]
                 < valid[:, None]).astype(key_out.dtype)         # (N, T)
        if (train and cfg.straddle_weight != 1.0
                and "window_coverage" in batch):
            # down-weight (or mask, at 0.0) windows whose label segment does
            # not cover their full audio span — the structural label noise
            # quantified by scripts/local_ceiling_analysis.py. The weighted
            # mean renormalizes by the surviving weight so pure windows are
            # not diluted; a sample with no surviving windows contributes 0.
            cov = batch["window_coverage"][:, :t]
            wmask = wmask * jnp.where(cov >= 1.0, 1.0, cfg.straddle_weight)
            denom = jnp.maximum(jnp.sum(wmask, axis=-1),
                                1.0).astype(key_out.dtype)
        else:
            denom = jnp.maximum(valid, 1).astype(key_out.dtype)
        bce_frames = _bce(key_out, key_labels).mean(-1)          # (N, T)
        bce_loss = _wmean(_masked_sum(bce_frames, wmask) / denom,
                          sample_weights)
        tonic_idx = jnp.argmax(tonic_labels, axis=2)
        ce_frames = _cross_entropy(tonic_out, tonic_idx)         # (N, T)
        tonic_loss = _wmean(_masked_sum(ce_frames, wmask) / denom,
                            sample_weights)
    else:
        bce_loss = _wmean(_bce(key_out, key_labels).mean(-1), sample_weights)
        tonic_idx = jnp.argmax(tonic_labels, axis=1)
        tonic_loss = _wmean(_cross_entropy(tonic_out, tonic_idx),
                            sample_weights)

    loss = cfg.key_weight * bce_loss + cfg.tonic_weight * tonic_loss
    aux["bce_loss"] = bce_loss
    aux["tonic_loss"] = tonic_loss

    if cfg.genre and genre_out is not None:
        genre_labels = batch["genre"]                            # (N, 11)
        genre_mask = jnp.sum(genre_labels, axis=1) == 1          # (N,)
        genre_idx = jnp.argmax(genre_labels, axis=1)
        if cfg.local:
            # genre is constant per song; the reference tiles it per frame
            # (KeyDataset.py:464) and CEs per valid window (models.py:874-875,
            # minus its in-loop genre_out re-masking bug). Intended behavior:
            # masked per-frame CE averaged per sample, then over labeled
            # samples.
            # the genre head has no sliding-window max, so its time axis is
            # longer than the key head's; score the first T windows like the
            # reference's [:seq-w*f+1] slicing
            g = genre_out[:, :t]
            ce_frames = _cross_entropy(
                g, jnp.broadcast_to(genre_idx[:, None], g.shape[:2]))  # (N, T)
            ce = _masked_sum(ce_frames, wmask) / denom             # (N,)
        else:
            ce = _cross_entropy(genre_out, genre_idx)              # (N,)
        gw = genre_mask.astype(ce.dtype)
        if sample_weights is not None:
            gw = gw * sample_weights.astype(ce.dtype)
        cnt = jnp.sum(gw)
        genre_loss = jnp.where(cnt == 0, 0.0,
                               jnp.sum(gw * ce) / jnp.maximum(cnt, 1))
        loss = loss + cfg.genre_weight * genre_loss
        aux["genre_loss"] = genre_loss
        aux["genre_mask_count"] = cnt

    if cfg.use_cos:
        num = jnp.sum(key_out * key_labels, axis=-1)
        den = jnp.maximum(jnp.linalg.norm(key_out, axis=-1)
                          * jnp.linalg.norm(key_labels, axis=-1), 1e-8)
        cos = num / den
        if cfg.local:
            # per-window cosine over the 12 key dims, averaged over each
            # sample's VALID windows (same mask as bce/tonic above).
            # Documented divergence: the reference's local use_cos
            # (models.py:887,898) applies CosineSimilarity(dim=1) — the
            # TIME axis, a shape bug carried over from the global branch —
            # and averages over padded windows; this is the intended
            # masked per-window semantics instead.
            cos = _masked_sum(cos, wmask) / denom
        cos_mean = _wmean(cos, sample_weights)
        loss = loss + (1 - cos_mean)
        aux["cos_sim"] = cos_mean

    aux["loss"] = loss
    return loss, aux
