"""MIREX metric and loss parity tests against hand-computed references and a
torch transcription of the reference scoring loop (models.py:1065-1116)."""

import jax.numpy as jnp
import numpy as np
import torch

from audio_key_estimation_tpu.config import Config
from audio_key_estimation_tpu.train.loss import compute_loss
from audio_key_estimation_tpu.train.metrics import (all_key_accuracy,
                                                    genre_accuracy,
                                                    mirex_score)
from audio_key_estimation_tpu.utils.key_signatures import KEY_SIGNATURE_MAP


def _torch_mirex(key_labels, key_preds, tonic_labels, tonic_preds, key_sig_id):
    """Direct transcription of the reference per-sample loop for testing."""
    ksm = torch.tensor(KEY_SIGNATURE_MAP)
    n = len(key_labels)
    correct = fifths = relative = parallel = other = accuracy = 0
    for i in range(n):
        category = 0
        kp = torch.tensor(key_preds[i])
        sims = torch.nn.functional.cosine_similarity(kp[None, :], ksm, dim=1)
        pred_id = int(torch.argmax(sims))
        key_pred = ksm[pred_id].numpy()
        sig_id = int(np.argmax(key_sig_id[i]))
        ck = int((key_pred == key_labels[i]).sum())
        accuracy += 1 if ck == 12 else 0
        ct = 1 if np.argmax(tonic_labels[i]) == np.argmax(tonic_preds[i]) else 0
        diff = abs(pred_id - sig_id)
        if diff == 1 and not (ct == 1 and ck == 12):
            fifths += 1; category = 1
        if ct == 1 and ck == 12 and category == 0:
            correct += 1; category = 1
        if ck == 12 and ct == 0 and category == 0:
            relative += 1; category = 1
        if ct == 1 and ck != 12 and category == 0:
            parallel += 1; category = 1
        if category == 0:
            other += 1
    mirex = correct + 0.5 * fifths + 0.3 * relative + 0.2 * parallel
    return {k: v / n for k, v in dict(
        mirex=mirex, correct=correct, fifths=fifths, relative=relative,
        parallel=parallel, other=other, accuracy=accuracy).items()}


def test_mirex_matches_reference_loop(rng):
    n = 64
    key_preds = rng.uniform(0, 1, (n, 12)).astype(np.float32)
    rows = rng.integers(0, 21, n)
    key_labels = KEY_SIGNATURE_MAP[rows]
    tonic_labels = np.eye(12, dtype=np.float32)[rng.integers(0, 12, n)]
    tonic_preds = rng.normal(size=(n, 12)).astype(np.float32)
    sig = np.zeros((n, 24), np.float32)
    sig[np.arange(n), rng.integers(0, 24, n)] = 1
    sig[:5] = 0  # all-zero signature ids (flat-spelling quirk)

    ours = mirex_score(jnp.asarray(key_labels), jnp.asarray(key_preds),
                       jnp.asarray(tonic_labels), jnp.asarray(tonic_preds),
                       jnp.asarray(sig))
    ref = _torch_mirex(key_labels, key_preds, tonic_labels, tonic_preds, sig)
    for k, v in ref.items():
        np.testing.assert_allclose(float(ours[k]), v, atol=1e-6, err_msg=k)


def test_mirex_perfect_prediction():
    labels = KEY_SIGNATURE_MAP[[7, 8]]
    tonic = np.eye(12, dtype=np.float32)[[0, 7]]
    sig = np.zeros((2, 24), np.float32)
    # chromatic ids far from circle-of-fifths ids 7,8 so diff != 1
    sig[0, 12] = 1
    sig[1, 19] = 1
    out = mirex_score(jnp.asarray(labels), jnp.asarray(labels),
                      jnp.asarray(tonic), jnp.asarray(tonic), jnp.asarray(sig))
    assert float(out["mirex"]) == 1.0 and float(out["correct"]) == 1.0


def test_fifths_quirk_cross_ordering():
    """fifths compares circle-of-fifths pred index vs chromatic label index
    (models.py:1095-1100) — reproduce exactly: a *correct* key prediction is
    downgraded to 'fifths' when |pred_row - sig_argmax| == 1 and tonic is
    wrong."""
    labels = KEY_SIGNATURE_MAP[[7]]            # C major row, pred id == 7
    tonic_l = np.eye(12, dtype=np.float32)[[0]]
    tonic_p = np.eye(12, dtype=np.float32)[[3]]  # wrong tonic
    sig = np.zeros((1, 24), np.float32)
    sig[0, 8] = 1                               # |7-8| == 1 -> fifths
    out = mirex_score(jnp.asarray(labels), jnp.asarray(labels),
                      jnp.asarray(tonic_l), jnp.asarray(tonic_p),
                      jnp.asarray(sig))
    assert float(out["fifths"]) == 1.0
    assert float(out["relative"]) == 0.0


def test_all_key_accuracy_top7():
    labels = KEY_SIGNATURE_MAP[[7]]
    good = labels[0] * 0.9 + 0.05
    bad = 1 - good
    acc = all_key_accuracy(jnp.asarray(labels),
                           jnp.asarray(np.stack([good])))
    assert float(acc) == 1.0
    acc = all_key_accuracy(jnp.asarray(labels), jnp.asarray(np.stack([bad])))
    assert float(acc) == 0.0


def test_genre_accuracy_empty_mask_is_zero():
    preds = jnp.asarray(np.random.default_rng(0).normal(size=(4, 11)))
    idx = jnp.zeros(4, jnp.int32)
    mask = jnp.zeros(4, bool)
    assert float(genre_accuracy(idx, preds, mask)) == 0.0


def test_loss_matches_torch(rng):
    cfg = Config(genre=True, use_cos=True)
    n = 8
    key_out = rng.uniform(0.01, 0.99, (n, 12)).astype(np.float32)
    key_labels = KEY_SIGNATURE_MAP[rng.integers(0, 21, n)]
    tonic_out = rng.normal(size=(n, 12)).astype(np.float32)
    tonic_labels = np.eye(12, dtype=np.float32)[rng.integers(0, 12, n)]
    genre_out = rng.normal(size=(n, 11)).astype(np.float32)
    genre_labels = np.zeros((n, 11), np.float32)
    genre_labels[np.arange(4), rng.integers(0, 11, 4)] = 1  # half unlabeled

    batch = {"key_labels": jnp.asarray(key_labels),
             "tonic_labels": jnp.asarray(tonic_labels),
             "genre": jnp.asarray(genre_labels)}
    loss, aux = compute_loss(cfg, (jnp.asarray(key_out), jnp.asarray(tonic_out),
                                   jnp.asarray(genre_out)), batch)

    kt = torch.tensor(key_out).double()
    bce = torch.nn.BCELoss()(kt, torch.tensor(key_labels).double())
    ce_t = torch.nn.CrossEntropyLoss()(
        torch.tensor(tonic_out).double(),
        torch.tensor(np.argmax(tonic_labels, 1)))
    mask = genre_labels.sum(1) == 1
    ce_g = torch.nn.CrossEntropyLoss()(
        torch.tensor(genre_out[mask]).double(),
        torch.tensor(np.argmax(genre_labels[mask], 1)))
    cos = torch.nn.CosineSimilarity(dim=1)(
        kt, torch.tensor(key_labels).double())
    expected = (cfg.key_weight * bce + cfg.tonic_weight * ce_t
                + cfg.genre_weight * ce_g + (1 - cos.sum() / n))
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)


def test_loss_sample_weights_ignore_padded_rows(rng):
    """Eval passes the batch `valid` mask as sample_weights: a batch whose
    tail rows are repeat-padded duplicates must yield the same loss as the
    batch of unique rows alone (global and use_cos paths)."""
    cfg = Config(genre=True, use_cos=True)
    n = 3
    key = jnp.asarray(rng.uniform(0.05, 0.95, (n, 12)).astype(np.float32))
    tonic = jnp.asarray(rng.standard_normal((n, 12)).astype(np.float32))
    genre = jnp.asarray(rng.standard_normal((n, 11)).astype(np.float32))
    batch = {
        "key_labels": jnp.asarray((rng.random((n, 12)) < 0.5)
                                  .astype(np.float32)),
        "tonic_labels": jnp.asarray(np.eye(12, dtype=np.float32)[
            rng.integers(0, 12, n)]),
        "genre": jnp.asarray(np.eye(11, dtype=np.float32)[
            rng.integers(0, 11, n)]),
    }
    ref, _ = compute_loss(cfg, (key, tonic, genre), batch)

    def dup(x):  # repeat the last row 2x (the dataset's tail padding)
        return jnp.concatenate([x, x[-1:], x[-1:]], axis=0)
    padded = {k: dup(v) for k, v in batch.items()}
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    weighted, _ = compute_loss(cfg, (dup(key), dup(tonic), dup(genre)),
                               padded, sample_weights=w)
    np.testing.assert_allclose(float(weighted), float(ref), rtol=1e-6)
    unweighted, _ = compute_loss(cfg, (dup(key), dup(tonic), dup(genre)),
                                 padded)
    assert abs(float(unweighted) - float(ref)) > 1e-6  # bias existed


def test_local_window_coverage_alignment_and_values():
    """local_window_coverage rows align with local_labels; pure windows are
    1.0, boundary-straddling windows fractional."""
    from audio_key_estimation_tpu.utils import labels as L
    frames, wsec = 5, 2            # W = 10 frames
    segments = [(0.0, 8.0, "C:maj"), (8.0, 16.0, "G:maj"),
                (16.0, 24.0, "D:maj")]
    from audio_key_estimation_tpu.data.loaders import (_CHROM_FLAT,
                                                        _CHROM_SHARP,
                                                        keys_table)
    keys = keys_table(lambda n: f'{n}:maj', lambda n: f'{n}:min')
    signature = ([f'{n}:min' for n in _CHROM_SHARP]
                 + [f'{n}:maj' for n in _CHROM_SHARP]
                 + [f'{n}:min' for n in _CHROM_FLAT]
                 + [f'{n}:maj' for n in _CHROM_FLAT])
    key, sig, tonic, cut, keep = L.local_labels(
        segments, keys, signature, frames, wsec)
    cov = L.local_window_coverage(segments, frames, wsec)
    assert cov.shape[0] == key.shape[0]
    W = frames * wsec
    # a window is pure iff its span sits inside one 40-frame segment
    for j in range(cov.shape[0]):
        a, b = cut + j, cut + j + W
        pure = any(a >= s * frames and b <= e * frames
                   for s, e, _ in segments)
        if pure:
            assert cov[j] == 1.0, j
        else:
            assert 0.0 <= cov[j] < 1.0, j
    assert (cov < 1.0).any() and (cov == 1.0).any()


def test_local_loss_straddle_weight(rng):
    """straddle_weight=0 removes straddling windows from the local loss and
    renormalizes; =1.0 is bit-identical to the reference behavior whether or
    not coverage is present."""
    cfg = Config(local=True, loc_window_size=2, frames=5)
    n, t = 3, 12
    key_out = jnp.asarray(rng.uniform(0.01, 0.99, (n, t, 12)), jnp.float32)
    tonic_out = jnp.asarray(rng.normal(size=(n, t, 12)), jnp.float32)
    key_labels = jnp.asarray(
        KEY_SIGNATURE_MAP[rng.integers(0, 21, (n, t))], jnp.float32)
    tonic_labels = jnp.asarray(
        np.eye(12, dtype=np.float32)[rng.integers(0, 12, (n, t))])
    seq = jnp.asarray(np.array([21, 18, 15], np.int32))  # valid = 12, 9, 6
    cov = np.ones((n, t), np.float32)
    cov[0, 3:6] = 0.4   # straddling windows in sample 0
    cov[1, 0] = 0.7
    base = {"key_labels": key_labels, "tonic_labels": tonic_labels,
            "seq_length": seq}

    ref, _ = compute_loss(cfg, (key_out, tonic_out), base)
    with_cov, _ = compute_loss(
        cfg, (key_out, tonic_out), dict(base, window_coverage=jnp.asarray(cov)))
    assert float(ref) == float(with_cov)  # weight 1.0: coverage ignored

    cfgm = cfg.replace(straddle_weight=0.0)
    masked, auxm = compute_loss(
        cfgm, (key_out, tonic_out), dict(base, window_coverage=jnp.asarray(cov)))

    # eval path (train=False): straddle weighting must NOT apply — val_loss
    # is the early-stopping monitor and scores every valid window, keeping
    # masked and unmasked runs comparable
    evalm, _ = compute_loss(
        cfgm, (key_out, tonic_out),
        dict(base, window_coverage=jnp.asarray(cov)), train=False)
    assert float(evalm) == float(ref)

    # manual recomputation: zero out straddling windows, renormalize
    def manual():
        p = np.clip(np.asarray(key_out), 1e-7, 1 - 1e-7)
        y = np.asarray(key_labels)
        bce = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean(-1)
        logits = np.asarray(tonic_out)
        z = logits - logits.max(-1, keepdims=True)
        logp = z - np.log(np.exp(z).sum(-1, keepdims=True))
        ce = -np.take_along_axis(
            logp, np.asarray(tonic_labels).argmax(-1)[..., None], -1)[..., 0]
        valid = np.maximum(np.asarray(seq) - 10 + 1, 0)
        w = (np.arange(t)[None] < valid[:, None]) * (cov >= 1.0)
        den = np.maximum(w.sum(-1), 1.0)
        return (((w * bce).sum(-1) / den).mean(),
                ((w * ce).sum(-1) / den).mean())

    mb, mc = manual()
    exp = cfg.key_weight * mb + cfg.tonic_weight * mc
    np.testing.assert_allclose(float(masked), exp, rtol=1e-5)
    assert abs(float(masked) - float(ref)) > 1e-6  # it actually changed
