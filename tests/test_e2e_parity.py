"""End-to-end wav -> final-logits parity vs the reference-shaped pipeline.

VERDICT r2 item 3: the two parity halves existed separately — front-end vs
the librosa-0.9.2-algorithm oracle (tests/test_cqt_librosa.py) and model
forward vs functional torch (tests/test_torch_port.py). This composes them
into the in-environment proxy for BASELINE.json's "identical logits within
fp tolerance" over the reference eval path (/root/reference/eval.py:113-129,
front-end /root/reference/KeyDataset.py:490-499):

  reference pipeline:  PCM/32768 -> librosa_ref CQT -> log1p
                       -> torch_funcref forward      (float64 numpy/torch)
  our pipeline:        WAV decode (audio_io, raw int16) -> ops.cqt /
                       ops.cqt_pallas (interpret)    -> flax forward

with SHARED weights (variables_to_state_dict port) on 4 synthetic triad
WAVs, octaves=4, hop 4416 (librosa's hop % 2**(octaves-1) rule), T=30.

Measured (this geometry, f32 conv operands, 2026-08-18):
  features   max|d| 0.166 on global peak 2.29 (~7%) — concentrated in the
             lowest octave's resample cascade + boundary frames; per-octave
             relative bounds are pinned in tests/test_cqt_librosa.py
  key sigmoid  max|d| 9.5e-5   (xla front-end vs reference pipeline)
  tonic logit  max|d| 2.8e-4
  pallas(interpret) vs xla: features 2.5e-6, final logits 0.0
  key/signature/tonic calls and MIREX categories: identical on all clips

Tolerances below carry ~10x headroom over measured.
"""

import os
import sys

import numpy as np
import pytest

# compile-heavy module: excluded from the fast tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
from flax import traverse_util  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from torch_funcref import torch_forward  # noqa: E402

from audio_key_estimation_tpu.config import Config  # noqa: E402
from audio_key_estimation_tpu.data import audio_io  # noqa: E402
from audio_key_estimation_tpu.models import PitchClassNet  # noqa: E402
from audio_key_estimation_tpu.models.torch_port import (  # noqa: E402
    variables_to_state_dict)
from audio_key_estimation_tpu.ops.cqt import CQTParams  # noqa: E402
from audio_key_estimation_tpu.ops.frontend import compute_cqt  # noqa: E402
from audio_key_estimation_tpu.ops.librosa_ref import librosa_cqt  # noqa: E402
from audio_key_estimation_tpu.predict import key_name  # noqa: E402
from audio_key_estimation_tpu.train.metrics import (  # noqa: E402
    mirex_categories)
from audio_key_estimation_tpu.utils.key_signatures import (  # noqa: E402
    KEY_SIGNATURE_MAP)

SR, HOP, SECONDS, N = 22050, 4416, 6.0, 4  # hop % 2**(octaves-1) == 0
CFG = Config(octaves=4, num_layers=2, conv_layers=1, n_filters=2,
             kernel_size=3, head_layers=1, genre=False, frames=5)

TOL_KEY = 1e-3     # measured 9.5e-5
TOL_TONIC = 3e-3   # measured 2.8e-4
TOL_PALLAS = 1e-4  # measured 0.0


@pytest.fixture(scope="module")
def pipelines(tmp_path_factory):
    """Run all three pipelines once; tests assert on the shared result."""
    td = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(7)
    L = int(SR * SECONDS)
    t = np.arange(L) / SR
    paths = []
    for i in range(N):
        tonic = (i * 5) % 12
        f0 = 110.0 * 2 ** (tonic / 12)
        y = np.zeros(L)
        for mult, amp in ((1, .35), (2 ** (4 / 12), .25),
                          (2 ** (7 / 12), .25), (2, .15)):
            y += amp * np.sin(2 * np.pi * f0 * mult * t + rng.uniform(0, 6))
        y += 0.01 * rng.standard_normal(L)
        p = str(td / f"w{i}.wav")
        audio_io.write_wav(p, (y * 0.5).astype(np.float32), SR)
        paths.append(p)

    # ---- our pipeline: production decode -> on-device CQT (both impls)
    batch = np.stack([w for w, _ in audio_io.decode_many(paths, raw=True)])
    assert batch.dtype == np.int16  # raw PCM16 enters the CQT graph
    params = CQTParams(sr=SR, hop=HOP, bins_per_octave=36, octaves=4)
    mel_x = np.asarray(compute_cqt(jnp.asarray(batch), params,
                                   use_pallas=False, conv_dtype="float32"))
    mel_p = np.asarray(compute_cqt(jnp.asarray(batch), params,
                                   use_pallas=True, conv_dtype="float32"))

    # ---- reference-shaped pipeline: librosa-0.9.2 algorithm, float64
    mel_r = np.stack([np.log1p(np.abs(librosa_cqt(
        batch[i].astype(np.float64) / 32768.0, SR, HOP, 36 * 4, 36)))
        for i in range(N)])
    T = min(mel_x.shape[2], mel_r.shape[2])
    mel_x, mel_p, mel_r = mel_x[:, :, :T], mel_p[:, :, :T], mel_r[:, :, :T]

    # ---- shared weights: flax init, ported to a torch state_dict
    model = PitchClassNet(CFG)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, CFG.pitches, T, 1), jnp.float32),
                           jnp.full((1,), T, jnp.int32), False)
    flat = traverse_util.flatten_dict(variables["batch_stats"])
    r2 = np.random.default_rng(11)
    for k in flat:  # non-trivial eval-mode BN statistics
        flat[k] = (jnp.asarray(r2.normal(size=flat[k].shape) * 0.3,
                               jnp.float32) if k[-1] == "mean"
                   else jnp.asarray(r2.uniform(0.5, 2.0, flat[k].shape),
                                    jnp.float32))
    variables = dict(variables)
    variables["batch_stats"] = traverse_util.unflatten_dict(flat)
    sd = variables_to_state_dict(variables)
    seq = np.full((N,), T, np.int32)

    out_x = model.apply(variables, jnp.asarray(mel_x[:, :, :, None]),
                        jnp.asarray(seq), False)
    out_p = model.apply(variables, jnp.asarray(mel_p[:, :, :, None]),
                        jnp.asarray(seq), False)
    out_r = torch_forward(sd, CFG, torch.tensor(mel_r[:, None]).double(),
                          seq)
    return {"x": [np.asarray(o) for o in out_x],
            "p": [np.asarray(o) for o in out_p],
            "r": [o.numpy() for o in out_r]}


def test_final_logits_match_reference_pipeline(pipelines):
    assert np.abs(pipelines["x"][0] - pipelines["r"][0]).max() < TOL_KEY
    assert np.abs(pipelines["x"][1] - pipelines["r"][1]).max() < TOL_TONIC


def test_pallas_frontend_pipeline_matches_xla(pipelines):
    assert np.abs(pipelines["p"][0] - pipelines["x"][0]).max() < TOL_PALLAS
    assert np.abs(pipelines["p"][1] - pipelines["x"][1]).max() < TOL_PALLAS


def test_key_calls_identical(pipelines):
    """The serving-level interpretation agrees clip by clip."""
    for i in range(N):
        calls = [key_name(pipelines[k][0][i], pipelines[k][1][i])
                 for k in ("x", "p", "r")]
        assert len({c["signature_row"] for c in calls}) == 1, (i, calls)
        assert len({c["tonic"] for c in calls}) == 1, (i, calls)
        assert len({c["key"] for c in calls}) == 1, (i, calls)


def test_mirex_categories_identical(pipelines):
    """Every pipeline lands in the same MIREX category for any truth."""
    rows = np.arange(N) % 15
    key_labels = jnp.asarray(KEY_SIGNATURE_MAP[rows], jnp.float32)
    tonic_labels = jnp.asarray(np.eye(12, dtype=np.float32)[
        [(11 + 7 * r) % 12 for r in rows]])
    sig_id = jnp.asarray(np.eye(21, dtype=np.float32)[rows])
    cats = {}
    for k in ("x", "p", "r"):
        cats[k] = {n: np.asarray(v) for n, v in mirex_categories(
            key_labels, jnp.asarray(pipelines[k][0]), tonic_labels,
            jnp.asarray(pipelines[k][1]), sig_id).items()}
    for n in cats["x"]:
        np.testing.assert_array_equal(cats["x"][n], cats["r"][n], err_msg=n)
        np.testing.assert_array_equal(cats["x"][n], cats["p"][n], err_msg=n)
