"""Serving API: waveforms/files -> key, tonic, genre predictions.

The reference has no inference entry point short of running eval.py over a
corpus; this provides the production path: a `KeyEstimator` that loads a
checkpoint (orbax or ported torch state_dict), batches arbitrary audio
through the on-device CQT + PitchClassNet, and returns human-readable
results.

Key naming: the 12-dim sigmoid output is matched to the nearest
KEY_SIGNATURE_MAP row (circle of fifths) exactly like the MIREX scorer
(models.py:1083-1085); the predicted tonic then selects the major or
relative-minor reading of that signature.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data import audio_io
from .data.audio_io import decode_many
from .data.loaders import A_GENRES
from .models import PitchClassNet, PitchClassNetMulti
from .ops.cqt import CQTParams, reference_hop
from .ops.frontend import compute_cqt
from .utils.key_signatures import KEY_SIGNATURE_MAP

NOTE_NAMES = ['C', 'C#', 'D', 'D#', 'E', 'F', 'F#', 'G', 'G#', 'A', 'A#', 'B']
# major tonic of circle-of-fifths row i (0 = Cb); theoretical rows 15..20
# map to their enharmonic base signatures (utils/key_signatures.py)
_ROW_MAJOR_TONIC = [(11 + 7 * i) % 12 for i in range(15)] + [2, 4, 9, 3, 8, 10]


def key_name(key_sigmoid: np.ndarray, tonic_logits: np.ndarray) -> dict:
    """Interpret model outputs as a named key."""
    ksm = KEY_SIGNATURE_MAP
    v = key_sigmoid / max(np.linalg.norm(key_sigmoid), 1e-8)
    sims = (ksm @ v) / np.linalg.norm(ksm, axis=1)
    row = int(np.argmax(sims))
    tonic = int(np.argmax(tonic_logits))
    major_tonic = _ROW_MAJOR_TONIC[row]
    if tonic == major_tonic:
        name = f"{NOTE_NAMES[tonic]} major"
    elif tonic == (major_tonic + 9) % 12:  # relative minor
        name = f"{NOTE_NAMES[tonic]} minor"
    else:
        # tonic disagrees with the signature; report tonic with the
        # signature's accidentals as context
        name = f"{NOTE_NAMES[tonic]} (signature {NOTE_NAMES[major_tonic]} major)"
    return {"key": name, "signature_row": row, "tonic": NOTE_NAMES[tonic],
            "confidence": float(sims[row])}


@dataclass
class Prediction:
    key: str
    tonic: str
    confidence: float
    genre: Optional[str] = None
    key_probs: Optional[np.ndarray] = None
    tonic_logits: Optional[np.ndarray] = None


@dataclass
class WindowPrediction:
    """One local-mode window: key over [start, end) seconds."""
    start: float
    end: float
    key: str
    tonic: str
    confidence: float
    genre: Optional[str] = None


@dataclass
class LocalPrediction:
    windows: list
    key_probs: Optional[np.ndarray] = None   # (T', 12) per-window sigmoids
    tonic_logits: Optional[np.ndarray] = None


class KeyEstimator:
    """Batched inference over arbitrary audio.

    >>> est = KeyEstimator.from_checkpoint("Model_logs/lightning_logs/version_0")
    >>> est.predict_files(["song.wav"])  # -> [Prediction(key='A minor', ...)]
    """

    def __init__(self, cfg: Config, variables, *, bucket_seconds=(60, 180, 420),
                 mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis — inference
        runs data-parallel: variables replicated, the clip batch sharded,
        XLA splitting the CQT + forward across chips over ICI. Batches are
        repeat-padded up to a multiple of the mesh size."""
        self.cfg = cfg.replace(local=False)
        # Serving must build the architecture the checkpoint was trained
        # with: a multi_scale config selects the two-scale ensemble
        # (reference models.py:1118-1189), and a params/config mismatch is
        # rejected loudly rather than silently mis-applying weights.
        has_multi_params = any(str(k).startswith("model1")
                               for k in variables.get("params", {}))
        if has_multi_params != bool(cfg.multi_scale):
            raise ValueError(
                f"checkpoint/config mismatch: config.multi_scale="
                f"{cfg.multi_scale} but params "
                f"{'have' if has_multi_params else 'lack'} the "
                "model1/model2 ensemble structure")
        model_cls = PitchClassNetMulti if cfg.multi_scale else PitchClassNet
        self.model = model_cls(self.cfg, dtype=jnp.dtype(cfg.dtype))
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import replicate
            variables = replicate(variables, mesh)
        self.variables = variables
        self.bucket_seconds = bucket_seconds
        if cfg.multi_scale:
            self._apply = jax.jit(lambda mel1, mel2, seq: self.model.apply(
                self.variables, mel1, mel2, seq, False))
        else:
            self._apply = jax.jit(lambda mel, seq: self.model.apply(
                self.variables, mel, seq, False))
        self._apply_local = None  # built on first predict_*_local call

    def _mesh_pad(self, n: int) -> int:
        """Batch rows needed so the 'data' axis divides the batch evenly."""
        if self.mesh is None:
            return n
        d = int(np.prod(self.mesh.devices.shape))
        return -(-n // d) * d

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, run_dir: str, name: str = "best_model", **kw):
        from .train import checkpoints as ckpt_lib
        tree, cfg = ckpt_lib.load(run_dir, name)
        cfg = cfg or Config()
        return cls(cfg, {"params": tree["params"],
                         "batch_stats": tree["batch_stats"]}, **kw)

    @classmethod
    def from_torch_checkpoint(cls, path: str, cfg: Config, **kw):
        from .models.torch_port import state_dict_to_variables
        from .train.checkpoints import load_torch_state_dict
        model = PitchClassNet(cfg)
        mel = jnp.zeros((1, cfg.pitches, 64, 1), jnp.float32)
        template = model.init(jax.random.PRNGKey(0), mel, None, False)
        variables = state_dict_to_variables(load_torch_state_dict(path),
                                            template)
        return cls(cfg, variables, **kw)

    # ------------------------------------------------------------------
    def _bucket_len(self, seconds: float) -> float:
        for b in self.bucket_seconds:
            if seconds <= b:
                return b
        return float(np.ceil(seconds / 60.0) * 60)

    def _make_batch(self, waveforms, sr, cfg):
        """Bucket-padded (and mesh-padded) signal batch + true seq lengths."""
        hop = reference_hop(sr, cfg.frames, cfg.window_size,
                            max(len(w) for w in waveforms))
        secs = max(len(w) for w in waveforms) / sr
        pad_len = int(self._bucket_len(secs) * sr)
        n_pad = self._mesh_pad(len(waveforms))
        # int16 when every waveform is raw PCM16 (half the H2D bytes;
        # normalization runs inside the CQT graph), else float32
        batch = audio_io.pack_batch(waveforms, pad_len, n_rows=n_pad)
        seq = np.ones(n_pad, np.int32)  # mesh-pad rows: 1 valid frame
        for i, w in enumerate(waveforms):
            seq[i] = 1 + len(w) // hop
        batch_j, seq_j = jnp.asarray(batch), jnp.asarray(seq)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batch_j = jax.device_put(batch_j,
                                     NamedSharding(self.mesh, P("data")))
            seq_j = jax.device_put(seq_j, NamedSharding(self.mesh, P("data")))
        return batch_j, seq_j, hop

    def _features(self, batch, sr: int, hop: int, cfg: Config) -> tuple:
        """log1p-CQT feature tensors: (mel,) or (mel1, mel2) for multi-scale
        (model2 consumes the 12-bins/octave CQT — models.py:1118-1146)."""
        bpos = (cfg.bins_per_octave, 12) if cfg.multi_scale \
            else (cfg.bins_per_octave,)
        mels = []
        for bpo in bpos:
            params = CQTParams(sr=sr, hop=hop, bins_per_octave=bpo,
                               octaves=cfg.octaves)
            mels.append(compute_cqt(
                batch, params, use_pallas=cfg.pallas_cqt_enabled(),
                conv_dtype=cfg.cqt_conv_dtype)[:, :, :, None])
        return tuple(mels)

    def predict_waveforms(self, waveforms: Sequence[np.ndarray], sr: int,
                          return_raw: bool = False) -> List[Prediction]:
        cfg = self.cfg
        batch, seq, hop = self._make_batch(waveforms, sr, cfg)
        out = self._apply(*self._features(batch, sr, hop, cfg), seq)
        key = np.asarray(out[0])
        tonic = np.asarray(out[1])
        genre = np.asarray(out[2]) if cfg.genre else None
        preds = []
        for i in range(len(waveforms)):
            info = key_name(key[i], tonic[i])
            preds.append(Prediction(
                key=info["key"], tonic=info["tonic"],
                confidence=info["confidence"],
                genre=(A_GENRES[int(np.argmax(genre[i]))]
                       if genre is not None else None),
                key_probs=key[i] if return_raw else None,
                tonic_logits=tonic[i] if return_raw else None))
        return preds

    def predict_files(self, paths: Sequence[Union[str, os.PathLike]],
                      **kw) -> List[Prediction]:
        return self._predict_files(paths, self.predict_waveforms, **kw)

    def _predict_files(self, paths, fn, **kw):
        decoded = list(decode_many((str(p) for p in paths), raw=True))
        by_sr = {}
        for i, (w, sr) in enumerate(decoded):
            by_sr.setdefault(sr, []).append((i, w))
        results: list = [None] * len(decoded)
        for sr, group in by_sr.items():
            preds = fn([w for _, w in group], sr, **kw)
            for (i, _), p in zip(group, preds):
                results[i] = p
        return results

    # ------------------------------------------------------------------
    # local (per-window) key sequences — the serving face of --local mode
    # (reference models.py:861-876 only trains/evals it; no inference path)
    # ------------------------------------------------------------------
    def predict_waveforms_local(self, waveforms: Sequence[np.ndarray],
                                sr: int, return_raw: bool = False
                                ) -> List[LocalPrediction]:
        """Per-window key estimates: each window spans loc_window_size
        seconds, advancing 1/frames seconds per step (the local head's
        sliding max over frame windows)."""
        cfg = self.cfg.replace(local=True)
        if self._apply_local is None:
            model_cls = PitchClassNetMulti if cfg.multi_scale \
                else PitchClassNet
            model = model_cls(cfg, dtype=jnp.dtype(cfg.dtype))
            if cfg.multi_scale:
                self._apply_local = jax.jit(
                    lambda mel1, mel2, seq: model.apply(
                        self.variables, mel1, mel2, seq, False))
            else:
                self._apply_local = jax.jit(
                    lambda mel, seq: model.apply(
                        self.variables, mel, seq, False))
        batch, seq_j, hop = self._make_batch(waveforms, sr, cfg)
        seq = np.asarray(seq_j)
        out = self._apply_local(*self._features(batch, sr, hop, cfg), seq_j)
        key = np.asarray(out[0])                     # (N, T', 12)
        tonic = np.asarray(out[1])
        genre = np.asarray(out[2]) if cfg.genre else None
        preds = []
        win_s = cfg.loc_window_size
        step_s = 1.0 / cfg.frames
        for i in range(len(waveforms)):
            n_windows = max(int(seq[i]) - cfg.loc_window_size * cfg.frames
                            + 1, 0)
            n_windows = min(n_windows, key.shape[1])
            windows = []
            for t in range(n_windows):
                info = key_name(key[i, t], tonic[i, t])
                windows.append(WindowPrediction(
                    start=t * step_s, end=t * step_s + win_s,
                    key=info["key"], tonic=info["tonic"],
                    confidence=info["confidence"],
                    genre=(A_GENRES[int(np.argmax(genre[i, t]))]
                           if genre is not None else None)))
            preds.append(LocalPrediction(
                windows=windows,
                key_probs=key[i, :n_windows] if return_raw else None,
                tonic_logits=tonic[i, :n_windows] if return_raw else None))
        return preds

    def predict_files_local(self, paths: Sequence[Union[str, os.PathLike]],
                            **kw) -> List[LocalPrediction]:
        return self._predict_files(paths, self.predict_waveforms_local, **kw)
