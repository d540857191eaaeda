"""Hermetic synthetic fixtures: no-audio CQT blobs and tiny corpus trees.

`custom_cqt` reproduces the reference equivariance fixture
(equivariance_test.py:266-277); the corpus builders generate miniature
on-disk dataset layouts (sine-wave WAVs + annotations) so the loader and
pipeline stack is testable without any real corpora (SURVEY.md §4 item 3).
"""

from __future__ import annotations

import csv
import os

import numpy as np

from .audio_io import write_wav


def custom_cqt(octaves: int = 10, with_border: bool = True,
               frames_t: int = 592) -> np.ndarray:
    """Deterministic zeros+blobs CQT (equivariance_test.py:266-277)."""
    shape = octaves * 3 * 12
    mel = np.zeros((shape, frames_t), np.float32)
    mel[100:150, 20:50] = 1.0
    if with_border:
        mel[30:40, 400] = 10.0
        mel[10:15, 200] = 8.0
    mel[50, 320:350] = 20.0
    return mel


def sine_wav(path: str, freq: float, seconds: float = 2.0, sr: int = 22050):
    t = np.arange(int(seconds * sr)) / sr
    write_wav(path, 0.5 * np.sin(2 * np.pi * freq * t), sr)


from ..utils.key_signatures import _MAJOR_STEPS


def scale_wav(path: str, tonic_pc: int, minor: bool, seconds: float = 2.0,
              sr: int = 22050, seed: int = 0):
    """A song whose AUDIO determines its key: a random walk of sine notes
    over the key's diatonic pitch classes (natural minor = the relative
    major's set rotated), octaves 3-5, with the tonic sounded first, last,
    and 3x as often — so key signature AND tonic are learnable from sound
    alone. Used by the TPU convergence run (scripts/train_converge_tpu.py),
    where single-tone fixtures would make the labels unlearnable."""
    rng = np.random.default_rng(seed)
    rel_major = (tonic_pc + 3) % 12 if minor else tonic_pc
    pcs = [(rel_major + s) % 12 for s in _MAJOR_STEPS]
    weights = np.array([3.0 if pc == tonic_pc else 1.0 for pc in pcs])
    weights /= weights.sum()
    note_len = int(0.25 * sr)      # integer note grid: note i starts at
    n_notes = max(2, int(seconds * sr) // note_len)  # exactly i * note_len
    choices = rng.choice(len(pcs), size=n_notes, p=weights)
    octs = rng.integers(3, 6, size=n_notes)
    choices[0] = choices[-1] = pcs.index(tonic_pc)
    y = np.zeros(int(seconds * sr), np.float32)
    env = np.minimum(1.0, np.minimum(np.arange(note_len) / 200.0,
                     (note_len - np.arange(note_len)) / 200.0))
    for i, (ci, oc) in enumerate(zip(choices, octs)):
        f0 = 440.0 * 2.0 ** ((pcs[ci] - 9) / 12.0 + (int(oc) - 4))
        s0 = i * note_len
        seg = min(len(env), len(y) - s0)
        if seg <= 0:
            break
        t = np.arange(seg) / sr
        y[s0:s0 + seg] += (0.5 * env[:seg] * np.sin(2 * np.pi * f0 * t)
                           ).astype(np.float32)
    write_wav(path, y, sr)


def make_giantsteps_corpus(root: str, songs, seconds: float = 2.0,
                           scale_audio: bool = False, seed_offset: int = 0):
    """songs: list of (name, freq, key_string, genre_string).

    scale_audio=True synthesizes diatonic scale-walk audio derived from
    key_string (see scale_wav) instead of a single sine at `freq`;
    seed_offset decorrelates the walks of corpora sharing key lists
    (train vs val)."""
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations", "key"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations", "genre"), exist_ok=True)
    note_pc = {"c": 0, "db": 1, "c#": 1, "d": 2, "eb": 3, "d#": 3, "e": 4,
               "f": 5, "gb": 6, "f#": 6, "g": 7, "ab": 8, "g#": 8, "a": 9,
               "bb": 10, "a#": 10, "b": 11, "cb": 11}
    for idx, (name, freq, key, genre) in enumerate(songs):
        wav = os.path.join(root, "audio", f"{name}.wav")
        if scale_audio:
            note, mode = key.split()
            scale_wav(wav, note_pc[note.lower()], mode == "minor",
                      seconds=seconds, seed=seed_offset + idx)
        else:
            sine_wav(wav, freq, seconds=seconds)
        with open(os.path.join(root, "annotations", "key", f"{name}.key"), "w") as f:
            f.write(key)
        with open(os.path.join(root, "annotations", "genre", f"{name}.genre"), "w") as f:
            f.write(genre)
    return root


def make_winterreise_corpus(root: str, songs, local_segments=None,
                            seconds: float = 3.0):
    """songs: list of (performance, song, freq, key). Song names are
    '<performance>_<song>' as in the reference CSV join (KeyDataset.py:659)."""
    os.makedirs(os.path.join(root, "01_RawData", "audio_wav"), exist_ok=True)
    ann = os.path.join(root, "02_Annotations")
    os.makedirs(os.path.join(ann, "ann_audio_localkey-ann3"), exist_ok=True)
    with open(os.path.join(ann, "ann_audio_globalkey.csv"), "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(["performance", "song", "key"])
        for perf, song, freq, key in songs:
            w.writerow([perf, song, key])
    for perf, song, freq, key in songs:
        name = f"{perf}_{song}"
        sine_wav(os.path.join(root, "01_RawData", "audio_wav", f"{name}.wav"),
                 freq, seconds=seconds)
        segs = (local_segments or {}).get(name,
                                          [(0.0, 3.0, key)])
        with open(os.path.join(ann, "ann_audio_localkey-ann3", f"{name}.csv"),
                  "w", newline="") as f:
            w = csv.writer(f, delimiter=";")
            w.writerow(["start", "end", "key"])
            for s, e, k in segs:
                w.writerow([s, e, k])
    return root


def make_gtzan_corpus(root: str, songs):
    """songs: list of (genre_dir, name, freq, lerch_key_string)."""
    for genre_dir, name, freq, key in songs:
        adir = os.path.join(root, "genres_original", genre_dir)
        kdir = os.path.join(root, "gtzan_key", "genres", genre_dir)
        os.makedirs(adir, exist_ok=True)
        os.makedirs(kdir, exist_ok=True)
        sine_wav(os.path.join(adir, f"{name}.wav"), freq)
        with open(os.path.join(kdir, f"{name}.lerch.txt"), "w") as f:
            f.write(key)
    return root


def make_scraped_corpus(root: str, songs, threshold_scores=None):
    """songs: list of (name, score, key). Writes placeholder .mp3 files plus
    the similarity csv (decode is not exercised — discovery/labels only)."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "__youtube_similarities.csv"), "w",
              newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        for name, score, key in songs:
            w.writerow([name, score, key])
    for name, score, key in songs:
        with open(os.path.join(root, f"{name}.mp3"), "wb") as f:
            f.write(b"\x00" * 128)
    return root


def make_guitarset_corpus(root: str, songs):
    """songs: list of (name, freq, key)."""
    import json
    os.makedirs(os.path.join(root, "audio_mono-mic"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    for name, freq, key in songs:
        sine_wav(os.path.join(root, "audio_mono-mic", f"{name}_mic.wav"), freq)
        with open(os.path.join(root, "annotations", f"{name}.jams"), "w") as f:
            json.dump({"annotations": [
                {"data": [{"value": key}]}]}, f)
    return root
