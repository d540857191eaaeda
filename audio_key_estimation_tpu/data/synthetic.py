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


def make_giantsteps_corpus(root: str, songs, seconds: float = 2.0):
    """songs: list of (name, freq, key_string, genre_string)."""
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations", "key"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations", "genre"), exist_ok=True)
    for name, freq, key, genre in songs:
        sine_wav(os.path.join(root, "audio", f"{name}.wav"), freq,
                 seconds=seconds)
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
