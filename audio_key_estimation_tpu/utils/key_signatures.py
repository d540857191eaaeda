"""Music-theory constants: the key-signature map.

Equivalent of the reference's ``utils/key_signatures.py:19-42`` (a hand-written
21x12 TensorFlow tensor). Here the table is *derived* from theory: a key
signature is the diatonic pitch-class set of its major key, rows ordered along
the circle of fifths from Cb major (7 flats) to C# major (7 sharps), followed
by six "theoretical" enharmonic keys in the reference's order
(Cb/Db/Gb minor, D#/G#/A# major). A golden test pins every entry to the
reference's literal values.

Pitch classes are indexed chromatically: C=0, C#=1, ..., B=11.
"""

from __future__ import annotations

import numpy as np

_MAJOR_STEPS = (0, 2, 4, 5, 7, 9, 11)  # ionian scale degrees in semitones


def _major_set(tonic: int) -> np.ndarray:
    row = np.zeros(12, dtype=np.float32)
    row[[(tonic + s) % 12 for s in _MAJOR_STEPS]] = 1.0
    return row


def _build_map() -> np.ndarray:
    rows = []
    # Circle of fifths: row i has i-7 sharps; tonic walks by fifths from Cb (=B).
    for i in range(15):
        rows.append(_major_set((11 + 7 * i) % 12))
    # Theoretical keys (reference utils/key_signatures.py:35-41), each the
    # signature of its direct enharmonic equivalent:
    #   Cb minor = B minor -> D major;  Db minor = C# minor -> E major
    #   Gb minor = F# minor -> A major; D# major -> Eb major
    #   G# major -> Ab major;           A# major -> Bb major
    for tonic in (2, 4, 9, 3, 8, 10):
        rows.append(_major_set(tonic))
    return np.stack(rows)


KEY_SIGNATURE_MAP: np.ndarray = _build_map()
NUM_SIGNATURE_ROWS: int = KEY_SIGNATURE_MAP.shape[0]  # 21

# Human-readable row names, for logs/debugging (majors; minors are relative).
ROW_NAMES = [
    "Cb/Abm", "Gb/Ebm", "Db/Bbm", "Ab/Fm", "Eb/Cm", "Bb/Gm", "F/Dm",
    "C/Am", "G/Em", "D/Bm", "A/F#m", "E/C#m", "B/G#m", "F#/D#m", "C#/A#m",
    "Cbm(=Bm)", "Dbm(=C#m)", "Gbm(=F#m)", "D#(=Eb)", "G#(=Ab)", "A#(=Bb)",
]

assert KEY_SIGNATURE_MAP.shape == (21, 12)
