"""Golden tests for the theory core against the reference's literal tables."""

import numpy as np

from audio_key_estimation_tpu.utils.key_signatures import KEY_SIGNATURE_MAP
from audio_key_estimation_tpu.utils import labels


# Literal values from reference utils/key_signatures.py:19-42.
GOLDEN = np.array([
    [0, 1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 1],  # Cb major / Ab minor
    [0, 1, 0, 1, 0, 1, 1, 0, 1, 0, 1, 1],  # Gb / Eb m
    [1, 1, 0, 1, 0, 1, 1, 0, 1, 0, 1, 0],  # Db / Bb m
    [1, 1, 0, 1, 0, 1, 0, 1, 1, 0, 1, 0],  # Ab / F m
    [1, 0, 1, 1, 0, 1, 0, 1, 1, 0, 1, 0],  # Eb / C m
    [1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 1, 0],  # Bb / G m
    [1, 0, 1, 0, 1, 1, 0, 1, 0, 1, 1, 0],  # F  / D m
    [1, 0, 1, 0, 1, 1, 0, 1, 0, 1, 0, 1],  # C  / A m
    [1, 0, 1, 0, 1, 0, 1, 1, 0, 1, 0, 1],  # G  / E m
    [0, 1, 1, 0, 1, 0, 1, 1, 0, 1, 0, 1],  # D  / B m
    [0, 1, 1, 0, 1, 0, 1, 0, 1, 1, 0, 1],  # A  / F# m
    [0, 1, 0, 1, 1, 0, 1, 0, 1, 1, 0, 1],  # E  / C# m
    [0, 1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 1],  # B  / G# m
    [0, 1, 0, 1, 0, 1, 1, 0, 1, 0, 1, 1],  # F# / D# m
    [1, 1, 0, 1, 0, 1, 1, 0, 1, 0, 1, 0],  # C# / A# m
    [0, 1, 1, 0, 1, 0, 1, 1, 0, 1, 0, 1],  # Cb minor (= B minor)
    [0, 1, 0, 1, 1, 0, 1, 0, 1, 1, 0, 1],  # Db minor (= C# minor)
    [0, 1, 1, 0, 1, 0, 1, 0, 1, 1, 0, 1],  # Gb minor (= F# minor)
    [1, 0, 1, 1, 0, 1, 0, 1, 1, 0, 1, 0],  # D# major (= Eb major)
    [1, 1, 0, 1, 0, 1, 0, 1, 1, 0, 1, 0],  # G# major (= Ab major)
    [1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 1, 0],  # A# major (= Bb major)
], dtype=np.float32)


def test_key_signature_map_matches_reference():
    assert KEY_SIGNATURE_MAP.shape == (21, 12)
    np.testing.assert_array_equal(KEY_SIGNATURE_MAP, GOLDEN)


def test_every_signature_has_seven_tones():
    assert (KEY_SIGNATURE_MAP.sum(axis=1) == 7).all()


def test_circle_of_fifths_adjacency():
    # Adjacent signatures on the circle of fifths share exactly 6 tones.
    for i in range(14):
        overlap = (KEY_SIGNATURE_MAP[i] * KEY_SIGNATURE_MAP[i + 1]).sum()
        assert overlap == 6


GIANTSTEPS_KEYS = [
    'Cb major', 'Gb major', 'Db major', 'Ab major', 'Eb major', 'Bb major',
    'F major', 'C major', 'G major', 'D major', 'A major', 'E major',
    'B major', 'F# major', 'C# major', '', '', '',
    'D# major', 'G# major', 'A# major',
    'Ab minor', 'Eb minor', 'Bb minor', 'F minor', 'C minor', 'G minor',
    'D minor', 'A minor', 'E minor', 'B minor', 'F# minor', 'C# minor',
    'G# minor', 'D# minor', 'A# minor', 'Cb minor', 'Db minor', 'Gb minor',
    '', '', '']
GIANTSTEPS_SIG = [
    'C minor', 'Db minor', 'D minor', 'Eb minor', 'E minor', 'F minor',
    'Gb minor', 'G minor', 'Ab minor', 'A minor', 'Bb minor', 'B minor',
    'C major', 'Db major', 'D major', 'Eb major', 'E major', 'F major',
    'Gb major', 'G major', 'Ab major', 'A major', 'Bb major', 'B major']


def test_global_labels_c_major():
    k, s, t = labels.global_labels('C major', GIANTSTEPS_KEYS, GIANTSTEPS_SIG)
    np.testing.assert_array_equal(k, GOLDEN[7])
    assert s.argmax() == 12 and s.sum() == 1
    assert t.argmax() == 0 and t.sum() == 1


def test_minor_key_maps_to_relative_signature():
    # A minor (index 28 in keys) -> 28 % 21 = 7 -> C-major signature row.
    k, s, t = labels.global_labels('A minor', GIANTSTEPS_KEYS, GIANTSTEPS_SIG)
    np.testing.assert_array_equal(k, GOLDEN[7])
    assert t.argmax() == 9  # tonic A


def test_unmatched_key_string_maps_to_row0_quirk():
    # argmax of all-False == 0 (KeyDataset.py:443): unknown key -> Cb major row.
    k, s, t = labels.global_labels('nonsense', GIANTSTEPS_KEYS, GIANTSTEPS_SIG)
    np.testing.assert_array_equal(k, GOLDEN[0])
    assert s.argmax() == 0 and t.argmax() == 0


WINTERREISE_SIG_48 = [
    'C:min', 'C#:min', 'D:min', 'D#:min', 'E:min', 'F:min', 'F#:min', 'G:min',
    'G#:min', 'A:min', 'A#:min', 'B:min',
    'C:maj', 'C#:maj', 'D:maj', 'D#:maj', 'E:maj', 'F:maj', 'F#:maj', 'G:maj',
    'G#:maj', 'A:maj', 'A#:maj', 'B:maj',
    'C:min', 'Db:min', 'D:min', 'Eb:min', 'E:min', 'F:min', 'Gb:min', 'G:min',
    'Ab:min', 'A:min', 'Bb:min', 'B:min',
    'C:maj', 'Db:maj', 'D:maj', 'Eb:maj', 'E:maj', 'F:maj', 'Gb:maj', 'G:maj',
    'Ab:maj', 'A:maj', 'Bb:maj', 'B:maj']


def test_flat_spelling_yields_allzero_signature_id_quirk():
    # 'Eb:min' first matches slot 27 (>=24) -> tf.one_hot(27, 24) == zeros
    # (KeyDataset.py:446-447); tonic = 27 % 12 = 3 (Eb). Preserved exactly.
    s = labels.signature_onehot('Eb:min', WINTERREISE_SIG_48)
    assert s.sum() == 0
    t = labels.tonic_onehot('Eb:min', WINTERREISE_SIG_48)
    assert t.argmax() == 3 and t.sum() == 1


def test_local_labels_segment_arithmetic():
    frames, loc = 5, 10           # window = 50 frames
    segments = [(0.0, 30.0, 'C:maj'), (30.0, 60.0, 'G:maj'), (60.0, 90.0, 'D:maj')]
    k, s, t, cut, keep = labels.local_labels(
        segments, WINTERREISE_SIG_48, WINTERREISE_SIG_48, frames, loc)
    # per segment: span 150 frames, complete = 150-49 = 101
    # first: 101; middle: 25+101+25 = 151; last: 25+101 = 126
    assert k.shape == (101 + 151 + 126, 12)
    assert cut == 0 and keep == k.shape[0] + 49
    assert (k[:101] == k[0]).all() and (k[101:252] == k[101]).all()
