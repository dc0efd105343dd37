"""Fixture double for soundfile: read(fileobj, dtype=...) → (stereo
float array, samplerate); channel-mean gives the distinctive mono
waveform [0.3, 0.7]."""

import numpy as _np


def read(f, dtype="float32"):
    return (_np.array([[0.2, 0.4], [0.6, 0.8]], dtype=dtype), 16000)
