"""Fixture double for textblob: the exact API surface the seam in
risjbot_spark/extract/nlp.py dispatches to (TextBlob(...).sentiment with
.polarity/.subjectivity), returning distinctive constants so tests can
prove the DISPATCH path executed (not the stand-in)."""

from collections import namedtuple

Sentiment = namedtuple("Sentiment", ["polarity", "subjectivity"])

FAKE_POLARITY = 0.123
FAKE_SUBJECTIVITY = 0.456


class TextBlob:
    def __init__(self, text):
        self.text = text

    @property
    def sentiment(self):
        return Sentiment(FAKE_POLARITY, FAKE_SUBJECTIVITY)
