"""Fixture double for readability-lxml: Document with short_title() and
summary() — the surface risjbot_spark/extract/readability.py reproduces
from the reference's loaders.py:399-422."""

FAKE_TITLE = "FAKE READABILITY TITLE"


class Document:
    def __init__(self, html):
        self.html = html

    def short_title(self):
        return FAKE_TITLE

    def summary(self):
        return self.html
