"""Fixture double for lxml.html.fromstring(...).xpath('//body//text()')
— the call chain the readability seam runs over Document.summary()."""

FAKE_TEXTS = ["FAKE BODY ONE", "FAKE BODY TWO"]


class _Doc:
    def __init__(self, text):
        self.text = text

    def xpath(self, query):
        return list(FAKE_TEXTS)


def fromstring(text):
    return _Doc(text)
