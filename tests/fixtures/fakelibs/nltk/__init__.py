"""Fixture double for nltk: word/sent tokenizers, pos_tag, ne_chunk and
Tree — the exact surface risjbot_spark/extract/nlp.py dispatches to.
Distinctive behaviors (sentence split on '|', PERSON = consecutive
TitleCase runs via NNP tags) let tests prove the dispatch path ran."""


class Tree:
    def __init__(self, label, leaves):
        self._label = label
        self._leaves = list(leaves)

    def label(self):
        return self._label

    def leaves(self):
        return list(self._leaves)


class _Tokenize:
    @staticmethod
    def word_tokenize(text):
        return text.split()

    @staticmethod
    def sent_tokenize(text):
        return [s for s in text.split("|") if s.strip()]


tokenize = _Tokenize()

# real nltk re-exports these at top level; the seam uses both spellings
word_tokenize = _Tokenize.word_tokenize
sent_tokenize = _Tokenize.sent_tokenize


def pos_tag(tokens):
    return [(t, "NNP" if t[:1].isupper() else "NN") for t in tokens]


def ne_chunk(tagged):
    out, run = [], []
    for tok, tag in tagged:
        if tag == "NNP":
            run.append((tok, tag))
        else:
            if run:
                out.append(Tree("PERSON", run))
                run = []
            out.append((tok, tag))
    if run:
        out.append(Tree("PERSON", run))
    return out
