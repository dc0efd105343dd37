"""NLP enrichment functions (pure-Python, deterministic).

Mirrors the reference's item pipelines —
wordcount (/root/reference/RISJbot/pipelines/wordcount.py:13-18),
sentiment (/root/reference/RISJbot/pipelines/sentiment.py:16-23),
reading age (/root/reference/RISJbot/pipelines/readingage.py:55-108),
named people (/root/reference/RISJbot/pipelines/namedpeople.py:42-57).

The reference uses textblob / nltk / the CMU pronouncing dictionary, none
of which ship in this container. The *formulas and shapes* are identical
(Flesch/Kincaid coefficients, punctuation-category token stripping,
hyphen splitting); the lexicon/tokenizer/syllable-counter internals are
deterministic stand-ins, shared verbatim between the Spark UDFs and the
pytest oracle so results are reproducible by construction.

ADAPTER SEAM: when the real libraries ARE importable (a deployment
outside this container), the public functions dispatch to them —
textblob's PatternAnalyzer for sentiment, nltk's punkt tokenizers and
ne_chunk for tokenization/NER, `pronouncing`'s CMU lookups for
syllables — reproducing the reference pipelines' VALUES, not just their
formulas. Availability is probed once at import (including the nltk
data files, which can be installed yet undownloaded); the stand-ins
stay as the fallback and remain directly callable for tests.
"""

from __future__ import annotations

import re
import string
import unicodedata
from collections.abc import Iterable
from functools import lru_cache


def _try_import(name):
    try:
        import importlib

        return importlib.import_module(name)
    except Exception:
        return None


def _probe(fn) -> bool:
    try:
        fn()
        return True
    except Exception:
        return False


_textblob = _try_import("textblob")
_nltk = _try_import("nltk")
_pronouncing = _try_import("pronouncing")

HAS_TEXTBLOB = _textblob is not None and _probe(
    lambda: _textblob.TextBlob("probe").sentiment)
HAS_NLTK_TOKENIZE = _nltk is not None and _probe(
    lambda: _nltk.tokenize.word_tokenize("A probe."))
HAS_NLTK_NER = HAS_NLTK_TOKENIZE and _probe(
    lambda: _nltk.ne_chunk(_nltk.pos_tag(["John", "Smith"])))
HAS_CMU_DICT = _pronouncing is not None and _probe(
    lambda: _pronouncing.phones_for_word("probe")[0])

# ---------------------------------------------------------------------------
# Driver-decided backend pinning
# ---------------------------------------------------------------------------
# The HAS_* probes run per Python PROCESS, so a heterogeneous deployment
# (driver has nltk, some executors don't — or vice versa) would silently
# mix real-library and stand-in values inside one run. The engine's UDF
# factories (udfs.py) therefore capture the DRIVER's probe result in the
# UDF closure and pin it in every worker: pinned-available-but-missing
# fails loudly instead of degrading one partition's values.

_PINNED: dict[str, bool] | None = None


def backend_flags() -> dict[str, bool]:
    """This process's probe result — capture on the driver, ship in UDF
    closures, pin on workers."""
    return {"textblob": HAS_TEXTBLOB, "nltk_tokenize": HAS_NLTK_TOKENIZE,
            "nltk_ner": HAS_NLTK_NER, "cmu": HAS_CMU_DICT}


def pin_backend(flags: dict[str, bool] | None) -> None:
    """Pin the dispatch decision for this process (None → unpin, fall
    back to the local probe). Clears the syllable cache: cached values
    are backend-specific."""
    global _PINNED
    _PINNED = dict(flags) if flags is not None else None
    count_syllables.cache_clear()


def _use(name: str, local_has: bool) -> bool:
    from ..seams import seam_use
    return seam_use(name, local_has, _PINNED, kind="NLP backend")

# ---------------------------------------------------------------------------
# Word count — len(str.split()) exactly (wordcount.py:15)
# ---------------------------------------------------------------------------

def wordcount(text: str) -> int:
    return len(text.split())


# ---------------------------------------------------------------------------
# Sentiment — lexicon-averaged polarity/subjectivity in [-1,1] / [0,1]
# ---------------------------------------------------------------------------

_LEXICON: dict[str, tuple[float, float]] = {
    # word: (polarity, subjectivity) — compact en lexicon in the style of
    # pattern/textblob; values chosen once, fixed forever (determinism).
    "good": (0.7, 0.6), "great": (0.8, 0.75), "excellent": (1.0, 1.0),
    "best": (1.0, 0.3), "better": (0.5, 0.5), "positive": (0.3, 0.7),
    "success": (0.5, 0.4), "successful": (0.6, 0.6), "win": (0.4, 0.4),
    "wins": (0.4, 0.4), "won": (0.4, 0.4), "happy": (0.8, 1.0),
    "strong": (0.4, 0.5), "growth": (0.3, 0.3), "improve": (0.4, 0.5),
    "improved": (0.4, 0.5), "record": (0.2, 0.3), "boost": (0.4, 0.5),
    "popular": (0.4, 0.7), "support": (0.3, 0.4), "agree": (0.2, 0.6),
    "love": (0.5, 0.6), "beautiful": (0.85, 1.0), "safe": (0.5, 0.5),
    "clean": (0.4, 0.5), "fair": (0.7, 0.9), "calm": (0.3, 0.7),
    "bad": (-0.7, 0.67), "worse": (-0.5, 0.5), "worst": (-1.0, 1.0),
    "poor": (-0.4, 0.6), "negative": (-0.3, 0.7), "fail": (-0.5, 0.5),
    "failed": (-0.5, 0.5), "failure": (-0.5, 0.5), "loss": (-0.4, 0.4),
    "lose": (-0.4, 0.4), "lost": (-0.4, 0.4), "crisis": (-0.6, 0.6),
    "fear": (-0.6, 0.8), "fears": (-0.6, 0.8), "threat": (-0.5, 0.6),
    "attack": (-0.6, 0.5), "attacks": (-0.6, 0.5), "war": (-0.7, 0.4),
    "dead": (-0.8, 0.6), "death": (-0.7, 0.5), "killed": (-0.8, 0.6),
    "crash": (-0.6, 0.5), "scandal": (-0.7, 0.8), "fraud": (-0.8, 0.7),
    "angry": (-0.7, 0.9), "sad": (-0.6, 1.0), "terrible": (-1.0, 1.0),
    "awful": (-1.0, 1.0), "wrong": (-0.5, 0.5), "guilty": (-0.6, 0.8),
    "illegal": (-0.5, 0.5), "corrupt": (-0.8, 0.8), "danger": (-0.6, 0.6),
    "dangerous": (-0.6, 0.6), "warning": (-0.4, 0.5), "risk": (-0.3, 0.4),
    "collapse": (-0.6, 0.5), "decline": (-0.4, 0.4), "cuts": (-0.2, 0.3),
}

_NEGATIONS = frozenset({"not", "no", "never", "cannot", "hardly"})
_WORD_RE = re.compile(r"[A-Za-z']+")


def sentiment(text: str) -> tuple[float, float]:
    """(polarity, subjectivity) — textblob's PatternAnalyzer when
    available (sentiment.py:16-23 exactly), else the lexicon stand-in."""
    if _use("textblob", HAS_TEXTBLOB):
        s = _textblob.TextBlob(text).sentiment
        return s.polarity, s.subjectivity
    return sentiment_standin(text)


def sentiment_standin(text: str) -> tuple[float, float]:
    """(polarity, subjectivity); (0.0, 0.0) when nothing matches —
    deterministic lexicon stand-in for TextBlob's PatternAnalyzer."""
    tokens = [t.lower() for t in _WORD_RE.findall(text)]
    pols: list[float] = []
    subjs: list[float] = []
    for i, tok in enumerate(tokens):
        entry = _LEXICON.get(tok)
        if entry is None:
            continue
        pol, subj = entry
        if i > 0 and (tokens[i - 1] in _NEGATIONS
                      or tokens[i - 1].endswith("n't")):
            pol = -0.5 * pol  # pattern-style negation damping
        pols.append(pol)
        subjs.append(subj)
    if not pols:
        return 0.0, 0.0
    return sum(pols) / len(pols), sum(subjs) / len(subjs)


# ---------------------------------------------------------------------------
# Reading age — identical formulas; tokenizer/syllable stand-ins
# ---------------------------------------------------------------------------

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+(?=[\"'\(\[]?[A-Z0-9])")
_TOKEN_RE = re.compile(r"[A-Za-z]+(?:['\-][A-Za-z]+)*|\d+(?:\.\d+)?|[^\w\s]")

_PUNCT_CATS = frozenset({"Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po"})
_PUNCT_ASCII = frozenset(string.punctuation)


def sent_tokenize(text: str) -> list[str]:
    """nltk punkt when available (readingage.py:60), else regex split."""
    if _use("nltk_tokenize", HAS_NLTK_TOKENIZE):
        return _nltk.tokenize.sent_tokenize(text)
    return sent_tokenize_standin(text)


def sent_tokenize_standin(text: str) -> list[str]:
    text = text.strip()
    if not text:
        return []
    return [s for s in _SENT_SPLIT.split(text) if s.strip()]


def word_tokenize(text: str) -> list[str]:
    """nltk punkt when available (readingage.py:61), else regex."""
    if _use("nltk_tokenize", HAS_NLTK_TOKENIZE):
        return _nltk.tokenize.word_tokenize(text)
    return word_tokenize_standin(text)


def word_tokenize_standin(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


@lru_cache(maxsize=65536)
def _strip_punct_one(tok: str) -> str:
    """Identical algorithm to the reference (readingage.py:94-103);
    token-level cache — natural text repeats tokens heavily."""
    return "".join(
        x for x in tok
        if unicodedata.category(x) not in _PUNCT_CATS and x not in _PUNCT_ASCII
    )


def strip_punct_toks(toks: Iterable[str]) -> Iterable[str]:
    for tok in toks:
        ntok = _strip_punct_one(tok)
        if ntok:
            yield ntok


def split_hyphenated(toks: Iterable[str]) -> Iterable[str]:
    for tok in toks:
        yield from tok.split("-")


@lru_cache(maxsize=65536)
def count_syllables(word: str) -> int | None:
    """CMU pronouncing dictionary when available (readingage.py:77-91:
    first pronunciation's syllable count; words NOT in the dictionary
    return None and are omitted from the tally — no per-word fallback to
    the heuristic, mirroring the reference exactly), else the vowel-group
    stand-in."""
    if _use("cmu", HAS_CMU_DICT):
        try:
            return _pronouncing.syllable_count(
                _pronouncing.phones_for_word(word.lower())[0])
        except IndexError:
            return None
    return count_syllables_standin(word)


@lru_cache(maxsize=65536)
def count_syllables_standin(word: str) -> int | None:
    """Vowel-group heuristic (CMU-dictionary stand-in). Returns None for
    tokens with no letters — mirroring words absent from the CMU dict,
    which the reference simply omits from the syllable tally."""
    w = word.lower()
    if not any(c.isalpha() for c in w):
        return None
    groups = re.findall(r"[aeiouy]+", w)
    n = len(groups)
    if w.endswith("e") and not w.endswith(("le", "ee")) and n > 1:
        n -= 1
    return max(1, n)


def reading_scores(text: str) -> tuple[float, float] | None:
    """(fleschreadingease, kincaidgradelevel) with the exact coefficients
    of readingage.py:69-74; None when there are no sentences/words."""
    sents = sent_tokenize(text)
    nsent = len(sents)
    words = list(strip_punct_toks(word_tokenize(text)))
    nwords = len(words)
    sylls = [c for c in (count_syllables(w) for w in split_hyphenated(words)) if c]
    nsylls = sum(sylls)
    nsyllwords = len(sylls)
    if nsyllwords == 0 or nsent == 0:
        return None
    flesch = 206.835 - 1.015 * (nwords / nsent) - 84.6 * (nsylls / nsyllwords)
    kincaid = 0.39 * (nwords / nsent) + 11.8 * (nsylls / nsyllwords) - 15.59
    return flesch, kincaid


# ---------------------------------------------------------------------------
# Named people — capitalized-run heuristic (nltk ne_chunk stand-in)
# ---------------------------------------------------------------------------

_HONORIFICS = frozenset({
    "Mr", "Mrs", "Ms", "Dr", "Sir", "Dame", "Lord", "Lady", "President",
    "Senator", "Governor", "Mayor", "Judge", "Professor", "Prime", "Minister",
})
_NONNAME = frozenset({
    "The", "A", "An", "In", "On", "At", "Of", "For", "And", "But", "It",
    "He", "She", "They", "We", "I", "You", "This", "That", "These", "Those",
    "However", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday", "Sunday", "January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December",
})
_CAP_RE = re.compile(r"^[A-Z][a-z]+$")


def named_people(text: str) -> list[str]:
    """nltk ne_chunk PERSON entities when available (namedpeople.py:50-57
    verbatim: ne_chunk(pos_tag(word_tokenize)) → PERSON subtrees joined
    with spaces, duplicates kept), else the TitleCase-run stand-in."""
    if _use("nltk_ner", HAS_NLTK_NER):
        ents = _nltk.ne_chunk(_nltk.pos_tag(_nltk.word_tokenize(text)))
        return [
            " ".join(tok for tok, _tag in t.leaves())
            for t in ents
            if isinstance(t, _nltk.Tree) and t.label() == "PERSON"
        ]
    return named_people_standin(text)


def named_people_standin(text: str) -> list[str]:
    """Runs of ≥2 consecutive TitleCase tokens → candidate person names.
    Keeps duplicates in encounter order (the reference does not de-dupe,
    namedpeople.py:60-63)."""
    tokens = word_tokenize_standin(text)
    people: list[str] = []
    run: list[str] = []
    for tok in tokens:
        if _CAP_RE.match(tok) and tok not in _NONNAME:
            run.append(tok)
        else:
            _flush_run(run, people)
            run = []
    _flush_run(run, people)
    return people


def _flush_run(run: list[str], out: list[str]) -> None:
    core = [t for t in run if t not in _HONORIFICS]
    if len(core) >= 2:
        out.append(" ".join(core))
