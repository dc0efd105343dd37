"""Prove the real-library adapter seams EXECUTE (r2 verdict item #5):
vendored fixture doubles expose the textblob / nltk / pronouncing /
readability-lxml API surfaces, so both branches of every dispatch seam
run in this container — the stand-in branch (default) and the
real-library branch (with the doubles on sys.path)."""

import importlib
import os
import sys

import pytest

FAKES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "fixtures", "fakelibs")
_LIB_ROOTS = ("textblob", "nltk", "pronouncing", "readability", "lxml")


def _reload_seams():
    """Purge the fake/real libraries and re-execute the seam modules'
    import-time probes. importlib.reload mutates the existing module
    objects in place, so references held by udfs/semantics stay valid."""
    for m in list(sys.modules):
        if m.split(".")[0] in _LIB_ROOTS:
            del sys.modules[m]
    import risjbot_spark.extract.nlp as nlp
    import risjbot_spark.extract.readability as rd
    nlp = importlib.reload(nlp)
    rd = importlib.reload(rd)
    nlp.count_syllables.cache_clear()
    nlp.count_syllables_standin.cache_clear()
    return nlp, rd


@pytest.fixture
def fake_libs():
    sys.path.insert(0, FAKES)
    try:
        yield _reload_seams()
    finally:
        sys.path.remove(FAKES)
        nlp, rd = _reload_seams()
        assert not nlp.HAS_TEXTBLOB and not rd.HAS_READABILITY_LXML


def test_nlp_seam_dispatches_to_real_libraries(fake_libs):
    nlp, _rd = fake_libs
    assert nlp.HAS_TEXTBLOB and nlp.HAS_NLTK_TOKENIZE
    assert nlp.HAS_NLTK_NER and nlp.HAS_CMU_DICT
    # sentiment comes from the double's constants, not the lexicon
    assert nlp.sentiment("a bad terrible day") == (0.123, 0.456)
    assert nlp.sentiment_standin("a bad terrible day") != (0.123, 0.456)
    # NER runs ne_chunk(pos_tag(word_tokenize)) through the double
    assert nlp.named_people("John Smith visited") == ["John Smith visited"] \
        or nlp.named_people("John Smith visited lower town") == ["John Smith"]
    # syllables come from the CMU double (2 per word); 'q' words are OOV
    # → IndexError path → None, mirroring the reference's omission
    assert nlp.count_syllables("anything") == 2
    assert nlp.count_syllables("quixotic") is None
    # sentence split on the double's distinctive '|' separator
    assert nlp.sent_tokenize("one|two|three") == ["one", "two", "three"]


def test_reading_scores_through_real_seam(fake_libs):
    nlp, _rd = fake_libs
    # 2 sentences ('|' split), 4 words after punct-strip drops the
    # standalone '|' token, every word 2 syllables via the CMU double →
    # exact Flesch/Kincaid from the reference coefficients
    text = "alpha beta | gamma delta"
    flesch, kincaid = nlp.reading_scores(text)
    nwords, nsent, spw = 4, 2, 2.0
    assert flesch == pytest.approx(
        206.835 - 1.015 * (nwords / nsent) - 84.6 * spw)
    assert kincaid == pytest.approx(
        0.39 * (nwords / nsent) + 11.8 * spw - 15.59)


def test_readability_seam_dispatches(fake_libs):
    _nlp, rd = fake_libs
    assert rd.HAS_READABILITY_LXML
    assert rd.short_title_from_html("<html></html>") \
        == "FAKE READABILITY TITLE"
    assert rd.body_texts_from_html("<html></html>") \
        == ["FAKE BODY ONE", "FAKE BODY TWO"]


def test_pin_backend_forces_standin_despite_libraries(fake_libs):
    """Driver-decided pinning (ADVICE #2): an all-off pin must force the
    stand-ins even when the libraries import fine."""
    nlp, rd = fake_libs
    try:
        nlp.pin_backend({"textblob": False, "nltk_tokenize": False,
                         "nltk_ner": False, "cmu": False})
        rd.pin_backend(False)
        assert nlp.sentiment("good") == nlp.sentiment_standin("good")
        assert nlp.sent_tokenize("one|two") == ["one|two"]
        assert rd.short_title_from_html("<x>") is None
    finally:
        nlp.pin_backend(None)
        rd.pin_backend(None)


def test_pin_backend_raises_when_pinned_lib_missing():
    """The heterogeneous-deployment guard: pinned-available but locally
    missing must raise, never silently fall back (one partition scoring
    with the stand-in would corrupt the run undetectably)."""
    import risjbot_spark.extract.nlp as nlp
    import risjbot_spark.extract.readability as rd
    assert not nlp.HAS_TEXTBLOB           # container has no textblob
    try:
        nlp.pin_backend({"textblob": True})
        with pytest.raises(RuntimeError, match="pinned available"):
            nlp.sentiment("anything")
        rd.pin_backend(True)
        with pytest.raises(RuntimeError, match="pinned available"):
            rd.use_real()
    finally:
        nlp.pin_backend(None)
        rd.pin_backend(None)


def test_udf_factory_captures_driver_flags():
    """The UDF factories embed the driver's probe in the closure (the
    channel that ships the decision to workers)."""
    from risjbot_spark import udfs
    flags = udfs._driver_backend_flags()
    assert set(flags) == {"textblob", "nltk_tokenize", "nltk_ner", "cmu",
                          "readability"}
    assert all(v is False for v in flags.values())   # this container
    # factory accepts explicit flags (what a driver ships)
    u = udfs.make_sentiment_udf(flags)
    assert u is not None


def test_pin_worker_repins_on_readability_only_change():
    """_pin_worker guards the nlp and readability pins INDEPENDENTLY: a
    warm worker that last ran a UDF with identical NLP flags but a
    different readability flag must still re-pin readability (a shared
    guard skipped it, leaving the worker on the stale backend — the
    silent real/stand-in mixing the seam exists to prevent)."""
    import risjbot_spark.extract.nlp as nlp
    import risjbot_spark.extract.readability as rd
    from risjbot_spark import udfs

    nlp_flags = {"textblob": False, "nltk_tokenize": False,
                 "nltk_ner": False, "cmu": False}
    try:
        udfs._pin_worker({**nlp_flags, "readability": False})
        assert rd._PINNED is False
        # same NLP subset, readability flips → must re-pin
        udfs._pin_worker({**nlp_flags, "readability": True})
        assert rd._PINNED is True
        assert nlp._PINNED == nlp_flags      # nlp pin untouched/equal
    finally:
        nlp.pin_backend(None)
        rd.pin_backend(None)


# ---------------------------------------------------------------------------
# Media decode probe seam (multimodal.py — r2 verdict item #8)
# ---------------------------------------------------------------------------

def _reload_multimodal():
    for m in list(sys.modules):
        if m.split(".")[0] in ("PIL", "soundfile"):
            del sys.modules[m]
    import risjbot_spark.multimodal as mm
    return importlib.reload(mm)


@pytest.fixture
def fake_media_libs():
    sys.path.insert(0, FAKES)
    try:
        yield _reload_multimodal()
    finally:
        sys.path.remove(FAKES)
        mm = _reload_multimodal()
        assert not mm.HAS_PIL and not mm.HAS_SOUNDFILE


def test_media_seam_dispatches_to_real_decoders(fake_media_libs):
    import numpy as np
    mm = fake_media_libs
    assert mm.HAS_PIL and mm.HAS_SOUNDFILE
    # image: the double's 2x2x3 ramp, not the 8x8x3 stand-in
    arr = mm.decode_image(b"png-bytes")
    assert arr.shape == (2, 2, 3) and arr.dtype == np.uint8
    assert (arr.ravel() == np.arange(12)).all()
    # fake=True still forces the stand-in even with the lib present
    assert mm.decode_image(b"png-bytes", fake=True).shape == (8, 8, 3)
    # audio: stereo double channel-averaged to mono
    wave = mm.decode_audio(b"wav-bytes")
    assert wave.dtype == np.float32
    assert np.allclose(wave, [0.3, 0.7])
    # the pipeline decision flips accordingly (video still fake: no
    # ffmpeg binary)
    fake_map = mm.use_fake_decode()
    assert fake_map == {"image": False, "audio": False, "video": True}
    # features flow through the REAL image decode
    f = mm._feature_of("image", b"png-bytes", fake_map)
    assert f.shape == (64,) and abs(float(f.sum()) - 1.0) < 1e-6


def test_media_video_seam_via_ffmpeg_runner(monkeypatch):
    """The ffmpeg path is probed by binary presence (not sys.path), so
    drive it through the monkeypatchable runner."""
    import numpy as np

    import risjbot_spark.multimodal as mm
    raw = bytes(range(192)) + bytes(range(192))

    def fake_run(args, stdin_bytes=None):
        assert args[0] == "-i" and "-pix_fmt" in args
        return raw
    monkeypatch.setattr(mm, "_run_ffmpeg", fake_run)
    monkeypatch.setattr(mm, "HAS_FFMPEG", True)
    frames = mm.sample_video_frames(b"mp4-bytes", n_frames=2)
    assert len(frames) == 2
    assert frames[0].shape == (8, 8, 3)
    assert (frames[0].ravel() == np.arange(192)).all()


def test_media_corrupt_blob_degrades_not_aborts(fake_media_libs):
    """Poison-pill guard: one corrupt blob on the REAL decode path
    yields (null pixels + error class) / null feature instead of an
    exception that would fail the whole mapInPandas stage after Spark's
    4 task retries. Missing-backend NotImplementedError stays loud."""
    import pytest

    mm = fake_media_libs
    assert mm.HAS_PIL
    # the double mirrors Pillow: corrupt bytes raise UnidentifiedImageError
    with pytest.raises(Exception, match="cannot identify"):
        mm.decode_image(b"corrupt...")
    px, err = mm.resize_row(b"corrupt...", fake=False, width=2, height=2)
    assert px is None and err == "UnidentifiedImageError"
    px, err = mm.resize_row(b"png-bytes", fake=False, width=2, height=2)
    assert err is None and len(px) == 2 * 2 * 3
    fake_map = mm.use_fake_decode()
    assert mm.feature_row("image", b"corrupt...", fake_map) is None
    f = mm.feature_row("image", b"png-bytes", fake_map)
    assert f is not None and len(f) == 64
    with pytest.raises(ValueError, match="unknown media kind"):
        mm.feature_row("pdf", b"x", fake_map)
    # a pinned-but-missing backend is a misconfiguration, never
    # swallowed into a null row (BackendMismatchError bypasses the guard)
    mm.pin_backend({"image": True})
    real_has = mm.HAS_PIL
    try:
        mm.HAS_PIL = False
        with pytest.raises(mm.BackendMismatchError, match="pinned available"):
            mm.resize_row(b"png-bytes", fake=False, width=2, height=2)
    finally:
        mm.HAS_PIL = real_has
        mm.pin_backend(None)


def test_media_pin_raises_when_backend_missing():
    import risjbot_spark.multimodal as mm
    assert not mm.HAS_PIL                  # container has no Pillow
    try:
        mm.pin_backend({"image": True})
        with pytest.raises(RuntimeError, match="pinned available"):
            mm.decode_image(b"x")
        mm.pin_backend({"image": False, "audio": False, "video": False})
        # pinned-off → stand-in decisions everywhere
        assert mm.use_fake_decode() == {"image": True, "audio": True,
                                        "video": True}
    finally:
        mm.pin_backend(None)


def test_tokenizer_seam_dispatches_and_guards(tmp_path):
    """The tokenization seam's real branch runs against the vendored
    `tokenizers` double (distinctive 2·words+1 counts), the stand-in
    matches the JVM expression's formula, and a pinned-but-absent
    worker fails loudly."""
    import importlib
    import pandas as pd

    import risjbot_spark.tokenization as tz

    # container default: no library, estimator formula
    assert not tz.HAS_TOKENIZERS
    assert tz.count_tokens_standin("abcdefgh xy") == 3   # ceil(8/4)+ceil(2/4)
    # pinned-available but absent → loud failure, never silent mixing
    tz.pin_backend({"tokenizers": True})
    try:
        with pytest.raises(RuntimeError, match="pinned available"):
            tz._use_real()
    finally:
        tz.pin_backend(None)

    sys.path.insert(0, FAKES)
    try:
        for m in list(sys.modules):
            if m.split(".")[0] == "tokenizers":
                del sys.modules[m]
        tz = importlib.reload(tz)
        assert tz.HAS_TOKENIZERS
        tok_file = tmp_path / "tok.json"
        tok_file.write_text("{}")
        out = tz._count_batch(pd.Series(["one two", None, "a b c"]),
                              str(tok_file))
        # 2·words+1: the double ran; NULL stays null (pandas NA)
        assert out[0] == 5 and out[2] == 7 and pd.isna(out[1])
    finally:
        sys.path.remove(FAKES)
        for m in list(sys.modules):
            if m.split(".")[0] == "tokenizers":
                del sys.modules[m]
        tz = importlib.reload(tz)
        assert not tz.HAS_TOKENIZERS
