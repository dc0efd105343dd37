"""End-to-end `spark-submit --py-files` deployment proof.

The north rule's deployment clause is "run via spark-submit --py-files on
a multi-executor cluster". The sandbox has no cluster, but the packaging
contract IS testable: build the deterministic zip, then drive a real
`spark-submit --master local[2] --py-files risjbot_spark.zip` crawl from a
scratch cwd with a scrubbed PYTHONPATH, so the package can ONLY resolve
from the zip. A fresh JVM + python worker pool boots, so this is the one
deliberately slow test in the suite.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from package_pyfiles import build_zip  # noqa: E402

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_zip_is_deterministic_and_complete(tmp_path):
    a, b = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    ha, hb = build_zip(a), build_zip(b)
    assert ha == hb, "same tree must produce a byte-identical artifact"
    names = set(zipfile.ZipFile(a).namelist())
    # package layout preserved: top-level modules and every subpackage
    for required in [
        "risjbot_spark/__init__.py",
        "risjbot_spark/__main__.py",
        "risjbot_spark/crawl.py",
        "risjbot_spark/frontier/state.py",
        "risjbot_spark/extract/semantics.py",
        "risjbot_spark/sources/feeds.py",
        "risjbot_spark/store/snapshots.py",
        "risjbot_spark/streaming/ops.py",
    ]:
        assert required in names
    assert not any("__pycache__" in n for n in names)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_conf_wins_over_session_defaults(tmp_path):
    """Builder .config() silently overrides spark-submit --conf, so
    _session() must apply its defaults only for keys not set externally:
    an operator's --conf spark.sql.shuffle.partitions must survive, while
    unset keys (session timezone) still get the app defaults."""
    zip_path = str(tmp_path / "risjbot_spark.zip")
    build_zip(zip_path)
    probe = tmp_path / "probe.py"
    probe.write_text(
        "from risjbot_spark.__main__ import _session\n"
        "s = _session()\n"
        "print('EFF=' + s.conf.get('spark.sql.shuffle.partitions')\n"
        "      + ' TZ=' + s.conf.get('spark.sql.session.timeZone'))\n")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "SPARK_HOME")}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=111",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, str(probe)],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "EFF=111 TZ=UTC" in proc.stdout, proc.stdout[-500:]


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_pyfiles_crawl(spark, tmp_path):
    # --- inputs written by the (separate) test session ------------------
    from risjbot_spark.corpus import pages_df

    pages_path = str(tmp_path / "pages")
    pages_df(spark, 48, partitions=2).write.parquet(pages_path)
    urls = [r["url"] for r in
            spark.read.parquet(pages_path).select("url").collect()]
    seeds_path = tmp_path / "seeds.txt"
    seeds_path.write_text("\n".join(urls[:30]) + "\n")

    zip_path = str(tmp_path / "risjbot_spark.zip")
    build_zip(zip_path)
    driver = tmp_path / "driver.py"
    shutil.copyfile(os.path.join(REPO, "tools", "submit_driver.py"),
                    driver)

    # --- scrubbed environment: the package must come from the zip -------
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "SPARK_HOME")}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    wh = str(tmp_path / "wh")
    proc = subprocess.run(
        [SPARK_SUBMIT,
         "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         str(driver),
         "crawl", "--pages", pages_path, "--seeds", str(seeds_path),
         "--warehouse", wh, "--rounds", "1", "--partitions", "4"],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed:\n{proc.stderr[-4000:]}")

    manifest = json.load(open(os.path.join(wh, "articles",
                                           "snap-1.manifest.json")))
    arts = spark.read.parquet(*manifest["files"])
    assert 0 < arts.count() <= 30
    assert {"url_canon", "headline", "bodytext"} <= set(arts.columns)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_ships_library_doubles_to_executors(tmp_path):
    """r3 verdict item #5 — the executor-level seam proof. The fat zip
    (risjbot_spark + the vendored API doubles from tests/fixtures/
    fakelibs) ships through --py-files; worker PROCESSES must then (a)
    report the doubles via backend_flags(), and (b) produce extraction
    values through the real-library dispatch branch — pinned by the
    driver, executed in the workers — not the stand-in heuristics.
    FAKE_POLARITY/FAKE_SYLLABLES are distinctive constants no stand-in
    produces, so a value match proves WHICH branch ran worker-side."""
    zip_path = str(tmp_path / "risjbot_fat.zip")
    build_zip(zip_path,
              extra_pkg_dirs=[os.path.join(REPO, "tests", "fixtures",
                                           "fakelibs")])
    names = set(zipfile.ZipFile(zip_path).namelist())
    assert {"textblob/__init__.py", "pronouncing/__init__.py",
            "risjbot_spark/extract/nlp.py"} <= names

    probe = tmp_path / "probe.py"
    probe.write_text(
        "import json\n"
        "import pandas as pd\n"
        "from pyspark.sql import SparkSession\n"
        "from risjbot_spark.extract import nlp\n"
        "from risjbot_spark.udfs import make_sentiment_udf\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "print('DRIVER=' + json.dumps(nlp.backend_flags()))\n"
        "def probe(it):\n"
        "    from risjbot_spark.extract import nlp as wnlp\n"
        "    flags = wnlp.backend_flags()\n"
        "    for pdf in it:\n"
        "        yield pd.DataFrame({\n"
        "            'textblob': [flags['textblob']] * len(pdf),\n"
        "            'cmu': [flags['cmu']] * len(pdf),\n"
        "            'syl': [wnlp.count_syllables('word')] * len(pdf)})\n"
        "rows = (spark.range(4).repartition(2)\n"
        "        .mapInPandas(probe, 'textblob boolean, cmu boolean, "
        "syl int').collect())\n"
        "print('WORKER=' + json.dumps(sorted(\n"
        "    [r['textblob'], r['cmu'], r['syl']] for r in rows)))\n"
        "sdf = spark.createDataFrame([('any text',)], 'text string')\n"
        "sent = sdf.select(make_sentiment_udf()('text').alias('s'))"
        ".select('s.*').first()\n"
        "print('SENTIMENT=%.3f' % sent['sentiment'])\n"
        "spark.stop()\n")

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "SPARK_HOME")}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=2",
         "--py-files", zip_path, str(probe)],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    driver_flags = json.loads(out.split("DRIVER=")[1].splitlines()[0])
    assert driver_flags["textblob"] and driver_flags["cmu"]
    worker = json.loads(out.split("WORKER=")[1].splitlines()[0])
    # every worker row: doubles importable + FAKE_SYLLABLES value
    assert worker and all(r == [True, True, 2] for r in worker)
    # the engine's sentiment UDF (driver-pinned flags, worker-executed)
    # carries textblob-double values — FAKE_POLARITY, not the stand-in
    assert "SENTIMENT=0.123" in out


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_media_decode_dispatch_in_workers(tmp_path):
    """The multimodal half of the executor-seam proof: PIL + soundfile
    doubles ship in the --py-files zip, the DRIVER probes them available
    (use_fake_decode -> real branch) and pins that in the mapInPandas
    closures, and WORKER processes must then produce the doubles'
    distinctive values — PIL double: 2x2x3 arange(12) ramp; soundfile
    double: channel-mean waveform [0.3, 0.7] — proving the real-library
    dispatch path executes inside executors, not just driver-side."""
    zip_path = str(tmp_path / "risjbot_media.zip")
    build_zip(zip_path,
              extra_pkg_dirs=[os.path.join(REPO, "tests", "fixtures",
                                           "fakelibs")])
    assert {"PIL/__init__.py", "soundfile/__init__.py"} <= set(
        zipfile.ZipFile(zip_path).namelist())

    probe = tmp_path / "probe_media.py"
    probe.write_text(
        "import json\n"
        "import numpy as np\n"
        "from pyspark.sql import SparkSession\n"
        "from risjbot_spark import multimodal as M\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "print('FLAGS=' + json.dumps(M.backend_flags()))\n"
        "rows = [(1, 'image', b'img-bytes', {}), (2, 'audio', b'wav', {})]\n"
        "media = spark.createDataFrame(rows, 'media_id long, kind string,"
        " content binary, meta map<string,string>').repartition(2)\n"
        "rz = {r['media_id']: bytes(r['pixels'])\n"
        "      for r in M.resize_images(media, width=2, height=2)"
        ".collect()}\n"
        "print('PIXELS=' + rz[1].hex())\n"
        "feats = {r['media_id']: r['feature']\n"
        "         for r in M.extract_features(media).collect()}\n"
        "wave = np.clip((np.array([0.3, 0.7]) + 1.0) * 127.5, 0, 255)"
        ".astype('uint8')\n"
        "hist, _ = np.histogram(wave, bins=64, range=(0, 256))\n"
        "want = (hist / hist.sum()).astype('float32')\n"
        "got = np.array(feats[2], dtype='float32')\n"
        "print('AUDIO_MATCH=' + str(bool(np.allclose(got, want))))\n"
        "spark.stop()\n")

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "SPARK_HOME")}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=2",
         "--py-files", zip_path, str(probe)],
        cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = proc.stdout
    flags = json.loads(out.split("FLAGS=")[1].splitlines()[0])
    assert flags["image"] and flags["audio"]
    # PIL double's arange(12) ramp, identity-resized at 2x2
    assert "PIXELS=" + bytes(range(12)).hex() in out
    assert "AUDIO_MATCH=True" in out
