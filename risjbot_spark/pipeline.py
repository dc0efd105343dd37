"""End-to-end curation pipeline: corpus DataFrame → training-ready corpus.

One call composes the library's stages in the canonical order a
training-data run uses them:

    text repair     boilerplate strip → PII scrub → duplicated-span strip
    row filters     quality gate → near-dup survivors → decontamination
    corpus shaping  data-mix downsample → train/val/test split

Everything stays ONE declarative plan (the row filters are pure
filters/anti-joins, so Catalyst fuses them into the corpus scan);
per-stage lineage counts ride `Observation` nodes at each boundary —
the engine's zero-extra-job counter device (crawl.py uses the same
pattern for round lineage) — so a single downstream action (the
caller's write, or `CurationResult.report()`'s count) yields every
stage's surviving-row count.

Eagerness caveat: the near-dedup stage runs connected components,
which iterates with its own Spark actions — so `curate()` with
`near_dedup=` does work at call time (everything else is lazy until
the caller acts).

Reference parity: RISJbot has no corpus-curation surface (its pipeline
ends at per-article NewsItems); this module is the LLM-training-data
composition the brief adds, built entirely from the library ops that
are each oracle-gated on their own.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from . import dedup as _dedup
from . import textquality as _tq

__all__ = ["holdout_split", "leakage_safe_split", "curate",
           "CurationResult"]


def holdout_split(df: DataFrame, id_col: str, *,
                  val_permille: int = 10,
                  test_permille: int = 10,
                  bucket=None,
                  resolution: int = 1000,
                  out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: a hash bucket of the
    document id (NOT an RNG — the same corpus always splits
    identically, across runs, partitionings, and cluster sizes, and a
    re-crawled document lands in the same split so eval never leaks
    into train on refresh). Buckets [0, val) → 'val', [val, val+test)
    → 'test', rest → 'train'. Pure projection: zero exchanges, composes
    into the corpus scan.

    Default bucket is pmod(xxhash64(id), resolution); pass `bucket` for
    a custom [0, resolution) expression (e.g. a multiplicative hash
    reproducible across engines for oracle checks, or a hash of a
    GROUP key so whole sites/domains split together — the right unit
    when near-duplicates cluster within a site)."""
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists in the "
                         "input; pick a fresh name")
    if val_permille < 0 or test_permille < 0 \
            or val_permille + test_permille > 1000:
        raise ValueError("val_permille/test_permille must be >= 0 and "
                         "sum to <= 1000")
    if bucket is None:
        bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(resolution))
    val_hi = val_permille * resolution // 1000
    test_hi = val_hi + test_permille * resolution // 1000
    split = (F.when(bucket < val_hi, F.lit("val"))
             .when(bucket < test_hi, F.lit("test"))
             .otherwise(F.lit("train")))
    return df.withColumn(out_col, split)


def leakage_safe_split(df: DataFrame, id_col: str, pairs: DataFrame, *,
                       src: str = "id_a", dst: str = "id_b",
                       val_permille: int = 10,
                       test_permille: int = 10,
                       resolution: int = 1000,
                       out_col: str = "split",
                       bucket_of=None,
                       max_iters: int = 12,
                       checkpoint_dir: "str | None" = None) -> DataFrame:
    """Near-dup-AWARE holdout split: every document splits by its dedup
    cluster's representative (the min-id member, from connected
    components over the verified near-dup `pairs`), singletons by their
    own id — so two near-duplicates can NEVER straddle train and eval.
    A plain id-hash split leaks: with 10% duplication and a 1% eval
    slice, a large fraction of "held-out" documents have a near-copy in
    train, and the eval measures memorization, not generalization.

    `pairs` is the verified edge list (dedup.minhash_dedup /
    simhash_dedup output); bucket_of, when given, maps the
    representative column to a [0, resolution) bucket expression
    (default pmod(xxhash64(rep))). The corpus-side cost is ONE left
    join against the (tiny) labeled-node table; CC iterates on edges
    only."""
    for c in ("_rep",):
        if c in df.columns:
            raise ValueError(f"input column {c!r} collides with an "
                             "internal column of leakage_safe_split")
    labels = _dedup.connected_components(
        pairs, src, dst, max_iters=max_iters,
        checkpoint_dir=checkpoint_dir)
    lab = labels.select(F.col("node").alias(id_col),
                        F.col("lbl").alias("_rep"))
    d = df.join(lab, id_col, "left")
    rep = F.coalesce(F.col("_rep"), F.col(id_col))
    if bucket_of is not None:
        bucket = bucket_of(rep)
    else:
        # hash rep in the id column's OWN type — identical to
        # holdout_split's default xxhash64(id) for singletons, so a
        # document in no near-dup cluster keeps the assignment a plain
        # holdout_split gave it (a re-split on corpus refresh must not
        # reshuffle the un-clustered majority).
        bucket = F.pmod(F.xxhash64(rep), F.lit(resolution))
    out = holdout_split(d, id_col, val_permille=val_permille,
                        test_permille=test_permille, bucket=bucket,
                        resolution=resolution, out_col=out_col)
    return out.drop("_rep")


@dataclass
class CurationResult:
    """`docs` is the curated corpus (lazy); `observations` maps stage
    names to their Observation counters; `persisted` holds any
    intermediates curate(persist=True) pinned — call unpersist() when
    done with `docs`."""
    docs: DataFrame
    stages: "list[str]" = field(default_factory=list)
    observations: "dict[str, Observation]" = field(default_factory=dict)
    persisted: "list[DataFrame]" = field(default_factory=list)
    stage_dfs: "dict[str, DataFrame]" = field(default_factory=dict)

    def unpersist(self) -> None:
        for df in self.persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self.persisted.clear()

    def report(self, *, run: bool = True,
               exact: bool = False) -> "dict[str, int]":
        """Per-stage surviving-row counts. With run=True (default) a
        single count() materializes the plan so every Observation
        fires; pass run=False if you already ran an action on `docs`
        (a write, a count) — the counters kept that first action's
        values and this just reads them.

        exact=True counts each recorded stage DataFrame with its own
        count() job instead of reading Observations — one extra job per
        stage, but immune to the CollectMetrics re-instantiation issue
        (a chain with two or more self-referencing stages — span-strip
        plus near-dedup — can leave upstream observation rows empty
        even across pinned boundaries).  With curate(persist=True)
        stages downstream of a pinned boundary count off the cached
        blocks rather than recomputing; the 'input' stage is recorded
        BEFORE the observe wrapper (the cached node is the wrapped
        child, which the cache manager won't substitute here), so its
        count re-scans the raw source once."""
        if exact:
            return {name: df.count()
                    for name, df in self.stage_dfs.items()}
        if run:
            self.docs.count()
        out: "dict[str, int]" = {}
        for name, o in self.observations.items():
            try:
                out[name] = int(o.get["rows"])
            except Exception:
                # Observation.get's Python-side row pickling
                # (PythonSQLUtils.toPyRow) hits an AssertionError when
                # the observed node was DUPLICATED in the executed plan
                # — a stage that references its input more than once
                # (span-strip's flag+rebuild sides) re-instantiates
                # every upstream CollectMetrics.  The JVM-side row is
                # still correct (single `rows` long); read it directly.
                try:
                    out[name] = int(o._jo.getRow().get(0))
                except Exception:
                    # AQE can replace an all-empty subtree's
                    # CollectMetrics with EmptyRelation, leaving the row
                    # truly absent — same failure mode crawl.py's
                    # lineage resolve guards; an eliminated counter
                    # means zero rows flowed through it
                    out[name] = 0
        return out


def curate(df: DataFrame, id_col: str, text_col: str, *,
           boilerplate: "dict | None" = None,
           pii: "dict | None" = None,
           span_dedup: "dict | None" = None,
           quality: "dict | None" = None,
           classifier: "dict | None" = None,
           dsir: "dict | None" = None,
           near_dedup: "dict | None" = None,
           span_dedup_after_near_dedup: bool = False,
           decontam_eval: "DataFrame | None" = None,
           decontam: "dict | None" = None,
           mix: "dict | None" = None,
           split: "dict | None" = None,
           observe: bool = True,
           persist: bool = False) -> CurationResult:
    """Compose the curation stages; every kwarg is None (stage skipped)
    or a kwargs dict forwarded to the stage's library function:

      boilerplate → textquality.strip_boilerplate
      pii         → textquality.pii_scrub (with_counts defaults False)
      span_dedup  → dedup.strip_duplicate_spans
      quality     → textquality.quality_filter
      classifier  → model-based filter (textquality.
                    quality_classifier_score): pass a trained
                    {"model": QualityClassifier} or raw
                    {"weights": [...], "intercept": b}, plus optional
                    min_prob (default 0.5, NULL text drops like the
                    heuristic gate) and keep_score=True to keep the
                    q_prob column.  Runs AFTER the cheap heuristic gate
                    and BEFORE near-dedup, so the shuffle-heavy stages
                    see the already-thinned corpus; the stage itself is
                    a zero-shuffle projection
      dsir        → textquality.dsir_select options plus the required
                    "target" DataFrame (the corpus whose distribution
                    you want more of).  NOTE: the two distribution
                    histograms are estimated over the corpus AS GATED
                    SO FAR and collected eagerly at curate() call time
                    (dim-bounded — driver-safe), so this stage runs
                    the upstream plan; persist=True pins the boundary
      near_dedup  → dedup.minhash_dedup geometry, plus optional
                    max_iters / checkpoint_dir for the component step;
                    survivors keep the smallest id per cluster.  For
                    template-heavy corpora raise rows_per_band (see
                    minhash_dedup's GEOMETRY AT SCALE note: band
                    buckets cost |bucket|² pairs, and 0.5-sim document
                    families explode the 2×3 default at 10^6+ docs)

    span_dedup_after_near_dedup=True moves the span_dedup stage from
    its default early slot to AFTER near-dedup, so the gram-stream
    window — the chain's single heaviest exchange — runs over the
    survivor set only.  Budget math at 100 TB: span-strip shuffles one
    row per token-gram, i.e. roughly (tokens × ~3 columns of 8-byte
    hash/id/pos) ≈ 0.5–1× the corpus's text bytes through one exchange
    (measured 9,738 docs/s at 10^6 docs on local[32],
    BENCH/span_scale_1m.json).  If near-dedup drops 30–50% of a crawl
    corpus (typical for CC-scale web text), survivor-first cuts that
    dominant shuffle by the same fraction.  SEMANTIC difference, not
    just cost: in the default order, span-stripping runs first and
    near-dedup shingles the STRIPPED text (boilerplate-heavy near-dups
    are easier to catch once shared spans are gone); survivor-first
    dedups the raw text and only survivors get stripped — documents
    whose similarity lived in the duplicated spans may escape
    near-dedup.  Choose survivor-first when the span pass is the cost
    driver and near-dup pairs are expected to be near-dups with or
    without the shared spans.
      decontam    → textquality.decontaminate options + max_hit_frac
                    (docs with hit_frac ABOVE it are dropped; requires
                    decontam_eval, the evaluation-set DataFrame with
                    the same text_col)
      mix         → textquality.mix_sample: group_cols (required),
                    weights, and any of its keyword options
      split       → holdout_split options

    persist=True pins the corpus (MEMORY_AND_DISK — spills, never
    recomputes) at each boundary a later stage references more than
    once: before span-strip (two gram-stream scans + the doc rebuild
    read it), before near-dedup (the shingle pipeline AND the survivor
    anti-join both read it) and before decontamination (the overlap
    join and the final filter both read it).  Observe-lineage caveat:
    with persist=False and a span_dedup stage, the counters observed
    UPSTREAM of span-strip can come back 0 — the stage re-instantiates
    every upstream CollectMetrics and AQE may leave the observation's
    row empty; persist=True makes every counter fire exactly once at
    its cache boundary, so lineage is exact.  MEASURE before flipping
    it: at bench scale (6k docs) the materialization overhead LOSES to
    recompute (41 s vs 27 s, A/B'd in one session) because the
    upstream chain is a cheap pruned scan; it wins when the upstream
    is expensive relative to the intermediate's size (a 100 TB scan
    feeding a 1 TB filtered corpus).  On a real cluster the equivalent
    is writing the intermediate table; callers own the lifetime via
    CurationResult.unpersist().

    Returns CurationResult(docs, stages, observations, persisted)."""
    from pyspark.storagelevel import StorageLevel

    if decontam is not None and decontam_eval is None:
        raise ValueError("decontam options given without decontam_eval")
    d = df
    stages: "list[str]" = []
    obs: "dict[str, Observation]" = {}
    persisted: "list[DataFrame]" = []
    stage_dfs: "dict[str, DataFrame]" = {}

    def _pin() -> None:
        nonlocal d
        if persist:
            d = d.persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(d)

    def _mark(name: str) -> None:
        nonlocal d
        stages.append(name)
        stage_dfs[name] = d
        if observe:
            o = Observation()
            d = d.observe(o, F.count(F.lit(1)).alias("rows"))
            obs[name] = o

    _mark("input")
    if boilerplate is not None:
        # boilerplate-strip reads its input twice (line-frequency set +
        # doc rebuild) — pin for the same single-materialization /
        # exact-lineage reasons as the span stage below
        _pin()
        d = _tq.strip_boilerplate(d, text_col, **boilerplate)
        stages.append("boilerplate_strip")
    if pii is not None:
        d = _tq.pii_scrub(d, text_col, **{"with_counts": False, **pii})
        stages.append("pii_scrub")
    if span_dedup is not None and not span_dedup_after_near_dedup:
        # span-strip references its input THREE times (two gram-stream
        # scans + the doc rebuild); _pin makes those reads share one
        # materialization — and, with observe=True, keeps the upstream
        # Observation counters readable: re-instantiated CollectMetrics
        # under AQE can leave an observation's row empty, while a
        # cached boundary fires each counter exactly once
        _pin()
        d = _dedup.strip_duplicate_spans(d, id_col, text_col,
                                         **span_dedup)
        stages.append("span_dedup")
    if quality is not None:
        d = _tq.quality_filter(d, text_col, **quality)
        _mark("after_quality")
    if classifier is not None:
        weights, intercept, min_prob, keep_score, out_col = \
            _tq.resolve_classifier_opts(classifier)
        if min_prob is None and not keep_score:
            raise ValueError("classifier with min_prob=None is "
                             "annotate-only — set keep_score=True or "
                             "give a threshold")
        d = _tq.quality_classifier_score(d, text_col, weights,
                                         intercept=intercept,
                                         out_col=out_col)
        if min_prob is not None:
            # NULL text scores NULL and NULL >= x is not true → dropped,
            # matching the heuristic gate's NULL-text behavior
            d = d.filter(F.col(out_col) >= min_prob)
        if not keep_score:
            d = d.drop(out_col)
        _mark("after_classifier")
    if dsir is not None:
        ds = dict(dsir)
        tgt = ds.pop("target", None)
        if tgt is None:
            raise ValueError("dsir options need 'target' (the "
                             "DataFrame whose distribution to match)")
        _pin()   # the histogram estimate AND the scorer both read d
        d = _tq.dsir_select(d, text_col, tgt, **ds)
        _mark("after_dsir")
    if near_dedup is not None:
        _pin()
        nd = dict(near_dedup)
        cc = {k: nd.pop(k) for k in ("max_iters", "checkpoint_dir")
              if k in nd}
        pairs = _dedup.minhash_dedup(d, id_col, text_col, **nd)
        _clusters, d = _dedup.cluster_and_survivors(d, id_col, pairs,
                                                    **cc)
        _mark("after_near_dedup")
    if span_dedup is not None and span_dedup_after_near_dedup:
        # survivor-first ordering: the gram-stream exchange runs over
        # the post-near-dedup corpus only (cost + semantics rationale
        # in the docstring); same pin rationale as the early slot
        _pin()
        d = _dedup.strip_duplicate_spans(d, id_col, text_col,
                                         **span_dedup)
        stages.append("span_dedup")
    if decontam_eval is not None:
        _pin()
        dc = dict(decontam or {})
        max_hit = dc.pop("max_hit_frac", 0.0)
        ev = decontam_eval
        if id_col not in ev.columns:
            # decontaminate shingles the eval side per-row then drops
            # the id, so any unique value serves
            ev = ev.withColumn(id_col, F.monotonically_increasing_id())
        hits = _tq.decontaminate(d, ev, id_col, text_col, **dc)
        bad = hits.filter(F.col("hit_frac") > max_hit).select(id_col)
        d = d.join(bad, id_col, "left_anti")
        _mark("after_decontam")
    if mix is not None:
        mx = dict(mix)
        group_cols = mx.pop("group_cols")
        weights = mx.pop("weights", None)
        d = _tq.mix_sample(d, group_cols, weights,
                           **{"id_col": id_col, **mx})
        _mark("after_mix")
    if split is not None:
        d = holdout_split(d, id_col, **split)
        stages.append("split")
    _mark("output")
    return CurationResult(docs=d, stages=stages, observations=obs,
                          persisted=persisted, stage_dfs=stage_dfs)
