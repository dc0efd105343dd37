"""Text-quality and contamination analysis over arbitrary DataFrames —
the repetition-signal and benchmark-decontamination half of the
training-data library (sibling of `dedup`/`ann`; same contract: caller
DataFrame + column NAMES, bench constants as parameter defaults).

Two capabilities a 100 TB training-data pipeline runs on every corpus:

  * repetition_signals — per-document repetitiveness statistics in the
    style of the Gopher quality rules (Rae et al. 2021, public):
    distinct-token ratio, most-frequent-token fraction, duplicate
    n-gram fraction. Pure per-row JVM expressions over the token array:
    ZERO shuffle, pushdown-friendly, cost bounded by document length —
    never an explode+groupBy over O(corpus tokens) rows.
  * decontaminate — flag training documents that share token n-grams
    with an evaluation/benchmark set (the standard n-gram-overlap
    decontamination used for public LLM training sets). The eval side
    is distinct-ed and BROADCAST (benchmarks are tiny next to a crawl);
    the training corpus explodes to distinct (id, ngram) rows and
    aggregates per id — one map-side-combinable shuffle on doc id, and
    the 100 TB side is never hashed across the cluster for the join.
    At production scale the join key would be a 64-bit hash of the
    n-gram rather than the string (same plan shape, ~8 bytes/key);
    the string form here keeps the DuckDB oracle engine-exact, since
    xxhash64 is not portable across engines.

Reference parity: RISJbot has no corpus-level quality/contamination
stage (its per-page QA is the fake-404/no-bodytext checks in
`/root/reference/RISJbot/spiders/base.py`); this module is part of the
LLM-training-data surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_rows, tokens_expr

__all__ = [
    "ngrams_expr",
    "repetition_exprs",
    "repetition_signals",
    "quality_filter",
    "mix_report",
    "decontaminate",
]

# internal working-column names, prefixed so they can't shadow a caller
# column under the arbitrary-schema contract (guards below still raise
# on a direct collision rather than silently misbehaving)
_TOKS = "__tq_toks"
_SH = "__tq_s"
_HIT = "__tq_hit"


def ngrams_expr(toks, n: int) -> Column:
    """Array of space-joined token n-grams from a token-array column —
    the non-exploded sibling of `dedup.shingle_rows`, built the same
    fast way (arrays_zip of n shifted slices, then one codegen'd
    concat_ws per gram; see shingle_rows' docstring for why the
    transform(sequence, slice) alternative is 10-20× slower). Guarded:
    short docs short-circuit to an empty array (Spark's sequence(1, 0)
    counts DOWN), and NULL tokens stay NULL."""
    if n < 1:
        raise ValueError(f"ngram size must be >= 1, got {n}")
    shift_len = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, shift_len) for i in range(n)])
    grams = F.transform(
        zipped,
        lambda t: F.concat_ws(" ", *[t[str(i)] for i in range(n)]))
    return (
        F.when(toks.isNull(), F.lit(None).cast("array<string>"))
        .when(F.size(toks) >= n, grams)
        .otherwise(F.array().cast("array<string>"))
    )


def repetition_signals(df: DataFrame, id_col: str, text_col: str,
                       *, ngram: int = 2,
                       round_dp: int = 6) -> DataFrame:
    """Per-document repetition statistics (Gopher-style quality rules):

      n_tokens             — lowercased str.split() token count
      distinct_token_ratio — |distinct tokens| / n_tokens
      top_token_frac       — occurrences of the modal token / n_tokens
      dup_ngram_frac       — 1 - |distinct n-grams| / |n-grams|

    NULL text yields NULL everywhere; an empty/whitespace-only doc has
    n_tokens = 0 and NULL ratios; a doc shorter than `ngram` tokens has
    NULL dup_ngram_frac (no n-grams to judge).

    All four are per-row expressions over the token array — the modal
    count is the longest equal-run of the SORTED token array (one
    array_sort + one aggregate pass, O(L log L) per row), never the
    per-distinct-token filter scan whose O(distinct × L) degenerates to
    O(L²) on long high-entropy web documents. That beats the explode +
    groupBy(id, token) alternative at corpus scale: no shuffle at all,
    and the scan stays a projection Catalyst can prune around."""
    if id_col in ("n_tokens", "distinct_token_ratio", "top_token_frac",
                  "dup_ngram_frac", _TOKS):
        raise ValueError(f"id_col {id_col!r} collides with an output or "
                         "internal column of repetition_signals")
    toks = tokens_expr(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias(_TOKS))
    sig = repetition_exprs(F.col(_TOKS), ngram=ngram, round_dp=round_dp)
    return d.select(
        id_col, *(expr.alias(name) for name, expr in sig.items()))


def repetition_exprs(toks, *, ngram: int = 2,
                     round_dp: int = 6) -> "dict[str, Column]":
    """The four repetition signals as named Column expressions over a
    token-array column — the composable form `repetition_signals` and
    the streaming quality gate both select from. Keys double as the
    canonical output column names."""
    n = F.size(toks)
    distinct_toks = F.array_distinct(toks)
    # longest run in the sorted array == count of the modal token; the
    # accumulator carries (previous token, current run, best run)
    zero = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("run"), F.lit(0).alias("best"))
    def _run_step(acc, w):
        run = (F.when(w.eqNullSafe(acc["prev"]), acc["run"] + 1)
               .otherwise(F.lit(1)))
        return F.struct(w.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))
    top_cnt = F.aggregate(F.array_sort(toks), zero, _run_step,
                          lambda acc: acc["best"])
    grams = ngrams_expr(toks, ngram)
    n_grams = F.size(grams)
    frac = (
        lambda num, den: F.when(den > 0, F.round(num / den, round_dp)))
    return {
        "n_tokens": n.cast("long"),
        "distinct_token_ratio": frac(F.size(distinct_toks), n),
        "top_token_frac": frac(top_cnt, n),
        "dup_ngram_frac": frac(n_grams - F.size(F.array_distinct(grams)),
                               n_grams),
    }


def quality_filter(df: DataFrame, text_col: str,
                   *, ngram: int = 2,
                   max_dup_ngram_frac: float = 0.3,
                   max_top_token_frac: float = 0.3,
                   min_distinct_ratio: float = 0.2,
                   with_signals: bool = False,
                   round_dp: int = 6) -> DataFrame:
    """APPLY the repetition-quality gate: return the rows of `df` that
    pass the Gopher-style thresholds — the kept corpus a training run
    actually reads, the same relationship `dedup.survivor_docs` has to
    the pair-finding ops. All caller columns survive; with
    `with_signals=True` the four signal columns are appended (guarded
    against caller-column collisions).

    Gate semantics match the streaming twin (`stream_quality_gate`):
    NULL-text rows are dropped (nothing to train on), and a document
    too short to judge a signal (NULL fraction — e.g. no n-grams)
    passes that check rather than being silently discarded.

    Plan shape at 100 TB: a pure projection + filter — ZERO exchanges,
    no join, no aggregation. The token array and its sort are computed
    once per row in one codegen'd stage; Catalyst prunes everything
    but `text_col` plus whatever the caller selects downstream, so the
    gate composes into the scan of a parquet corpus."""
    sig_names = ("n_tokens", "distinct_token_ratio", "top_token_frac",
                 "dup_ngram_frac")
    if _TOKS in df.columns:
        raise ValueError(f"input column {_TOKS!r} collides with an "
                         "internal column of quality_filter")
    if with_signals:
        clash = [c for c in sig_names if c in df.columns]
        if clash:
            raise ValueError(
                f"with_signals=True would overwrite caller columns "
                f"{clash}; rename them or pass with_signals=False")
    d = (df.filter(F.col(text_col).isNotNull())
         .withColumn(_TOKS, tokens_expr(F.col(text_col))))
    sig = repetition_exprs(F.col(_TOKS), ngram=ngram, round_dp=round_dp)
    passes = (
        F.coalesce(sig["dup_ngram_frac"] <= max_dup_ngram_frac,
                   F.lit(True))
        & F.coalesce(sig["top_token_frac"] <= max_top_token_frac,
                     F.lit(True))
        & F.coalesce(sig["distinct_token_ratio"] >= min_distinct_ratio,
                     F.lit(True)))
    kept = d.filter(passes)
    if with_signals:
        kept = kept.select(
            *df.columns, *(sig[n].alias(n) for n in sig_names))
    return kept.drop(_TOKS)


def mix_report(df: DataFrame, group_cols, text_col: str,
               *, ngram: int = 2, round_dp: int = 6) -> DataFrame:
    """Data-mix curation report: per-group document counts, token
    totals, corpus token share, and mean repetition signals — the table
    a training run sets mixture weights from (by source, language,
    domain tier, ...). `group_cols` is a column name or list of names.

    Output: group_cols..., n_docs, n_tokens, token_share,
    mean_distinct_token_ratio, mean_top_token_frac,
    mean_dup_ngram_frac. NULL-text documents count toward n_docs but
    contribute NULL tokens/signals (sum/avg skip them, matching SQL).

    Plan shape at 100 TB: ONE map-side-combinable exchange keyed by the
    group columns — the per-row signal expressions fold into partial
    aggregates inside the scan stage, so the shuffle carries one row
    per (partition, group), not per document. The `token_share` window
    then runs over the AGGREGATED relation only (cardinality = number
    of groups — sources × languages, thousands at web scale, never
    corpus-sized), so the single-partition window a naive plan would
    put on the corpus never appears."""
    from pyspark.sql import Window

    if isinstance(group_cols, str):
        group_cols = [group_cols]
    out_names = ("n_docs", "n_tokens", "token_share",
                 "mean_distinct_token_ratio", "mean_top_token_frac",
                 "mean_dup_ngram_frac")
    clash = [c for c in group_cols
             if c in out_names or c.startswith("__tq_")]
    if clash:
        raise ValueError(f"group column(s) {clash} collide with "
                         "mix_report output/internal columns")
    d = df.select(*group_cols,
                  tokens_expr(F.col(text_col)).alias(_TOKS))
    sig = repetition_exprs(F.col(_TOKS), ngram=ngram, round_dp=round_dp)
    scale = 10 ** round_dp

    # Group means are computed ENTIRELY in integer arithmetic: float
    # avg() is summation-order-dependent (engines and partitionings sum
    # in different orders), and when a mean of round_dp-rounded values
    # lands on an exact decimal half even a deterministic double is
    # rounded differently by different engines (Spark rounds the
    # shortest decimal string HALF_UP, C-family engines round the
    # binary value — 0.1268895 goes to .126890 vs .126889). So: per-row
    # values become exact scaled integers, the sum is an exact integer,
    # and round-half-up(s/c) is (2s+c) div (2c) — associative, exact,
    # and engine-independent; only then does the result become a double
    # (an exact division by the scale).
    def _k(col):
        return F.round(col * scale).cast("long")

    sums = [
        ("mean_distinct_token_ratio", "distinct_token_ratio"),
        ("mean_top_token_frac", "top_token_frac"),
        ("mean_dup_ngram_frac", "dup_ngram_frac"),
    ]
    agg = d.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum(sig["n_tokens"]).cast("long").alias("n_tokens"),
        *[x for out, name in sums for x in (
            F.sum(_k(sig[name])).alias(f"__tq_s_{out}"),
            F.count(sig[name]).alias(f"__tq_c_{out}"))])

    def _mean(out):
        s, c = f"__tq_s_{out}", f"__tq_c_{out}"
        return F.expr(
            f"CASE WHEN {c} > 0 THEN "
            f"CAST((2 * {s} + {c}) div (2 * {c}) AS DOUBLE) "
            f"/ {float(scale)} END")

    total = F.sum("n_tokens").over(Window.partitionBy())
    share = F.expr(  # same integer half-up as the means
        f"CASE WHEN __tq_total > 0 THEN "
        f"CAST((2 * n_tokens * {scale} + __tq_total) "
        f"div (2 * __tq_total) AS DOUBLE) / {float(scale)} END")
    return (
        agg.withColumn("__tq_total", total)
        .select(*group_cols, "n_docs", "n_tokens",
                share.alias("token_share"),
                *(_mean(out).alias(out) for out, _ in sums)))


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  id_col: str, text_col: str,
                  *, ngram: int = 5,
                  round_dp: int = 6,
                  broadcast_eval: bool = True) -> DataFrame:
    """Benchmark decontamination by token n-gram overlap: for every
    training document that shares at least one `ngram`-token shingle
    with the evaluation set, return

      (id_col, n_hits, n_doc_ngrams, hit_frac)

    where n_hits counts the doc's DISTINCT shingles that appear
    anywhere in the eval set and n_doc_ngrams its distinct-shingle
    total. Callers drop (or audit) rows above a hit_frac threshold.

    Plan shape at 100 TB: the eval side reduces to a distinct shingle
    set and is broadcast (benchmark suites are MBs, crawls are TBs),
    and the training side dedupes each doc's shingles INSIDE the row
    (array_distinct before the explode — all of a doc's shingles live
    in one source row, so no cross-partition distinct is ever needed).
    That leaves scan → explode → broadcast-hash-join → partial-agg with
    exactly ONE exchange on the 100 TB side, keyed by doc id and
    map-side combined. Both sides tokenize identically (lowercased
    str.split(): `dedup.tokens_expr`), so quoting a benchmark question
    verbatim hits regardless of case or whitespace shape.

    `broadcast_eval` (default True) fits the intended shape — a small
    benchmark suite. Pass False when the "eval" side is itself
    corpus-sized (e.g. cross-corpus overlap audits): the hint would
    otherwise push a multi-GB build past Spark's broadcast limits, and
    a plain shuffled join is the correct plan there."""
    # "s" is shingle_rows' own output column (used for the eval side)
    if id_col in ("n_hits", "n_doc_ngrams", "hit_frac", "s", _SH, _HIT):
        raise ValueError(f"id_col {id_col!r} collides with an output or "
                         "internal column of decontaminate")
    ev = (shingle_rows(eval_df, id_col, text_col, ngram=ngram)
          .select(F.col("s").alias(_SH)).distinct()
          .withColumn(_HIT, F.lit(1)))
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            ngrams_expr(tokens_expr(F.col(text_col)), ngram))).alias(_SH))
    joined = tr.join(ev, _SH, "left")
    n_hits = F.sum(F.coalesce(_HIT, F.lit(0)))
    return (
        joined.groupBy(id_col)
        .agg(n_hits.cast("long").alias("n_hits"),
             F.count("*").alias("n_doc_ngrams"))
        .filter(F.col("n_hits") > 0)
        .select(id_col, "n_hits", "n_doc_ngrams",
                F.round(F.col("n_hits") / F.col("n_doc_ngrams"),
                        round_dp).alias("hit_frac"))
    )
