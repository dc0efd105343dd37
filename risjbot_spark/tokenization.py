"""Real-tokenizer token counting behind a probe seam — so sequence
packing and datasheet totals can use the TRAINING tokenizer's counts
instead of whitespace/heuristic estimates when the library is present.

Dispatch mirrors `extract/nlp.py`'s backend seam exactly: probe
HuggingFace `tokenizers` at import, let the driver pin the decision
into UDF closures (heterogeneous executors fail loudly, never silently
mix real and estimated counts), deterministic stand-in otherwise.

The stand-in is the ceil(chars/4)-per-word subword estimate — chosen
because it is ALSO expressible as a pure JVM expression
(`bpe_estimate_expr`, the same formula q:token_count publishes), so the
no-library path never pays Python at all: `token_counts` routes to the
expression unless a real tokenizer is in play. The real path is an
Arrow-batched pandas UDF (never per-row Python) loading the tokenizer
file once per executor process.

Scale shape: both paths are per-row projections — zero exchanges; the
real path's cost is the tokenizer encode itself, batched by Arrow.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema import PY_WS_RE

__all__ = [
    "HAS_TOKENIZERS",
    "backend_flags",
    "pin_backend",
    "bpe_estimate_expr",
    "count_tokens_standin",
    "token_counts",
]

try:  # probe seam: real library when importable (not in this container)
    from tokenizers import Tokenizer as _Tokenizer  # type: ignore
    HAS_TOKENIZERS = True
except Exception:  # pragma: no cover - absence is the container default
    _Tokenizer = None
    HAS_TOKENIZERS = False

_PINNED: "dict[str, bool] | None" = None


def backend_flags() -> "dict[str, bool]":
    """This process's probe result — capture on the driver, ship in UDF
    closures, pin on workers."""
    return {"tokenizers": HAS_TOKENIZERS}


def pin_backend(flags: "dict[str, bool] | None") -> None:
    """Pin the dispatch decision for this process (None → unpin)."""
    global _PINNED
    _PINNED = dict(flags) if flags is not None else None


def _use_real() -> bool:
    from .seams import seam_use
    return seam_use("tokenizers", HAS_TOKENIZERS, _PINNED,
                    kind="tokenizer backend")


def count_tokens_standin(text: str) -> int:
    """ceil(len/4) per whitespace word — the deterministic stand-in,
    value-identical to `bpe_estimate_expr`."""
    return sum(math.ceil(len(w) / 4) for w in text.split())


def bpe_estimate_expr(text_col) -> Column:
    """The stand-in as a JVM expression (NULL text → NULL): what
    `token_counts` compiles to when no real tokenizer is in play."""
    words = F.filter(F.split(F.trim(text_col), PY_WS_RE),
                     lambda x: x != "")
    return F.aggregate(
        words, F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"))


def token_counts(df: DataFrame, text_col: str, *,
                 out_col: str = "n_tokens",
                 tokenizer_file: "str | None" = None) -> DataFrame:
    """Per-document token counts for packing/datasheets.

    With `tokenizer_file` (a HuggingFace tokenizers JSON) and the
    library importable under the driver's pin, counts come from the
    REAL tokenizer via an Arrow-batched pandas UDF — the file loads
    once per executor process, encode_batch amortizes per Arrow batch.
    Otherwise the ceil(chars/4) estimate runs as a pure JVM expression
    (zero Python). NULL text counts NULL either way."""
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists in the "
                         "input; pick a fresh name")
    if tokenizer_file is None or not _use_real():
        return df.withColumn(out_col, bpe_estimate_expr(F.col(text_col)))

    flags = backend_flags() if _PINNED is None else dict(_PINNED)

    @F.pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        pin_backend(flags)
        return _count_batch(s, tokenizer_file)

    return df.withColumn(out_col, _count(F.col(text_col)))


def _count_batch(s: "pd.Series", tokenizer_file: str) -> "pd.Series":
    """One Arrow batch through the REAL tokenizer — extracted from the
    UDF so the dispatch (incl. the pinned-but-absent guard in
    _use_real) is testable driver-side with the vendored double, the
    same per-row-helper pattern the multimodal seams use."""
    if not _use_real():
        raise RuntimeError("real-tokenizer batch path reached without "
                           "the library (pin mismatch)")
    tok = _tokenizer_cache(tokenizer_file)
    mask = s.notna()
    out = pd.Series([None] * len(s), index=s.index, dtype="object")
    if mask.any():
        enc = tok.encode_batch(s[mask].tolist())
        out[mask] = [len(e.ids) for e in enc]
    return out.astype("Int64")


_TOK_CACHE: "dict[str, object]" = {}


def _tokenizer_cache(path: str):
    """One Tokenizer per (process, file) — executors keep it across
    Arrow batches."""
    t = _TOK_CACHE.get(path)
    if t is None:
        t = _Tokenizer.from_file(path)
        _TOK_CACHE[path] = t
    return t
