"""The heterogeneous-cluster dispatch guard shared by every
real-library probe seam (extract/nlp, multimodal, tokenization).

Each seam module probes its libraries at import, lets the DRIVER pin
the probe result into UDF closures, and re-checks on every worker:
pinned-available-but-absent must raise, never fall back — a cluster
where half the executors have the real library and half use the
deterministic stand-in would silently mix value families inside one
column. This module holds the ONE copy of that guard; the seam modules
keep their own `_PINNED` globals and flag vocabularies and delegate
here."""

from __future__ import annotations

__all__ = ["seam_use"]


def seam_use(name: str, local_has: bool,
             pinned: "dict[str, bool] | None", *,
             kind: str = "backend",
             exc: type = RuntimeError) -> bool:
    """True = dispatch to the real library. Unpinned processes follow
    their local probe; pinned processes follow the driver's decision,
    and a pin this process can't honor raises `exc` loudly."""
    if pinned is None:
        return local_has
    want = pinned.get(name, False)
    if want and not local_has:
        raise exc(
            f"{kind} {name!r} was pinned available by the driver but "
            f"is not importable in this worker — heterogeneous "
            f"deployment would silently mix real-library and stand-in "
            f"values; install the library on every executor (or pin "
            f"it off)")
    return want
