"""Extraction semantics — shared by the Spark pandas UDFs and the pytest
oracle (SURVEY.md §7 M0: write the semantics once, vectorize around it)."""

from .semantics import ExtractResult, extract_article
from .sites import GENERIC, REGISTRY, SiteProfile, profile_for

__all__ = [
    "ExtractResult",
    "extract_article",
    "GENERIC",
    "REGISTRY",
    "SiteProfile",
    "profile_for",
]
