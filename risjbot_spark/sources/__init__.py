from .feeds import expand_sitemaps, parse_feed, parse_feed_udf, seeds_from_csv, seeds_from_textfile

__all__ = [
    "parse_feed",
    "parse_feed_udf",
    "expand_sitemaps",
    "seeds_from_csv",
    "seeds_from_textfile",
]
