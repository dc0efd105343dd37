"""Fixture double for lxml (package root; see lxml/html.py)."""
