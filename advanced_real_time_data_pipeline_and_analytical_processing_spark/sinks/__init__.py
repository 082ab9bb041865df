"""Sinks: quarantine, audit, serving-store writers."""
