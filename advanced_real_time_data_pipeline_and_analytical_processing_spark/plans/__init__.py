"""Plan-level helpers: naming, rule specs, explain utilities."""
