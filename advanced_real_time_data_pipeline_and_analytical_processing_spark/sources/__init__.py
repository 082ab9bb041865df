"""Batch + streaming sources and the schema registry."""
