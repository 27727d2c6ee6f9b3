"""Reusable column expressions: exact cross-engine aggregates, text
statistics, vector math."""
