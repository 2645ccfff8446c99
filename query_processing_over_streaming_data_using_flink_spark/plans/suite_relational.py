"""Relational operator micro-suite — filled in Milestone 1."""
