"""Changelog / streaming semantics suite — filled in Milestone 2."""
