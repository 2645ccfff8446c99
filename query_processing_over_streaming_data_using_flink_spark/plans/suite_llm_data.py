"""LLM-data-pipeline operator suite — filled in Milestone 3."""
