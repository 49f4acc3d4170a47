"""Operator library: positional algebra plus LLM-data-pipeline extensions."""
