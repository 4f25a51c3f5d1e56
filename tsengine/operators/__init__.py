"""Operator library: every compute-surface function from SURVEY.md §2,
re-expressed as lazy DataFrame transformations."""
