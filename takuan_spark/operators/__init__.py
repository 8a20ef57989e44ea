"""Relational + north-star operators, all expressed as DataFrame
transformations so Catalyst can optimize them (SURVEY.md §2)."""
