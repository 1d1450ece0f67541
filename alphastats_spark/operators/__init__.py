"""Distributed operator building blocks (ordered prefixes, islands, joins)."""
