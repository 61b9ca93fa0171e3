"""Corpus curation CLI package ([ext] north star)."""
