"""Operators: index build, query serving, dedup, similarity, text analysis."""
