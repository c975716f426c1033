"""Operators: LWW compaction, lake MERGE, skew salting, dedup, similarity, text."""
