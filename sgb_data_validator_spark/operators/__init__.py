"""Operators: the rule families of the validation engine plus the
training-data-pipeline operators (dedup, similarity, text analysis)."""
