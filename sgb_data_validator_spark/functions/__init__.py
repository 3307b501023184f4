"""Scalar functions: text normalization (native + vectorized), QIDs."""
