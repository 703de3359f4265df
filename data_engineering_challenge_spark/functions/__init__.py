"""Scalar expression builders shared across operator families."""
