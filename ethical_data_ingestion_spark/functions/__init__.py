"""Scalar/column function library (SURVEY §2.5)."""
