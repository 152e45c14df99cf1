"""Vendored single-process oracle for parity tests (formulas cited, not copied)."""
