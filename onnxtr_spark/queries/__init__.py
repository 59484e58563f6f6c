"""Relational benchmark queries over the TPC-H-ish testdata tables."""
