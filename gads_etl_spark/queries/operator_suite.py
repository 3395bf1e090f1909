"""Operator suite — populated incrementally."""
