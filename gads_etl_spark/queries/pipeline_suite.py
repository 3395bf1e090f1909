"""Pipeline suite — populated incrementally."""
