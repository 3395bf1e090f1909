"""Extension suite — populated incrementally."""
