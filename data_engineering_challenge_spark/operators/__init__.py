"""Operator families. Importing a module registers its queries."""
