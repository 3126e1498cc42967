"""Composed operators: the engine's value-add above raw DataFrame calls."""
