"""Command-line entry points (train / eval / cga)."""
