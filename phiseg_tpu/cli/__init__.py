"""Command-line entry points (equivalents of the reference repo-root scripts)."""
