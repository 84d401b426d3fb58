"""Command-line entry points (L6/L9 equivalents)."""
