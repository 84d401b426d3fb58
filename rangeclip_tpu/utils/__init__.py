"""Shared utilities: math helpers, logging, tensor monitoring, depth I/O."""
