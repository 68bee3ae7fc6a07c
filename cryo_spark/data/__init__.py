"""Vendored data assets (small, redistribution-safe, pure-Python)."""
