"""Offline statistical analysis (reblocking, extraction)."""
