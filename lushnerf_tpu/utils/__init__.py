"""Metrics, logging, and misc utilities."""
