"""Experimental features. Reference: ``nessai/experimental/``."""
