"""Checkpoint streaming + quantize-on-load."""
