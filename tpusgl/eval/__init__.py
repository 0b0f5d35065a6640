"""Evaluation harnesses (perplexity, parity)."""
