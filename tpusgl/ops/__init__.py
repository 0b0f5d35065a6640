"""Pallas + jnp compute ops."""
