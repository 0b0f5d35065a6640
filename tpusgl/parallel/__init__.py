"""Mesh + sharding utilities."""
