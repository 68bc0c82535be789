"""Compatibility layer: migrate artifacts from the reference ecosystem."""
