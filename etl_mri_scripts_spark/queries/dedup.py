"""Placeholder — queries added in later phases."""
