"""Linalg ops: truncation, rsvd, apply."""
