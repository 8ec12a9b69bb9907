"""Core tensor-train containers."""
