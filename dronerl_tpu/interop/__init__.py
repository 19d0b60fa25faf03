"""Checkpoint persistence and cross-framework (torch) interop."""
