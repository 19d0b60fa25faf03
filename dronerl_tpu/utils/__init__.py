"""Cross-cutting utilities: metric logging, profiling, seeding."""
