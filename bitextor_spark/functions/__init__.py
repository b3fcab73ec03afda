"""Column-level functions: URL canonicalization, hashing, text, images."""
