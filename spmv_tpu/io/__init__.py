"""I/O loaders (the reference's L6)."""
