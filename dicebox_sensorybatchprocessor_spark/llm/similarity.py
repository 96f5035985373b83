"""§2.9 similarity search — implemented in a later milestone."""
