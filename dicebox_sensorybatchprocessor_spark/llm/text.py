"""§2.9 text analysis — implemented in a later milestone."""
