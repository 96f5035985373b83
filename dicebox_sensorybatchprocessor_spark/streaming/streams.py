"""§2.8 streaming operators — implemented in a later milestone."""
