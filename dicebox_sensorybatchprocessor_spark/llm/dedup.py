"""§2.9 dedup operators — implemented in a later milestone."""
