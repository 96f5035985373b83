"""§2.9 UDx surface — implemented in a later milestone."""
