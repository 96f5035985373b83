"""§2.9 multimodal/binary columns — implemented in a later milestone."""
