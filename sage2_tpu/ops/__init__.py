"""Device-side primitive operations (2-bit packing, multi-key sort, segment ops)."""
