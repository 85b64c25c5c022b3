"""Pure, Ray-free kernels (normalization, scorers, extraction, hashing)."""
