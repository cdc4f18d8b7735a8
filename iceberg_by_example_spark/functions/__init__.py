from .exact import davg, dec, dsum, dsum_dec, one_minus, one_plus  # noqa: F401
