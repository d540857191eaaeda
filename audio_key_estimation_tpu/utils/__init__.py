from .key_signatures import KEY_SIGNATURE_MAP, NUM_SIGNATURE_ROWS  # noqa: F401
