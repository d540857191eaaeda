from .binding import load_library, native_available  # noqa: F401
