from .expr import (  # noqa: F401
    clean_text,
    iso_or_original,
    money,
    null_default,
    revenue,
    surrogate_key,
)
