from .money import dec, dsum, davg, sql_dec, sql_dsum, sql_davg  # noqa: F401
